"""Device-mesh sharding helpers.

The texture pipeline's parallelism is data parallelism over the batch axis
(images or flat block index), exactly like the reference's OpenMP-over-blocks
(DirectXTexCompress.cpp:209-373) lifted to a chip mesh. No per-image
cross-chip communication exists; quality metrics reduce with psum.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "sharded_compress_fn", "sharded_mse"]


def make_mesh(devices: Sequence | None = None, axis: str = "batch") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Shard the leading dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(arr: jnp.ndarray, mesh: Mesh, axis: str = "batch"):
    """Place [N, ...] with N sharded over the mesh."""
    return jax.device_put(arr, batch_sharding(mesh, axis))


def sharded_compress_fn(encode_block_fn: Callable, mesh: Mesh,
                        axis: str = "batch") -> Callable:
    """jit an encode function [N, 16, 4] -> [N, B] with the block axis
    sharded over the mesh. XLA partitions the computation with zero
    collectives (blocks are independent)."""
    sh = batch_sharding(mesh, axis)
    return jax.jit(encode_block_fn, in_shardings=sh, out_shardings=sh)


def sharded_mse(mesh: Mesh, axis: str = "batch") -> Callable:
    """Batch-sharded MSE: per-shard partial sums combine via psum — the only
    collective in the pipeline (SURVEY.md §2.6)."""
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map

    def local(a, b):
        d = a - b
        s = jnp.sum(d * d)
        n = jnp.asarray(d.size, jnp.float32)
        return (jax.lax.psum(s, axis) / jax.lax.psum(n, axis))

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    ))
