"""Spatial sharding for huge textures: rows over the mesh, halos over ICI.

The reference's "large texture" story is 4GB limits and ALLOW_LARGE_FILES
(DirectXTex.h:136,278); one image never spans execution units. On a TPU
mesh a single huge image CAN span chips: shard the row axis, keep every
pixel op local, and exchange only the filter-tap halo rows between
neighboring shards with `jax.lax.ppermute` (SURVEY.md §5 "long-context"
note). Wrap edges map to the ppermute ring for free; mirror/clamp edges
overwrite the ring data at the global boundary shards.

Everything here runs under `shard_map` over a 1-D ("rows") mesh axis and
is exercised on a virtual CPU mesh in tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pre-0.8 JAX
    from jax.experimental.shard_map import shard_map

__all__ = ["rows_sharding", "halo_exchange_rows", "sharded_normal_map",
           "sharded_box_mip"]


def rows_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Shard the leading (row) axis of an image over the mesh."""
    return NamedSharding(mesh, P(axis))


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis: str,
                       wrap: bool = True) -> jnp.ndarray:
    """[H_loc, ...] -> [H_loc + 2*halo, ...] with neighbor rows attached.

    Shards are ordered top-to-bottom along `axis`. The top halo comes from
    the previous shard's last rows, the bottom halo from the next shard's
    first rows — one ppermute each way, riding ICI. With wrap=False the
    global boundary shards replicate their own edge row (clamp semantics,
    matching jnp.pad mode="edge" in the single-device ops).

    Must be called inside shard_map over `axis`.
    """
    n = jax.lax.axis_size(axis)
    if n == 1:
        if wrap:
            return jnp.concatenate([x[-halo:], x, x[:halo]], axis=0)
        top = jnp.repeat(x[:1], halo, axis=0)
        bot = jnp.repeat(x[-1:], halo, axis=0)
        return jnp.concatenate([top, x, bot], axis=0)

    i = jax.lax.axis_index(axis)
    # each shard sends its last rows downward (j -> j+1): received = the
    # previous shard's tail = my top halo; first rows upward for the bottom
    top = jax.lax.ppermute(x[-halo:], axis,
                           [(j, (j + 1) % n) for j in range(n)])
    bot = jax.lax.ppermute(x[:halo], axis,
                           [(j, (j - 1) % n) for j in range(n)])
    if not wrap:
        # clamp at the global edges: shard 0 replicates its first row,
        # shard n-1 its last row
        edge_top = jnp.repeat(x[:1], halo, axis=0)
        edge_bot = jnp.repeat(x[-1:], halo, axis=0)
        top = jnp.where((i == 0), edge_top, top)
        bot = jnp.where((i == n - 1), edge_bot, bot)
    return jnp.concatenate([top, x, bot], axis=0)


def _shift_cols(h: jnp.ndarray, dx: int, mirror_u: bool) -> jnp.ndarray:
    """Column shift with wrap or clamp — full width is local to each shard."""
    if dx == 0:
        return h
    if mirror_u:
        padded = jnp.pad(h, ((0, 0), (1, 1)), mode="edge")
        return padded[:, 1 + dx:padded.shape[1] - 1 + dx]
    return jnp.roll(h, -dx, axis=1)


def sharded_normal_map(mesh: Mesh, amplitude: float = 1.0,
                       mirror_u: bool = False, mirror_v: bool = False,
                       invert_sign: bool = False, axis: str = "batch"):
    """jit a height-field -> normal-map function over a rows-sharded image.

    Same 3x3 central-difference math as ops.compute_normal_map
    (ComputeNMap, DirectXTexNormalMaps.cpp:175-184) with UNORM biasing,
    but the [H, W] height plane is sharded over `mesh` rows and only the
    ONE halo row each way crosses chips. Returns fn: [H, W] -> [H, W, 4].
    """
    sh = NamedSharding(mesh, P(axis))

    def local(height):
        slab = halo_exchange_rows(height, 1, axis, wrap=not mirror_v)
        nb = {}
        for dy in (-1, 0, 1):
            rows = slab[1 + dy:slab.shape[0] - 1 + dy]
            for dx in (-1, 0, 1):
                nb[(dy, dx)] = _shift_cols(rows, dx, mirror_u)
        tot_x = ((nb[(-1, -1)] - nb[(-1, 1)]) + (nb[(0, -1)] - nb[(0, 1)])
                 + (nb[(1, -1)] - nb[(1, 1)]))
        tot_y = ((nb[(-1, -1)] - nb[(1, -1)]) + (nb[(-1, 0)] - nb[(1, 0)])
                 + (nb[(-1, 1)] - nb[(1, 1)]))
        nx = tot_x * (amplitude / 6.0)
        ny = tot_y * (amplitude / 6.0)
        nz = jnp.ones_like(nx)
        length = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        normal = jnp.stack([nx, ny, nz], axis=-1) / length[..., None]
        scale = -0.5 if invert_sign else 0.5
        normal = normal * scale + 0.5
        alpha = jnp.ones_like(nx)[..., None]
        return jnp.concatenate([normal, alpha], axis=-1)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis),
                   out_specs=P(axis))
    return jax.jit(fn, in_shardings=sh, out_shardings=sh)


def sharded_box_mip(mesh: Mesh, axis: str = "batch"):
    """jit one 2x box-filter halving over a rows-sharded [H, W, C] image.

    Requires the local shard height to be even (guaranteed when H is a
    multiple of 2 * mesh size): every 2-row group is then shard-local and
    NO cross-chip communication is needed — the sharding annotation alone
    keeps the reduction on-chip. Returns fn: [H, W, C] -> [H/2, W/2, C].
    """
    sh = NamedSharding(mesh, P(axis))

    def local(img):
        h, w, c = img.shape
        return img.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))

    fn = shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    return jax.jit(fn, in_shardings=sh, out_shardings=sh)
