"""Texture-library scale-out: whole asset libraries over the chip mesh.

The production shape of the workload: thousands of same-sized textures to
mip + compress. Batch them to [N, H, W, 4], shard N over the mesh, and run
ONE jitted program — XLA partitions the encode with zero collectives
(images are independent; SURVEY.md §2.6). Host I/O overlaps the device
work through a thread pool (the reference's per-file loop,
Texconv/texconv.cpp:2034+, turned into a data-parallel pipeline).

Multi-host: initialize `jax.distributed` first and give each host its own
`paths` slice; the mesh then spans all hosts' devices and DCN carries only
the per-host input shards.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..formats.dxgi import DXGIFormat
from .sharding import batch_sharding

__all__ = ["compress_library_fn", "load_library", "compress_library"]


def compress_library_fn(fmt: DXGIFormat, mesh: Mesh,
                        threshold: float = 0.5, bcflags: int = 0,
                        mips: bool = False, axis: str = "batch"):
    """jit a [N, H, W, 4] -> packed-blocks function, N sharded over `mesh`.

    With mips=True every image's full box mip chain is generated and
    encoded in the same dispatch (blocks of all levels concatenated, the
    models.pipelines.mipped_compress_pipeline structure). Returns the
    jitted fn; outputs keep the batch sharding so results can stay
    device-resident for further processing.
    """
    from ..bc.common import image_to_blocks
    from ..ops.compress import _ENCODERS, _encode_blocks

    if fmt not in _ENCODERS:
        raise ValueError(f"not a BC format: {fmt!r}")
    kind, _ = _ENCODERS[fmt]
    sh = batch_sharding(mesh, axis)

    def encode_one(img):
        if not mips:
            blocks, _, _ = image_to_blocks(img)
            return (_encode_blocks(kind, blocks, threshold, bcflags),)
        h, w = img.shape[:2]
        lvl = img
        outs = []
        for _ in range(max(h, w).bit_length()):
            blocks, _, _ = image_to_blocks(lvl)
            outs.append(blocks)
            nh, nw = max(1, lvl.shape[0] // 2), max(1, lvl.shape[1] // 2)
            if lvl.shape[0] > 1:
                lvl = lvl.reshape(nh, 2, lvl.shape[1], 4).mean(axis=1)
            if lvl.shape[1] > 1:
                lvl = lvl.reshape(nh, nw, 2, 4).mean(axis=2)
        counts = [b.shape[0] for b in outs]
        packed = _encode_blocks(kind, jnp.concatenate(outs, axis=0),
                                threshold, bcflags)
        res, off = [], 0
        for c in counts:
            res.append(packed[off:off + c])
            off += c
        return tuple(res)

    fn = jax.jit(jax.vmap(encode_one), in_shardings=sh,
                 out_shardings=sh)
    return fn


def load_library(paths: Sequence[str], width: int, height: int,
                 workers: int = 8) -> np.ndarray:
    """Load many image files into one [N, H, W, 4] f32 batch.

    Decoding runs in a thread pool (byte-level host work); images are
    resized on device only if their size differs from (width, height).
    """
    from ..io import load_texture
    from ..ops import decompress
    from ..ops.resize import resize_array
    from ..texture import CompressedTexture

    def load_one(p):
        t = load_texture(p)
        if isinstance(t, CompressedTexture):
            t = decompress(t)
        img = t.levels[0][0]
        if img.shape[:2] != (height, width):
            img = resize_array(img, width, height)
        return np.asarray(img, np.float32)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        return np.stack(list(pool.map(load_one, paths)))


def compress_library(paths: Sequence[str], fmt: DXGIFormat, mesh: Mesh,
                     width: int, height: int, *, threshold: float = 0.5,
                     bcflags: int = 0, mips: bool = False,
                     axis: str = "batch"):
    """End to end: files -> sharded batch -> one encode dispatch.

    Returns a list of per-level numpy block arrays [N, blocks_per_image,
    bytes] (one entry when mips=False). N is padded up to a mesh multiple
    internally; padding rows are dropped before returning.
    """
    n = len(paths)
    n_dev = mesh.devices.size
    batch = load_library(paths, width, height)
    pad = (-n) % n_dev
    if pad:
        batch = np.concatenate([batch, batch[:pad]], axis=0)
    sh = batch_sharding(mesh, axis)
    dev = jax.device_put(jnp.asarray(batch), sh)
    outs = compress_library_fn(fmt, mesh, threshold, bcflags, mips,
                               axis)(dev)
    return [np.asarray(o)[:n] for o in outs]
