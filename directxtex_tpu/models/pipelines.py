"""Jittable end-to-end texture pipelines (BASELINE.md configs).

These compose the codec/filters into single jitted device programs:
one upload, one compiled computation, one readback — the TPU-native
restructuring of texconv's per-stage host loop (SURVEY.md §3.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..bc import bc123, bc45, bc67
from ..bc.common import image_to_blocks
from ..ops.colorspace import apply_linear_to_srgb, apply_srgb_to_linear

__all__ = ["bc_encode_pipeline", "mipped_compress_pipeline",
           "hdr_cubemap_pipeline", "asset_pipeline"]


def _encode(kind: str, blocks, flags: int = 0):
    if kind == "bc1":
        return bc123.encode_bc1(blocks, 0.5, flags)
    if kind == "bc3":
        return bc123.encode_bc3(blocks, flags)
    if kind == "bc4":
        return bc45.encode_bc4u(blocks)
    if kind == "bc5":
        return bc45.encode_bc5u(blocks)
    if kind == "bc7":
        return bc67.encode_bc7(blocks, flags)
    if kind == "bc6h":
        return bc67.encode_bc6h(blocks, signed=False)
    raise ValueError(kind)


def bc_encode_pipeline(kind: str = "bc7", flags: int = 0):
    """[H, W, 4] f32 -> packed blocks. The headline benchmark kernel."""

    def run(img: jnp.ndarray) -> jnp.ndarray:
        blocks, _, _ = image_to_blocks(img)
        return _encode(kind, blocks, flags)

    return run


def mipped_compress_pipeline(kind: str = "bc1", levels: int = 0,
                             srgb: bool = True, flags: int = 0):
    """BASELINE config #1: image -> full box mip chain -> BC encode of every
    level, all inside one jit."""

    def run(img: jnp.ndarray):
        work = apply_srgb_to_linear(img) if srgb else img
        h, w = img.shape[:2]
        lvl = work
        n_levels = levels or max(h, w).bit_length()
        all_blocks = []
        counts = []
        for _ in range(n_levels):
            store = apply_linear_to_srgb(lvl) if srgb else lvl
            blocks, _, _ = image_to_blocks(store)
            all_blocks.append(blocks)
            counts.append(blocks.shape[0])
            nh, nw = max(1, lvl.shape[0] // 2), max(1, lvl.shape[1] // 2)
            if lvl.shape[0] > 1:
                lvl = lvl.reshape(nh, 2, lvl.shape[1], 4).mean(axis=1)
            if lvl.shape[1] > 1:
                lvl = lvl.reshape(nh, nw, 2, 4).mean(axis=2)
            if lvl.shape[:2] == (1, 1) and len(all_blocks) == n_levels:
                break
        # every level's blocks ride one encode dispatch
        packed = _encode(kind, jnp.concatenate(all_blocks, axis=0), flags)
        outs = []
        off = 0
        for c in counts:
            outs.append(packed[off:off + c])
            off += c
        return tuple(outs)

    return run


def hdr_cubemap_pipeline():
    """BASELINE config #4: equirect HDR [H, 2H, 4] -> 6 cube faces (H x H)
    via bilinear sphere sampling -> BC6H_UF16 blocks per face."""

    def run(equirect: jnp.ndarray):
        h = equirect.shape[0]
        face = h // 2
        u = (jnp.arange(face) + 0.5) / face * 2.0 - 1.0
        gv, gu = jnp.meshgrid(u, u, indexing="ij")
        one = jnp.ones_like(gu)
        # +X -X +Y -Y +Z -Z direction bases
        dirs = [
            (one, -gv, -gu), (-one, -gv, gu),
            (gu, one, gv), (gu, -one, -gv),
            (gu, -gv, one), (-gu, -gv, -one),
        ]
        flat = equirect.reshape(-1, 4)
        idxs = []
        for dx, dy, dz in dirs:
            norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            x, y, z = dx / norm, dy / norm, dz / norm
            lon = jnp.arctan2(x, z)          # [-pi, pi]
            lat = jnp.arcsin(jnp.clip(y, -1, 1))
            fu = (lon / (2 * jnp.pi) + 0.5) * equirect.shape[1]
            fv = (0.5 - lat / jnp.pi) * equirect.shape[0]
            x0 = jnp.clip(fu.astype(jnp.int32), 0, equirect.shape[1] - 1)
            y0 = jnp.clip(fv.astype(jnp.int32), 0, equirect.shape[0] - 1)
            idxs.append(y0 * equirect.shape[1] + x0)
        # ONE row gather for all six faces (row gather beats 2-D indexing;
        # batching amortizes the gather engine's fixed overhead)
        sampled_all = jnp.take(flat, jnp.stack(idxs).reshape(-1), axis=0)
        sampled_all = sampled_all.reshape(6, face, face, 4)
        all_blocks = []
        for i in range(6):
            blocks, _, _ = image_to_blocks(sampled_all[i])
            all_blocks.append(blocks)
        # all 6 faces in one encode dispatch
        packed = bc67.encode_bc6h(jnp.concatenate(all_blocks, axis=0),
                                  signed=False)
        per = all_blocks[0].shape[0]
        return tuple(packed[i * per:(i + 1) * per] for i in range(6))

    return run


def asset_pipeline(flags: int = 0):
    """BASELINE config #5: height map -> normal map -> BC7, batched over a
    texture library [N, H, W, 4]."""
    from ..ops.normalmaps import _shift

    def run(heights: jnp.ndarray):
        h = heights[..., 0]
        nb = {(dy, dx): _shift(h, dy, dx, False, False)
              for dy in (-1, 0, 1) for dx in (-1, 0, 1)}
        tx = ((nb[(-1, -1)] - nb[(-1, 1)]) + (nb[(0, -1)] - nb[(0, 1)])
              + (nb[(1, -1)] - nb[(1, 1)])) * (2.0 / 6.0)
        ty = ((nb[(-1, -1)] - nb[(1, -1)]) + (nb[(-1, 0)] - nb[(1, 0)])
              + (nb[(-1, 1)] - nb[(1, 1)])) * (2.0 / 6.0)
        ln = jnp.sqrt(tx * tx + ty * ty + 1.0)
        normal = jnp.stack([tx / ln, ty / ln, 1.0 / ln], axis=-1) * 0.5 + 0.5
        rgba = jnp.concatenate(
            [normal, jnp.ones(normal.shape[:-1] + (1,), jnp.float32)], -1)

        def enc(img):
            blocks, _, _ = image_to_blocks(img)
            return bc67.encode_bc7(blocks, flags)

        return jax.vmap(enc)(rgba)

    return run
