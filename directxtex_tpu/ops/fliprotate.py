"""Flip / rotate (DirectXTexFlipRotate.cpp).

The reference routes through WIC's IWICBitmapFlipRotator (Windows-only,
DirectXTexFlipRotate.cpp:23-50). On TPU these are pure layout transforms:
jnp.flip / jnp.rot90 over the [items, H, W, 4] planes — XLA compiles them to
copies/transposes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..texture import Texture
from .flags import TEX_FR_FLAGS as FR

__all__ = ["flip_rotate"]


def flip_rotate(tex: Texture, flags: FR) -> Texture:
    """90-degree-multiple rotation plus optional horizontal/vertical flip.

    Matches TEX_FR_FLAGS semantics (DirectXTex.h:723-731): rotation applied
    first, then flips.
    """
    flags = FR(flags)
    rot = int(flags) & 0x3
    do_h = bool(flags & FR.FLIP_HORIZONTAL)
    do_v = bool(flags & FR.FLIP_VERTICAL)

    def xform(lvl):
        v = lvl
        if rot:
            # rot90 with k=-rot: TEX_FR_ROTATE90 is clockwise
            v = jnp.rot90(v, k=-rot, axes=(1, 2))
        if do_h:
            v = jnp.flip(v, axis=2)
        if do_v:
            v = jnp.flip(v, axis=1)
        return v

    levels = [xform(l) for l in tex.levels]
    meta = tex.metadata
    if rot in (1, 3):
        meta = dataclasses.replace(meta, width=meta.height, height=meta.width)
    return tex.replace_levels(levels, dataclasses.replace(meta, mip_levels=len(levels)))
