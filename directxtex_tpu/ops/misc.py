"""Misc image ops: ComputeMSE, CopyRectangle, EvaluateImage, TransformImage
(DirectXTexMisc.cpp).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..formats.dxgi import FMT, DXGIFormat
from ..texture import Texture
from .flags import CMSE_FLAGS

__all__ = ["compute_mse", "compute_psnr", "copy_rectangle", "evaluate_image",
           "transform_image"]

_GAMMA22 = jnp.asarray([2.2, 2.2, 2.2, 1.0])

_SRGB_MSE_FORMATS = (
    FMT.R8G8B8A8_UNORM_SRGB, FMT.BC1_UNORM_SRGB, FMT.BC2_UNORM_SRGB,
    FMT.BC3_UNORM_SRGB, FMT.B8G8R8A8_UNORM_SRGB, FMT.BC7_UNORM_SRGB,
)


def _implied_flags(fmt: DXGIFormat, which: int, flags: CMSE_FLAGS) -> CMSE_FLAGS:
    """Flags implied by image format (DirectXTexMisc.cpp:47-92)."""
    srgb = CMSE_FLAGS.IMAGE1_SRGB if which == 1 else CMSE_FLAGS.IMAGE2_SRGB
    if fmt == FMT.B8G8R8X8_UNORM:
        flags |= CMSE_FLAGS.IGNORE_ALPHA
    elif fmt == FMT.B8G8R8X8_UNORM_SRGB:
        flags |= srgb | CMSE_FLAGS.IGNORE_ALPHA
    elif fmt in _SRGB_MSE_FORMATS:
        flags |= srgb
    return flags


def compute_mse(image1: jnp.ndarray, image2: jnp.ndarray,
                flags: CMSE_FLAGS = CMSE_FLAGS.DEFAULT,
                fmt1: DXGIFormat | None = None,
                fmt2: DXGIFormat | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MSE between two [..., 4] RGBA images (ComputeMSE,
    DirectXTexMisc.cpp:27-180). Returns (mse_scalar, mse_per_channel[4]);
    the scalar is the SUM of the four channel MSEs, matching the reference.
    """
    flags = CMSE_FLAGS(flags)
    if fmt1 is not None:
        flags = _implied_flags(fmt1, 1, flags)
    if fmt2 is not None:
        flags = _implied_flags(fmt2, 2, flags)

    v1 = jnp.asarray(image1, jnp.float32)
    v2 = jnp.asarray(image2, jnp.float32)
    if v1.shape[-1] not in (3, 4) or v2.shape[-1] not in (3, 4):
        raise ValueError("compute_mse expects [..., 3] or [..., 4] images")
    if v1.shape[-1] == 3:
        v1 = jnp.concatenate([v1, jnp.zeros(v1.shape[:-1] + (1,))], axis=-1)
        flags |= CMSE_FLAGS.IGNORE_ALPHA
    if v2.shape[-1] == 3:
        v2 = jnp.concatenate([v2, jnp.zeros(v2.shape[:-1] + (1,))], axis=-1)
        flags |= CMSE_FLAGS.IGNORE_ALPHA
    if flags & CMSE_FLAGS.IMAGE1_SRGB:
        v1 = jnp.power(v1, _GAMMA22)  # gamma-2.2 approximation (g_Gamma22)
    if flags & CMSE_FLAGS.IMAGE1_X2_BIAS:
        v1 = v1 * 2.0 - 1.0
    if flags & CMSE_FLAGS.IMAGE2_SRGB:
        v2 = jnp.power(v2, _GAMMA22)
    if flags & CMSE_FLAGS.IMAGE2_X2_BIAS:
        v2 = v2 * 2.0 - 1.0

    d = v1 - v2
    mask = jnp.asarray([
        0.0 if flags & CMSE_FLAGS.IGNORE_RED else 1.0,
        0.0 if flags & CMSE_FLAGS.IGNORE_GREEN else 1.0,
        0.0 if flags & CMSE_FLAGS.IGNORE_BLUE else 1.0,
        0.0 if flags & CMSE_FLAGS.IGNORE_ALPHA else 1.0,
    ])
    d = d * mask
    npix = d.size // 4
    mse_v = jnp.sum((d * d).reshape(-1, 4), axis=0) / npix
    return jnp.sum(mse_v), mse_v


def compute_psnr(image1: jnp.ndarray, image2: jnp.ndarray,
                 flags: CMSE_FLAGS = CMSE_FLAGS.DEFAULT) -> jnp.ndarray:
    """PSNR in dB over RGB channels (peak 1.0), the benchmark quality metric.

    Uses MSE averaged over the 3 color channels (texconv/texdiag convention).
    """
    _, mse_v = compute_mse(image1, image2, flags | CMSE_FLAGS.IGNORE_ALPHA)
    mse = jnp.sum(mse_v) / 3.0
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-30))


def copy_rectangle(src: jnp.ndarray, src_rect: tuple[int, int, int, int],
                   dst: jnp.ndarray, x_offset: int, y_offset: int) -> jnp.ndarray:
    """CopyRectangle (DirectXTexMisc.cpp:275): paste src[y:y+h, x:x+w] into
    dst at (x_offset, y_offset). Arrays are [H, W, 4]; returns new dst."""
    x, y, w, h = src_rect
    if x + w > src.shape[1] or y + h > src.shape[0]:
        raise ValueError("source rectangle out of bounds")
    if x_offset + w > dst.shape[1] or y_offset + h > dst.shape[0]:
        raise ValueError("destination rectangle out of bounds")
    patch = src[y:y + h, x:x + w]
    return jnp.asarray(dst).at[y_offset:y_offset + h,
                               x_offset:x_offset + w].set(patch)


def evaluate_image(tex_or_image, pixel_func: Callable[[jnp.ndarray], None]) -> None:
    """EvaluateImage (DirectXTexMisc.cpp:475): call `pixel_func(pixels)` with
    the full [H, W, 4] array (the reference iterates scanlines; device-side
    the natural unit is the whole plane)."""
    if isinstance(tex_or_image, Texture):
        for lvl in tex_or_image.levels:
            for item in range(lvl.shape[0]):
                pixel_func(lvl[item])
    else:
        pixel_func(tex_or_image)


def transform_image(tex: Texture,
                    pixel_func: Callable[[jnp.ndarray], jnp.ndarray]) -> Texture:
    """TransformImage (DirectXTexMisc.cpp:606): map a user function over every
    [H, W, 4] plane, producing a new texture."""
    new_levels = []
    for lvl in tex.levels:
        out = jnp.stack([pixel_func(lvl[item]) for item in range(lvl.shape[0])])
        if out.shape != lvl.shape:
            raise ValueError("pixel_func must preserve shape")
        new_levels.append(out)
    return tex.replace_levels(new_levels)
