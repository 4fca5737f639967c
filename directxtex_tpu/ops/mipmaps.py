"""Mipmap generation (DirectXTexMipmaps.cpp).

The reference generates level l+1 from level l with per-filter scanline loops
(Generate2DMips*Filter, :907-1607). Here each level is one fused device op:
point = strided slice, box = 2x2 (or 1x2/2x1) mean via reshape-mean, linear/
cubic/triangle land with the resize module. sRGB-correct filtering wraps the
whole chain in transfer functions (Load/StoreScanlineLinear semantics).

Alpha-coverage preservation (ScaleMipMapsAlphaForCoverage,
DirectXTexMipmaps.cpp:3483) does the reference's bisection search, batched
over the whole level.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ..formats import traits
from ..texture import TexDimension, Texture
from .colorspace import apply_linear_to_srgb, apply_srgb_to_linear
from .flags import TEX_FILTER_FLAGS as TF
from .flags import TEX_FILTER_MODE_MASK

__all__ = ["generate_mipmaps", "generate_mipmaps_3d",
           "scale_mipmaps_alpha_for_coverage", "calculate_alpha_coverage"]


def _box_reduce_2d(img: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 4] -> [N, H/2, W/2, 4] box filter; handles H==1 or W==1."""
    n, h, w, c = img.shape
    nh, nw = max(1, h // 2), max(1, w // 2)
    if h > 1:
        img = img.reshape(n, nh, 2, w, c).mean(axis=2)
    if w > 1:
        img = img.reshape(n, nh, nw, 2, c).mean(axis=3)
    return img


def _point_reduce_2d(img: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 4] -> [N, H/2, W/2, 4] point sample; handles H==1/W==1."""
    _, h, w, _ = img.shape
    if h > 1 and w > 1:
        return img[:, ::2, ::2]
    return img[:, :, ::2] if w > 1 else img[:, ::2, :]


def _reduce_level(img: jnp.ndarray, mode: int, wrap_mirror: TF) -> jnp.ndarray:
    """One mip reduction step for 2D [N, H, W, 4]."""
    if mode == int(TF.POINT):
        return _point_reduce_2d(img)
    if mode in (0, int(TF.BOX), int(TF.LINEAR), int(TF.CUBIC), int(TF.TRIANGLE)):
        # linear/cubic/triangle for exact-1/2 downscale: the reference's
        # linear filter with a pow2 halving reduces to the same 2x2 box;
        # cubic/triangle use the resize module once sizes aren't pow2.
        from .resize import resize_array
        n, h, w, c = img.shape
        nh, nw = max(1, h // 2), max(1, w // 2)
        if mode in (0, int(TF.BOX)) or (h // 2 * 2 == h and w // 2 * 2 == w):
            if mode in (int(TF.CUBIC), int(TF.TRIANGLE)) :
                return resize_array(img, nw, nh, TF(mode) | wrap_mirror)
            return _box_reduce_2d(img)
        return resize_array(img, nw, nh, TF(mode) | wrap_mirror)
    raise ValueError(f"unknown filter mode {mode:#x}")


def generate_mipmaps(tex: Texture, filter_flags: TF = TF.DEFAULT,
                     levels: int = 0) -> Texture:
    """GenerateMipMaps (DirectXTexMipmaps.cpp:2828). levels=0 => full chain."""
    filter_flags = TF(filter_flags)
    meta = tex.metadata
    if meta.dimension == TexDimension.TEXTURE3D:
        return generate_mipmaps_3d(tex, filter_flags, levels)
    if traits.is_compressed(meta.format):
        raise ValueError("generate_mipmaps: decompress first")

    n_levels = traits.calculate_mip_levels(meta.width, meta.height, levels)
    mode = int(filter_flags) & TEX_FILTER_MODE_MASK
    wrap_mirror = filter_flags & (TF.WRAP | TF.MIRROR)

    srgb = traits.is_srgb(meta.format) or bool(filter_flags & TF.SRGB_IN)

    base = tex.levels[0]
    work = apply_srgb_to_linear(base) if srgb else base
    chain = [base]
    lin = work
    for _ in range(1, n_levels):
        lin = _reduce_level(lin, mode, wrap_mirror)
        chain.append(apply_linear_to_srgb(lin) if srgb else lin)

    new_meta = dataclasses.replace(meta, mip_levels=n_levels)
    return Texture(new_meta, chain)


def generate_mipmaps_3d(tex: Texture, filter_flags: TF = TF.DEFAULT,
                        levels: int = 0) -> Texture:
    """GenerateMipMaps3D (DirectXTexMipmaps.cpp:3254)."""
    filter_flags = TF(filter_flags)
    meta = tex.metadata
    n_levels = traits.calculate_mip_levels_3d(meta.width, meta.height,
                                              meta.depth, levels)
    mode = int(filter_flags) & TEX_FILTER_MODE_MASK
    wrap = bool(filter_flags & TF.WRAP)
    mirror = bool(filter_flags & TF.MIRROR)

    srgb = traits.is_srgb(meta.format) or bool(filter_flags & TF.SRGB_IN)
    base = tex.levels[0]  # [D, H, W, 4]
    lin = apply_srgb_to_linear(base) if srgb else base
    chain = [base]
    for _ in range(1, n_levels):
        d, h, w, c = lin.shape
        if mode == int(TF.POINT):
            lin = lin[:: 2 if d > 1 else 1, :: 2 if h > 1 else 1,
                      :: 2 if w > 1 else 1]
        elif mode in (int(TF.LINEAR), int(TF.CUBIC), int(TF.TRIANGLE)):
            # Generate3DMips{Linear,Cubic,Triangle}Filter
            # (DirectXTexMipmaps.cpp:1608-2827): separable per-axis filter
            # matrices (filters.h weights) contracted on the MXU
            from .resize import filter_weights
            for axis, size in ((0, d), (1, h), (2, w)):
                nsize = max(1, size // 2)
                if nsize == size:
                    continue
                W = jnp.asarray(filter_weights(size, nsize, mode, wrap,
                                               mirror))
                lin = jnp.moveaxis(
                    jnp.tensordot(W, jnp.moveaxis(lin, axis, 0),
                                  axes=([1], [0])), 0, axis)
        else:  # box / fant default
            if d > 1:
                lin = lin.reshape(max(1, d // 2), 2, h, w, c).mean(axis=1)
            nd = lin.shape[0]
            if h > 1:
                lin = lin.reshape(nd, max(1, h // 2), 2, w, c).mean(axis=2)
            nh = lin.shape[1]
            if w > 1:
                lin = lin.reshape(nd, nh, max(1, w // 2), 2, c).mean(axis=3)
        chain.append(apply_linear_to_srgb(lin) if srgb else lin)

    new_meta = dataclasses.replace(meta, mip_levels=n_levels)
    return Texture(new_meta, chain)


def calculate_alpha_coverage(alpha: jnp.ndarray, ref: float,
                             scale: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """Fraction of texels whose (scaled) alpha passes the reference test
    (CalculateAlphaCoverage, DirectXTexMipmaps.cpp:215)."""
    a = jnp.minimum(jnp.asarray(alpha) * scale, 1.0)
    return jnp.mean((a > ref).astype(jnp.float32))


def scale_mipmaps_alpha_for_coverage(tex: Texture,
                                     alpha_reference: float) -> Texture:
    """ScaleMipMapsAlphaForCoverage (DirectXTexMipmaps.cpp:3483).

    For each mip > 0, bisection-search an alpha scale so that level's
    coverage matches the base level's (EstimateAlphaScaleForCoverage :310),
    then scale alpha (:143).
    """
    base_cov = calculate_alpha_coverage(tex.levels[0][..., 3], alpha_reference)

    def estimate_scale(alpha):
        def body(_, carry):
            mn, mx, scale = carry
            cov = calculate_alpha_coverage(alpha, alpha_reference, scale)
            mn = jnp.where(cov < base_cov, scale, mn)
            mx = jnp.where(cov < base_cov, mx, scale)
            return mn, mx, (mn + mx) * 0.5

        mn, mx, scale = lax.fori_loop(
            0, 10, body, (jnp.float32(0.0), jnp.float32(4.0), jnp.float32(1.0)))
        return scale

    new_levels = [tex.levels[0]]
    for lvl in tex.levels[1:]:
        scale = estimate_scale(lvl[..., 3])
        scaled = jnp.minimum(lvl[..., 3] * scale, 1.0)
        new_levels.append(lvl.at[..., 3].set(scaled))
    return tex.replace_levels(new_levels)
