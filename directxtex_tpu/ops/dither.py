"""Dithered quantization for format conversion.

Mirrors DirectXTexConvert.cpp's two dither modes:
- TEX_FILTER_DITHER: ordered 4x4 dither (g_Dither table, :3863) applied
  around the quantization round — vectorized, device-friendly.
- TEX_FILTER_DITHER_DIFFUSION: Floyd-Steinberg error diffusion
  (StoreScanlineDither, :4049) — inherently sequential, runs in the native
  C++ kernel (native/dither.cpp) with a pure-Python fallback.

Both produce quantized-but-renormalized f32 values, so the regular pack()
path afterwards stores them losslessly.
"""

from __future__ import annotations

import numpy as np

from ..formats.dxgi import DXGIFormat, FMT

__all__ = ["dither_scales", "ordered_dither", "diffusion_dither",
           "apply_dither"]

# the reference's ordered-dither pattern (g_Dither, DirectXTexConvert.cpp:
# 3863, z=0 plane): B[y & 3][x & 3], values in (-0.5, 0.5)
_ORDERED = np.array([
    [0.468750, -0.031250, 0.343750, -0.156250],
    [-0.281250, 0.218750, -0.406250, 0.093750],
    [0.281250, -0.218750, 0.406250, -0.093750],
    [-0.468750, 0.031250, -0.343750, 0.156250],
], np.float32)

# per-channel quantization scales (g_Scale*pc tables, :3872-3881);
# (scales, clampzero). Only the formats StoreScanlineDither actually
# dithers; anything else falls through to the plain store.
_SCALES: dict[DXGIFormat, tuple[tuple, bool]] = {
    FMT.R16G16B16A16_UNORM: ((65535, 65535, 65535, 65535), True),
    FMT.R16G16B16A16_SNORM: ((32767, 32767, 32767, 32767), False),
    FMT.R10G10B10A2_UNORM: ((1023, 1023, 1023, 3), True),
    FMT.R10G10B10_XR_BIAS_A2_UNORM: ((510, 510, 510, 3), True),
    FMT.R8G8B8A8_UNORM: ((255, 255, 255, 255), True),
    FMT.R8G8B8A8_UNORM_SRGB: ((255, 255, 255, 255), True),
    FMT.B8G8R8A8_UNORM: ((255, 255, 255, 255), True),
    FMT.B8G8R8A8_UNORM_SRGB: ((255, 255, 255, 255), True),
    FMT.B8G8R8X8_UNORM: ((255, 255, 255, 255), True),
    FMT.B8G8R8X8_UNORM_SRGB: ((255, 255, 255, 255), True),
    FMT.R8G8B8A8_SNORM: ((127, 127, 127, 127), False),
    FMT.R16G16_UNORM: ((65535, 65535, 1, 1), True),
    FMT.R16G16_SNORM: ((32767, 32767, 1, 1), False),
    FMT.R8G8_UNORM: ((255, 255, 1, 1), True),
    FMT.R8G8_SNORM: ((127, 127, 1, 1), False),
    FMT.R16_UNORM: ((65535, 1, 1, 1), True),
    FMT.R16_SNORM: ((32767, 1, 1, 1), False),
    FMT.R8_UNORM: ((255, 1, 1, 1), True),
    FMT.R8_SNORM: ((127, 1, 1, 1), False),
    FMT.A8_UNORM: ((1, 1, 1, 255), True),
    FMT.B5G6R5_UNORM: ((31, 63, 31, 1), True),
    FMT.B5G5R5A1_UNORM: ((31, 31, 31, 1), True),
    FMT.B4G4R4A4_UNORM: ((15, 15, 15, 15), True),
    FMT.A4B4G4R4_UNORM: ((15, 15, 15, 15), True),
}


def dither_scales(fmt: DXGIFormat):
    """(per-channel scales [4], clampzero) or None if `fmt` is not a
    ditherable format (StoreScanlineDither's format switch)."""
    return _SCALES.get(fmt)


def ordered_dither(vals, fmt: DXGIFormat):
    """Ordered 4x4 dither + quantize + renormalize. vals [..., H, W, 4]
    (jnp or np); returns same type/shape."""
    import jax.numpy as jnp

    entry = dither_scales(fmt)
    if entry is None:
        return vals
    scales, clampzero = entry
    sc = jnp.asarray(scales, jnp.float32)
    h, w = vals.shape[-3], vals.shape[-2]
    pat = jnp.asarray(np.tile(_ORDERED, (-(-h // 4), -(-w // 4)))[:h, :w],
                      jnp.float32)[..., None]
    v = jnp.clip(vals, 0.0 if clampzero else -1.0, 1.0)
    t = jnp.round(v * sc + pat)
    lo = 0.0 if clampzero else -(sc - 1.0)
    t = jnp.clip(t, lo, sc)
    return t / sc


def _fs_dither_py(img: np.ndarray, scales: np.ndarray,
                  clampzero: bool) -> np.ndarray:
    """Pure-Python Floyd-Steinberg (fallback; small images only)."""
    h, w, _ = img.shape
    out = img.astype(np.float32).copy()
    err_prev = np.zeros((w + 2, 4), np.float32)
    for y in range(h):
        err_next = np.zeros((w + 2, 4), np.float32)
        rtl = bool(y & 1)
        verr = np.zeros(4, np.float32)
        xs = range(w - 1, -1, -1) if rtl else range(w)
        for x in xs:
            v = out[y, x] + err_prev[x + 1]
            v = np.clip(v, 0.0 if clampzero else -1.0, 1.0) + verr
            vs = v * scales
            # round-half-even, matching XMVectorRound / C nearbyintf
            target = np.round(vs.astype(np.float64)).astype(np.float32)
            e = (vs - target) / scales
            dl, dr = (x + 2, x) if rtl else (x, x + 2)
            err_next[dl] += e * (3.0 / 16.0)
            err_next[x + 1] += e * (5.0 / 16.0)
            err_next[dr] += e * (1.0 / 16.0)
            verr = e * (7.0 / 16.0)
            lo = 0.0 if clampzero else -(scales - 1.0)
            out[y, x] = np.clip(target, lo, scales) / scales
        err_prev = err_next
    return out


def diffusion_dither(vals, fmt: DXGIFormat):
    """Floyd-Steinberg error-diffusion dither + quantize + renormalize.
    vals [N, H, W, 4] or [H, W, 4]; host-side (numpy in, numpy out)."""
    entry = dither_scales(fmt)
    if entry is None:
        return vals
    scales, clampzero = entry
    sc = np.asarray(scales, np.float32)
    arr = np.asarray(vals, np.float32)
    single = arr.ndim == 3
    if single:
        arr = arr[None]
    from .. import native
    outs = []
    for img in arr:
        done = native.fs_dither(img.copy(), sc, clampzero)
        if done is None:
            done = _fs_dither_py(img, sc, clampzero)
        outs.append(done)
    out = np.stack(outs)
    return out[0] if single else out


def apply_dither(vals, fmt: DXGIFormat, filter_flags: int):
    """Dispatch on TEX_FILTER_DITHER / TEX_FILTER_DITHER_DIFFUSION
    (DirectXTexConvert.cpp:4817 scanline loop)."""
    from .flags import TEX_FILTER_FLAGS as TF

    mode = int(filter_flags) & int(TF.DITHER | TF.DITHER_DIFFUSION)
    if not mode or dither_scales(fmt) is None:
        return vals
    if mode & int(TF.DITHER_DIFFUSION):
        import jax.numpy as jnp
        return jnp.asarray(diffusion_dither(np.asarray(vals), fmt))
    return ordered_dither(vals, fmt)
