"""Wire-format pack/unpack engine (the scanline-engine equivalent).

The reference converts pixels on demand, one scanline at a time, through a
~75-format switch (DirectXTexConvert.cpp: LoadScanline :779-1641,
StoreScanline :1643-2790). The TPU-native design converts whole subresources
at the device boundary instead: `unpack(fmt, bytes) -> [N,4] f32` and
`pack(fmt, [N,4] f32) -> bytes`, with every format implemented as vectorized
jnp bit math (jittable, runs on device).

Channel fill rules match the reference exactly: missing G/B decode to 0,
missing A decodes to 1; A8 decodes to (0,0,0,a); depth/stencil decode to
(d,s,0,1). sRGB transfer is NOT applied here — like the reference, the
sRGB formats share bit layout with their UNORM twins and the transfer
function is applied by the convert/filter layers (LoadScanlineLinear,
DirectXTexConvert.cpp:2881).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .dxgi import FMT, DXGIFormat
from . import traits

__all__ = ["unpack", "pack", "unpack_image", "pack_image", "is_packable"]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _bytes_to_u16(b: jnp.ndarray) -> jnp.ndarray:
    """[N*2] u8 -> [N] u16 (little-endian)."""
    return lax.bitcast_convert_type(b.reshape(-1, 2), jnp.uint16)


def _bytes_to_u32(b: jnp.ndarray) -> jnp.ndarray:
    return lax.bitcast_convert_type(b.reshape(-1, 4), jnp.uint32)


def _u16_to_bytes(w: jnp.ndarray) -> jnp.ndarray:
    return lax.bitcast_convert_type(w, jnp.uint8).reshape(-1)


def _u32_to_bytes(w: jnp.ndarray) -> jnp.ndarray:
    return lax.bitcast_convert_type(w, jnp.uint8).reshape(-1)


def _round_unorm(v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """float [0,1] -> integer code, round-to-nearest (XMStore*N semantics)."""
    v = jnp.clip(v, 0.0, 1.0)
    return jnp.floor(v * scale + 0.5).astype(jnp.uint32)


def _round_snorm(v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """float [-1,1] -> signed integer code, round-half-away-from-zero."""
    v = jnp.clip(v, -1.0, 1.0) * scale
    return jnp.where(v >= 0, jnp.floor(v + 0.5), jnp.ceil(v - 0.5)).astype(jnp.int32)


def _snorm_decode(code: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Signed n-bit code -> float, clamping the most-negative value to -1."""
    return _snorm_decode_exact(code, bits)


def _sign_extend(v: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Sign-extend the low `bits` of a uint32 lane -> int32."""
    shift = 32 - bits
    return (v.astype(jnp.int32) << shift) >> shift


# XLA rewrites x/const into x*reciprocal (and TPUs have no FP divide), which
# makes e.g. 255/255 decode to 0.99999994 instead of 1.0. The reference's
# scalar division is correctly rounded, and exact 0/1 endpoints are load-
# bearing (alpha==1 tests, sRGB eligibility). For narrow codes, decode via an
# exact host-precomputed table; for wide codes, multiply with an endpoint fix.

import numpy as _np

_UNORM_TABLES: dict[int, _np.ndarray] = {}


def _unorm_decode(v: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Exact UNORM decode: correctly-rounded v / (2^bits - 1)."""
    maxc = (1 << bits) - 1
    if bits <= 10:
        tab = _UNORM_TABLES.get(bits)
        if tab is None:
            tab = (_np.arange(maxc + 1, dtype=_np.float32)
                   / _np.float32(maxc)).astype(_np.float32)
            _UNORM_TABLES[bits] = tab
        return jnp.asarray(tab)[v.astype(jnp.int32)]
    f = v.astype(jnp.float32) * jnp.float32(1.0 / maxc)
    return jnp.where(v == maxc, jnp.float32(1.0), f)


_SNORM_TABLES: dict[int, _np.ndarray] = {}


def _snorm_decode_exact(code: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Exact SNORM decode of signed int codes (most-negative clamps to -1)."""
    maxpos = (1 << (bits - 1)) - 1
    if bits <= 10:
        tab = _SNORM_TABLES.get(bits)
        if tab is None:
            codes = _np.arange(-(maxpos + 1), maxpos + 1, dtype=_np.float32)
            tab = _np.maximum(codes / _np.float32(maxpos), -1.0).astype(_np.float32)
            _SNORM_TABLES[bits] = tab
        return jnp.asarray(tab)[code.astype(jnp.int32) + (maxpos + 1)]
    f = code.astype(jnp.float32) * jnp.float32(1.0 / maxpos)
    f = jnp.where(code == maxpos, jnp.float32(1.0), f)
    f = jnp.where(code == -maxpos, jnp.float32(-1.0), f)
    return jnp.maximum(f, -1.0)


# half-float <-> float via bitcast (jnp.float16 is IEEE half)
def _half_to_f32(u16: jnp.ndarray) -> jnp.ndarray:
    return lax.bitcast_convert_type(u16.astype(jnp.uint16), jnp.float16).astype(jnp.float32)


def _f32_to_half(f: jnp.ndarray) -> jnp.ndarray:
    return lax.bitcast_convert_type(f.astype(jnp.float16), jnp.uint16)


# ---------------------------------------------------------------------------
# small-float families (11:11:10, 9995E, Xbox 7e3/6e4)
# ---------------------------------------------------------------------------

def _float_from_small(code: jnp.ndarray, mant_bits: int, exp_bits: int,
                      exp_bias: int) -> jnp.ndarray:
    """Unsigned small float -> f32 (denormals included, matching XMLoadFloat3PK)."""
    mant = (code & ((1 << mant_bits) - 1)).astype(jnp.float32)
    exp = ((code >> mant_bits) & ((1 << exp_bits) - 1)).astype(jnp.int32)
    max_exp = (1 << exp_bits) - 1
    # normal: (1 + m/2^mb) * 2^(e-bias); denormal: m/2^mb * 2^(1-bias)
    normal = (1.0 + mant / (1 << mant_bits)) * jnp.exp2((exp - exp_bias).astype(jnp.float32))
    denorm = (mant / (1 << mant_bits)) * jnp.exp2(jnp.float32(1 - exp_bias))
    value = jnp.where(exp == 0, denorm, normal)
    # exp all-ones -> inf / nan
    inf = jnp.where(mant == 0, jnp.inf, jnp.nan)
    return jnp.where(exp == max_exp, inf, value)


def _small_from_float(f: jnp.ndarray, mant_bits: int, exp_bits: int,
                      exp_bias: int) -> jnp.ndarray:
    """f32 -> unsigned small float code (round-to-nearest-even via f16 trick
    is insufficient for arbitrary layouts; do it with integer math)."""
    max_exp = (1 << exp_bits) - 1
    f = jnp.maximum(f.astype(jnp.float32), 0.0)  # unsigned target: negatives -> 0
    bits = lax.bitcast_convert_type(f, jnp.uint32)
    f_exp = ((bits >> 23) & 0xFF).astype(jnp.int32) - 127
    # target exponent field
    t_exp = f_exp + exp_bias
    # mantissa with implicit 1, shifted to target width + 1 rounding bit
    f_mant = (bits & 0x7FFFFF) | 0x800000
    shift = 23 - mant_bits
    # normal path with round-to-nearest (half away; good enough at these widths)
    rounded = (f_mant + (1 << (shift - 1))) >> shift
    # carry out of rounding can bump the exponent
    carry = rounded >> (mant_bits + 1)
    rounded = jnp.where(carry > 0, rounded >> 1, rounded)
    t_exp = t_exp + carry.astype(jnp.int32)
    mant_field = rounded & ((1 << mant_bits) - 1)
    code = (jnp.clip(t_exp, 0, max_exp).astype(jnp.uint32) << mant_bits) | mant_field
    # denormal / underflow: value too small for min normal exponent
    denorm_shift = jnp.clip(1 - exp_bias - f_exp + shift, 0, 31).astype(jnp.uint32)
    denorm = f_mant >> denorm_shift
    code = jnp.where(t_exp <= 0, denorm & ((1 << mant_bits) - 1), code)
    # overflow -> max finite (XMStoreFloat3PK clamps to 0x7BF-style max)
    max_code = (jnp.uint32(max_exp - 1) << mant_bits) | ((1 << mant_bits) - 1)
    code = jnp.where(t_exp > max_exp - 1, max_code, code)
    # NaN propagates as exp=max, mantissa nonzero
    is_nan = jnp.isnan(f)
    nan_code = (jnp.uint32(max_exp) << mant_bits) | 1
    code = jnp.where(is_nan, nan_code, code)
    code = jnp.where(f == 0.0, jnp.uint32(0), code)
    return code


def _f32_to_9995e(rgb: jnp.ndarray) -> jnp.ndarray:
    """[N,3] f32 -> [N] u32 R9G9B9E5 shared-exponent (XMStoreFloat3SE)."""
    maxf = 511.0 / 512.0 * 32768.0  # max representable
    r = jnp.clip(jnp.nan_to_num(rgb[:, 0]), 0.0, maxf)
    g = jnp.clip(jnp.nan_to_num(rgb[:, 1]), 0.0, maxf)
    b = jnp.clip(jnp.nan_to_num(rgb[:, 2]), 0.0, maxf)
    max_c = jnp.maximum(jnp.maximum(r, g), b)
    # shared exponent = floor(log2(max)) clamped, matching DirectXMath's
    # bit-level extraction with rounding allowance
    bits = lax.bitcast_convert_type(max_c, jnp.uint32)
    biased_exp = ((bits >> 23) & 0xFF).astype(jnp.int32)
    exp_shared = jnp.clip(biased_exp - 127 + 16, 0, 31)  # bias 15 + 1 for 9-bit mant
    scale = jnp.exp2((exp_shared - 15 - 9).astype(jnp.float32))
    rm = jnp.floor(r / scale + 0.5).astype(jnp.uint32)
    gm = jnp.floor(g / scale + 0.5).astype(jnp.uint32)
    bm = jnp.floor(b / scale + 0.5).astype(jnp.uint32)
    # mantissa overflow from rounding bumps exponent
    over = jnp.maximum(jnp.maximum(rm, gm), bm) > 511
    exp_shared = jnp.where(over, exp_shared + 1, exp_shared)
    scale = jnp.exp2((exp_shared - 15 - 9).astype(jnp.float32))
    rm = jnp.minimum(jnp.floor(r / scale + 0.5), 511).astype(jnp.uint32)
    gm = jnp.minimum(jnp.floor(g / scale + 0.5), 511).astype(jnp.uint32)
    bm = jnp.minimum(jnp.floor(b / scale + 0.5), 511).astype(jnp.uint32)
    return rm | (gm << 9) | (bm << 18) | (exp_shared.astype(jnp.uint32) << 27)


def _9995e_to_f32(w: jnp.ndarray) -> jnp.ndarray:
    """[N] u32 -> [N,3] f32 (XMLoadFloat3SE: value = m * 2^(e-24))."""
    scale = jnp.exp2(((w >> 27).astype(jnp.int32) - 24).astype(jnp.float32))
    r = (w & 0x1FF).astype(jnp.float32) * scale
    g = ((w >> 9) & 0x1FF).astype(jnp.float32) * scale
    b = ((w >> 18) & 0x1FF).astype(jnp.float32) * scale
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# YUV <-> RGB (studio swing, exact integer math from LoadScanline)
# ---------------------------------------------------------------------------

def _dot_shift16(terms: list[tuple[int, jnp.ndarray]]) -> jnp.ndarray:
    """Exact (sum c_i * x_i + 32768) >> 16 without int64.

    The reference does this in int64 (DirectXTexConvert.cpp Y410/Y416 paths);
    JAX defaults to 32-bit, and e.g. 76607*61439 overflows int32. Two-limb
    arithmetic: each product c*x = (c*(x>>8))<<8 + c*(x&255) with both
    partials < 2^27, then (A*256 + B) >> 16 == (A + (B>>8)) >> 8 exactly
    (arithmetic shifts are floor division, matching C's int64 >>).
    """
    A = jnp.int32(0)
    B = jnp.int32(32768)
    for c, x in terms:
        x = x.astype(jnp.int32)
        A = A + jnp.int32(c) * (x >> 8)
        B = B + jnp.int32(c) * (x & 255)
    return (A + (B >> 8)) >> 8


def _yuv8_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> tuple:
    """8-bit BT.601-ish integer conversion (DirectXTexConvert.cpp:1296-1316)."""
    y_ = y.astype(jnp.int32) - 16
    u_ = u.astype(jnp.int32) - 128
    v_ = v.astype(jnp.int32) - 128
    r = (298 * y_ + 409 * v_ + 128) >> 8
    g = (298 * y_ - 100 * u_ - 208 * v_ + 128) >> 8
    b = (298 * y_ + 516 * u_ + 128) >> 8
    clip = lambda x: _unorm_decode(jnp.clip(x, 0, 255), 8)
    return clip(r), clip(g), clip(b)


def _rgb_to_yuv8(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> tuple:
    """Inverse of _yuv8_to_rgb (StoreScanline AYUV math)."""
    ri = _round_unorm(r, 255.0).astype(jnp.int32)
    gi = _round_unorm(g, 255.0).astype(jnp.int32)
    bi = _round_unorm(b, 255.0).astype(jnp.int32)
    y = ((66 * ri + 129 * gi + 25 * bi + 128) >> 8) + 16
    u = ((-38 * ri - 74 * gi + 112 * bi + 128) >> 8) + 128
    v = ((112 * ri - 94 * gi - 18 * bi + 128) >> 8) + 128
    c = lambda x: jnp.clip(x, 0, 255).astype(jnp.uint32)
    return c(y), c(u), c(v)


def _yuv10_to_rgb(y, u, v):
    """10-bit conversion (Y410/Y210, DirectXTexConvert.cpp:1328-1360)."""
    y_ = y.astype(jnp.int32) - 64
    u_ = u.astype(jnp.int32) - 512
    v_ = v.astype(jnp.int32) - 512
    r = _dot_shift16([(76533, y_), (104905, v_)])
    g = _dot_shift16([(76533, y_), (-25747, u_), (-53425, v_)])
    b = _dot_shift16([(76533, y_), (132590, u_)])
    clip = lambda x: _unorm_decode(jnp.clip(x, 0, 1023), 10)
    return clip(r), clip(g), clip(b)


def _yuv16_to_rgb(y, u, v):
    """16-bit conversion (Y416/Y216, DirectXTexConvert.cpp:1363-1397)."""
    y_ = y.astype(jnp.int32) - 4096
    u_ = u.astype(jnp.int32) - 32768
    v_ = v.astype(jnp.int32) - 32768
    r = _dot_shift16([(76607, y_), (105006, v_)])
    g = _dot_shift16([(76607, y_), (-25772, u_), (-53477, v_)])
    b = _dot_shift16([(76607, y_), (132718, u_)])
    clip = lambda x: _unorm_decode(jnp.clip(x, 0, 65535), 16)
    return clip(r), clip(g), clip(b)


def _rgb_to_yuv10(r, g, b):
    ri = _round_unorm(r, 1023.0).astype(jnp.int32)
    gi = _round_unorm(g, 1023.0).astype(jnp.int32)
    bi = _round_unorm(b, 1023.0).astype(jnp.int32)
    y = _dot_shift16([(16780, ri), (32942, gi), (6544, bi)]) + 64
    u = _dot_shift16([(-9683, ri), (-19017, gi), (28700, bi)]) + 512
    v = _dot_shift16([(28700, ri), (-24033, gi), (-4667, bi)]) + 512
    c = lambda x: jnp.clip(x, 0, 1023).astype(jnp.uint32)
    return c(y), c(u), c(v)


def _rgb_to_yuv16(r, g, b):
    ri = _round_unorm(r, 65535.0).astype(jnp.int32)
    gi = _round_unorm(g, 65535.0).astype(jnp.int32)
    bi = _round_unorm(b, 65535.0).astype(jnp.int32)
    y = _dot_shift16([(16763, ri), (32910, gi), (6537, bi)]) + 4096
    u = _dot_shift16([(-9674, ri), (-18998, gi), (28672, bi)]) + 32768
    v = _dot_shift16([(28672, ri), (-24010, gi), (-4662, bi)]) + 32768
    c = lambda x: jnp.clip(x, 0, 65535).astype(jnp.uint32)
    return c(y), c(u), c(v)


# ---------------------------------------------------------------------------
# descriptor table for the regular formats
# ---------------------------------------------------------------------------
# kinds: 'f32', 'f16', 'unorm16', 'snorm16', 'uint16', 'sint16',
#        'unorm8', 'snorm8', 'uint8', 'sint8', 'uint32', 'sint32'
# channels: how many consecutive typed elements per pixel
# order: destination RGBA channel of each element (None = discard)

@dataclasses.dataclass(frozen=True)
class _ChanDesc:
    kind: str
    channels: int
    order: tuple = (0, 1, 2, 3)


_CHAN_FORMATS: dict[DXGIFormat, _ChanDesc] = {
    FMT.R32G32B32A32_FLOAT: _ChanDesc("f32", 4),
    FMT.R32G32B32A32_UINT: _ChanDesc("uint32", 4),
    FMT.R32G32B32A32_SINT: _ChanDesc("sint32", 4),
    FMT.R32G32B32_FLOAT: _ChanDesc("f32", 3),
    FMT.R32G32B32_UINT: _ChanDesc("uint32", 3),
    FMT.R32G32B32_SINT: _ChanDesc("sint32", 3),
    FMT.R16G16B16A16_FLOAT: _ChanDesc("f16", 4),
    FMT.R16G16B16A16_UNORM: _ChanDesc("unorm16", 4),
    FMT.R16G16B16A16_UINT: _ChanDesc("uint16", 4),
    FMT.R16G16B16A16_SNORM: _ChanDesc("snorm16", 4),
    FMT.R16G16B16A16_SINT: _ChanDesc("sint16", 4),
    FMT.R32G32_FLOAT: _ChanDesc("f32", 2),
    FMT.R32G32_UINT: _ChanDesc("uint32", 2),
    FMT.R32G32_SINT: _ChanDesc("sint32", 2),
    FMT.R8G8B8A8_UNORM: _ChanDesc("unorm8", 4),
    FMT.R8G8B8A8_UNORM_SRGB: _ChanDesc("unorm8", 4),
    FMT.R8G8B8A8_UINT: _ChanDesc("uint8", 4),
    FMT.R8G8B8A8_SNORM: _ChanDesc("snorm8", 4),
    FMT.R8G8B8A8_SINT: _ChanDesc("sint8", 4),
    FMT.R16G16_FLOAT: _ChanDesc("f16", 2),
    FMT.R16G16_UNORM: _ChanDesc("unorm16", 2),
    FMT.R16G16_UINT: _ChanDesc("uint16", 2),
    FMT.R16G16_SNORM: _ChanDesc("snorm16", 2),
    FMT.R16G16_SINT: _ChanDesc("sint16", 2),
    FMT.D32_FLOAT: _ChanDesc("f32", 1),
    FMT.R32_FLOAT: _ChanDesc("f32", 1),
    FMT.R32_UINT: _ChanDesc("uint32", 1),
    FMT.R32_SINT: _ChanDesc("sint32", 1),
    FMT.R8G8_UNORM: _ChanDesc("unorm8", 2),
    FMT.R8G8_UINT: _ChanDesc("uint8", 2),
    FMT.R8G8_SNORM: _ChanDesc("snorm8", 2),
    FMT.R8G8_SINT: _ChanDesc("sint8", 2),
    FMT.R16_FLOAT: _ChanDesc("f16", 1),
    FMT.D16_UNORM: _ChanDesc("unorm16", 1),
    FMT.R16_UNORM: _ChanDesc("unorm16", 1),
    FMT.R16_UINT: _ChanDesc("uint16", 1),
    FMT.R16_SNORM: _ChanDesc("snorm16", 1),
    FMT.R16_SINT: _ChanDesc("sint16", 1),
    FMT.R8_UNORM: _ChanDesc("unorm8", 1),
    FMT.R8_UINT: _ChanDesc("uint8", 1),
    FMT.R8_SNORM: _ChanDesc("snorm8", 1),
    FMT.R8_SINT: _ChanDesc("sint8", 1),
    FMT.A8_UNORM: _ChanDesc("unorm8", 1, order=(3,)),
    FMT.B8G8R8A8_UNORM: _ChanDesc("unorm8", 4, order=(2, 1, 0, 3)),
    FMT.B8G8R8A8_UNORM_SRGB: _ChanDesc("unorm8", 4, order=(2, 1, 0, 3)),
    FMT.B8G8R8X8_UNORM: _ChanDesc("unorm8", 4, order=(2, 1, 0, None)),
    FMT.B8G8R8X8_UNORM_SRGB: _ChanDesc("unorm8", 4, order=(2, 1, 0, None)),
}


def _decode_elems(raw: jnp.ndarray, kind: str, n: int) -> jnp.ndarray:
    """flat u8 -> [N, n] f32 per element kind."""
    if kind == "f32":
        return lax.bitcast_convert_type(raw.reshape(-1, 4), jnp.float32).reshape(-1, n)
    if kind == "uint32":
        return _bytes_to_u32(raw).astype(jnp.float32).reshape(-1, n)
    if kind == "sint32":
        return _bytes_to_u32(raw).astype(jnp.int32).astype(jnp.float32).reshape(-1, n)
    if kind == "f16":
        return _half_to_f32(_bytes_to_u16(raw)).reshape(-1, n)
    if kind == "unorm16":
        return _unorm_decode(_bytes_to_u16(raw), 16).reshape(-1, n)
    if kind == "uint16":
        return _bytes_to_u16(raw).astype(jnp.float32).reshape(-1, n)
    if kind == "snorm16":
        s = lax.bitcast_convert_type(raw.reshape(-1, 2), jnp.uint16).astype(jnp.int32)
        s = jnp.where(s >= 32768, s - 65536, s)
        return _snorm_decode(s, 16).reshape(-1, n)
    if kind == "sint16":
        s = _bytes_to_u16(raw).astype(jnp.int32)
        s = jnp.where(s >= 32768, s - 65536, s)
        return s.astype(jnp.float32).reshape(-1, n)
    if kind == "unorm8":
        return _unorm_decode(raw, 8).reshape(-1, n)
    if kind == "uint8":
        return raw.astype(jnp.float32).reshape(-1, n)
    if kind == "snorm8":
        s = raw.astype(jnp.int32)
        s = jnp.where(s >= 128, s - 256, s)
        return _snorm_decode(s, 8).reshape(-1, n)
    if kind == "sint8":
        s = raw.astype(jnp.int32)
        s = jnp.where(s >= 128, s - 256, s)
        return s.astype(jnp.float32).reshape(-1, n)
    raise ValueError(kind)


def _encode_elems(vals: jnp.ndarray, kind: str) -> jnp.ndarray:
    """[N, n] f32 -> flat u8 per element kind."""
    flat = vals.reshape(-1)
    if kind == "f32":
        return lax.bitcast_convert_type(flat, jnp.uint8).reshape(-1)
    if kind == "uint32":
        return _u32_to_bytes(jnp.clip(flat, 0, 4294967040.0).astype(jnp.uint32))
    if kind == "sint32":
        return _u32_to_bytes(
            jnp.clip(flat, -2147483648.0, 2147483520.0).astype(jnp.int32)
            .astype(jnp.uint32))
    if kind == "f16":
        return _u16_to_bytes(_f32_to_half(flat))
    if kind == "unorm16":
        return _u16_to_bytes(_round_unorm(flat, 65535.0).astype(jnp.uint16))
    if kind == "uint16":
        return _u16_to_bytes(jnp.clip(flat, 0, 65535).astype(jnp.uint16))
    if kind == "snorm16":
        return _u16_to_bytes(
            (_round_snorm(flat, 32767.0) & 0xFFFF).astype(jnp.uint16))
    if kind == "sint16":
        return _u16_to_bytes(
            (jnp.clip(flat, -32768, 32767).astype(jnp.int32) & 0xFFFF)
            .astype(jnp.uint16))
    if kind == "unorm8":
        return _round_unorm(flat, 255.0).astype(jnp.uint8)
    if kind == "uint8":
        return jnp.clip(flat, 0, 255).astype(jnp.uint8)
    if kind == "snorm8":
        return (_round_snorm(flat, 127.0) & 0xFF).astype(jnp.uint8)
    if kind == "sint8":
        return (jnp.clip(flat, -128, 127).astype(jnp.int32) & 0xFF).astype(jnp.uint8)
    raise ValueError(kind)


# packed bitfield formats: word bits, per-RGBA (shift, bits, scale-kind)
# scale-kind: 'unorm' (v/max), 'one' (value as-is 0/1), 'uint'
_BITFIELD_FORMATS: dict[DXGIFormat, tuple] = {
    # fmt: (word_bits, [(dest_chan, shift, bits, kind)], default_alpha)
    FMT.B5G6R5_UNORM: (16, [(2, 0, 5, "unorm"), (1, 5, 6, "unorm"),
                            (0, 11, 5, "unorm")], 1.0),
    FMT.B5G5R5A1_UNORM: (16, [(2, 0, 5, "unorm"), (1, 5, 5, "unorm"),
                              (0, 10, 5, "unorm"), (3, 15, 1, "one")], None),
    FMT.B4G4R4A4_UNORM: (16, [(2, 0, 4, "unorm"), (1, 4, 4, "unorm"),
                              (0, 8, 4, "unorm"), (3, 12, 4, "unorm")], None),
    FMT.A4B4G4R4_UNORM: (16, [(3, 0, 4, "unorm"), (2, 4, 4, "unorm"),
                              (1, 8, 4, "unorm"), (0, 12, 4, "unorm")], None),
    FMT.XBOX_R4G4_UNORM: (8, [(0, 0, 4, "unorm"), (1, 4, 4, "unorm")], 1.0),
    FMT.R10G10B10A2_UNORM: (32, [(0, 0, 10, "unorm"), (1, 10, 10, "unorm"),
                                 (2, 20, 10, "unorm"), (3, 30, 2, "unorm")], None),
    FMT.R10G10B10A2_UINT: (32, [(0, 0, 10, "uint"), (1, 10, 10, "uint"),
                                (2, 20, 10, "uint"), (3, 30, 2, "uint")], None),
}


def is_packable(fmt: DXGIFormat) -> bool:
    """True if this format is supported by unpack()/pack().

    Matches the reference LoadScanline coverage: everything valid except
    fully-typeless, compressed (use bc decoders), planar, palettized, R1.
    """
    if fmt in _CHAN_FORMATS or fmt in _BITFIELD_FORMATS:
        return True
    return fmt in _SPECIAL_UNPACK


# ---------------------------------------------------------------------------
# main entry points
# ---------------------------------------------------------------------------

def unpack(fmt: DXGIFormat, data: jnp.ndarray, count: int) -> jnp.ndarray:
    """Decode `count` pixels of wire format `fmt` from a flat u8 array.

    Returns [count, 4] float32 RGBA. Mirrors LoadScanline
    (DirectXTexConvert.cpp:779).
    """
    data = jnp.asarray(data, dtype=jnp.uint8)

    desc = _CHAN_FORMATS.get(fmt)
    if desc is not None:
        elems = _decode_elems(data, desc.kind, desc.channels)[:count]
        out = jnp.zeros((count, 4), jnp.float32).at[:, 3].set(1.0)
        for i, dest in enumerate(desc.order[: desc.channels]):
            if dest is not None:
                out = out.at[:, dest].set(elems[:, i])
        return out

    bf = _BITFIELD_FORMATS.get(fmt)
    if bf is not None:
        word_bits, fields, default_a = bf
        if word_bits == 8:
            words = data[:count].astype(jnp.uint32)
        elif word_bits == 16:
            words = _bytes_to_u16(data).astype(jnp.uint32)[:count]
        else:
            words = _bytes_to_u32(data)[:count]
        out = jnp.zeros((count, 4), jnp.float32).at[:, 3].set(
            1.0 if default_a is None else default_a)
        for dest, shift, bits, kind in fields:
            v = (words >> shift) & ((1 << bits) - 1)
            if kind == "unorm":
                f = _unorm_decode(v, bits)
            elif kind == "one":
                f = v.astype(jnp.float32)
            else:  # uint
                f = v.astype(jnp.float32)
            out = out.at[:, dest].set(f)
        return out

    special = _SPECIAL_UNPACK.get(fmt)
    if special is not None:
        return special(data, count)

    raise ValueError(f"unpack: unsupported format {fmt!r}")


def pack(fmt: DXGIFormat, rgba: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Encode [N,4] f32 RGBA to wire bytes. Mirrors StoreScanline
    (DirectXTexConvert.cpp:1643). `threshold` controls 1-bit alpha."""
    rgba = jnp.asarray(rgba, jnp.float32)
    count = rgba.shape[0]

    desc = _CHAN_FORMATS.get(fmt)
    if desc is not None:
        cols = []
        for i, dest in enumerate(desc.order[: desc.channels]):
            if dest is None:
                cols.append(jnp.ones((count,), jnp.float32))  # X channel -> 1
            else:
                cols.append(rgba[:, dest])
        elems = jnp.stack(cols, axis=-1)
        return _encode_elems(elems, desc.kind)

    bf = _BITFIELD_FORMATS.get(fmt)
    if bf is not None:
        word_bits, fields, _default_a = bf
        words = jnp.zeros((count,), jnp.uint32)
        for dest, shift, bits, kind in fields:
            v = rgba[:, dest]
            if kind == "unorm":
                code = _round_unorm(v, float((1 << bits) - 1))
            elif kind == "one":
                code = (v > threshold).astype(jnp.uint32)
            else:
                code = jnp.clip(v, 0, float((1 << bits) - 1)).astype(jnp.uint32)
            words = words | (code << shift)
        if word_bits == 8:
            return words.astype(jnp.uint8)
        if word_bits == 16:
            return _u16_to_bytes(words.astype(jnp.uint16))
        return _u32_to_bytes(words)

    special = _SPECIAL_PACK.get(fmt)
    if special is not None:
        return special(rgba, threshold)

    raise ValueError(f"pack: unsupported format {fmt!r}")


# ---------------------------------------------------------------------------
# special formats
# ---------------------------------------------------------------------------

def _unpack_r11g11b10(data, count):
    w = _bytes_to_u32(data)[:count]
    r = _float_from_small(w & 0x7FF, 6, 5, 15)
    g = _float_from_small((w >> 11) & 0x7FF, 6, 5, 15)
    b = _float_from_small((w >> 22) & 0x3FF, 5, 5, 15)
    return jnp.stack([r, g, b, jnp.ones_like(r)], axis=-1)


def _pack_r11g11b10(rgba, threshold):
    r = _small_from_float(rgba[:, 0], 6, 5, 15)
    g = _small_from_float(rgba[:, 1], 6, 5, 15)
    b = _small_from_float(rgba[:, 2], 5, 5, 15)
    return _u32_to_bytes(r | (g << 11) | (b << 22))


def _unpack_9995e(data, count):
    w = _bytes_to_u32(data)[:count]
    rgb = _9995e_to_f32(w)
    return jnp.concatenate([rgb, jnp.ones((count, 1), jnp.float32)], axis=-1)


def _pack_9995e(rgba, threshold):
    return _u32_to_bytes(_f32_to_9995e(rgba[:, :3]))


def _unpack_xr_bias(data, count):
    w = _bytes_to_u32(data)[:count]
    def chan(shift):
        v = ((w >> shift) & 0x3FF).astype(jnp.int32) - 0x180
        f = v.astype(jnp.float32) * jnp.float32(1.0 / 510.0)
        return jnp.where(v == 510, jnp.float32(1.0), f)
    a = _unorm_decode((w >> 30) & 0x3, 2)
    return jnp.stack([chan(0), chan(10), chan(20), a], axis=-1)


def _pack_xr_bias(rgba, threshold):
    def chan(v):
        code = jnp.floor(jnp.clip(v, -0.7529412, 1.2529412) * 510.0 + 0.5)
        return (code.astype(jnp.int32) + 0x180).astype(jnp.uint32) & 0x3FF
    a = _round_unorm(rgba[:, 3], 3.0)
    w = chan(rgba[:, 0]) | (chan(rgba[:, 1]) << 10) | (chan(rgba[:, 2]) << 20) | (a << 30)
    return _u32_to_bytes(w)


def _unpack_r10g10b10_snorm_a2(data, count):
    w = _bytes_to_u32(data)[:count]
    def chan(shift):
        return _snorm_decode(_sign_extend((w >> shift) & 0x3FF, 10), 10)
    a = _unorm_decode((w >> 30) & 0x3, 2)
    return jnp.stack([chan(0), chan(10), chan(20), a], axis=-1)


def _pack_r10g10b10_snorm_a2(rgba, threshold):
    def chan(v):
        return (_round_snorm(v, 511.0) & 0x3FF).astype(jnp.uint32)
    a = _round_unorm(rgba[:, 3], 3.0)
    w = chan(rgba[:, 0]) | (chan(rgba[:, 1]) << 10) | (chan(rgba[:, 2]) << 20) | (a << 30)
    return _u32_to_bytes(w)


def _unpack_7e3(data, count):
    w = _bytes_to_u32(data)[:count]
    def chan(shift):
        return _float_from_small((w >> shift) & 0x3FF, 7, 3, 3)
    a = _unorm_decode((w >> 30) & 0x3, 2)
    return jnp.stack([chan(0), chan(10), chan(20), a], axis=-1)


def _pack_7e3(rgba, threshold):
    def chan(v):
        return _small_from_float(v, 7, 3, 3)
    a = _round_unorm(rgba[:, 3], 3.0)
    w = chan(rgba[:, 0]) | (chan(rgba[:, 1]) << 10) | (chan(rgba[:, 2]) << 20) | (a << 30)
    return _u32_to_bytes(w)


def _unpack_6e4(data, count):
    w = _bytes_to_u32(data)[:count]
    def chan(shift):
        return _float_from_small((w >> shift) & 0x3FF, 6, 4, 7)
    a = _unorm_decode((w >> 30) & 0x3, 2)
    return jnp.stack([chan(0), chan(10), chan(20), a], axis=-1)


def _pack_6e4(rgba, threshold):
    def chan(v):
        return _small_from_float(v, 6, 4, 7)
    a = _round_unorm(rgba[:, 3], 3.0)
    w = chan(rgba[:, 0]) | (chan(rgba[:, 1]) << 10) | (chan(rgba[:, 2]) << 20) | (a << 30)
    return _u32_to_bytes(w)


def _unpack_d24s8(data, count):
    w = _bytes_to_u32(data)[:count]
    d = _unorm_decode(w & 0xFFFFFF, 24)
    s = ((w >> 24) & 0xFF).astype(jnp.float32)
    z = jnp.zeros_like(d)
    return jnp.stack([d, s, z, jnp.ones_like(d)], axis=-1)


def _pack_d24s8(rgba, threshold):
    d = _round_unorm(rgba[:, 0], 16777215.0)
    s = jnp.clip(rgba[:, 1], 0, 255).astype(jnp.uint32)
    return _u32_to_bytes(d | (s << 24))


def _unpack_r24x8(data, count):
    w = _bytes_to_u32(data)[:count]
    d = _unorm_decode(w & 0xFFFFFF, 24)
    z = jnp.zeros_like(d)
    return jnp.stack([d, z, z, jnp.ones_like(d)], axis=-1)


def _pack_r24x8(rgba, threshold):
    return _u32_to_bytes(_round_unorm(rgba[:, 0], 16777215.0))


def _unpack_x24g8(data, count):
    w = _bytes_to_u32(data)[:count]
    s = ((w >> 24) & 0xFF).astype(jnp.float32)
    z = jnp.zeros_like(s)
    return jnp.stack([z, s, z, jnp.ones_like(s)], axis=-1)


def _pack_x24g8(rgba, threshold):
    s = jnp.clip(rgba[:, 1], 0, 255).astype(jnp.uint32)
    return _u32_to_bytes(s << 24)


def _unpack_d32s8x24(data, count):
    pairs = data.reshape(-1, 8)[:count]
    d = lax.bitcast_convert_type(pairs[:, 0:4], jnp.float32).reshape(-1)
    s = pairs[:, 4].astype(jnp.float32)
    z = jnp.zeros_like(d)
    return jnp.stack([d, s, z, jnp.ones_like(d)], axis=-1)


def _pack_d32s8x24(rgba, threshold):
    d = lax.bitcast_convert_type(rgba[:, 0], jnp.uint8).reshape(-1, 4)
    s = jnp.clip(rgba[:, 1], 0, 255).astype(jnp.uint8)[:, None]
    zeros = jnp.zeros_like(s)
    return jnp.concatenate([d, s, zeros, zeros, zeros], axis=-1).reshape(-1)


def _unpack_r32x8x24(data, count):
    pairs = data.reshape(-1, 8)[:count]
    d = lax.bitcast_convert_type(pairs[:, 0:4], jnp.float32).reshape(-1)
    z = jnp.zeros_like(d)
    return jnp.stack([d, z, z, jnp.ones_like(d)], axis=-1)


def _unpack_x32g8x24(data, count):
    pairs = data.reshape(-1, 8)[:count]
    s = pairs[:, 4].astype(jnp.float32)
    z = jnp.zeros_like(s)
    return jnp.stack([z, s, z, jnp.ones_like(s)], axis=-1)


def _unpack_r1(data, count):
    bits = data.reshape(-1, 1)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)[None, :]
    vals = ((bits >> shifts) & 1).astype(jnp.float32).reshape(-1)[:count]
    z = jnp.zeros_like(vals)
    return jnp.stack([vals, z, z, jnp.ones_like(vals)], axis=-1)


def _pack_r1(rgba, threshold):
    v = (rgba[:, 0] > 0.5).astype(jnp.uint8)
    pad = (-v.shape[0]) % 8
    v = jnp.pad(v, (0, pad)).reshape(-1, 8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)[None, :]
    return jnp.sum(v << shifts, axis=-1).astype(jnp.uint8)


def _unpack_rgbg(data, count):
    """R8G8_B8G8: each 4-byte group decodes 2 pixels (r,g0,b | r,g1,b)."""
    q = _unorm_decode(data.reshape(-1, 4), 8)
    r, g0, b, g1 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    one = jnp.ones_like(r)
    p0 = jnp.stack([r, g0, b, one], axis=-1)
    p1 = jnp.stack([r, g1, b, one], axis=-1)
    return jnp.stack([p0, p1], axis=1).reshape(-1, 4)[:count]


def _pack_rgbg(rgba, threshold):
    # r/b come from the first pixel of each pair (StoreScanline
    # DirectXTexConvert.cpp:2060-2075: select 1110 keeps v0.xyz, w = v1.g)
    pairs = rgba.reshape(-1, 2, 4)
    r = _round_unorm(pairs[:, 0, 0], 255.0)
    b = _round_unorm(pairs[:, 0, 2], 255.0)
    g0 = _round_unorm(pairs[:, 0, 1], 255.0)
    g1 = _round_unorm(pairs[:, 1, 1], 255.0)
    return _u32_to_bytes(r | (g0 << 8) | (b << 16) | (g1 << 24))


def _unpack_grgb(data, count):
    """G8R8_G8B8: bytes (g0, r, g1, b) -> pixels (r,g0,b),(r,g1,b)."""
    q = _unorm_decode(data.reshape(-1, 4), 8)
    g0, r, g1, b = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    one = jnp.ones_like(r)
    p0 = jnp.stack([r, g0, b, one], axis=-1)
    p1 = jnp.stack([r, g1, b, one], axis=-1)
    return jnp.stack([p0, p1], axis=1).reshape(-1, 4)[:count]


def _pack_grgb(rgba, threshold):
    # bytes (g0, r0, g1, b0): r/b from the first pixel (StoreScanline :2077)
    pairs = rgba.reshape(-1, 2, 4)
    r = _round_unorm(pairs[:, 0, 0], 255.0)
    b = _round_unorm(pairs[:, 0, 2], 255.0)
    g0 = _round_unorm(pairs[:, 0, 1], 255.0)
    g1 = _round_unorm(pairs[:, 1, 1], 255.0)
    return _u32_to_bytes(g0 | (r << 8) | (g1 << 16) | (b << 24))


def _unpack_ayuv(data, count):
    q = data.reshape(-1, 4)[:count]
    v, u, y, a = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r, g, b = _yuv8_to_rgb(y, u, v)
    return jnp.stack([r, g, b, _unorm_decode(a, 8)], axis=-1)


def _pack_ayuv(rgba, threshold):
    y, u, v = _rgb_to_yuv8(rgba[:, 0], rgba[:, 1], rgba[:, 2])
    a = _round_unorm(rgba[:, 3], 255.0)
    return _u32_to_bytes(v | (u << 8) | (y << 16) | (a << 24))


def _unpack_y410(data, count):
    w = _bytes_to_u32(data)[:count]
    u = w & 0x3FF
    y = (w >> 10) & 0x3FF
    v = (w >> 20) & 0x3FF
    a = _unorm_decode((w >> 30) & 0x3, 2)
    r, g, b = _yuv10_to_rgb(y, u, v)
    return jnp.stack([r, g, b, a], axis=-1)


def _pack_y410(rgba, threshold):
    y, u, v = _rgb_to_yuv10(rgba[:, 0], rgba[:, 1], rgba[:, 2])
    a = _round_unorm(rgba[:, 3], 3.0)
    return _u32_to_bytes(u | (y << 10) | (v << 20) | (a << 30))


def _unpack_y416(data, count):
    q = _bytes_to_u16(data).reshape(-1, 4)[:count]
    u, y, v, a = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r, g, b = _yuv16_to_rgb(y, u, v)
    return jnp.stack([r, g, b, _unorm_decode(a, 16)], axis=-1)


def _pack_y416(rgba, threshold):
    y, u, v = _rgb_to_yuv16(rgba[:, 0], rgba[:, 1], rgba[:, 2])
    a = _round_unorm(rgba[:, 3], 65535.0)
    out = jnp.stack([u, y, v, a], axis=-1).astype(jnp.uint16)
    return _u16_to_bytes(out.reshape(-1))


def _unpack_yuy2(data, count):
    q = data.reshape(-1, 4)[:count // 2 + count % 2]
    y0, u, y1, v = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r0, g0, b0 = _yuv8_to_rgb(y0, u, v)
    r1, g1, b1 = _yuv8_to_rgb(y1, u, v)
    one = jnp.ones_like(r0)
    p0 = jnp.stack([r0, g0, b0, one], axis=-1)
    p1 = jnp.stack([r1, g1, b1, one], axis=-1)
    return jnp.stack([p0, p1], axis=1).reshape(-1, 4)[:count]


def _pack_yuy2(rgba, threshold):
    pairs = rgba.reshape(-1, 2, 4)
    y0, u0, v0 = _rgb_to_yuv8(pairs[:, 0, 0], pairs[:, 0, 1], pairs[:, 0, 2])
    y1, u1, v1 = _rgb_to_yuv8(pairs[:, 1, 0], pairs[:, 1, 1], pairs[:, 1, 2])
    u = (u0 + u1) >> 1
    v = (v0 + v1) >> 1
    return _u32_to_bytes(y0 | (u << 8) | (y1 << 16) | (v << 24))


def _unpack_y210(data, count):
    q = _bytes_to_u16(data).reshape(-1, 4)[:count // 2 + count % 2]
    y0 = (q[:, 0] >> 6)
    u = (q[:, 1] >> 6)
    y1 = (q[:, 2] >> 6)
    v = (q[:, 3] >> 6)
    r0, g0, b0 = _yuv10_to_rgb(y0, u, v)
    r1, g1, b1 = _yuv10_to_rgb(y1, u, v)
    one = jnp.ones_like(r0)
    p0 = jnp.stack([r0, g0, b0, one], axis=-1)
    p1 = jnp.stack([r1, g1, b1, one], axis=-1)
    return jnp.stack([p0, p1], axis=1).reshape(-1, 4)[:count]


def _pack_y210(rgba, threshold):
    pairs = rgba.reshape(-1, 2, 4)
    y0, u0, v0 = _rgb_to_yuv10(pairs[:, 0, 0], pairs[:, 0, 1], pairs[:, 0, 2])
    y1, u1, v1 = _rgb_to_yuv10(pairs[:, 1, 0], pairs[:, 1, 1], pairs[:, 1, 2])
    u = (u0 + u1) >> 1
    v = (v0 + v1) >> 1
    out = jnp.stack([y0 << 6, u << 6, y1 << 6, v << 6], axis=-1).astype(jnp.uint16)
    return _u16_to_bytes(out.reshape(-1))


def _unpack_y216(data, count):
    q = _bytes_to_u16(data).reshape(-1, 4)[:count // 2 + count % 2]
    y0, u, y1, v = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r0, g0, b0 = _yuv16_to_rgb(y0, u, v)
    r1, g1, b1 = _yuv16_to_rgb(y1, u, v)
    one = jnp.ones_like(r0)
    p0 = jnp.stack([r0, g0, b0, one], axis=-1)
    p1 = jnp.stack([r1, g1, b1, one], axis=-1)
    return jnp.stack([p0, p1], axis=1).reshape(-1, 4)[:count]


def _pack_y216(rgba, threshold):
    pairs = rgba.reshape(-1, 2, 4)
    y0, u0, v0 = _rgb_to_yuv16(pairs[:, 0, 0], pairs[:, 0, 1], pairs[:, 0, 2])
    y1, u1, v1 = _rgb_to_yuv16(pairs[:, 1, 0], pairs[:, 1, 1], pairs[:, 1, 2])
    u = (u0 + u1) >> 1
    v = (v0 + v1) >> 1
    out = jnp.stack([y0, u, y1, v], axis=-1).astype(jnp.uint16)
    return _u16_to_bytes(out.reshape(-1))


_SPECIAL_UNPACK = {
    FMT.R11G11B10_FLOAT: _unpack_r11g11b10,
    FMT.R9G9B9E5_SHAREDEXP: _unpack_9995e,
    FMT.R10G10B10_XR_BIAS_A2_UNORM: _unpack_xr_bias,
    FMT.XBOX_R10G10B10_SNORM_A2_UNORM: _unpack_r10g10b10_snorm_a2,
    FMT.XBOX_R10G10B10_7E3_A2_FLOAT: _unpack_7e3,
    FMT.XBOX_R10G10B10_6E4_A2_FLOAT: _unpack_6e4,
    FMT.D24_UNORM_S8_UINT: _unpack_d24s8,
    FMT.R24_UNORM_X8_TYPELESS: _unpack_r24x8,
    FMT.X24_TYPELESS_G8_UINT: _unpack_x24g8,
    FMT.D32_FLOAT_S8X24_UINT: _unpack_d32s8x24,
    FMT.R32_FLOAT_X8X24_TYPELESS: _unpack_r32x8x24,
    FMT.X32_TYPELESS_G8X24_UINT: _unpack_x32g8x24,
    FMT.R1_UNORM: _unpack_r1,
    FMT.R8G8_B8G8_UNORM: _unpack_rgbg,
    FMT.G8R8_G8B8_UNORM: _unpack_grgb,
    FMT.AYUV: _unpack_ayuv,
    FMT.Y410: _unpack_y410,
    FMT.Y416: _unpack_y416,
    FMT.YUY2: _unpack_yuy2,
    FMT.Y210: _unpack_y210,
    FMT.Y216: _unpack_y216,
}

_SPECIAL_PACK = {
    FMT.R11G11B10_FLOAT: _pack_r11g11b10,
    FMT.R9G9B9E5_SHAREDEXP: _pack_9995e,
    FMT.R10G10B10_XR_BIAS_A2_UNORM: _pack_xr_bias,
    FMT.XBOX_R10G10B10_SNORM_A2_UNORM: _pack_r10g10b10_snorm_a2,
    FMT.XBOX_R10G10B10_7E3_A2_FLOAT: _pack_7e3,
    FMT.XBOX_R10G10B10_6E4_A2_FLOAT: _pack_6e4,
    FMT.D24_UNORM_S8_UINT: _pack_d24s8,
    FMT.R24_UNORM_X8_TYPELESS: _pack_r24x8,
    FMT.X24_TYPELESS_G8_UINT: _pack_x24g8,
    FMT.D32_FLOAT_S8X24_UINT: _pack_d32s8x24,
    FMT.R1_UNORM: _pack_r1,
    FMT.R8G8_B8G8_UNORM: _pack_rgbg,
    FMT.G8R8_G8B8_UNORM: _pack_grgb,
    FMT.AYUV: _pack_ayuv,
    FMT.Y410: _pack_y410,
    FMT.Y416: _pack_y416,
    FMT.YUY2: _pack_yuy2,
    FMT.Y210: _pack_y210,
    FMT.Y216: _pack_y216,
}


# ---------------------------------------------------------------------------
# image-level wrappers
# ---------------------------------------------------------------------------

def unpack_image(fmt: DXGIFormat, data: jnp.ndarray, width: int,
                 height: int) -> jnp.ndarray:
    """Flat wire bytes (no row padding) -> [H, W, 4] f32."""
    return unpack(fmt, data, width * height).reshape(height, width, 4)


def pack_image(fmt: DXGIFormat, rgba: jnp.ndarray,
               threshold: float = 0.5) -> jnp.ndarray:
    """[H, W, 4] f32 -> flat wire bytes (tightly packed rows)."""
    h, w, _ = rgba.shape
    return pack(fmt, rgba.reshape(h * w, 4), threshold)


# ---------------------------------------------------------------------------
# planar YUV image decode (ConvertToSinglePlane support)
# ---------------------------------------------------------------------------

def planar_to_single(fmt: DXGIFormat) -> DXGIFormat:
    """PlanarToSingle (DirectXTexConvert.cpp:4916)."""
    if fmt in (FMT.NV12, FMT.NV11):
        return FMT.YUY2
    if fmt == FMT.P010:
        return FMT.Y210
    if fmt == FMT.P016:
        return FMT.Y216
    return FMT.UNKNOWN


def unpack_planar_image(fmt: DXGIFormat, data: jnp.ndarray, width: int,
                        height: int) -> jnp.ndarray:
    """Planar wire bytes -> [H, W, 4] f32 RGBA.

    Equivalent to ConvertToSinglePlane (DirectXTexConvert.cpp:5411) followed
    by decoding the packed 4:2:2 result: the 4:2:0/4:1:1 chroma is duplicated
    across the covered luma samples (CONVERT_420_TO_422 semantics).
    """
    data = jnp.asarray(data, jnp.uint8)
    if fmt in (FMT.NV12, FMT.OPAQUE_420):
        y = data[: width * height].reshape(height, width)
        uv = data[width * height:width * height + (height // 2) * ((width + 1) // 2) * 2]
        cw = (width + 1) // 2
        uv = uv.reshape(height // 2, cw, 2)
        u = jnp.repeat(jnp.repeat(uv[..., 0], 2, axis=0), 2, axis=1)[:height, :width]
        v = jnp.repeat(jnp.repeat(uv[..., 1], 2, axis=0), 2, axis=1)[:height, :width]
        r, g, b = _yuv8_to_rgb(y, u, v)
        return jnp.stack([r, g, b, jnp.ones_like(r)], axis=-1)
    if fmt in (FMT.P010, FMT.P016):
        w16 = _bytes_to_u16(data)
        y = w16[: width * height].reshape(height, width)
        cw = (width + 1) // 2
        uv = w16[width * height:width * height + (height // 2) * cw * 2]
        uv = uv.reshape(height // 2, cw, 2)
        u = jnp.repeat(jnp.repeat(uv[..., 0], 2, axis=0), 2, axis=1)[:height, :width]
        v = jnp.repeat(jnp.repeat(uv[..., 1], 2, axis=0), 2, axis=1)[:height, :width]
        if fmt == FMT.P010:
            r, g, b = _yuv10_to_rgb(y >> 6, u >> 6, v >> 6)
        else:
            r, g, b = _yuv16_to_rgb(y, u, v)
        return jnp.stack([r, g, b, jnp.ones_like(r)], axis=-1)
    if fmt == FMT.NV11:
        y = data[: width * height].reshape(height, width)
        cw = (width + 3) // 4
        uv = data[width * height:width * height + height * cw * 2]
        uv = uv.reshape(height, cw, 2)
        u = jnp.repeat(uv[..., 0], 4, axis=1)[:, :width]
        v = jnp.repeat(uv[..., 1], 4, axis=1)[:, :width]
        r, g, b = _yuv8_to_rgb(y, u, v)
        return jnp.stack([r, g, b, jnp.ones_like(r)], axis=-1)
    if fmt == FMT.P208:
        y = data[: width * height].reshape(height, width)
        cw = (width + 1) // 2
        uv = data[width * height:width * height + height * cw * 2]
        uv = uv.reshape(height, cw, 2)
        u = jnp.repeat(uv[..., 0], 2, axis=1)[:, :width]
        v = jnp.repeat(uv[..., 1], 2, axis=1)[:, :width]
        r, g, b = _yuv8_to_rgb(y, u, v)
        return jnp.stack([r, g, b, jnp.ones_like(r)], axis=-1)
    raise ValueError(f"unpack_planar_image: unsupported format {fmt!r}")
