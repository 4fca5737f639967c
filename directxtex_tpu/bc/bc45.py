"""BC4/BC5 codecs, batched over blocks (BC4BC5.cpp).

Decode follows BC4_UNORM/BC4_SNORM::DecodeFromIndex exactly, including the
6-step + {0,1} endpoint rule and the -128 -> -127 signed clamp
(BC4BC5.cpp:39-151). Encode = FindEndPointsBC4U/S (OptimizeAlpha with 6- vs
8-step selection by boundary values, :183-293) + FindClosest (:325-377).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .common import optimize_alpha_t

__all__ = ["decode_bc4u", "decode_bc4s", "decode_bc5u", "decode_bc5s",
           "encode_bc4u", "encode_bc4s", "encode_bc5u", "encode_bc5s"]

def _bc4_palette(r0_code: jnp.ndarray, r1_code: jnp.ndarray,
                 signed: bool) -> jnp.ndarray:
    """[NB] u32 byte codes -> [NB, 8] palette (DecodeFromIndex)."""
    if signed:
        # arithmetic instead of a 256-entry table gather (slow on the TPU
        # VPU): same ops as building _T127_DIV, so bit-identical
        s0 = jnp.where(r0_code >= 128, r0_code.astype(jnp.int32) - 256,
                       r0_code.astype(jnp.int32))
        s1 = jnp.where(r1_code >= 128, r1_code.astype(jnp.int32) - 256,
                       r1_code.astype(jnp.int32))
        f0 = jnp.where(s0 == -128, -127, s0).astype(jnp.float32) \
            / jnp.float32(127.0)
        f1 = jnp.where(s1 == -128, -127, s1).astype(jnp.float32) \
            / jnp.float32(127.0)
        # comparison uses the *signed* byte values (red_0 > red_1)
        eight = s0 > s1
        lo_val, hi_val = -1.0, 1.0
    else:
        f0 = r0_code.astype(jnp.float32) / jnp.float32(255.0)
        f1 = r1_code.astype(jnp.float32) / jnp.float32(255.0)
        eight = r0_code > r1_code
        lo_val, hi_val = 0.0, 1.0

    i8 = jnp.arange(1, 7, dtype=jnp.float32)
    p8 = (f0[:, None] * (7.0 - i8)[None] + f1[:, None] * i8[None]) / 7.0
    pal8 = jnp.concatenate([f0[:, None], f1[:, None], p8], axis=1)
    i6 = jnp.arange(1, 5, dtype=jnp.float32)
    p6 = (f0[:, None] * (5.0 - i6)[None] + f1[:, None] * i6[None]) / 5.0
    pal6 = jnp.concatenate([f0[:, None], f1[:, None], p6,
                            jnp.full((f0.shape[0], 1), lo_val, jnp.float32),
                            jnp.full((f0.shape[0], 1), hi_val, jnp.float32)],
                           axis=1)
    return jnp.where(eight[:, None], pal8, pal6)


def _bc4_indices(words: jnp.ndarray) -> jnp.ndarray:
    """[NB, 2] u32 (8-byte block) -> [NB, 16] 3-bit indices."""
    lo = (words[:, 0] >> 16) | ((words[:, 1] & 0xFF) << 16)
    hi = words[:, 1] >> 8
    sh = jnp.arange(8, dtype=jnp.uint32) * 3
    idx_lo = ((lo[:, None] >> sh[None, :]) & 7).astype(jnp.int32)
    idx_hi = ((hi[:, None] >> sh[None, :]) & 7).astype(jnp.int32)
    return jnp.concatenate([idx_lo, idx_hi], axis=1)


def _decode_bc4_channel(blocks8: jnp.ndarray, signed: bool) -> jnp.ndarray:
    words = lax.bitcast_convert_type(blocks8.reshape(-1, 2, 4), jnp.uint32)
    r0 = words[:, 0] & 0xFF
    r1 = (words[:, 0] >> 8) & 0xFF
    pal = _bc4_palette(r0, r1, signed)
    idx = _bc4_indices(words)
    # one-hot select (TPU-friendly) instead of gather
    onehot = (idx[:, :, None] == jnp.arange(8)[None, None, :]).astype(jnp.float32)
    return jnp.einsum("nik,nk->ni", onehot, pal,
                      preferred_element_type=jnp.float32)


def decode_bc4u(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 8] u8 -> [NB, 16, 4] (r, 0, 0, 1) (D3DXDecodeBC4U)."""
    r = _decode_bc4_channel(blocks, False)
    z = jnp.zeros_like(r)
    return jnp.stack([r, z, z, jnp.ones_like(r)], axis=-1)


def decode_bc4s(blocks: jnp.ndarray) -> jnp.ndarray:
    r = _decode_bc4_channel(blocks, True)
    z = jnp.zeros_like(r)
    return jnp.stack([r, z, z, jnp.ones_like(r)], axis=-1)


def decode_bc5u(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16] u8 -> [NB, 16, 4] (r, g, 0, 1) (D3DXDecodeBC5U)."""
    r = _decode_bc4_channel(blocks[:, :8], False)
    g = _decode_bc4_channel(blocks[:, 8:], False)
    z = jnp.zeros_like(r)
    return jnp.stack([r, g, z, jnp.ones_like(r)], axis=-1)


def decode_bc5s(blocks: jnp.ndarray) -> jnp.ndarray:
    r = _decode_bc4_channel(blocks[:, :8], True)
    g = _decode_bc4_channel(blocks[:, 8:], True)
    z = jnp.zeros_like(r)
    return jnp.stack([r, g, z, jnp.ones_like(r)], axis=-1)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _float_to_snorm8(v: jnp.ndarray) -> jnp.ndarray:
    """FloatToSNorm (BC4BC5.cpp:158): clamp, scale by 127, round away."""
    v = jnp.nan_to_num(v)
    v = jnp.clip(v, -1.0, 1.0) * 127.0
    v = jnp.where(v >= 0, v + 0.5, v - 0.5)
    return (v.astype(jnp.int32) & 0xFF).astype(jnp.uint32)


def _encode_bc4_channel(texels: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """[NB, 16] float -> [NB, 2] u32 words of the 8-byte BC4 block."""
    nb = texels.shape[0]
    t = jnp.transpose(jnp.asarray(texels, jnp.float32))  # lane-major [16,NB]
    fmin = jnp.min(t, axis=0)
    fmax = jnp.max(t, axis=0)
    min_norm = -1.0 if signed else 0.0
    use_6 = (fmin == min_norm) | (fmax == 1.0)  # boundary -> 6-step codec

    x8, y8 = optimize_alpha_t(t, 8, signed)
    x6, y6 = optimize_alpha_t(t, 6, signed)

    if signed:
        to_code = _float_to_snorm8
    else:
        def to_code(v):
            # uint8_t(fStart * 255.0f): TRUNCATION (BC4BC5.cpp:219)
            return jnp.clip(v * 255.0, 0, 255).astype(jnp.uint32)

    # 8-step: red_0 = end (max), red_1 = start (min) (BC4BC5.cpp:222-223)
    # 6-step: red_0 = start, red_1 = end (:233-234)
    r0 = jnp.where(use_6, to_code(x6), to_code(y8))
    r1 = jnp.where(use_6, to_code(y6), to_code(x8))

    pal = _bc4_palette(r0, r1, signed)  # [NB, 8] decode-exact gradient
    # FindClosest: nearest palette entry, lane-major argmin over 8 entries
    best = jnp.abs(t - pal[:, 0][None, :])
    idx = jnp.zeros(t.shape, jnp.uint32)
    for k in range(1, 8):
        d = jnp.abs(t - pal[:, k][None, :])
        better = d < best
        best = jnp.where(better, d, best)
        idx = jnp.where(better, k, idx)

    sh = (jnp.arange(8, dtype=jnp.uint32) * 3)[:, None]
    half0 = jnp.sum(idx[:8] << sh, axis=0)
    half1 = jnp.sum(idx[8:] << sh, axis=0)
    word0 = r0 | (r1 << 8) | ((half0 & 0xFFFF) << 16)
    word1 = (half0 >> 16) | ((half1 & 0xFFFFFF) << 8)
    return jnp.stack([word0, word1], axis=1)


def encode_bc4u(colors: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16, 4] -> [NB, 8] u8 (D3DXEncodeBC4U)."""
    words = _encode_bc4_channel(colors[..., 0], False)
    return lax.bitcast_convert_type(words, jnp.uint8).reshape(-1, 8)


def encode_bc4s(colors: jnp.ndarray) -> jnp.ndarray:
    words = _encode_bc4_channel(colors[..., 0], True)
    return lax.bitcast_convert_type(words, jnp.uint8).reshape(-1, 8)


def encode_bc5u(colors: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16, 4] -> [NB, 16] u8 (D3DXEncodeBC5U)."""
    r = _encode_bc4_channel(colors[..., 0], False)
    g = _encode_bc4_channel(colors[..., 1], False)
    words = jnp.concatenate([r, g], axis=1)
    return lax.bitcast_convert_type(words, jnp.uint8).reshape(-1, 16)


def encode_bc5s(colors: jnp.ndarray) -> jnp.ndarray:
    r = _encode_bc4_channel(colors[..., 0], True)
    g = _encode_bc4_channel(colors[..., 1], True)
    words = jnp.concatenate([r, g], axis=1)
    return lax.bitcast_convert_type(words, jnp.uint8).reshape(-1, 16)
