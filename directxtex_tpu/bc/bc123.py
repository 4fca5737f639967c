"""BC1/BC2/BC3 (DXT1-5) codecs, batched over blocks.

Vectorized re-derivation of BC.cpp: Decode565/Encode565 (:36-61), OptimizeRGB
(:65-314) — min/max box init, 4-diagonal axis selection, 8-iteration Newton
least-squares — DecodeBC1 (:318) incl. the 3-color + transparent mode,
EncodeBC1 (:370) with the color-key path, and the BC2/BC3 alpha codecs
(:801-1141). Floyd-Steinberg dither (BC_FLAGS_DITHER_*) is implemented as a
16-step lax.scan inside the block (the error diffusion is sequential by
construction; 16 steps is cheap).

All entry points take/return batched arrays:
    decode_bc1(blocks_u8 [NB, 8])  -> [NB, 16, 4] f32
    encode_bc1(colors [NB, 16, 4]) -> [NB, 8] u8
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .common import optimize_alpha

__all__ = [
    "BC_FLAGS_DITHER_RGB", "BC_FLAGS_DITHER_A", "BC_FLAGS_UNIFORM",
    "decode_bc1", "decode_bc2", "decode_bc3",
    "encode_bc1", "encode_bc2", "encode_bc3",
]

# BC_FLAGS (BC.h:30-48)
BC_FLAGS_DITHER_RGB = 0x10000
BC_FLAGS_DITHER_A = 0x20000
BC_FLAGS_UNIFORM = 0x40000
BC_FLAGS_USE_3SUBSETS = 0x80000
BC_FLAGS_FORCE_BC7_MODE6 = 0x100000

# perceptual luminance weights (BC.cpp:30-31)
_LUM = (0.2125 / 0.7154, 1.0, 0.0721 / 0.7154)
_LUM_INV = (0.7154 / 0.2125, 1.0, 0.7154 / 0.0721)

# The reference decodes 565 as c * (1.0f/31.0f) in float32 (Decode565,
# BC.cpp:38-40). A direct f32 multiply by the f32 constant reproduces those
# bit patterns exactly (single correctly-rounded multiply), and multiplies
# vectorize on the VPU where table gathers would not.
import numpy as _np
# plain Python floats of the exact f32 constants: jnp.float32(...) at module
# scope would initialize a JAX backend on import
_INV5 = float(_np.float32(1.0 / 31.0))
_INV6 = float(_np.float32(1.0 / 63.0))
_INV255 = float(_np.float32(1.0 / 255.0))
_INV15 = float(_np.float32(1.0 / 15.0))


def _bytes_to_u32(b: jnp.ndarray) -> jnp.ndarray:
    return lax.bitcast_convert_type(b.reshape(b.shape[:-1] + (-1, 4)),
                                    jnp.uint32)


def _decode565(w: jnp.ndarray) -> jnp.ndarray:
    """[...] u32 565 words -> [..., 4] f32 RGBA (Decode565, BC.cpp:36)."""
    r = ((w >> 11) & 31).astype(jnp.float32) * _INV5
    g = ((w >> 5) & 63).astype(jnp.float32) * _INV6
    b = (w & 31).astype(jnp.float32) * _INV5
    return jnp.stack([r, g, b, jnp.ones_like(r)], axis=-1)


def _encode565(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., >=3] f32 -> [...] u32 565 word (Encode565, BC.cpp:44)."""
    c = jnp.clip(rgb, 0.0, 1.0)
    r = jnp.floor(c[..., 0] * 31.0 + 0.5).astype(jnp.uint32)
    g = jnp.floor(c[..., 1] * 63.0 + 0.5).astype(jnp.uint32)
    b = jnp.floor(c[..., 2] * 31.0 + 0.5).astype(jnp.uint32)
    return (r << 11) | (g << 5) | b


def _decode_bc1_words(w0: jnp.ndarray, w1: jnp.ndarray, bitmap: jnp.ndarray,
                      isbc1: bool) -> jnp.ndarray:
    """Core DecodeBC1 (BC.cpp:318). w0/w1/bitmap are [NB] u32."""
    clr0 = _decode565(w0)  # [NB, 4]
    clr1 = _decode565(w1)
    three_color = (w0 <= w1) if isbc1 else jnp.zeros_like(w0, bool)

    lerp = lambda t: clr0 + t * (clr1 - clr0)
    c2_4 = lerp(jnp.float32(1.0 / 3.0))
    c3_4 = lerp(jnp.float32(2.0 / 3.0))
    c2_3 = lerp(jnp.float32(0.5))
    c3_3 = jnp.zeros_like(clr0)  # transparent black

    tc = three_color[:, None]
    c2 = jnp.where(tc, c2_3, c2_4)
    c3 = jnp.where(tc, c3_3, c3_4)

    palette = jnp.stack([clr0, clr1, c2, c3], axis=1)  # [NB, 4, 4]
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    idx = ((bitmap[:, None] >> shifts[None, :]) & 3).astype(jnp.int32)
    # one-hot select instead of gather: batched [16,4]x[4,4] matmuls
    onehot = (idx[:, :, None] == jnp.arange(4)[None, None, :]).astype(jnp.float32)
    return jnp.einsum("nik,nkc->nic", onehot, palette,
                      preferred_element_type=jnp.float32)


def decode_bc1(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 8] u8 -> [NB, 16, 4] f32 (D3DXDecodeBC1, BC.cpp:731)."""
    words = _bytes_to_u32(blocks)  # [NB, 2]
    w565 = words[:, 0]
    return _decode_bc1_words(w565 & 0xFFFF, w565 >> 16, words[:, 1], True)


def decode_bc2(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16] u8 -> [NB, 16, 4] f32 (D3DXDecodeBC2, BC.cpp:802)."""
    words = _bytes_to_u32(blocks)  # [NB, 4]: a0 a1 rgb bitmap
    w565 = words[:, 2]
    rgba = _decode_bc1_words(w565 & 0xFFFF, w565 >> 16, words[:, 3], False)
    # 4-bit alpha from words 0..1
    shifts = jnp.arange(8, dtype=jnp.uint32) * 4
    a0 = ((words[:, 0, None] >> shifts[None, :]) & 0xF)
    a1 = ((words[:, 1, None] >> shifts[None, :]) & 0xF)
    a = jnp.concatenate([a0, a1], axis=1).astype(jnp.float32) * _INV15
    return rgba.at[:, :, 3].set(a)


def _bc3_alpha_palette(a0: jnp.ndarray, a1: jnp.ndarray) -> jnp.ndarray:
    """[NB] u32 byte codes -> [NB, 8] f32 alpha palette (BC.cpp:915-930)."""
    f0 = a0.astype(jnp.float32) * _INV255
    f1 = a1.astype(jnp.float32) * _INV255
    i = jnp.arange(1, 7, dtype=jnp.float32)
    # 8-step: fAlpha[i+1] = (f0*(7-i) + f1*i)/7 for i in 1..6
    p8 = (f0[:, None] * (7.0 - i)[None, :] + f1[:, None] * i[None, :]) * (1.0 / 7.0)
    pal8 = jnp.concatenate([f0[:, None], f1[:, None], p8], axis=1)
    # 6-step: i in 1..4, then 0.0, 1.0
    i6 = jnp.arange(1, 5, dtype=jnp.float32)
    p6 = (f0[:, None] * (5.0 - i6)[None, :] + f1[:, None] * i6[None, :]) * (1.0 / 5.0)
    pal6 = jnp.concatenate([f0[:, None], f1[:, None], p6,
                            jnp.zeros_like(f0[:, None]),
                            jnp.ones_like(f0[:, None])], axis=1)
    return jnp.where((a0 > a1)[:, None], pal8, pal6)


def decode_bc3(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16] u8 -> [NB, 16, 4] f32 (D3DXDecodeBC3, BC.cpp:902)."""
    words = _bytes_to_u32(blocks)
    w565 = words[:, 2]
    rgba = _decode_bc1_words(w565 & 0xFFFF, w565 >> 16, words[:, 3], False)

    a0 = words[:, 0] & 0xFF
    a1 = (words[:, 0] >> 8) & 0xFF
    palette = _bc3_alpha_palette(a0, a1)  # [NB, 8]

    # 3-bit indices: 48 bits across bytes 2..7
    lo = (words[:, 0] >> 16) | ((words[:, 1] & 0xFF) << 16)   # bytes 2,3,4
    hi = words[:, 1] >> 8                                     # bytes 5,6,7
    sh = jnp.arange(8, dtype=jnp.uint32) * 3
    idx_lo = ((lo[:, None] >> sh[None, :]) & 7).astype(jnp.int32)
    idx_hi = ((hi[:, None] >> sh[None, :]) & 7).astype(jnp.int32)
    idx = jnp.concatenate([idx_lo, idx_hi], axis=1)
    a = jnp.take_along_axis(palette, idx, axis=1)
    return rgba.at[:, :, 3].set(a)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _optimize_rgb(points: jnp.ndarray, csteps: int, uniform: bool
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched OptimizeRGB (BC.cpp:65): returns endpoint colors X, Y
    each [NB, 3] in the (possibly luminance-weighted) space of `points`."""
    nb = points.shape[0]
    if csteps == 3:
        pC = jnp.asarray([2/2, 1/2, 0/2, 0.0], jnp.float32)
        pD = jnp.asarray([0/2, 1/2, 2/2, 0.0], jnp.float32)
    else:
        pC = jnp.asarray([3/3, 2/3, 1/3, 0/3], jnp.float32)
        pD = jnp.asarray([0/3, 1/3, 2/3, 3/3], jnp.float32)

    init_max = jnp.ones((3,), jnp.float32) if uniform else jnp.asarray(_LUM)
    X = jnp.minimum(jnp.min(points, axis=1), init_max[None, :])
    Y = jnp.maximum(jnp.max(points, axis=1), 0.0)

    AB = Y - X
    fAB = jnp.sum(AB * AB, axis=1)
    single_color = fAB < jnp.finfo(jnp.float32).tiny

    # 4-diagonal axis pick (BC.cpp:124-194)
    inv = 1.0 / jnp.where(single_color, 1.0, fAB)
    Dir = AB * inv[:, None]
    Mid = (X + Y) * 0.5
    Pt = (points - Mid[:, None, :]) * Dir[:, None, :]
    f0 = Pt[..., 0] + Pt[..., 1] + Pt[..., 2]
    f1 = Pt[..., 0] + Pt[..., 1] - Pt[..., 2]
    f2 = Pt[..., 0] - Pt[..., 1] + Pt[..., 2]
    f3 = Pt[..., 0] - Pt[..., 1] - Pt[..., 2]
    fdir = jnp.stack([jnp.sum(f0 * f0, axis=1), jnp.sum(f1 * f1, axis=1),
                      jnp.sum(f2 * f2, axis=1), jnp.sum(f3 * f3, axis=1)],
                     axis=1)
    idirmax = jnp.argmax(fdir, axis=1)
    swap_g = (idirmax & 2) != 0
    swap_b = (idirmax & 1) != 0
    Xg = jnp.where(swap_g, Y[:, 1], X[:, 1])
    Yg = jnp.where(swap_g, X[:, 1], Y[:, 1])
    Xb = jnp.where(swap_b, Y[:, 2], X[:, 2])
    Yb = jnp.where(swap_b, X[:, 2], Y[:, 2])
    X = jnp.stack([X[:, 0], Xg, Xb], axis=1)
    Y = jnp.stack([Y[:, 0], Yg, Yb], axis=1)

    two_color = fAB < (1.0 / 4096.0)
    frozen = single_color | two_color

    def body(i, carry):
        X, Y, done = carry
        steps = (X[:, None, :] * pC[None, :csteps, None]
                 + Y[:, None, :] * pD[None, :csteps, None])  # [NB, csteps, 3]
        Dir = Y - X
        flen = jnp.sum(Dir * Dir, axis=1)
        stop = flen < (1.0 / 4096.0)
        scale = (csteps - 1) / jnp.where(stop, 1.0, flen)
        Dirs = Dir * scale[:, None]

        fdot = jnp.sum((points - X[:, None, :]) * Dirs[:, None, :], axis=2)
        istep = jnp.where(fdot <= 0.0, 0,
                          jnp.where(fdot >= (csteps - 1), csteps - 1,
                                    jnp.floor(fdot + 0.5).astype(jnp.int32)))
        # one-hot select (gathers don't vectorize on the VPU)
        onehot = (istep[:, :, None] == jnp.arange(csteps)[None, None, :]
                  ).astype(jnp.float32)                      # [NB,16,csteps]
        sel_c = onehot @ pC[:csteps]                          # [NB,16]
        sel_d = onehot @ pD[:csteps]
        step_sel = jnp.einsum("nik,nkc->nic", onehot, steps,
                              preferred_element_type=jnp.float32)
        diff = step_sel - points
        fc = sel_c * (1.0 / 8.0)
        fd = sel_d * (1.0 / 8.0)

        d2X = jnp.sum(fc * sel_c, axis=1)
        dX = jnp.sum(fc[:, :, None] * diff, axis=1)
        d2Y = jnp.sum(fd * sel_d, axis=1)
        dY = jnp.sum(fd[:, :, None] * diff, axis=1)

        nX = jnp.where((d2X > 0)[:, None], X - dX / jnp.where(d2X > 0, d2X, 1.0)[:, None], X)
        nY = jnp.where((d2Y > 0)[:, None], Y - dY / jnp.where(d2Y > 0, d2Y, 1.0)[:, None], Y)

        eps = (0.25 / 64.0) * (0.25 / 64.0)
        converged = jnp.all(dX * dX < eps, axis=1) & jnp.all(dY * dY < eps, axis=1)

        active = jnp.logical_not(done | stop)
        X = jnp.where(active[:, None], nX, X)
        Y = jnp.where(active[:, None], nY, Y)
        done = done | stop | (active & converged)
        return X, Y, done

    X, Y, _ = lax.fori_loop(0, 8, body, (X, Y, frozen))
    return X, Y


def _fs_dither_quantize(values: jnp.ndarray, quantize_fn) -> jnp.ndarray:
    """Floyd-Steinberg error diffusion over the 16 raster-order pixels of
    each block (EncodeBC1 dither, BC.cpp:414-489). values: [NB, 16, C].
    Returns the dithered (pre-quantization-error-adjusted) values."""
    values = jnp.asarray(values, jnp.float32)
    nb, _, c = values.shape

    def step(error, i):
        # error: [NB, 16, C] accumulated
        v = values[:, i] + error[:, i]
        q = quantize_fn(v)
        diff = v - q
        w_right = jnp.where((i & 3) != 3, 7.0 / 16.0, 0.0)
        w_dl = jnp.where((i < 12) & ((i & 3) != 0), 3.0 / 16.0, 0.0)
        w_down = jnp.where(i < 12, 5.0 / 16.0, 0.0)
        w_dr = jnp.where((i < 12) & ((i & 3) != 3), 1.0 / 16.0, 0.0)
        for offset, wgt in ((1, w_right), (3, w_dl), (4, w_down), (5, w_dr)):
            j = jnp.minimum(i + offset, 15)
            error = error.at[:, j].add(jnp.where(wgt > 0, diff * wgt, 0.0))
        return error, q

    error0 = jnp.zeros_like(values)
    _, qs = lax.scan(step, error0, jnp.arange(16))
    return qs.transpose(1, 0, 2)  # [16, NB, C] -> [NB, 16, C]


def _quantize565_f(v: jnp.ndarray) -> jnp.ndarray:
    """Quantize float RGB to the 565 grid, returned as float (BC.cpp:433)."""
    r = jnp.floor(v[..., 0] * 31.0 + 0.5) * (1.0 / 31.0)
    g = jnp.floor(v[..., 1] * 63.0 + 0.5) * (1.0 / 63.0)
    b = jnp.floor(v[..., 2] * 31.0 + 0.5) * (1.0 / 31.0)
    return jnp.stack([r, g, b], axis=-1)


def _encode_bc1_core(color: jnp.ndarray, alpha: jnp.ndarray, color_key: bool,
                     threshold: float, flags: int) -> jnp.ndarray:
    """EncodeBC1 (BC.cpp:370). color [NB,16,3] (straight RGB), alpha [NB,16].
    Returns (w565_0, w565_1, bitmap) packed into [NB, 8] u8."""
    nb = color.shape[0]
    uniform = bool(flags & BC_FLAGS_UNIFORM)
    dither = bool(flags & BC_FLAGS_DITHER_RGB)

    if color_key:
        transparent = alpha < threshold
        n_key = jnp.sum(transparent, axis=1)
        all_key = n_key == 16
        three = n_key > 0
    else:
        transparent = jnp.zeros_like(alpha, bool)
        all_key = jnp.zeros(nb, bool)
        three = jnp.zeros(nb, bool)

    # quantize to 565 grid (with optional FS dithering), BC.cpp:408-490
    if dither:
        q = _fs_dither_quantize(color, _quantize565_f)
    else:
        q = _quantize565_f(color)
    if not uniform:
        lum = jnp.asarray(_LUM)
        q = q * lum[None, None, :]
        wcolor = color * lum[None, None, :]
    else:
        wcolor = color

    # endpoint optimization in weighted space; OptimizeRGB is
    # shape-specialized on csteps, so run both variants and select
    Xa4, Ya4 = _optimize_rgb(q, 4, uniform)
    if color_key:
        Xa3, Ya3 = _optimize_rgb(q, 3, uniform)
        Xa = jnp.where(three[:, None], Xa3, Xa4)
        Ya = jnp.where(three[:, None], Ya3, Ya4)
    else:
        Xa, Ya = Xa4, Ya4

    inv = jnp.ones((3,), jnp.float32) if uniform else jnp.asarray(_LUM_INV)
    wA = _encode565(Xa * inv[None, :])
    wB = _encode565(Ya * inv[None, :])

    # re-decode quantized endpoints back into weighted space
    lumv = jnp.ones((3,), jnp.float32) if uniform else jnp.asarray(_LUM)
    cA = _decode565(wA)[:, :3] * lumv[None, :]
    cB = _decode565(wB)[:, :3] * lumv[None, :]

    # order endpoints: 4-color needs w0 > w1; 3-color needs w0 <= w1
    want_le = three  # (3 == uSteps) == (wColorA <= wColorB) keeps order
    is_le = wA <= wB
    keep = (want_le == is_le)
    w0 = jnp.where(keep, wA, wB)
    w1 = jnp.where(keep, wB, wA)
    s0 = jnp.where(keep[:, None], cA, cB)
    s1 = jnp.where(keep[:, None], cB, cA)

    csteps_f = jnp.where(three, 2.0, 3.0)
    # palette steps in storage-index order via pSteps map
    dirv = s1 - s0
    lensq = jnp.sum(dirv * dirv, axis=1)
    fscale = jnp.where(wA != wB, csteps_f / jnp.where(lensq == 0, 1.0, lensq), 0.0)
    dirs = dirv * fscale[:, None]

    fdot = jnp.sum((wcolor - s0[:, None, :]) * dirs[:, None, :], axis=2)
    # step palette values for dither error calc: order [s0, s1, mid...]
    step2_3 = s0 + 0.5 * (s1 - s0)
    step2_4 = s0 + (1.0 / 3.0) * (s1 - s0)
    step3_4 = s0 + (2.0 / 3.0) * (s1 - s0)

    # index mapping pSteps3 = [0,2,1], pSteps4 = [0,2,3,1] as select chains
    raw = jnp.floor(fdot + 0.5).astype(jnp.int32)
    raw = jnp.clip(raw, 0, jnp.where(three, 2, 3)[:, None])
    m3 = jnp.where(raw == 0, 0, jnp.where(raw == 1, 2, 1))
    m4 = jnp.where(raw == 0, 0, jnp.where(raw == 1, 2,
                   jnp.where(raw == 2, 3, 1)))
    mapped = jnp.where(three[:, None], m3, m4)
    istep = jnp.where(fdot <= 0.0, 0,
                      jnp.where(fdot >= csteps_f[:, None], 1, mapped))
    istep = jnp.where(transparent & three[:, None], 3, istep)

    # single-color degenerate case: 4-color with equal endpoints -> bitmap 0
    degen = (~three) & (wA == wB)
    istep = jnp.where(degen[:, None], 0, istep)

    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    bitmap = jnp.sum(istep.astype(jnp.uint32) << shifts[None, :], axis=1)

    # all-transparent block override (BC.cpp:393-399)
    w0 = jnp.where(all_key, 0x0000, w0)
    w1 = jnp.where(all_key, 0xFFFF, w1)
    bitmap = jnp.where(all_key, jnp.uint32(0xFFFFFFFF), bitmap)

    word0 = w0 | (w1 << 16)
    out = jnp.stack([word0, bitmap], axis=1)
    return lax.bitcast_convert_type(out, jnp.uint8).reshape(nb, 8)


def encode_bc1(colors: jnp.ndarray, threshold: float = 0.5,
               flags: int = 0) -> jnp.ndarray:
    """[NB, 16, 4] f32 -> [NB, 8] u8 (D3DXEncodeBC1, BC.cpp:738)."""
    return _encode_bc1_core(colors[..., :3], colors[..., 3], True,
                            threshold, flags)


def encode_bc2(colors: jnp.ndarray, flags: int = 0) -> jnp.ndarray:
    """[NB, 16, 4] f32 -> [NB, 16] u8 (D3DXEncodeBC2, BC.cpp:828)."""
    nb = colors.shape[0]
    alpha = colors[..., 3]
    if flags & BC_FLAGS_DITHER_A:
        q = _fs_dither_quantize(alpha[..., None],
                                lambda v: jnp.floor(v * 15.0 + 0.5) * (1.0 / 15.0))
        codes = jnp.clip(jnp.floor(q[..., 0] * 15.0 + 0.5), 0, 15).astype(jnp.uint32)
    else:
        codes = jnp.clip(jnp.floor(alpha * 15.0 + 0.5), 0, 15).astype(jnp.uint32)
    sh = jnp.arange(8, dtype=jnp.uint32) * 4
    a0 = jnp.sum(codes[:, :8] << sh[None, :], axis=1)
    a1 = jnp.sum(codes[:, 8:] << sh[None, :], axis=1)

    rgb = _encode_bc1_core(colors[..., :3], alpha, False, 0.0, flags)
    rgb_words = lax.bitcast_convert_type(rgb.reshape(nb, 2, 4), jnp.uint32)
    out = jnp.concatenate([a0[:, None], a1[:, None], rgb_words], axis=1)
    return lax.bitcast_convert_type(out, jnp.uint8).reshape(nb, 16)


def encode_bc3(colors: jnp.ndarray, flags: int = 0) -> jnp.ndarray:
    """[NB, 16, 4] f32 -> [NB, 16] u8 (D3DXEncodeBC3, BC.cpp:944)."""
    nb = colors.shape[0]
    alpha = colors[..., 3]

    # quantize alpha to A8 grid (with optional dithering), BC.cpp:957-1005
    if flags & BC_FLAGS_DITHER_A:
        fq = _fs_dither_quantize(alpha[..., None],
                                 lambda v: jnp.floor(v * 255.0 + 0.5) * (1.0 / 255.0))
        falpha = fq[..., 0]
    else:
        falpha = jnp.floor(alpha * 255.0 + 0.5) * (1.0 / 255.0)
    fmin = jnp.min(falpha, axis=1)
    fmax = jnp.max(falpha, axis=1)

    all_opaque = fmin == 1.0
    six_steps = (fmin == 0.0) | (fmax == 1.0)

    # optimize both variants, select per block
    x6, y6 = optimize_alpha(falpha, 6, False)
    x8, y8 = optimize_alpha(falpha, 8, False)
    fx = jnp.where(six_steps, x6, x8)
    fy = jnp.where(six_steps, y6, y8)

    bA = jnp.floor(fx * 255.0 + 0.5).astype(jnp.uint32)
    bB = jnp.floor(fy * 255.0 + 0.5).astype(jnp.uint32)
    fA = bA.astype(jnp.float32) * (1.0 / 255.0)
    fB = bB.astype(jnp.float32) * (1.0 / 255.0)

    # 8-step degenerate: equal endpoints -> zero bitmap
    degen8 = (~six_steps) & (bA == bB)

    # byte order: 6-step stores (bA, bB); 8-step stores (bB, bA)
    a_lo = jnp.where(six_steps, bA, bB)
    a_hi = jnp.where(six_steps, bB, bA)

    # build step palette in *storage order* f[0], f[1] then interpolants
    s0 = jnp.where(six_steps, fA, fB)
    s1 = jnp.where(six_steps, fB, fA)
    i6 = jnp.arange(1, 5, dtype=jnp.float32)
    pal6 = jnp.concatenate(
        [s0[:, None], s1[:, None],
         (s0[:, None] * (5.0 - i6)[None] + s1[:, None] * i6[None]) * (1.0 / 5.0),
         jnp.zeros((nb, 1), jnp.float32), jnp.ones((nb, 1), jnp.float32)],
        axis=1)
    i8 = jnp.arange(1, 7, dtype=jnp.float32)
    pal8 = jnp.concatenate(
        [s0[:, None], s1[:, None],
         (s0[:, None] * (7.0 - i8)[None] + s1[:, None] * i8[None]) * (1.0 / 7.0)],
        axis=1)
    pal = jnp.where(six_steps[:, None], pal6, pal8)

    psteps6 = jnp.asarray([0, 2, 3, 4, 5, 1, 1, 1], jnp.int32)
    psteps8 = jnp.asarray([0, 2, 3, 4, 5, 6, 7, 1], jnp.int32)
    csteps_f = jnp.where(six_steps, 5.0, 7.0)
    fscale = jnp.where(s0 != s1, csteps_f / (s1 - s0), 0.0)

    # index assignment reads the pre-quantization alpha (BC.cpp:1102)
    fdot = (alpha - s0[:, None]) * fscale[:, None]
    raw = jnp.clip(jnp.floor(fdot + 0.5).astype(jnp.int32), 0,
                   jnp.where(six_steps, 5, 7)[:, None])
    mapped = jnp.where(six_steps[:, None], psteps6[raw], psteps8[raw])
    lo6 = jnp.where(alpha <= s0[:, None] * 0.5, 6, 0)
    hi6 = jnp.where(alpha >= (s1[:, None] + 1.0) * 0.5, 7, 1)
    lo = jnp.where(six_steps[:, None], lo6, 0)
    hi = jnp.where(six_steps[:, None], hi6, 1)
    istep = jnp.where(fdot <= 0.0, lo,
                      jnp.where(fdot >= csteps_f[:, None], hi, mapped))

    # overrides: all-opaque and degenerate blocks
    istep = jnp.where((all_opaque | degen8)[:, None], 0, istep)
    a_lo = jnp.where(all_opaque, 0xFF, a_lo)
    a_hi = jnp.where(all_opaque, 0xFF, a_hi)

    # pack 16x 3-bit indices into 6 bytes
    sh = jnp.arange(8, dtype=jnp.uint32) * 3
    half0 = jnp.sum(istep[:, :8].astype(jnp.uint32) << sh[None, :], axis=1)
    half1 = jnp.sum(istep[:, 8:].astype(jnp.uint32) << sh[None, :], axis=1)
    zero_bits = (all_opaque | degen8)
    half0 = jnp.where(zero_bits, 0, half0)
    half1 = jnp.where(zero_bits, 0, half1)

    word0 = a_lo | (a_hi << 8) | ((half0 & 0xFFFF) << 16)
    word1 = (half0 >> 16) | ((half1 & 0xFFFFFF) << 8)

    rgb = _encode_bc1_core(colors[..., :3], alpha, False, 0.0, flags)
    rgb_words = lax.bitcast_convert_type(rgb.reshape(nb, 2, 4), jnp.uint32)
    out = jnp.concatenate([word0[:, None], word1[:, None], rgb_words], axis=1)
    return lax.bitcast_convert_type(out, jnp.uint8).reshape(nb, 16)
