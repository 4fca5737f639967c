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


def _decode_bc1_planes_t(w0, w1, bitmap, isbc1: bool):
    """Core DecodeBC1 (BC.cpp:318), lane-major: [NB] u32 words ->
    [16, 4, NB] f32. Identical float math to the per-block reference
    (verified exactly by tests/test_bc.py golden decoders)."""
    r0, g0, b0 = _decode565_planes(w0)
    r1, g1, b1 = _decode565_planes(w1)
    one = jnp.ones_like(r0)
    c0 = [r0, g0, b0, one]
    c1 = [r1, g1, b1, one]
    three = (w0 <= w1) if isbc1 else jnp.zeros_like(w0, bool)
    t13 = jnp.float32(1.0 / 3.0)
    t23 = jnp.float32(2.0 / 3.0)
    t12 = jnp.float32(0.5)
    c2 = [jnp.where(three, a + t12 * (b - a), a + t13 * (b - a))
          for a, b in zip(c0, c1)]
    c3 = [jnp.where(three, jnp.zeros_like(a), a + t23 * (b - a))
          for a, b in zip(c0, c1)]  # 3-color mode: transparent black
    px = []
    for i in range(16):
        idx = ((bitmap >> (2 * i)) & 3).astype(jnp.int32)
        row = [jnp.where(idx == 1, c1[ch],
               jnp.where(idx == 2, c2[ch],
               jnp.where(idx == 3, c3[ch], c0[ch]))) for ch in range(4)]
        px.append(jnp.stack(row))
    return jnp.stack(px)                         # [16, 4, NB]


def decode_bc1(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 8] u8 -> [NB, 16, 4] f32 (D3DXDecodeBC1, BC.cpp:731)."""
    words = _bytes_to_u32(blocks)  # [NB, 2]
    w565 = words[:, 0]
    out = _decode_bc1_planes_t(w565 & 0xFFFF, w565 >> 16, words[:, 1], True)
    return jnp.transpose(out, (2, 0, 1))


def decode_bc2(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16] u8 -> [NB, 16, 4] f32 (D3DXDecodeBC2, BC.cpp:802)."""
    words = _bytes_to_u32(blocks)  # [NB, 4]: a0 a1 rgb bitmap
    w565 = words[:, 2]
    out = _decode_bc1_planes_t(w565 & 0xFFFF, w565 >> 16, words[:, 3],
                               False)
    # explicit 4-bit alpha from words 0..1, lane-major per pixel
    inv15 = jnp.float32(_INV15)
    for i in range(16):
        word = words[:, 0] if i < 8 else words[:, 1]
        a = ((word >> (4 * (i % 8))) & 0xF).astype(jnp.float32) * inv15
        out = out.at[i, 3, :].set(a)
    return jnp.transpose(out, (2, 0, 1))


def decode_bc3(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16] u8 -> [NB, 16, 4] f32 (D3DXDecodeBC3, BC.cpp:902)."""
    words = _bytes_to_u32(blocks)
    w565 = words[:, 2]
    out = _decode_bc1_planes_t(w565 & 0xFFFF, w565 >> 16, words[:, 3],
                               False)

    a0 = words[:, 0] & 0xFF
    a1 = (words[:, 0] >> 8) & 0xFF
    # alpha palette as 8 [NB] planes (BC.cpp:915-930)
    inv255 = jnp.float32(_INV255)
    f0 = a0.astype(jnp.float32) * inv255
    f1 = a1.astype(jnp.float32) * inv255
    eight = a0 > a1
    pal = [f0, f1]
    for k in range(2, 8):
        p8 = (f0 * jnp.float32(8 - k) + f1 * jnp.float32(k - 1)) \
            * jnp.float32(1.0 / 7.0)
        if k < 6:
            p6 = (f0 * jnp.float32(6 - k) + f1 * jnp.float32(k - 1)) \
                * jnp.float32(1.0 / 5.0)
        elif k == 6:
            p6 = jnp.zeros_like(f0)
        else:
            p6 = jnp.ones_like(f0)
        pal.append(jnp.where(eight, p8, p6))

    # 3-bit indices: 48 bits across bytes 2..7
    lo = (words[:, 0] >> 16) | ((words[:, 1] & 0xFF) << 16)   # bytes 2,3,4
    hi = words[:, 1] >> 8                                     # bytes 5,6,7
    for i in range(16):
        word = lo if i < 8 else hi
        idx = ((word >> (3 * (i % 8))) & 7).astype(jnp.int32)
        a = pal[0]
        for k in range(1, 8):
            a = jnp.where(idx == k, pal[k], a)
        out = out.at[i, 3, :].set(a)
    return jnp.transpose(out, (2, 0, 1))




# ---------------------------------------------------------------------------
# encode — lane-major layout
# ---------------------------------------------------------------------------
#
# TPU vector registers are (8 sublanes, 128 lanes) over the two minor
# dimensions. A [NB, 16, 4] layout puts 16x4 in the vector unit and wastes
# ~97% of each register, so the encoders transpose once to channel planes of
# shape [16, NB] (block index minor = full lanes) and do all arithmetic
# there. Semantics are identical to the reference scalar loops.


def _optimize_rgb_t(pr, pg, pb, csteps: int, uniform: bool):
    """Batched OptimizeRGB (BC.cpp:65) over [16, NB] channel planes.
    Returns endpoint planes ((Xr,Xg,Xb), (Yr,Yg,Yb)) each [NB]."""
    pC = ([2 / 2, 1 / 2, 0 / 2] if csteps == 3 else [3 / 3, 2 / 3, 1 / 3, 0 / 3])
    pD = ([0 / 2, 1 / 2, 2 / 2] if csteps == 3 else [0 / 3, 1 / 3, 2 / 3, 3 / 3])

    init = (1.0, 1.0, 1.0) if uniform else _LUM
    Xr = jnp.minimum(jnp.min(pr, axis=0), init[0])
    Xg = jnp.minimum(jnp.min(pg, axis=0), init[1])
    Xb = jnp.minimum(jnp.min(pb, axis=0), init[2])
    Yr = jnp.maximum(jnp.max(pr, axis=0), 0.0)
    Yg = jnp.maximum(jnp.max(pg, axis=0), 0.0)
    Yb = jnp.maximum(jnp.max(pb, axis=0), 0.0)

    ABr, ABg, ABb = Yr - Xr, Yg - Xg, Yb - Xb
    fAB = ABr * ABr + ABg * ABg + ABb * ABb
    single = fAB < jnp.finfo(jnp.float32).tiny

    inv = 1.0 / jnp.where(single, 1.0, fAB)
    Dr, Dg, Db = ABr * inv, ABg * inv, ABb * inv
    Mr, Mg, Mb = (Xr + Yr) * 0.5, (Xg + Yg) * 0.5, (Xb + Yb) * 0.5
    Ptr = (pr - Mr) * Dr
    Ptg = (pg - Mg) * Dg
    Ptb = (pb - Mb) * Db
    f0 = Ptr + Ptg + Ptb
    f1 = Ptr + Ptg - Ptb
    f2 = Ptr - Ptg + Ptb
    f3 = Ptr - Ptg - Ptb
    d0 = jnp.sum(f0 * f0, axis=0)
    d1 = jnp.sum(f1 * f1, axis=0)
    d2 = jnp.sum(f2 * f2, axis=0)
    d3 = jnp.sum(f3 * f3, axis=0)
    # argmax over the four diagonals (BC.cpp:174-194)
    best01 = jnp.where(d1 > d0, 1, 0)
    bv01 = jnp.maximum(d0, d1)
    best23 = jnp.where(d3 > d2, 3, 2)
    bv23 = jnp.maximum(d2, d3)
    idirmax = jnp.where(bv23 > bv01, best23, best01)
    swap_g = (idirmax & 2) != 0
    swap_b = (idirmax & 1) != 0
    Xg, Yg = jnp.where(swap_g, Yg, Xg), jnp.where(swap_g, Xg, Yg)
    Xb, Yb = jnp.where(swap_b, Yb, Xb), jnp.where(swap_b, Xb, Yb)

    frozen = single | (fAB < 1.0 / 4096.0)
    fsteps = float(csteps - 1)

    def body(_, carry):
        Xr, Xg, Xb, Yr, Yg, Yb, done = carry
        Dr, Dg, Db = Yr - Xr, Yg - Xg, Yb - Xb
        flen = Dr * Dr + Dg * Dg + Db * Db
        stop = flen < (1.0 / 4096.0)
        scale = fsteps / jnp.where(stop, 1.0, flen)
        Dr, Dg, Db = Dr * scale, Dg * scale, Db * scale

        fdot = (pr - Xr) * Dr + (pg - Xg) * Dg + (pb - Xb) * Db  # [16, NB]
        istep = jnp.where(fdot <= 0.0, 0,
                          jnp.where(fdot >= fsteps, csteps - 1,
                                    jnp.floor(fdot + 0.5).astype(jnp.int32)))
        d2X = jnp.zeros_like(Xr)
        d2Y = jnp.zeros_like(Xr)
        dXr = jnp.zeros_like(Xr); dXg = jnp.zeros_like(Xr); dXb = jnp.zeros_like(Xr)
        dYr = jnp.zeros_like(Xr); dYg = jnp.zeros_like(Xr); dYb = jnp.zeros_like(Xr)
        for k in range(csteps):
            m = (istep == k).astype(jnp.float32)              # [16, NB]
            sr = Xr * pC[k] + Yr * pD[k]
            sg = Xg * pC[k] + Yg * pD[k]
            sb = Xb * pC[k] + Yb * pD[k]
            diffr = m * (sr - pr)
            diffg = m * (sg - pg)
            diffb = m * (sb - pb)
            cnt = jnp.sum(m, axis=0)
            fc = pC[k] * (1.0 / 8.0)
            fd = pD[k] * (1.0 / 8.0)
            d2X = d2X + cnt * (fc * pC[k])
            d2Y = d2Y + cnt * (fd * pD[k])
            dXr = dXr + fc * jnp.sum(diffr, axis=0)
            dXg = dXg + fc * jnp.sum(diffg, axis=0)
            dXb = dXb + fc * jnp.sum(diffb, axis=0)
            dYr = dYr + fd * jnp.sum(diffr, axis=0)
            dYg = dYg + fd * jnp.sum(diffg, axis=0)
            dYb = dYb + fd * jnp.sum(diffb, axis=0)

        okX = d2X > 0
        invX = 1.0 / jnp.where(okX, d2X, 1.0)
        nXr = jnp.where(okX, Xr - dXr * invX, Xr)
        nXg = jnp.where(okX, Xg - dXg * invX, Xg)
        nXb = jnp.where(okX, Xb - dXb * invX, Xb)
        okY = d2Y > 0
        invY = 1.0 / jnp.where(okY, d2Y, 1.0)
        nYr = jnp.where(okY, Yr - dYr * invY, Yr)
        nYg = jnp.where(okY, Yg - dYg * invY, Yg)
        nYb = jnp.where(okY, Yb - dYb * invY, Yb)

        eps = (0.25 / 64.0) * (0.25 / 64.0)
        conv = ((dXr * dXr < eps) & (dXg * dXg < eps) & (dXb * dXb < eps)
                & (dYr * dYr < eps) & (dYg * dYg < eps) & (dYb * dYb < eps))
        act = jnp.logical_not(done | stop)
        Xr = jnp.where(act, nXr, Xr); Xg = jnp.where(act, nXg, Xg)
        Xb = jnp.where(act, nXb, Xb)
        Yr = jnp.where(act, nYr, Yr); Yg = jnp.where(act, nYg, Yg)
        Yb = jnp.where(act, nYb, Yb)
        done = done | stop | (act & conv)
        return Xr, Xg, Xb, Yr, Yg, Yb, done

    Xr, Xg, Xb, Yr, Yg, Yb, _ = lax.fori_loop(
        0, 8, body, (Xr, Xg, Xb, Yr, Yg, Yb, frozen))
    return (Xr, Xg, Xb), (Yr, Yg, Yb)


def _fs_dither_quantize(values: jnp.ndarray, quantize_fn) -> jnp.ndarray:
    """Floyd-Steinberg error diffusion over the 16 raster-order pixels of
    each block (EncodeBC1 dither, BC.cpp:414-489). values: [16, NB, C] in
    lane-major layout. Returns the quantized (error-diffused) values."""
    values = jnp.asarray(values, jnp.float32)

    def step(error, i):
        v = values[i] + error[i]
        q = quantize_fn(v)
        diff = v - q
        w_right = jnp.where((i & 3) != 3, 7.0 / 16.0, 0.0)
        w_dl = jnp.where((i < 12) & ((i & 3) != 0), 3.0 / 16.0, 0.0)
        w_down = jnp.where(i < 12, 5.0 / 16.0, 0.0)
        w_dr = jnp.where((i < 12) & ((i & 3) != 3), 1.0 / 16.0, 0.0)
        for offset, wgt in ((1, w_right), (3, w_dl), (4, w_down), (5, w_dr)):
            j = jnp.minimum(i + offset, 15)
            error = error.at[j].add(jnp.where(wgt > 0, diff * wgt, 0.0))
        return error, q

    error0 = jnp.zeros_like(values)
    _, qs = lax.scan(step, error0, jnp.arange(16))
    return qs  # [16, NB, C]


def _quantize565_planes(r, g, b):
    """Quantize channel planes to the 565 grid as floats (BC.cpp:433)."""
    return (jnp.floor(r * 31.0 + 0.5) * _INV5,
            jnp.floor(g * 63.0 + 0.5) * _INV6,
            jnp.floor(b * 31.0 + 0.5) * _INV5)


def _encode565_planes(r, g, b):
    cr = jnp.clip(r, 0.0, 1.0)
    cg = jnp.clip(g, 0.0, 1.0)
    cb = jnp.clip(b, 0.0, 1.0)
    return ((jnp.floor(cr * 31.0 + 0.5).astype(jnp.uint32) << 11)
            | (jnp.floor(cg * 63.0 + 0.5).astype(jnp.uint32) << 5)
            | jnp.floor(cb * 31.0 + 0.5).astype(jnp.uint32))


def _decode565_planes(w):
    return (((w >> 11) & 31).astype(jnp.float32) * _INV5,
            ((w >> 5) & 63).astype(jnp.float32) * _INV6,
            (w & 31).astype(jnp.float32) * _INV5)


def _encode_bc1_core(color: jnp.ndarray, alpha: jnp.ndarray, color_key: bool,
                     threshold: float, flags: int) -> jnp.ndarray:
    """EncodeBC1 (BC.cpp:370). color [NB,16,3] straight RGB, alpha [NB,16].
    Returns packed [NB, 8] u8 blocks."""
    nb = color.shape[0]
    uniform = bool(flags & BC_FLAGS_UNIFORM)
    dither = bool(flags & BC_FLAGS_DITHER_RGB)

    # lane-major planes
    ct = jnp.transpose(jnp.asarray(color, jnp.float32), (1, 2, 0))  # [16,3,NB]
    at = jnp.transpose(jnp.asarray(alpha, jnp.float32), (1, 0))    # [16,NB]
    pr, pg, pb = ct[:, 0], ct[:, 1], ct[:, 2]

    if color_key:
        transparent = at < threshold
        n_key = jnp.sum(transparent, axis=0)
        all_key = n_key == 16
        three = n_key > 0
    else:
        transparent = jnp.zeros_like(at, bool)
        all_key = jnp.zeros(nb, bool)
        three = jnp.zeros(nb, bool)

    # 565-grid quantization (+ optional FS dithering), BC.cpp:408-490
    if dither:
        q = _fs_dither_quantize(
            jnp.stack([pr, pg, pb], axis=-1),
            lambda v: jnp.stack(_quantize565_planes(v[..., 0], v[..., 1],
                                                    v[..., 2]), axis=-1))
        qr, qg, qb = q[..., 0], q[..., 1], q[..., 2]
    else:
        qr, qg, qb = _quantize565_planes(pr, pg, pb)
    if not uniform:
        qr, qg, qb = qr * _LUM[0], qg * _LUM[1], qb * _LUM[2]
        wr, wg, wb = pr * _LUM[0], pg * _LUM[1], pb * _LUM[2]
    else:
        wr, wg, wb = pr, pg, pb

    # endpoint optimization; both step counts, select per block
    (X4r, X4g, X4b), (Y4r, Y4g, Y4b) = _optimize_rgb_t(qr, qg, qb, 4, uniform)
    if color_key:
        (X3r, X3g, X3b), (Y3r, Y3g, Y3b) = _optimize_rgb_t(qr, qg, qb, 3, uniform)
        Xr = jnp.where(three, X3r, X4r); Xg = jnp.where(three, X3g, X4g)
        Xb = jnp.where(three, X3b, X4b)
        Yr = jnp.where(three, Y3r, Y4r); Yg = jnp.where(three, Y3g, Y4g)
        Yb = jnp.where(three, Y3b, Y4b)
    else:
        Xr, Xg, Xb, Yr, Yg, Yb = X4r, X4g, X4b, Y4r, Y4g, Y4b

    inv = (1.0, 1.0, 1.0) if uniform else _LUM_INV
    wA = _encode565_planes(Xr * inv[0], Xg * inv[1], Xb * inv[2])
    wB = _encode565_planes(Yr * inv[0], Yg * inv[1], Yb * inv[2])

    lum = (1.0, 1.0, 1.0) if uniform else _LUM
    cAr, cAg, cAb = _decode565_planes(wA)
    cBr, cBg, cBb = _decode565_planes(wB)
    cAr, cAg, cAb = cAr * lum[0], cAg * lum[1], cAb * lum[2]
    cBr, cBg, cBb = cBr * lum[0], cBg * lum[1], cBb * lum[2]

    # endpoint storage order: 4-color needs w0 > w1; 3-color needs w0 <= w1
    keep = (three == (wA <= wB))
    w0 = jnp.where(keep, wA, wB)
    w1 = jnp.where(keep, wB, wA)
    s0r = jnp.where(keep, cAr, cBr); s0g = jnp.where(keep, cAg, cBg)
    s0b = jnp.where(keep, cAb, cBb)
    s1r = jnp.where(keep, cBr, cAr); s1g = jnp.where(keep, cBg, cAg)
    s1b = jnp.where(keep, cBb, cAb)

    csteps_f = jnp.where(three, 2.0, 3.0)
    dr, dg, db = s1r - s0r, s1g - s0g, s1b - s0b
    lensq = dr * dr + dg * dg + db * db
    fscale = jnp.where(wA != wB,
                       csteps_f / jnp.where(lensq == 0, 1.0, lensq), 0.0)
    dr, dg, db = dr * fscale, dg * fscale, db * fscale

    fdot = (wr - s0r) * dr + (wg - s0g) * dg + (wb - s0b) * db  # [16, NB]
    raw = jnp.clip(jnp.floor(fdot + 0.5).astype(jnp.int32), 0,
                   jnp.where(three, 2, 3))
    # pSteps3 = [0,2,1], pSteps4 = [0,2,3,1]
    m3 = jnp.where(raw == 0, 0, jnp.where(raw == 1, 2, 1))
    m4 = jnp.where(raw == 0, 0, jnp.where(raw == 1, 2,
                   jnp.where(raw == 2, 3, 1)))
    mapped = jnp.where(three, m3, m4)
    istep = jnp.where(fdot <= 0.0, 0,
                      jnp.where(fdot >= csteps_f, 1, mapped))
    istep = jnp.where(transparent & three, 3, istep)
    degen = (~three) & (wA == wB)
    istep = jnp.where(degen, 0, istep)

    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)[:, None]
    bitmap = jnp.sum(istep.astype(jnp.uint32) << shifts, axis=0)

    w0 = jnp.where(all_key, 0x0000, w0)
    w1 = jnp.where(all_key, 0xFFFF, w1)
    bitmap = jnp.where(all_key, jnp.uint32(0xFFFFFFFF), bitmap)

    out = jnp.stack([w0 | (w1 << 16), bitmap], axis=1)  # [NB, 2] u32
    return lax.bitcast_convert_type(out, jnp.uint8).reshape(nb, 8)


def encode_bc1(colors: jnp.ndarray, threshold: float = 0.5,
               flags: int = 0) -> jnp.ndarray:
    """[NB, 16, 4] f32 -> [NB, 8] u8 (D3DXEncodeBC1, BC.cpp:738)."""
    colors = jnp.asarray(colors, jnp.float32)
    return _encode_bc1_core(colors[..., :3], colors[..., 3], True,
                            threshold, flags)


def encode_bc2(colors: jnp.ndarray, flags: int = 0) -> jnp.ndarray:
    """[NB, 16, 4] f32 -> [NB, 16] u8 (D3DXEncodeBC2, BC.cpp:828)."""
    colors = jnp.asarray(colors, jnp.float32)
    nb = colors.shape[0]
    at = jnp.transpose(colors[..., 3], (1, 0))  # [16, NB]
    if flags & BC_FLAGS_DITHER_A:
        q = _fs_dither_quantize(
            at[..., None], lambda v: jnp.floor(v * 15.0 + 0.5) * _INV15)
        codes = jnp.clip(jnp.floor(q[..., 0] * 15.0 + 0.5), 0, 15
                         ).astype(jnp.uint32)
    else:
        codes = jnp.clip(jnp.floor(at * 15.0 + 0.5), 0, 15).astype(jnp.uint32)
    sh = (jnp.arange(8, dtype=jnp.uint32) * 4)[:, None]
    a0 = jnp.sum(codes[:8] << sh, axis=0)
    a1 = jnp.sum(codes[8:] << sh, axis=0)

    rgb = _encode_bc1_core(colors[..., :3], colors[..., 3], False, 0.0, flags)
    rgb_words = lax.bitcast_convert_type(rgb.reshape(nb, 2, 4), jnp.uint32)
    out = jnp.concatenate([a0[:, None], a1[:, None], rgb_words], axis=1)
    return lax.bitcast_convert_type(out, jnp.uint8).reshape(nb, 16)


def encode_bc3(colors: jnp.ndarray, flags: int = 0) -> jnp.ndarray:
    """[NB, 16, 4] f32 -> [NB, 16] u8 (D3DXEncodeBC3, BC.cpp:944)."""
    from .common import optimize_alpha_t

    colors = jnp.asarray(colors, jnp.float32)
    nb = colors.shape[0]
    at = jnp.transpose(colors[..., 3], (1, 0))  # [16, NB]

    # quantize alpha to the A8 grid (+ optional dithering), BC.cpp:957-1005
    if flags & BC_FLAGS_DITHER_A:
        fq = _fs_dither_quantize(
            at[..., None], lambda v: jnp.floor(v * 255.0 + 0.5) * _INV255)
        falpha = fq[..., 0]
    else:
        falpha = jnp.floor(at * 255.0 + 0.5) * _INV255
    fmin = jnp.min(falpha, axis=0)
    fmax = jnp.max(falpha, axis=0)

    all_opaque = fmin == 1.0
    six_steps = (fmin == 0.0) | (fmax == 1.0)

    x6, y6 = optimize_alpha_t(falpha, 6, False)
    x8, y8 = optimize_alpha_t(falpha, 8, False)
    fx = jnp.where(six_steps, x6, x8)
    fy = jnp.where(six_steps, y6, y8)

    bA = jnp.floor(fx * 255.0 + 0.5).astype(jnp.uint32)
    bB = jnp.floor(fy * 255.0 + 0.5).astype(jnp.uint32)
    fA = bA.astype(jnp.float32) * _INV255
    fB = bB.astype(jnp.float32) * _INV255

    degen8 = (~six_steps) & (bA == bB)
    a_lo = jnp.where(six_steps, bA, bB)
    a_hi = jnp.where(six_steps, bB, bA)
    s0 = jnp.where(six_steps, fA, fB)
    s1 = jnp.where(six_steps, fB, fA)

    csteps_f = jnp.where(six_steps, 5.0, 7.0)
    fscale = jnp.where(s0 != s1, csteps_f / (s1 - s0), 0.0)

    # index assignment reads the pre-quantization alpha (BC.cpp:1102)
    fdot = (at - s0) * fscale                      # [16, NB]
    raw = jnp.clip(jnp.floor(fdot + 0.5).astype(jnp.int32), 0,
                   jnp.where(six_steps, 5, 7))
    # pSteps6 = [0,2,3,4,5,1]; pSteps8 = [0,2,3,4,5,6,7,1]
    m6 = jnp.where(raw == 0, 0, jnp.where(raw == 5, 1, raw + 1))
    m8 = jnp.where(raw == 0, 0, jnp.where(raw == 7, 1, raw + 1))
    mapped = jnp.where(six_steps, m6, m8)
    lo6 = jnp.where(at <= s0 * 0.5, 6, 0)
    hi6 = jnp.where(at >= (s1 + 1.0) * 0.5, 7, 1)
    lo = jnp.where(six_steps, lo6, 0)
    hi = jnp.where(six_steps, hi6, 1)
    istep = jnp.where(fdot <= 0.0, lo,
                      jnp.where(fdot >= csteps_f, hi, mapped))

    zero_bits = all_opaque | degen8
    istep = jnp.where(zero_bits, 0, istep)
    a_lo = jnp.where(all_opaque, 0xFF, a_lo)
    a_hi = jnp.where(all_opaque, 0xFF, a_hi)

    sh = (jnp.arange(8, dtype=jnp.uint32) * 3)[:, None]
    half0 = jnp.sum(istep[:8].astype(jnp.uint32) << sh, axis=0)
    half1 = jnp.sum(istep[8:].astype(jnp.uint32) << sh, axis=0)
    word0 = a_lo | (a_hi << 8) | ((half0 & 0xFFFF) << 16)
    word1 = (half0 >> 16) | ((half1 & 0xFFFFFF) << 8)

    rgb = _encode_bc1_core(colors[..., :3], colors[..., 3], False, 0.0, flags)
    rgb_words = lax.bitcast_convert_type(rgb.reshape(nb, 2, 4), jnp.uint32)
    out = jnp.concatenate([word0[:, None], word1[:, None], rgb_words], axis=1)
    return lax.bitcast_convert_type(out, jnp.uint8).reshape(nb, 16)
