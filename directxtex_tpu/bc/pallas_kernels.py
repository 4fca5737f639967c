"""Pallas TPU kernels for the BC encode hot loops.

The XLA path materializes [16, NB] intermediates between the palette-search
steps (each of the K palette entries produces distance planes that round-trip
through HBM between partially-fused kernels). This kernel fuses the whole
search: one pass reads the pixel planes into VMEM, iterates the K palette
entries entirely in registers with a running argmin, and writes only the
[16, NB] index plane and [NB] error row — ~8x less HBM traffic than the
fused-by-XLA version and measured ~5-10x faster at 2K image sizes.

Used when running on real TPUs; the jnp reference implementations in
bc67.py/bc45.py remain the CPU/test path (and the ground truth the kernel
is tested against, tests/test_pallas.py).

Reference behavior: AssignIndices / GeneratePaletteQuantized interpolation
((64-w)*e0 + w*e1 + 32) >> 6 (BC6HBC7.cpp:2030, :3181).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bc67_tables import WEIGHTS2, WEIGHTS3, WEIGHTS4

_WEIGHTS = {2: WEIGHTS2, 3: WEIGHTS3, 4: WEIGHTS4}

# lane tile per grid step; NB is padded to a multiple of this
_TILE = 512


def _use_pallas() -> bool:
    """Pallas path only on real TPUs (tests/CPU use the jnp reference)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pal_weight(k, K: int):
    """round(64k/(K-1)), exactly the g_aWeights2/3/4 tables.

    (128k + K-1) // (2K-2) as an exact multiply-shift — integer division
    lowers to slow software division on the TPU VPU. Exactness over the
    k in [0, K-1] domain is verified in tests/test_pallas.py."""
    m = -(-65536 // (2 * K - 2))
    return ((128 * k + (K - 1)) * m) >> 16


def _project_assign(xs, u0l, u1l, prec: int, lo: int, hi: int):
    """Projection index assignment (same math as bc67._assign_indices_t):
    snap each pixel's 0..64 axis projection to the nearest interpolation
    weight, then exact integer-palette distance for the chosen index.

    xs: per-channel [16, T] int32 pixel planes; u0l/u1l: per-channel [T]
    int32 endpoints. Returns (idx [16, T] int32, dist [16, T] f32)."""
    K = 1 << prec
    d0 = [xs[c] - u0l[c][None, :] for c in range(lo, hi)]
    e = [u1l[c] - u0l[c] for c in range(lo, hi)]
    dot = sum((d * ee[None, :] for d, ee in zip(d0, e)),
              start=jnp.zeros_like(d0[0])).astype(jnp.float32)
    span = sum((ee * ee for ee in e),
               start=jnp.zeros_like(e[0])).astype(jnp.float32)
    p64 = jnp.clip(dot * (64.0 / jnp.where(span > 0, span, 1.0))[None, :],
                   0.0, 64.0)
    kf = jnp.round(p64 * ((K - 1) / 64.0)).astype(jnp.int32)
    kf = jnp.clip(kf, 0, K - 1)
    wk = _pal_weight(kf, K)
    wkp = _pal_weight(jnp.minimum(kf + 1, K - 1), K)
    wkm = _pal_weight(jnp.maximum(kf - 1, 0), K)
    up = (kf < K - 1) & (2.0 * p64 > (wk + wkp).astype(jnp.float32))
    dn = (kf > 0) & (2.0 * p64 < (wk + wkm).astype(jnp.float32))
    idx = jnp.where(up, kf + 1, jnp.where(dn, kf - 1, kf))
    wk = _pal_weight(idx, K)
    dist = jnp.zeros_like(p64)
    for d, ee in zip(d0, e):
        r = (d - ((wk * ee[None, :] + 32) >> 6)).astype(jnp.float32)
        dist = dist + r * r
    return idx, dist


def _assign_kernel(px_ref, u0_ref, u1_ref, mask_ref, idx_ref, err_ref,
                   *, prec: int, ch_start: int, ch_end: int):
    """One NB-tile of the projection-based palette assignment.

    px_ref   [64, T] int32 — channel-major pixel planes (ch*16 + pixel row)
    u0_ref   [4, T]  int32 — unquantized endpoint 0 per channel
    u1_ref   [4, T]  int32
    mask_ref [16, T] float32 — 1.0 where the pixel belongs to the subset
    idx_ref  [16, T] int32 — winning palette index per pixel
    err_ref  [8, T]  float32 — masked total error (row 0; rows 1-7 padding)
    """
    xs = [px_ref[c * 16:(c + 1) * 16, :] for c in range(4)]
    u0l = [u0_ref[c, :] for c in range(4)]
    u1l = [u1_ref[c, :] for c in range(4)]
    idx, dist = _project_assign(xs, u0l, u1l, prec, ch_start, ch_end)
    idx_ref[...] = idx
    err = jnp.sum(dist * mask_ref[...], axis=0, keepdims=True)
    err_ref[...] = jnp.broadcast_to(err, err_ref.shape)


@functools.partial(jax.jit, static_argnames=("prec", "ch_start", "ch_end",
                                             "interpret"))
def assign_indices_pallas(px_i: jnp.ndarray, u0: jnp.ndarray,
                          u1: jnp.ndarray, mask: jnp.ndarray,
                          prec: int, ch_start: int = 0, ch_end: int = 4,
                          interpret: bool = False):
    """Fused palette search. px_i [16, 4, NB] int32; u0/u1 [4, NB] int32;
    mask [16, NB] bool. Returns (idx [16, NB] int32, err [NB] float32)."""
    from jax.experimental import pallas as pl

    nb = px_i.shape[2]
    nb_pad = -(-nb // _TILE) * _TILE
    pad = nb_pad - nb

    px_cm = jnp.transpose(px_i, (1, 0, 2)).reshape(64, nb)
    mf = mask.astype(jnp.float32)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))
        u0 = jnp.pad(u0, ((0, 0), (0, pad)))
        u1 = jnp.pad(u1, ((0, 0), (0, pad)))
        mf = jnp.pad(mf, ((0, 0), (0, pad)))

    grid = (nb_pad // _TILE,)
    kern = functools.partial(_assign_kernel, prec=prec,
                             ch_start=ch_start, ch_end=ch_end)
    idx, err8 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((64, _TILE), lambda i: (0, i)),
            pl.BlockSpec((4, _TILE), lambda i: (0, i)),
            pl.BlockSpec((4, _TILE), lambda i: (0, i)),
            pl.BlockSpec((16, _TILE), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((16, _TILE), lambda i: (0, i)),
            pl.BlockSpec((8, _TILE), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
        ],
        interpret=interpret,
    )(px_cm, u0, u1, mf)
    return idx[:, :nb], err8[0, :nb]


# ---------------------------------------------------------------------------
# Whole-subset-evaluation mega-kernel
# ---------------------------------------------------------------------------
# Fuses the full BC7 candidate evaluation (_eval_subset_candidate inner body,
# bc67.py): masked min/max box + diagonal axis pick -> quantize with p-bit
# majority vote -> unquantize -> K-entry palette search -> one least-squares
# endpoint refit -> second palette search -> keep the better. One VMEM pass
# instead of ~10 partially-fused XLA kernels. Mirrors the reference's
# one-thread-group-per-block DirectCompute structure (BC7Encode.hlsl).

_BC7_MODE_STATICS = {
    # mode_id: (rgba_prec, rgba_prec_p, index_prec, shared_p, with_alpha)
    0: ((4, 4, 4, 0), (5, 5, 5, 0), 3, False, False),
    1: ((6, 6, 6, 0), (7, 7, 7, 0), 3, True, False),
    2: ((5, 5, 5, 0), (5, 5, 5, 0), 2, False, False),
    3: ((7, 7, 7, 0), (8, 8, 8, 0), 2, False, False),
    6: ((7, 7, 7, 7), (8, 8, 8, 8), 4, False, True),
    7: ((5, 5, 5, 5), (6, 6, 6, 6), 2, False, True),
}


def _subset_eval_kernel(px_ref, mask_ref, q0_ref, q1_ref, pp_ref, idx_ref,
                        err_ref, *, mode_id: int):
    rgba_prec, rgba_prec_p, iprec, shared_p, with_alpha = \
        _BC7_MODE_STATICS[mode_id]
    w = _WEIGHTS[iprec]
    K = 1 << iprec

    mf = mask_ref[...]                                   # [16, T] f32
    mb = mf > 0.5
    xs = [px_ref[c * 16:(c + 1) * 16, :] for c in range(4)]  # i32
    xf = [x.astype(jnp.float32) for x in xs]

    # masked min/max box + best-diagonal axis pick (OptimizeRGBA init)
    big = jnp.float32(1e9)
    mi = [jnp.min(jnp.where(mb, f, big), axis=0) for f in xf]    # [T]
    ma = [jnp.max(jnp.where(mb, f, -big), axis=0) for f in xf]
    mid = [(a + b) * 0.5 for a, b in zip(mi, ma)]
    ab = [b - a for a, b in zip(mi, ma)]
    nch = 4 if with_alpha else 3
    fab = sum(ab[c] * ab[c] for c in range(nch))
    fab = jnp.where(fab > 0, fab, 1.0)
    pt = [(xf[c] - mid[c][None, :]) * (ab[c] / fab)[None, :] * mf
          for c in range(4)]
    best_score = jnp.full_like(fab, -1.0)
    best_sg = jnp.ones_like(fab)
    best_sb = jnp.ones_like(fab)
    best_sa = jnp.ones_like(fab)
    signs = [(sg, sb, sa) for sg in (1.0, -1.0) for sb in (1.0, -1.0)
             for sa in ((1.0, -1.0) if with_alpha else (1.0,))]
    for sg, sb, sa in signs:
        f = pt[0] + sg * pt[1] + sb * pt[2]
        if with_alpha:
            f = f + sa * pt[3]
        score = jnp.sum(f * f, axis=0)
        better = score > best_score
        best_score = jnp.where(better, score, best_score)
        best_sg = jnp.where(better, sg, best_sg)
        best_sb = jnp.where(better, sb, best_sb)
        best_sa = jnp.where(better, sa, best_sa)

    def flip(lo, hi, sgn):
        return jnp.where(sgn < 0, hi, lo), jnp.where(sgn < 0, lo, hi)

    g0, g1 = flip(mi[1], ma[1], best_sg)
    b0, b1 = flip(mi[2], ma[2], best_sb)
    if with_alpha:
        a0, a1 = flip(mi[3], ma[3], best_sa)
    else:
        a0, a1 = mi[3], ma[3]
    e0 = [mi[0], g0, b0, a0]
    e1 = [ma[0], g1, b1, a1]

    def quantize_u8(c, prec):
        if prec >= 8:
            return c
        return jnp.minimum(c + (1 << (7 - prec)), 255) >> (8 - prec)

    def unquantize(c, prec):
        if prec >= 8:
            return c
        c = (c << (8 - prec)) & 0xFF
        return c | (c >> prec)

    def qpal(e0l, e1l):
        ei0 = [jnp.clip(jnp.round(v), 0, 255).astype(jnp.int32) for v in e0l]
        ei1 = [jnp.clip(jnp.round(v), 0, 255).astype(jnp.int32) for v in e1l]
        q0l, q1l = [], []
        vote0 = jnp.zeros_like(ei0[0])
        vote1 = jnp.zeros_like(ei1[0])
        nvote = 0
        for ch in range(4):
            prec, prec_p = rgba_prec[ch], rgba_prec_p[ch]
            if prec == 0:
                q0l.append(jnp.zeros_like(vote0))
                q1l.append(jnp.zeros_like(vote1))
                continue
            if prec != prec_p:
                f0 = quantize_u8(ei0[ch], prec_p)
                f1 = quantize_u8(ei1[ch], prec_p)
                vote0 = vote0 + (f0 & 1)
                vote1 = vote1 + (f1 & 1)
                nvote += 1
                q0l.append(f0 >> 1)
                q1l.append(f1 >> 1)
            else:
                q0l.append(quantize_u8(ei0[ch], prec))
                q1l.append(quantize_u8(ei1[ch], prec))
        if nvote:
            p0 = (vote0 > (nvote >> 1)).astype(jnp.int32)
            p1 = (vote1 > (nvote >> 1)).astype(jnp.int32)
        else:
            p0 = jnp.zeros_like(ei0[0])
            p1 = p0
        p1u = p0 if shared_p else p1
        u0l, u1l = [], []
        for ch in range(4):
            prec, prec_p = rgba_prec[ch], rgba_prec_p[ch]
            if prec == 0:
                u0l.append(jnp.full_like(p0, 255))
                u1l.append(jnp.full_like(p0, 255))
                continue
            if prec != prec_p:
                u0l.append(unquantize((q0l[ch] << 1) | p0, prec_p))
                u1l.append(unquantize((q1l[ch] << 1) | p1u, prec_p))
            else:
                u0l.append(unquantize(q0l[ch], prec))
                u1l.append(unquantize(q1l[ch], prec))
        idx, dist = _project_assign(xs, u0l, u1l, iprec, 0, 4)
        err = jnp.sum(dist * mf, axis=0)
        return q0l, q1l, p0, p1, idx, err

    q0a, q1a, p0a, p1a, idx_a, err_a = qpal(e0, e1)

    # one least-squares refit round (closed-form normal equations)
    x = jnp.zeros_like(mf)
    for k in range(1, K):
        x = x + jnp.where(idx_a == k, jnp.float32(float(w[k]) / 64.0), 0.0)
    av = (1.0 - x) * mf
    bv = x * mf
    A = jnp.sum(av * av, axis=0)
    B = jnp.sum(av * bv, axis=0)
    C = jnp.sum(bv * bv, axis=0)
    det = A * C - B * B
    ok = jnp.abs(det) > 1e-6
    inv = 1.0 / jnp.where(ok, det, 1.0)
    e0r, e1r = [], []
    for c in range(4):
        r0 = jnp.sum(av * xf[c], axis=0)
        r1 = jnp.sum(bv * xf[c], axis=0)
        n0 = jnp.clip((C * r0 - B * r1) * inv, 0.0, 255.0)
        n1 = jnp.clip((A * r1 - B * r0) * inv, 0.0, 255.0)
        e0r.append(jnp.where(ok, n0, e0[c]))
        e1r.append(jnp.where(ok, n1, e1[c]))

    q0b, q1b, p0b, p1b, idx_b, err_b = qpal(e0r, e1r)

    better = err_b < err_a
    bet16 = better[None, :]
    q0 = [jnp.where(better, q0b[c], q0a[c]) for c in range(4)]
    q1 = [jnp.where(better, q1b[c], q1a[c]) for c in range(4)]
    p0 = jnp.where(better, p0b, p0a)
    p1 = jnp.where(better, p1b, p1a)
    idx = jnp.where(bet16, idx_b, idx_a)
    err = jnp.where(better, err_b, err_a)

    q0_ref[...] = jnp.stack(q0)
    q1_ref[...] = jnp.stack(q1)
    pp = jnp.stack([p0, p1])
    pp_ref[...] = jnp.broadcast_to(
        jnp.concatenate([pp, jnp.zeros_like(pp), jnp.zeros_like(pp),
                         jnp.zeros_like(pp)], axis=0), pp_ref.shape)
    idx_ref[...] = idx
    err_ref[...] = jnp.broadcast_to(err[None, :], err_ref.shape)


@functools.partial(jax.jit, static_argnames=("mode_id", "interpret"))
def subset_eval_pallas(px_i: jnp.ndarray, mask: jnp.ndarray, mode_id: int,
                       interpret: bool = False):
    """Fused subset candidate evaluation.

    px_i [16, 4, NB] int32; mask [16, NB] bool.
    Returns (q0, q1 [4, NB] int32, p0, p1 [NB] int32, idx [16, NB] int32,
    err [NB] float32) — identical to the jnp path in
    bc67._eval_subset_candidate's per-subset body with one refit round."""
    from jax.experimental import pallas as pl

    nb = px_i.shape[2]
    nb_pad = -(-nb // _TILE) * _TILE
    pad = nb_pad - nb

    px_cm = jnp.transpose(px_i, (1, 0, 2)).reshape(64, nb)
    mf = mask.astype(jnp.float32)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))
        mf = jnp.pad(mf, ((0, 0), (0, pad)), constant_values=1.0)

    grid = (nb_pad // _TILE,)
    kern = functools.partial(_subset_eval_kernel, mode_id=mode_id)
    q0, q1, pp, idx, err8 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((64, _TILE), lambda i: (0, i)),
            pl.BlockSpec((16, _TILE), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((4, _TILE), lambda i: (0, i)),
            pl.BlockSpec((4, _TILE), lambda i: (0, i)),
            pl.BlockSpec((8, _TILE), lambda i: (0, i)),
            pl.BlockSpec((16, _TILE), lambda i: (0, i)),
            pl.BlockSpec((8, _TILE), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((4, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((8, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((16, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
        ],
        interpret=interpret,
    )(px_cm, mf)
    return (q0[:, :nb], q1[:, :nb], pp[0, :nb], pp[1, :nb],
            idx[:, :nb], err8[0, :nb])


# ---------------------------------------------------------------------------
# BC6H subset evaluation mega-kernel
# ---------------------------------------------------------------------------
# Fuses _bc6h_eval_candidate's per-subset body (bc67.py): masked min/max
# endpoints in F16-int space -> Quantize -> palette error against the
# FINISHED palette (Unquantize + FinishUnquantize, BC6HBC7.cpp:1892-1940,
# :2028) -> two least-squares refit rounds -> keep best. The fit/delta checks
# and bit emission stay in XLA.

from .bc67_tables import BC6H_MODE_INFO

_F16MAX = 0x7BFF


def _idiv_f16max1(a):
    """Exact a // 31744 for 0 <= a < 2^30 without integer division: f32
    reciprocal estimate (quotient <= 2^15 so the f32 error is << 1) plus a
    +-1 correction step."""
    q = jnp.floor(a.astype(jnp.float32)
                  * jnp.float32(1.0 / 31744.0)).astype(jnp.int32)
    r = a - q * 31744
    q = q + (r >= 31744).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q


def _bc6h_eval_kernel(px_ref, mask_ref, q0_ref, q1_ref, idx_ref, err_ref,
                      *, row: int, signed: bool):
    _, partitions, transformed, iprec, precW, precX, precY, precZ = \
        BC6H_MODE_INFO[row]
    w = _WEIGHTS[iprec]
    K = 1 << iprec

    mf = mask_ref[...]                                   # [16, T]
    mb = mf > 0.5
    xs = [px_ref[c * 16:(c + 1) * 16, :] for c in range(3)]   # i32 F16-int
    xf = [x.astype(jnp.float32) for x in xs]

    big = jnp.float32(1e9)
    mi = [jnp.min(jnp.where(mb, f, big), axis=0) for f in xf]
    ma = [jnp.max(jnp.where(mb, f, -big), axis=0) for f in xf]

    def quantize(v, prec):
        # D3DX_BC6H::Quantize (BC6HBC7.cpp:1864)
        if signed:
            s = v < 0
            a = jnp.abs(v)
            q = a if prec >= 16 else _idiv_f16max1(a << (prec - 1))
            return jnp.where(s, -q, q)
        return v if prec >= 15 else _idiv_f16max1(v << prec)

    def unquantize(c, bits):
        if signed:
            if bits >= 16:
                return c
            s = c < 0
            a = jnp.abs(c)
            unq = jnp.where(a == 0, 0,
                            jnp.where(a >= (1 << (bits - 1)) - 1, 0x7FFF,
                                      ((a << 15) + 0x4000) >> (bits - 1)))
            return jnp.where(s, -unq, unq)
        if bits >= 15:
            return c
        return jnp.where(c == 0, 0,
                         jnp.where(c == (1 << bits) - 1, 0xFFFF,
                                   ((c << 16) + 0x8000) >> bits))

    def finish(c):
        if signed:
            return jnp.where(c < 0, -(((-c) * 31) >> 5), (c * 31) >> 5)
        return (c * 31) >> 6

    def quant3(e):
        return [quantize(jnp.round(e[c]).astype(jnp.int32), precW[c], )
                for c in range(3)]

    def palette_err(q0l, q1l):
        # projection onto the finished-endpoint axis (same scheme as
        # bc67._bc6h_palette_err_t): float dot (F16-int products overflow
        # int32), nearest-weight snap, exact integer palette at the winner
        u0 = [unquantize(q0l[c], precW[c]) for c in range(3)]
        u1 = [unquantize(q1l[c], precW[c]) for c in range(3)]
        f0 = [finish(u0[c]).astype(jnp.float32) for c in range(3)]
        f1 = [finish(u1[c]).astype(jnp.float32) for c in range(3)]
        dot = jnp.zeros_like(mf)
        span = jnp.zeros_like(f0[0])
        for c in range(3):
            e = f1[c] - f0[c]
            dot = dot + (xs[c].astype(jnp.float32) - f0[c][None, :]) \
                * e[None, :]
            span = span + e * e
        p64 = jnp.clip(
            dot * (64.0 / jnp.where(span > 0, span, 1.0))[None, :],
            0.0, 64.0)
        kf = jnp.round(p64 * ((K - 1) / 64.0)).astype(jnp.int32)
        kf = jnp.clip(kf, 0, K - 1)
        wk = _pal_weight(kf, K)
        wkp = _pal_weight(jnp.minimum(kf + 1, K - 1), K)
        wkm = _pal_weight(jnp.maximum(kf - 1, 0), K)
        upc = (kf < K - 1) & (2.0 * p64 > (wk + wkp).astype(jnp.float32))
        dnc = (kf > 0) & (2.0 * p64 < (wk + wkm).astype(jnp.float32))
        idx = jnp.where(upc, kf + 1, jnp.where(dnc, kf - 1, kf))
        wk = _pal_weight(idx, K)
        best = jnp.zeros_like(mf)
        for c in range(3):
            pal = finish((u0[c][None, :] * (64 - wk)
                          + u1[c][None, :] * wk + 32) >> 6)
            d = (xs[c] - pal).astype(jnp.float32)
            best = best + d * d
        err = jnp.sum(jnp.where(mb, best, 0.0), axis=0)
        return idx, err

    q0 = quant3(mi)
    q1 = quant3(ma)
    idx, err = palette_err(q0, q1)

    e0f, e1f = mi, ma
    q0b, q1b, idx_b, err_b = q0, q1, idx, err
    lim = float(_F16MAX)
    lo = -lim if signed else 0.0
    for _ in range(2):
        x = jnp.zeros_like(mf)
        for k in range(1, K):
            x = x + jnp.where(idx_b == k, jnp.float32(float(w[k]) / 64.0),
                              0.0)
        av = (1.0 - x) * mf
        bv = x * mf
        A = jnp.sum(av * av, axis=0)
        B = jnp.sum(av * bv, axis=0)
        C = jnp.sum(bv * bv, axis=0)
        det = A * C - B * B
        ok = jnp.abs(det) > 1e-6
        inv = 1.0 / jnp.where(ok, det, 1.0)
        rows0, rows1 = [], []
        for c in range(3):
            r0 = jnp.sum(av * xf[c], axis=0)
            r1 = jnp.sum(bv * xf[c], axis=0)
            n0 = jnp.clip((C * r0 - B * r1) * inv, lo, lim)
            n1 = jnp.clip((A * r1 - B * r0) * inv, lo, lim)
            rows0.append(jnp.where(ok, n0, e0f[c]))
            rows1.append(jnp.where(ok, n1, e1f[c]))
        e0f, e1f = rows0, rows1
        q0b = quant3(e0f)
        q1b = quant3(e1f)
        idx_b, err_b = palette_err(q0b, q1b)
    better = err_b < err
    bet16 = better[None, :]
    q0 = [jnp.where(better, q0b[c], q0[c]) for c in range(3)]
    q1 = [jnp.where(better, q1b[c], q1[c]) for c in range(3)]
    idx = jnp.where(bet16, idx_b, idx)
    err = jnp.minimum(err_b, err)

    zero = jnp.zeros_like(q0[0])
    q0_ref[...] = jnp.stack(q0 + [zero])
    q1_ref[...] = jnp.stack(q1 + [zero])
    idx_ref[...] = idx
    err_ref[...] = jnp.broadcast_to(err[None, :], err_ref.shape)


@functools.partial(jax.jit, static_argnames=("row", "signed", "interpret"))
def bc6h_eval_pallas(px_int: jnp.ndarray, mask: jnp.ndarray, row: int,
                     signed: bool, interpret: bool = False):
    """Fused BC6H subset evaluation. px_int [16, 3, NB] int32 (F16-int
    space); mask [16, NB] bool. Returns (q0, q1 [3, NB] int32 quantized
    endpoint codes, idx [16, NB] int32, err [NB] float32)."""
    from jax.experimental import pallas as pl

    nb = px_int.shape[2]
    nb_pad = -(-nb // _TILE) * _TILE
    pad = nb_pad - nb

    px_cm = jnp.transpose(px_int, (1, 0, 2)).reshape(48, nb)
    mf = mask.astype(jnp.float32)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))
        mf = jnp.pad(mf, ((0, 0), (0, pad)), constant_values=1.0)

    grid = (nb_pad // _TILE,)
    kern = functools.partial(_bc6h_eval_kernel, row=row, signed=signed)
    q0, q1, idx, err8 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((48, _TILE), lambda i: (0, i)),
            pl.BlockSpec((16, _TILE), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((4, _TILE), lambda i: (0, i)),
            pl.BlockSpec((4, _TILE), lambda i: (0, i)),
            pl.BlockSpec((16, _TILE), lambda i: (0, i)),
            pl.BlockSpec((8, _TILE), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((4, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((16, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
        ],
        interpret=interpret,
    )(px_cm, mf)
    return q0[:3, :nb], q1[:3, :nb], idx[:, :nb], err8[0, :nb]


# ---------------------------------------------------------------------------
# BC7 dual-index (modes 4/5) mega-kernel
# ---------------------------------------------------------------------------
# Fuses the dual-index candidate evaluation from bc67._try_single_mode:
# RGB axis endpoints + alpha min/max, quantize, separate color (RGB) and
# alpha palette searches at different precisions, per-group least-squares
# refits, second evaluation, keep-best. Rotation handling (channel swap) and
# the independent RGB/A anchor fix-ups stay outside.

_BC7_DUAL_STATICS = {
    # mode_id: (rgba_prec, rgba_prec_p, index_prec, index_prec2)
    4: ((5, 5, 5, 6), (5, 5, 5, 6), 2, 3),
    5: ((7, 7, 7, 8), (7, 7, 7, 8), 2, 2),
}


def _dual_eval_kernel(px_ref, q0_ref, q1_ref, cidx_ref, aidx_ref, err_ref,
                      *, mode_id: int, im: int):
    rgba_prec, rgba_prec_p, prec1, prec2 = _BC7_DUAL_STATICS[mode_id]
    cprec = prec2 if im else prec1
    aprec = prec1 if im else prec2
    wc = _WEIGHTS[cprec]
    wa = _WEIGHTS[aprec]

    xs = [px_ref[c * 16:(c + 1) * 16, :] for c in range(4)]
    xf = [x.astype(jnp.float32) for x in xs]

    # RGB axis fit (mask = all ones for single-subset modes) + alpha min/max
    mi = [jnp.min(f, axis=0) for f in xf]
    ma = [jnp.max(f, axis=0) for f in xf]
    mid = [(a + b) * 0.5 for a, b in zip(mi, ma)]
    ab = [b - a for a, b in zip(mi, ma)]
    fab = sum(ab[c] * ab[c] for c in range(3))
    fab = jnp.where(fab > 0, fab, 1.0)
    pt = [(xf[c] - mid[c][None, :]) * (ab[c] / fab)[None, :]
          for c in range(3)]
    best_score = jnp.full_like(fab, -1.0)
    best_sg = jnp.ones_like(fab)
    best_sb = jnp.ones_like(fab)
    for sg in (1.0, -1.0):
        for sb in (1.0, -1.0):
            f = pt[0] + sg * pt[1] + sb * pt[2]
            score = jnp.sum(f * f, axis=0)
            better = score > best_score
            best_score = jnp.where(better, score, best_score)
            best_sg = jnp.where(better, sg, best_sg)
            best_sb = jnp.where(better, sb, best_sb)
    g0 = jnp.where(best_sg < 0, ma[1], mi[1])
    g1 = jnp.where(best_sg < 0, mi[1], ma[1])
    b0 = jnp.where(best_sb < 0, ma[2], mi[2])
    b1 = jnp.where(best_sb < 0, mi[2], ma[2])
    e0 = [mi[0], g0, b0, mi[3]]
    e1 = [ma[0], g1, b1, ma[3]]

    def quantize_u8(c, prec):
        if prec >= 8:
            return c
        return jnp.minimum(c + (1 << (7 - prec)), 255) >> (8 - prec)

    def unquantize(c, prec):
        if prec >= 8:
            return c
        c = (c << (8 - prec)) & 0xFF
        return c | (c >> prec)

    def qpal(e0l, e1l):
        q0l = [quantize_u8(jnp.clip(jnp.round(e0l[c]), 0, 255)
                           .astype(jnp.int32), rgba_prec[c])
               for c in range(4)]
        q1l = [quantize_u8(jnp.clip(jnp.round(e1l[c]), 0, 255)
                           .astype(jnp.int32), rgba_prec[c])
               for c in range(4)]
        u0l = [unquantize(q0l[c], rgba_prec[c]) for c in range(4)]
        u1l = [unquantize(q1l[c], rgba_prec[c]) for c in range(4)]
        cidx, cdist = _project_assign(xs, u0l, u1l, cprec, 0, 3)
        cerr = jnp.sum(cdist, axis=0)
        aidx, adist = _project_assign(xs, u0l, u1l, aprec, 3, 4)
        aerr = jnp.sum(adist, axis=0)
        return q0l, q1l, cidx, aidx, cerr + aerr

    def refit(idx, wtab, K, lo_ch, hi_ch, e0l, e1l):
        x = jnp.zeros_like(xf[0])
        for k in range(1, K):
            x = x + jnp.where(idx == k, jnp.float32(float(wtab[k]) / 64.0),
                              0.0)
        av = 1.0 - x
        bv = x
        A = jnp.sum(av * av, axis=0)
        B = jnp.sum(av * bv, axis=0)
        C = jnp.sum(bv * bv, axis=0)
        det = A * C - B * B
        ok = jnp.abs(det) > 1e-6
        inv = 1.0 / jnp.where(ok, det, 1.0)
        e0n = list(e0l)
        e1n = list(e1l)
        for c in range(lo_ch, hi_ch):
            r0 = jnp.sum(av * xf[c], axis=0)
            r1 = jnp.sum(bv * xf[c], axis=0)
            n0 = jnp.clip((C * r0 - B * r1) * inv, 0.0, 255.0)
            n1 = jnp.clip((A * r1 - B * r0) * inv, 0.0, 255.0)
            e0n[c] = jnp.where(ok, n0, e0l[c])
            e1n[c] = jnp.where(ok, n1, e1l[c])
        return e0n, e1n

    q0a, q1a, cidx_a, aidx_a, err_a = qpal(e0, e1)
    e0c, e1c = refit(cidx_a, wc, 1 << cprec, 0, 3, e0, e1)
    e0c, e1c = refit(aidx_a, wa, 1 << aprec, 3, 4, e0c, e1c)
    q0b, q1b, cidx_b, aidx_b, err_b = qpal(e0c, e1c)

    better = err_b < err_a
    bet16 = better[None, :]
    q0 = [jnp.where(better, q0b[c], q0a[c]) for c in range(4)]
    q1 = [jnp.where(better, q1b[c], q1a[c]) for c in range(4)]
    cidx = jnp.where(bet16, cidx_b, cidx_a)
    aidx = jnp.where(bet16, aidx_b, aidx_a)
    err = jnp.minimum(err_b, err_a)

    q0_ref[...] = jnp.stack(q0)
    q1_ref[...] = jnp.stack(q1)
    cidx_ref[...] = cidx
    aidx_ref[...] = aidx
    err_ref[...] = jnp.broadcast_to(err[None, :], err_ref.shape)


@functools.partial(jax.jit, static_argnames=("mode_id", "im", "interpret"))
def dual_eval_pallas(px_i: jnp.ndarray, mode_id: int, im: int,
                     interpret: bool = False):
    """Fused BC7 mode-4/5 dual-index evaluation (rotation applied by the
    caller). px_i [16, 4, NB] int32. Returns (q0, q1 [4, NB] int32, cidx,
    aidx [16, NB] int32, err [NB] float32)."""
    from jax.experimental import pallas as pl

    nb = px_i.shape[2]
    nb_pad = -(-nb // _TILE) * _TILE
    pad = nb_pad - nb

    px_cm = jnp.transpose(px_i, (1, 0, 2)).reshape(64, nb)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))

    grid = (nb_pad // _TILE,)
    kern = functools.partial(_dual_eval_kernel, mode_id=mode_id, im=im)
    q0, q1, cidx, aidx, err8 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((64, _TILE), lambda i: (0, i))],
        out_specs=[
            pl.BlockSpec((4, _TILE), lambda i: (0, i)),
            pl.BlockSpec((4, _TILE), lambda i: (0, i)),
            pl.BlockSpec((16, _TILE), lambda i: (0, i)),
            pl.BlockSpec((16, _TILE), lambda i: (0, i)),
            pl.BlockSpec((8, _TILE), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((4, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((16, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((16, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
        ],
        interpret=interpret,
    )(px_cm)
    return (q0[:, :nb], q1[:, :nb], cidx[:, :nb], aidx[:, :nb],
            err8[0, :nb])
