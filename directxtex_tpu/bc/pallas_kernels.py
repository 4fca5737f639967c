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

from .bc67 import _MODE4_IMS, _ON_AXIS_W, _POWER_ITERS
from .bc67_tables import WEIGHTS2, WEIGHTS3, WEIGHTS4

_WEIGHTS = {2: WEIGHTS2, 3: WEIGHTS3, 4: WEIGHTS4}

# lane tile per grid step; NB is padded to a multiple of this
_TILE = 512
# decode mega-kernels: measured on v5e at 2K random blocks — BC6H 512 ->
# 1.4-1.8, 1024 -> 2.0, 256 -> 3.48 Gtexels/s; BC7 512 -> 2.40, 256 -> 2.55
_DEC_TILE = 256


def _compiler_params(interpret: bool):
    """Mark the (only) grid dimension parallel: every tile is independent,
    so Mosaic may split the grid across TensorCores on multi-core chips
    (v5p has 2 per chip; neutral on the 1-core v5e). Interpret mode takes
    no TPU params."""
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(dimension_semantics=("parallel",))


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


def _pal_weight_f(kf, K: int):
    """_pal_weight on an f32 index plane, staying in f32: floor(64k/(K-1)
    + 1/2) with k in 0..15 — the f32 quotient error (~2^-22) never crosses
    a rounding boundary since exact quotients sit on a 1/(K-1) grid,
    >= 1/30 away from any .5. Keeps the hot palette math on native f32
    multiplies instead of (emulated) 32-bit integer multiplies."""
    return jnp.floor(kf * (64.0 / (K - 1)) + 0.5)


def _k_sel_px(masks, vals):
    """Per-pixel [16, T] select of per-subset [T] rows (masks disjoint)."""
    out = jnp.broadcast_to(vals[0][None, :], masks[0].shape)
    for p in range(1, len(vals)):
        out = jnp.where(masks[p], vals[p][None, :], out)
    return out


def _proj_p64(xf, u0l, u1l, lo: int, hi: int):
    """Axis projection planes for _project_assign: depends only on the
    endpoints, NOT the index precision, so modes-4/5 index-mode pairs can
    share one projection. All math in f32: pixel values, endpoints, and
    their products stay < 2^24, so every intermediate is exact while the
    multiplies run native on the VPU (a 32-bit integer multiply is
    emulated, ~1.6x slower; see benchmarks/micro_intvsf32.py).
    xf: per-channel [16, T] f32 planes; u0l/u1l: per-channel [T] i32 or
    f32 endpoint rows. Returns (d0, e, p64), all f32."""
    u0f = [u0l[c].astype(jnp.float32) for c in range(lo, hi)]
    u1f = [u1l[c].astype(jnp.float32) for c in range(lo, hi)]
    d0 = [x - u[None, :] for x, u in zip(xf[lo:hi], u0f)]
    e = [b - a for a, b in zip(u0f, u1f)]
    dot = sum((d * ee[None, :] for d, ee in zip(d0, e)),
              start=jnp.zeros_like(d0[0]))
    span = sum((ee * ee for ee in e), start=jnp.zeros_like(e[0]))
    p64 = jnp.clip(dot * (64.0 / jnp.where(span > 0, span, 1.0))[None, :],
                   0.0, 64.0)
    return d0, e, p64


def _snap_dist(d0, e, p64, prec: int, lo: int,
               aw: float = 1.0, alpha_ch: int = 3, w_rows=None):
    """Snap projections to palette weights + exact palette distance.
    f32 throughout (exact: products < 2^24; floor(v/64 + .5) reproduces
    the integer (v + 32) >> 6 for both signs). Returns idx as an
    integer-valued f32 plane — emit converts once at the end."""
    K = 1 << prec
    kf = jnp.clip(jnp.round(p64 * ((K - 1) / 64.0)), 0.0, K - 1.0)
    wk = _pal_weight_f(kf, K)
    wkp = _pal_weight_f(jnp.minimum(kf + 1.0, K - 1.0), K)
    wkm = _pal_weight_f(jnp.maximum(kf - 1.0, 0.0), K)
    up = (kf < K - 1) & (2.0 * p64 > wk + wkp)
    dn = (kf > 0) & (2.0 * p64 < wk + wkm)
    idx = jnp.where(up, kf + 1.0, jnp.where(dn, kf - 1.0, kf))
    wk = _pal_weight_f(idx, K)
    dist = jnp.zeros_like(p64)
    for c, (d, ee) in enumerate(zip(d0, e), start=lo):
        r = d - jnp.floor(wk * ee[None, :] * jnp.float32(1 / 64) + 0.5)
        # alpha weighting hits the scoring only, like the projection-
        # unweighted reference shader (BC7Encode.hlsl:239-241). w_rows:
        # per-channel [T] weights for the refine pass, whose alpha
        # channel is per-lane under modes 4/5 rotation.
        if w_rows is not None:
            dist = dist + r * r * w_rows[c][None, :]
        else:
            dist = dist + (r * r if (c != alpha_ch or aw == 1.0)
                           else r * r * aw)
    return idx, dist


def _project_assign(xf, u0l, u1l, prec: int, lo: int, hi: int,
                    aw: float = 1.0, alpha_ch: int = 3):
    """Projection index assignment (same math as bc67._assign_indices_t):
    snap each pixel's 0..64 axis projection to the nearest interpolation
    weight, then exact palette distance for the chosen index.

    xf: per-channel [16, T] f32 pixel planes; u0l/u1l: per-channel [T]
    endpoint rows. Returns (idx [16, T] f32, dist [16, T] f32)."""
    d0, e, p64 = _proj_p64(xf, u0l, u1l, lo, hi)
    return _snap_dist(d0, e, p64, prec, lo, aw=aw, alpha_ch=alpha_ch)


def _project_assign_px(xf, u0px, u1px, e_px, span_px, prec: int,
                       lo: int = 0, hi: int = 4, aw: float = 1.0):
    """_project_assign with per-pixel endpoint planes: u0px/u1px/e_px are
    per-channel [16, T] (or [1, T]-broadcast) f32, span_px [16, T] f32.
    One pass serves every subset of a shape candidate simultaneously —
    identical math to running _project_assign per subset and masking."""
    K = 1 << prec
    d0 = [xf[c] - u0px[c] for c in range(lo, hi)]
    dot = sum((d * e for d, e in zip(d0, (e_px[c] for c in range(lo, hi)))),
              start=jnp.zeros_like(d0[0]))
    p64 = jnp.clip(dot * (64.0 / jnp.where(span_px > 0, span_px, 1.0)),
                   0.0, 64.0)
    kf = jnp.clip(jnp.round(p64 * ((K - 1) / 64.0)), 0.0, K - 1.0)
    wk = _pal_weight_f(kf, K)
    wkp = _pal_weight_f(jnp.minimum(kf + 1.0, K - 1.0), K)
    wkm = _pal_weight_f(jnp.maximum(kf - 1.0, 0.0), K)
    up = (kf < K - 1) & (2.0 * p64 > wk + wkp)
    dn = (kf > 0) & (2.0 * p64 < wk + wkm)
    idx = jnp.where(up, kf + 1.0, jnp.where(dn, kf - 1.0, kf))
    wk = _pal_weight_f(idx, K)
    dist = jnp.zeros_like(p64)
    for c, d in zip(range(lo, hi), d0):
        r = d - jnp.floor(wk * e_px[c] * jnp.float32(1 / 64) + 0.5)
        dist = dist + (r * r if (c != 3 or aw == 1.0) else r * r * aw)
    return idx, dist


def _project_assign_px_dyn(xf, u0px, e_px, span_px, km1, fK,
                           aw: float = 1.0):
    """_project_assign_px with a per-lane index precision: km1 [T] f32
    holds K-1 (7 for 3-bit, 3 for 2-bit indices), fK [T] f32 holds the
    SAME np.float32(64/(K-1)) constants the static helper bakes in, so
    each lane's arithmetic is bit-identical to _project_assign_px at
    its K. km1 * (1/64) is exact in f32 (power-of-two denominator),
    matching the static (K-1)/64.0 literal."""
    d0 = [xf[c] - u0px[c] for c in range(4)]
    dot = sum((d * e_px[c] for c, d in enumerate(d0)),
              start=jnp.zeros_like(d0[0]))
    p64 = jnp.clip(dot * (64.0 / jnp.where(span_px > 0, span_px, 1.0)),
                   0.0, 64.0)
    km1p = km1[None, :]
    fKp = fK[None, :]
    kf = jnp.clip(jnp.round(p64 * (km1p * jnp.float32(1 / 64))),
                  0.0, km1p)
    wk = jnp.floor(kf * fKp + 0.5)
    wkp = jnp.floor(jnp.minimum(kf + 1.0, km1p) * fKp + 0.5)
    wkm = jnp.floor(jnp.maximum(kf - 1.0, 0.0) * fKp + 0.5)
    up = (kf < km1p) & (2.0 * p64 > wk + wkp)
    dn = (kf > 0) & (2.0 * p64 < wk + wkm)
    idx = jnp.where(up, kf + 1.0, jnp.where(dn, kf - 1.0, kf))
    wk = jnp.floor(idx * fKp + 0.5)
    dist = jnp.zeros_like(p64)
    for c, d in enumerate(d0):
        r = d - jnp.floor(wk * e_px[c] * jnp.float32(1 / 64) + 0.5)
        dist = dist + (r * r if (c != 3 or aw == 1.0) else r * r * aw)
    return idx, dist


def _snap_dist_dyn(d0, e, p64, km1, fK, lo: int,
                   aw: float = 1.0, alpha_ch: int = 3, w_rows=None):
    """_snap_dist with a per-lane index precision: km1/fK [T] f32 rows
    hold the SAME f32 constants the static helper bakes in at each
    lane's K (see _project_assign_px_dyn), so each lane is bit-identical
    to _snap_dist at its precision. Serves the unified modes-4/5 refine,
    whose color/alpha index widths are per-lane (index-mode swap)."""
    km1p = km1[None, :]
    fKp = fK[None, :]
    kf = jnp.clip(jnp.round(p64 * (km1p * jnp.float32(1 / 64))),
                  0.0, km1p)
    wk = jnp.floor(kf * fKp + 0.5)
    wkp = jnp.floor(jnp.minimum(kf + 1.0, km1p) * fKp + 0.5)
    wkm = jnp.floor(jnp.maximum(kf - 1.0, 0.0) * fKp + 0.5)
    up = (kf < km1p) & (2.0 * p64 > wk + wkp)
    dn = (kf > 0) & (2.0 * p64 < wk + wkm)
    idx = jnp.where(up, kf + 1.0, jnp.where(dn, kf - 1.0, kf))
    wk = jnp.floor(idx * fKp + 0.5)
    dist = jnp.zeros_like(p64)
    for c, (d, ee) in enumerate(zip(d0, e), start=lo):
        r = d - jnp.floor(wk * ee[None, :] * jnp.float32(1 / 64) + 0.5)
        if w_rows is not None:
            dist = dist + r * r * w_rows[c][None, :]
        else:
            dist = dist + (r * r if (c != alpha_ch or aw == 1.0)
                           else r * r * aw)
    return idx, dist


# per-mode statics for the kernel helpers
# mode_id: (rgba_prec, rgba_prec_p, index_prec, shared_p, with_alpha)
_BC7_MODE_STATICS = {
    # mode_id: (rgba_prec, rgba_prec_p, index_prec, shared_p, with_alpha)
    0: ((4, 4, 4, 0), (5, 5, 5, 0), 3, False, False),
    1: ((6, 6, 6, 0), (7, 7, 7, 0), 3, True, False),
    2: ((5, 5, 5, 0), (5, 5, 5, 0), 2, False, False),
    3: ((7, 7, 7, 0), (8, 8, 8, 0), 2, False, False),
    6: ((7, 7, 7, 7), (8, 8, 8, 8), 4, False, True),
    7: ((5, 5, 5, 5), (6, 6, 6, 6), 2, False, True),
}


# ---------------------------------------------------------------------------
# Whole-mode mega-kernels
# ---------------------------------------------------------------------------
# One kernel call per BC7 mode family: every shape/rotation/index-mode
# candidate is evaluated in VMEM and the winning candidate's 128-bit block
# is emitted inside the kernel. HBM sees only the pixel planes in and
# (err, words) out — the per-candidate endpoint/index planes that the
# per-subset kernels round-tripped never leave the chip. This is the
# reference's own DirectCompute structure (one thread group owns a block
# through all passes, BC7Encode.hlsl) pushed one level further.

# mode_id -> (partitions, partition_bits, p_bits, rot_bits, im_bits,
#             index_prec, index_prec2, rgba_prec, rgba_prec_p)  (ms_aInfo)
_BC7_FULL_STATICS = {
    0: (2, 4, 6, 0, 0, 3, 0, (4, 4, 4, 0), (5, 5, 5, 0)),
    1: (1, 6, 2, 0, 0, 3, 0, (6, 6, 6, 0), (7, 7, 7, 0)),
    2: (2, 6, 0, 0, 0, 2, 0, (5, 5, 5, 0), (5, 5, 5, 0)),
    3: (1, 6, 4, 0, 0, 2, 0, (7, 7, 7, 0), (8, 8, 8, 0)),
    4: (0, 0, 0, 2, 1, 2, 3, (5, 5, 5, 6), (5, 5, 5, 6)),
    5: (0, 0, 0, 2, 0, 2, 2, (7, 7, 7, 8), (7, 7, 7, 8)),
    6: (0, 0, 2, 0, 0, 4, 0, (7, 7, 7, 7), (8, 8, 8, 8)),
    7: (1, 6, 4, 0, 0, 2, 0, (5, 5, 5, 5), (6, 6, 6, 6)),
}


def _k_quant_u8(c, prec):
    if prec >= 8:
        return c
    return jnp.minimum(c + (1 << (7 - prec)), 255) >> (8 - prec)


def _k_unquant(c, prec):
    if prec >= 8:
        return c
    c = (c << (8 - prec)) & 0xFF
    return c | (c >> prec)


def _k_axis(xf, mf, with_alpha: bool):
    """Masked min/max box + best-diagonal axis pick (OptimizeRGBA init,
    same math as bc67._minmax_axis_endpoints_t). xf: 4x [16, T] f32;
    mf: [16, T] f32 mask or None (all ones). Returns e0, e1 lists [T]."""
    if mf is None:
        mi = [jnp.min(f, axis=0) for f in xf]
        ma = [jnp.max(f, axis=0) for f in xf]
    else:
        mb = mf > 0.5
        big = jnp.float32(1e9)
        mi = [jnp.min(jnp.where(mb, f, big), axis=0) for f in xf]
        ma = [jnp.max(jnp.where(mb, f, -big), axis=0) for f in xf]
    mid = [(a + b) * 0.5 for a, b in zip(mi, ma)]
    ab = [b - a for a, b in zip(mi, ma)]
    nch = 4 if with_alpha else 3
    fab = sum(ab[c] * ab[c] for c in range(nch))
    fab = jnp.where(fab > 0, fab, 1.0)
    pt = [(xf[c] - mid[c][None, :]) * (ab[c] / fab)[None, :] for c in range(4)]
    if mf is not None:
        pt = [p * mf for p in pt]
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
    return [mi[0], g0, b0, a0], [ma[0], g1, b1, a1]


def _k_axis_multi(xf, masks, with_alpha: bool):
    """_k_axis for every subset of one shape candidate in a single fused
    pass: the per-pixel centered/scaled planes and the per-sign diagonal
    planes are computed once, with per-subset masked score reductions.
    masks: list of [16, T] bool (or [None] for a single full subset).
    Returns (e0_s, e1_s): per-subset lists of 4 [T] endpoint channels."""
    n_sub = len(masks)
    single = masks[0] is None
    big = jnp.float32(1e9)
    mi_s, ma_s = [], []
    for mb in masks:
        if mb is None:
            mi_s.append([jnp.min(f, axis=0) for f in xf])
            ma_s.append([jnp.max(f, axis=0) for f in xf])
        else:
            mi_s.append([jnp.min(jnp.where(mb, f, big), axis=0) for f in xf])
            ma_s.append([jnp.max(jnp.where(mb, f, -big), axis=0) for f in xf])

    nch = 4 if with_alpha else 3
    scale_s = []
    for p in range(n_sub):
        ab = [ma_s[p][c] - mi_s[p][c] for c in range(4)]
        fab = sum(ab[c] * ab[c] for c in range(nch))
        fab = jnp.where(fab > 0, fab, 1.0)
        scale_s.append([ab[c] / fab for c in range(4)])

    if single:
        mid_px = [((mi_s[0][c] + ma_s[0][c]) * 0.5)[None, :]
                  for c in range(4)]
        scl_px = [scale_s[0][c][None, :] for c in range(4)]
    else:
        mid_px = [_k_sel_px(masks, [(mi_s[p][c] + ma_s[p][c]) * 0.5
                                    for p in range(n_sub)]) for c in range(4)]
        scl_px = [_k_sel_px(masks, [scale_s[p][c] for p in range(n_sub)])
                  for c in range(4)]
    pt = [(xf[c] - mid_px[c]) * scl_px[c] for c in range(4)]

    zero = jnp.zeros_like(mi_s[0][0])
    best_score = [jnp.full_like(zero, -1.0) for _ in range(n_sub)]
    best_sg = [jnp.ones_like(zero) for _ in range(n_sub)]
    best_sb = [jnp.ones_like(zero) for _ in range(n_sub)]
    best_sa = [jnp.ones_like(zero) for _ in range(n_sub)]
    signs = [(sg, sb, sa) for sg in (1.0, -1.0) for sb in (1.0, -1.0)
             for sa in ((1.0, -1.0) if with_alpha else (1.0,))]
    for sg, sb, sa in signs:
        f = pt[0] + sg * pt[1] + sb * pt[2]
        if with_alpha:
            f = f + sa * pt[3]
        f2 = f * f
        for p in range(n_sub):
            score = jnp.sum(f2 if masks[p] is None
                            else jnp.where(masks[p], f2, 0.0), axis=0)
            better = score > best_score[p]
            best_score[p] = jnp.where(better, score, best_score[p])
            best_sg[p] = jnp.where(better, sg, best_sg[p])
            best_sb[p] = jnp.where(better, sb, best_sb[p])
            best_sa[p] = jnp.where(better, sa, best_sa[p])

    def flip(lo, hi, sgn):
        return jnp.where(sgn < 0, hi, lo), jnp.where(sgn < 0, lo, hi)

    e0_s, e1_s = [], []
    for p in range(n_sub):
        g0, g1 = flip(mi_s[p][1], ma_s[p][1], best_sg[p])
        b0, b1 = flip(mi_s[p][2], ma_s[p][2], best_sb[p])
        if with_alpha:
            a0, a1 = flip(mi_s[p][3], ma_s[p][3], best_sa[p])
        else:
            a0, a1 = mi_s[p][3], ma_s[p][3]
        e0_s.append([mi_s[p][0], g0, b0, a0])
        e1_s.append([ma_s[p][0], g1, b1, a1])
    return e0_s, e1_s


def _k_quant_endpoints_multi(e0_s, e1_s, rgba_prec, rgba_prec_p,
                             shared_p: bool):
    """Quantize every subset's float endpoints with p-bit majority vote
    (bc67._quantize_endpoints_t), all subsets packed into ONE
    [8*n_sub, T] plane: 1D [T] rows occupy 1/8 of each vreg (CLAUDE.md),
    so the per-channel quantize/vote/unquantize arithmetic runs once on
    the packed plane with per-row (sublane) constants — identical integer
    math to the per-row version. e0_s/e1_s: per-subset lists of 4 [T]
    rows. Returns a per-subset list of (q0l, q1l, p0, p1, u0l, u1l)."""
    n_sub = len(e0_s)
    rows = []
    for p in range(n_sub):
        rows += list(e0_s[p]) + list(e1_s[p])
    x = jnp.stack(rows)                              # [8n, T] f32
    xi = jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32)

    prec = list(rgba_prec) * 2 * n_sub
    prec_p = list(rgba_prec_p) * 2 * n_sub
    vote = [0 < p != pp for p, pp in zip(prec, prec_p)]
    zero = [p == 0 for p in prec]
    tq = [pp if v else p for p, pp, v in zip(prec, prec_p, vote)]

    def col(vals):
        # built in-kernel from scalars (pallas rejects captured jnp
        # constants); the where-chain folds to a constant vector
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (len(vals), 1), 0)
        out = jnp.full((len(vals), 1), int(vals[0]), jnp.int32)
        for i, v in enumerate(vals[1:], 1):
            out = jnp.where(rows_i == i, int(v), out)
        return out

    bias = col([(1 << (7 - t)) if 0 < t < 8 else 0 for t in tq])
    shift = col([(8 - t) if 0 < t < 8 else 0 for t in tq])
    f = jnp.minimum(xi + bias, 255) >> shift

    nvote = sum(vote[:4])
    p0_s, p1_s, p1u_s = [], [], []
    if nvote:
        vmask = col([1 if v else 0 for v in vote])
        vbits = (f & 1) * vmask
        for p in range(n_sub):
            vote0 = jnp.sum(vbits[8 * p:8 * p + 4], axis=0)
            vote1 = jnp.sum(vbits[8 * p + 4:8 * p + 8], axis=0)
            p0 = (vote0 > (nvote >> 1)).astype(jnp.int32)
            p1 = (vote1 > (nvote >> 1)).astype(jnp.int32)
            p0_s.append(p0)
            p1_s.append(p1)
            p1u_s.append(p0 if shared_p else p1)
    else:
        z = jnp.zeros_like(f[0])
        p0_s = p1_s = p1u_s = [z] * n_sub

    vsel = col([1 if v else 0 for v in vote]) != 0
    q = jnp.where(vsel, f >> 1, f)
    zsel = col([1 if z else 0 for z in zero]) != 0
    q = jnp.where(zsel, 0, q)

    # unquantize at prec_p (== prec when no vote bit)
    sh4 = (4,) + q.shape[1:]
    p_pl = jnp.concatenate(
        [jnp.broadcast_to(r[None, :], sh4)
         for p in range(n_sub) for r in (p0_s[p], p1u_s[p])])
    val = jnp.where(vsel, (q << 1) | p_pl, q)
    ls = col([(8 - pp) if 0 < pp < 8 else 0 for pp in prec_p])
    rs = col([pp if 0 < pp < 8 else 16 for pp in prec_p])
    c2 = (val << ls) & 0xFF
    u = c2 | (c2 >> rs)
    u = jnp.where(zsel, 255, u)

    out = []
    for p in range(n_sub):
        b = 8 * p
        out.append(([q[b + ch] for ch in range(4)],
                    [q[b + 4 + ch] for ch in range(4)],
                    p0_s[p], p1_s[p],
                    [u[b + ch] for ch in range(4)],
                    [u[b + 4 + ch] for ch in range(4)]))
    return out


def _k_quant_endpoints(e0l, e1l, rgba_prec, rgba_prec_p, shared_p: bool):
    """Single-subset _k_quant_endpoints_multi.
    Returns q0l, q1l, p0, p1, u0l, u1l."""
    return _k_quant_endpoints_multi([e0l], [e1l], rgba_prec, rgba_prec_p,
                                    shared_p)[0]


def _k_refit(xf, idx, mf, prec: int, e0l, e1l, ch_start=0, ch_end=4):
    """Least-squares endpoint refit (bc67._ls_refit_t)."""
    # w[idx]/64 in closed form (exact: 1/64 is a power of two)
    x = _pal_weight_f(idx, 1 << prec) * jnp.float32(1 / 64)
    if mf is None:
        av = 1.0 - x
        bv = x
    else:
        av = (1.0 - x) * mf
        bv = x * mf
    A = jnp.sum(av * av, axis=0)
    B = jnp.sum(av * bv, axis=0)
    C = jnp.sum(bv * bv, axis=0)
    det = A * C - B * B
    ok = jnp.abs(det) > 1e-6
    inv = 1.0 / jnp.where(ok, det, 1.0)
    e0n = list(e0l)
    e1n = list(e1l)
    for c in range(ch_start, ch_end):
        r0 = jnp.sum(av * xf[c], axis=0)
        r1 = jnp.sum(bv * xf[c], axis=0)
        n0 = jnp.clip((C * r0 - B * r1) * inv, 0.0, 255.0)
        n1 = jnp.clip((A * r1 - B * r0) * inv, 0.0, 255.0)
        e0n[c] = jnp.where(ok, n0, e0l[c])
        e1n[c] = jnp.where(ok, n1, e1l[c])
    return e0n, e1n


def _k_unquant_channel(q, pbit, prec: int, prec_p: int):
    """One channel of bc67._unquant_channel_t on i32 rows."""
    c = ((q << 1) | pbit) if prec != prec_p else q
    return _k_unquant(c, prec_p)


def _k_perturb_subset(xf, mask, prec_spec, q0l, q1l, p0, p1, wk_ch,
                      ladder, aw: float = 1.0, alpha_ch: int = 3,
                      w_rows=None):
    """In-kernel twin of bc67._perturb_channels_t: the bounded per-channel
    endpoint-perturbation ladder (OptimizeEndPoints/PerturbOne analog,
    BC6HBC7.cpp:2926-3044). Palette indices stay fixed — wk_ch supplies
    per-channel [16, T] f32 palette-weight planes — and each encodable
    endpoint channel greedily tries +/-delta steps on a shrinking ladder.
    Palette math runs on exact-in-f32 integers (products < 2^24, /64 is a
    power of two) so it reproduces the jnp integer path bit-for-bit.

    ladder = (rounds, deltas): LADDER_FULL in the winner-refine pass.
    prec_spec: (rgba_prec, rgba_prec_p, shared_p). q0l/q1l: per-channel
    i32 [T] rows; p0/p1 i32 [T]. w_rows: optional per-channel [T] f32
    error-weight rows overriding (aw, alpha_ch) — the refine pass needs
    them because modes 4/5's rotated alpha channel is per-lane there.
    Returns (q0r, q1r, err, err0) with err the final fixed-index error
    incl. the constant terms of unencoded-255 channels (matching
    _assign_indices_t's all-channel scoring), err0 the pre-ladder one."""
    rounds, deltas = ladder
    rgba_prec, rgba_prec_p, shared_p = prec_spec
    p1u = p0 if shared_p else p1
    q0r = list(q0l)
    q1r = list(q1l)
    chans = [c for c in range(4) if rgba_prec[c] > 0]

    def cherr(c, u0c, u1c):
        u0f = u0c.astype(jnp.float32)[None, :]
        u1f = u1c.astype(jnp.float32)[None, :]
        pal = jnp.floor(((64.0 - wk_ch[c]) * u0f + wk_ch[c] * u1f + 32.0)
                        * jnp.float32(1 / 64))
        r = xf[c] - pal
        if w_rows is not None:
            r2 = r * r * w_rows[c][None, :]
        else:
            w = aw if (c == alpha_ch and aw != 1.0) else 1.0
            r2 = r * r if w == 1.0 else r * r * w
        return jnp.sum(r2 if mask is None else jnp.where(mask, r2, 0.0),
                       axis=0)

    full = jnp.full_like(q0r[0], 255)
    ch_err = []
    for c in range(4):
        if rgba_prec[c] == 0:
            ch_err.append(cherr(c, full, full))
            continue
        u0c = _k_unquant_channel(q0r[c], p0, rgba_prec[c], rgba_prec_p[c])
        u1c = _k_unquant_channel(q1r[c], p1u, rgba_prec[c], rgba_prec_p[c])
        ch_err.append(cherr(c, u0c, u1c))

    err0 = sum(ch_err)
    for _ in range(rounds):
        for c in chans:
            prec, prec_p = rgba_prec[c], rgba_prec_p[c]
            qmax = (1 << prec) - 1
            base = ch_err[c]
            for which in (0, 1):
                rows = q0r if which == 0 else q1r
                pbit = p0 if which == 0 else p1u
                other_u = _k_unquant_channel(
                    (q1r if which == 0 else q0r)[c],
                    p1u if which == 0 else p0, prec, prec_p)
                for delta in deltas:
                    for sgn in (delta, -delta):
                        qt = jnp.clip(rows[c] + sgn, 0, qmax)
                        ut = _k_unquant_channel(qt, pbit, prec, prec_p)
                        e = cherr(c, ut, other_u) if which == 0 else \
                            cherr(c, other_u, ut)
                        better = e < base
                        rows[c] = jnp.where(better, qt, rows[c])
                        base = jnp.minimum(e, base)
            ch_err[c] = base
    return q0r, q1r, sum(ch_err), err0


def _k_moment_subset(xf, mask, prec_spec, q0l, q1l, p0, p1, wk_ch,
                     aw: float = 1.0, alpha_ch: int = 3, w_rows=None):
    """In-kernel twin of bc67._moment_channels_t (LADDER_MOMENT): one
    analytic joint (±1, ±1) q-step endpoint move per channel picked
    from the 5 residual/weight moments of the fixed-index quadratic
    error model, instead of 12-16 exact palette probes. The caller's
    joint re-assignment + exact rescore accepts or rejects the move
    (err_l returned as +inf so re-assigned indices always supersede
    the model). All moment math is exact-in-f32 integers/64ths, so it
    reproduces the jnp twin bit-for-bit."""
    rgba_prec, rgba_prec_p, shared_p = prec_spec
    p1u = p0 if shared_p else p1
    q0r = list(q0l)
    q1r = list(q1l)

    def wsum(plane, c):
        if w_rows is not None:
            plane = plane * w_rows[c][None, :]
        elif c == alpha_ch and aw != 1.0:
            plane = plane * aw
        return jnp.sum(plane if mask is None
                       else jnp.where(mask, plane, 0.0), axis=0)

    def msum(plane):
        return jnp.sum(plane if mask is None
                       else jnp.where(mask, plane, 0.0), axis=0)

    err0 = None
    moments_cache = {}
    for c in range(4):
        if rgba_prec[c] == 0:
            r = xf[c] - 255.0
            e = wsum(r * r, c)
            err0 = e if err0 is None else err0 + e
            continue
        prec, prec_p = rgba_prec[c], rgba_prec_p[c]
        maxq = (1 << prec) - 1
        u0c = _k_unquant_channel(q0r[c], p0, prec, prec_p)
        u1c = _k_unquant_channel(q1r[c], p1u, prec, prec_p)
        u0f = u0c.astype(jnp.float32)[None, :]
        u1f = u1c.astype(jnp.float32)[None, :]
        wk = wk_ch[c]
        pal = jnp.floor(((64.0 - wk) * u0f + wk * u1f + 32.0)
                        * jnp.float32(1 / 64))
        r = xf[c] - pal
        e = wsum(r * r, c)
        err0 = e if err0 is None else err0 + e

        key = id(wk)
        if key not in moments_cache:
            a = (64.0 - wk) * jnp.float32(1 / 64)
            b = wk * jnp.float32(1 / 64)
            moments_cache[key] = (a, b, msum(a * a), msum(a * b),
                                  msum(b * b))
        a, b, saa, sab, sbb = moments_cache[key]
        sra = msum(r * a)
        srb = msum(r * b)

        q0p, q0m = jnp.minimum(q0r[c] + 1, maxq), jnp.maximum(q0r[c] - 1, 0)
        q1p, q1m = jnp.minimum(q1r[c] + 1, maxq), jnp.maximum(q1r[c] - 1, 0)
        d0 = {1: (_k_unquant_channel(q0p, p0, prec, prec_p)
                  - u0c).astype(jnp.float32),
              -1: (_k_unquant_channel(q0m, p0, prec, prec_p)
                   - u0c).astype(jnp.float32)}
        d1 = {1: (_k_unquant_channel(q1p, p1u, prec, prec_p)
                  - u1c).astype(jnp.float32),
              -1: (_k_unquant_channel(q1m, p1u, prec, prec_p)
                   - u1c).astype(jnp.float32)}
        # plane-packed joint argmin (r4): the 8 combos' quadratic deltas
        # evaluated as one [8, T] plane (rows = combos, full sublane
        # occupancy) instead of 8 sequential [T]-row folds at 1/8
        # occupancy. Bit-identical to the jnp twin's sequential fold:
        # the per-combo expression tree is unchanged, and picking the
        # EARLIEST row attaining the global min (accepted only when
        # < 0) reproduces the strict `de < best` fold's tie-breaking.
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        # combo order (s0, s1): (0,1),(0,-1),(1,0),(1,1),(1,-1),
        #                       (-1,0),(-1,1),(-1,-1)
        e0p = jnp.where(rows8 < 2, 0.0,
                        jnp.where(rows8 < 5, d0[1][None, :],
                                  d0[-1][None, :]))
        r3 = rows8 % 3
        e1p = jnp.where(r3 == 0, d1[1][None, :],
                        jnp.where(r3 == 1, d1[-1][None, :], 0.0))
        de = (e0p * e0p * saa[None, :] + e1p * e1p * sbb[None, :]
              + 2.0 * e0p * e1p * sab[None, :]
              - 2.0 * (e0p * sra[None, :] + e1p * srb[None, :]))
        minv = jnp.min(de, axis=0)
        pick = jnp.min(jnp.where(de == minv[None, :],
                                 jnp.broadcast_to(rows8, de.shape), 8),
                       axis=0)
        acc = minv < 0.0
        q0r[c] = jnp.where(acc & (pick >= 2) & (pick < 5), q0p,
                           jnp.where(acc & (pick >= 5), q0m, q0r[c]))
        pm3 = pick % 3
        q1r[c] = jnp.where(acc & (pm3 == 0), q1p,
                           jnp.where(acc & (pm3 == 1), q1m, q1r[c]))

    errl = jnp.full_like(err0, jnp.inf)
    return q0r, q1r, errl, err0


def _k_unquant_dyn(q, pbit, prec_p):
    """_k_unquant_channel with a per-lane precision ROW (i32 [T]).
    Every unified 2-subset mode (1/3/7) stores endpoints with p-bits
    (rgba_prec_p == rgba_prec + 1), so the code always includes the p
    bit. Exact-int shifts: identical values to the static helper at
    each lane's precision (prec_p == 8 degenerates to c & 0xFF)."""
    c = (q << 1) | pbit
    c = (c << (8 - prec_p)) & 0xFF
    return c | (c >> prec_p)


def _k_unquant_dyn_nop(q, prec):
    """_k_unquant with a per-lane precision ROW (i32 [T]), for the
    p-bit-free modes 4/5. prec == 8 degenerates correctly: q << 0 fits
    8 bits and q >> 8 is 0, matching the static prec >= 8 passthrough."""
    c = (q << (8 - prec)) & 0xFF
    return c | (c >> prec)


def _k_moment_subset_dyn(xf, mask, prec_rows, q0l, q1l, p0, p1, wk_ch,
                         a_enc, aw: float = 1.0, has_p: bool = True,
                         w_rows=None):
    """_k_moment_subset with per-lane precision rows: one pass serves
    every 2-subset partition-family mode (1/3/7) simultaneously.
    prec_rows = (prec_c, prec_p_c, prec_a, prec_p_a) i32 [T] rows
    (RGB channels share one precision in these modes, ms_aInfo
    BC6HBC7.cpp:1106-1125); a_enc [T] bool marks lanes whose mode
    encodes alpha (mode 7) — other lanes score alpha against the
    constant 255 and never move it, exactly like the static helper's
    rgba_prec[c] == 0 branch (the palette of two 255 endpoints
    reproduces floor((64*255+32)/64) == 255 exactly in f32).
    has_p=False selects the p-bit-free unquant (modes 4/5; prec_p rows
    are ignored); w_rows: per-channel [T] error-weight rows overriding
    (aw, 3) — the rotated alpha channel is per-lane under modes 4/5."""
    prec_c, prec_p_c, prec_a, prec_p_a = prec_rows
    q0r = list(q0l)
    q1r = list(q1l)

    def wsum(plane, c):
        if w_rows is not None:
            plane = plane * w_rows[c][None, :]
        elif c == 3 and aw != 1.0:
            plane = plane * aw
        return jnp.sum(plane if mask is None
                       else jnp.where(mask, plane, 0.0), axis=0)

    def msum(plane):
        return jnp.sum(plane if mask is None
                       else jnp.where(mask, plane, 0.0), axis=0)

    err0 = None
    moments_cache = {}
    for c in range(4):
        prec = prec_c if c < 3 else prec_a
        prec_p = prec_p_c if c < 3 else prec_p_a
        enc = None if c < 3 else a_enc
        maxq = (1 << prec) - 1
        if has_p:
            u0c = _k_unquant_dyn(q0r[c], p0, prec_p)
            u1c = _k_unquant_dyn(q1r[c], p1, prec_p)
        else:
            u0c = _k_unquant_dyn_nop(q0r[c], prec)
            u1c = _k_unquant_dyn_nop(q1r[c], prec)
        if enc is not None:
            u0c = jnp.where(enc, u0c, 255)
            u1c = jnp.where(enc, u1c, 255)
        u0f = u0c.astype(jnp.float32)[None, :]
        u1f = u1c.astype(jnp.float32)[None, :]
        wk = wk_ch[c]
        pal = jnp.floor(((64.0 - wk) * u0f + wk * u1f + 32.0)
                        * jnp.float32(1 / 64))
        r = xf[c] - pal
        e = wsum(r * r, c)
        err0 = e if err0 is None else err0 + e

        key = id(wk)
        if key not in moments_cache:
            a = (64.0 - wk) * jnp.float32(1 / 64)
            b = wk * jnp.float32(1 / 64)
            moments_cache[key] = (a, b, msum(a * a), msum(a * b),
                                  msum(b * b))
        a, b, saa, sab, sbb = moments_cache[key]
        sra = msum(r * a)
        srb = msum(r * b)

        q0p, q0m = jnp.minimum(q0r[c] + 1, maxq), jnp.maximum(q0r[c] - 1, 0)
        q1p, q1m = jnp.minimum(q1r[c] + 1, maxq), jnp.maximum(q1r[c] - 1, 0)

        def delta(qt, pb, base):
            u = (_k_unquant_dyn(qt, pb, prec_p) if has_p
                 else _k_unquant_dyn_nop(qt, prec))
            d = (u - base).astype(jnp.float32)
            return d if enc is None else jnp.where(enc, d, 0.0)

        d0 = {1: delta(q0p, p0, u0c), -1: delta(q0m, p0, u0c)}
        d1 = {1: delta(q1p, p1, u1c), -1: delta(q1m, p1, u1c)}

        # plane-packed joint argmin — see _k_moment_subset. Packing the
        # four probe unquants themselves into one [8, T] plane unquant
        # (iota-select of q0r/q0p/q0m per combo row) measured NEUTRAL
        # on v5e (refine 2.64 -> 2.71 ms at 2K, r5) — the select-chain
        # plane builds cost what the packed row unquants saved, the r2
        # retrofit-packing result again; the moments themselves already
        # accumulate as full [16, T] plane ops.
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        e0p = jnp.where(rows8 < 2, 0.0,
                        jnp.where(rows8 < 5, d0[1][None, :],
                                  d0[-1][None, :]))
        r3 = rows8 % 3
        e1p = jnp.where(r3 == 0, d1[1][None, :],
                        jnp.where(r3 == 1, d1[-1][None, :], 0.0))
        de = (e0p * e0p * saa[None, :] + e1p * e1p * sbb[None, :]
              + 2.0 * e0p * e1p * sab[None, :]
              - 2.0 * (e0p * sra[None, :] + e1p * srb[None, :]))
        minv = jnp.min(de, axis=0)
        pick = jnp.min(jnp.where(de == minv[None, :],
                                 jnp.broadcast_to(rows8, de.shape), 8),
                       axis=0)
        acc = minv < 0.0
        q0r[c] = jnp.where(acc & (pick >= 2) & (pick < 5), q0p,
                           jnp.where(acc & (pick >= 5), q0m, q0r[c]))
        pm3 = pick % 3
        q1r[c] = jnp.where(acc & (pm3 == 0), q1p,
                           jnp.where(acc & (pm3 == 1), q1m, q1r[c]))

    errl = jnp.full_like(err0, jnp.inf)
    return q0r, q1r, errl, err0


def _k_perturb_subset_dyn(xf, mask, prec_rows, q0l, q1l, p0, p1, wk_ch,
                          ladder, a_enc, aw: float = 1.0,
                          has_p: bool = True, w_rows=None):
    """_k_perturb_subset with per-lane precision rows (see
    _k_moment_subset_dyn, incl. has_p/w_rows). Lanes whose mode has no
    alpha field probe alpha against the frozen 255 palette — every
    probe ties the base error there, so alpha endpoints never move
    (matching the static helper's chans filter)."""
    rounds, deltas = ladder
    prec_c, prec_p_c, prec_a, prec_p_a = prec_rows
    q0r = list(q0l)
    q1r = list(q1l)

    def cherr(c, u0c, u1c):
        u0f = u0c.astype(jnp.float32)[None, :]
        u1f = u1c.astype(jnp.float32)[None, :]
        pal = jnp.floor(((64.0 - wk_ch[c]) * u0f + wk_ch[c] * u1f + 32.0)
                        * jnp.float32(1 / 64))
        r = xf[c] - pal
        if w_rows is not None:
            r2 = r * r * w_rows[c][None, :]
        else:
            w = aw if (c == 3 and aw != 1.0) else 1.0
            r2 = r * r if w == 1.0 else r * r * w
        return jnp.sum(r2 if mask is None else jnp.where(mask, r2, 0.0),
                       axis=0)

    def unq(qc, pb, c, enc):
        if has_p:
            u = _k_unquant_dyn(qc, pb, prec_p_c if c < 3 else prec_p_a)
        else:
            u = _k_unquant_dyn_nop(qc, prec_c if c < 3 else prec_a)
        return u if enc is None else jnp.where(enc, u, 255)

    ch_err = []
    for c in range(4):
        enc = None if c < 3 else a_enc
        ch_err.append(cherr(c, unq(q0r[c], p0, c, enc),
                            unq(q1r[c], p1, c, enc)))

    err0 = sum(ch_err)
    for _ in range(rounds):
        for c in range(4):
            enc = None if c < 3 else a_enc
            prec = prec_c if c < 3 else prec_a
            qmax = (1 << prec) - 1
            base = ch_err[c]
            for which in (0, 1):
                rows = q0r if which == 0 else q1r
                pbit = p0 if which == 0 else p1
                other_u = unq((q1r if which == 0 else q0r)[c],
                              p1 if which == 0 else p0, c, enc)
                for delta in deltas:
                    for sgn in (delta, -delta):
                        qt = jnp.clip(rows[c] + sgn, 0, qmax)
                        ut = unq(qt, pbit, c, enc)
                        e = cherr(c, ut, other_u) if which == 0 else \
                            cherr(c, other_u, ut)
                        better = e < base
                        rows[c] = jnp.where(better, qt, rows[c])
                        base = jnp.minimum(e, base)
            ch_err[c] = base
    return q0r, q1r, sum(ch_err), err0


def _k_anchor_index(idx, anchor):
    """idx value at the (data-dependent) anchor pixel: one-hot row select."""
    a_idx = jnp.zeros_like(idx[0])
    for i in range(16):
        a_idx = jnp.where(anchor == i, idx[i], a_idx)
    return a_idx


class _KWords:
    """Accumulates a 128-bit block as 4 u32 words with static-offset and
    per-pixel dynamic-offset fields (bc67._scatter_bits semantics).
    Static puts hit exactly one word row (1 row op each); dynamic puts
    accumulate on a [4, T] plane, where one packed where-chain replaces
    4 per-row chains (a [4, T] plane op costs the same vregs as a single
    [T] row). stack() ORs the two halves together."""

    def __init__(self, t):
        z = jnp.zeros_like(t, dtype=jnp.uint32)
        self.w = [z, z, z, z]
        self.wp = None                               # [4, T] dyn plane
        self._rows = jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0)

    def put(self, value, offset: int, nbits: int):
        v = value.astype(jnp.uint32)
        wi, sh = offset // 32, offset % 32
        self.w[wi] = self.w[wi] | (v << sh)
        if sh and sh + nbits > 32:
            self.w[wi + 1] = self.w[wi + 1] | (v >> (32 - sh))

    def put_dyn(self, value, offset, lo_word: int):
        """value/offset [T]; offset >= 32*lo_word (static lower bound)."""
        v = value.astype(jnp.uint32)[None, :]
        wi = (offset >> 5)[None, :]
        sh = (offset & 31).astype(jnp.uint32)[None, :]
        lo = jnp.where(self._rows == wi, v << sh, jnp.uint32(0))
        hi = jnp.where((self._rows == wi + 1) & (sh != 0),
                       v >> ((32 - sh) & 31), jnp.uint32(0))
        self.wp = (lo | hi) if self.wp is None else (self.wp | lo | hi)

    def stack(self):
        out = jnp.stack(self.w)
        return out if self.wp is None else out | self.wp


def _k_emit(mode_id: int, t, s_blk, rot, im, q0s, q1s, p0s, p1s,
            idx1, idx2, a2, a3):
    """In-kernel EmitBlock (bc67._emit_bc7): returns [4, T] u32.

    s_blk/rot/im: [T] data or python int 0. a2/a3: anchor pixel positions
    [T] for subsets 1/2 (None when absent); index offsets derive from them
    (anchor pixels store prec-1 bits; their index msb is 0 after the swap,
    so writing prec bits is equivalent)."""
    (parts, part_bits, p_bits, rot_bits, im_bits, iprec, iprec2,
     rgba_prec, _) = _BC7_FULL_STATICS[mode_id]
    n_sub = parts + 1
    # the search carries indices as integer-valued f32 planes (native VPU
    # multiplies); bit packing needs ints — one cast per winner here
    if idx1 is not None and jnp.issubdtype(idx1.dtype, jnp.floating):
        idx1 = idx1.astype(jnp.int32)
    if idx2 is not None and jnp.issubdtype(idx2.dtype, jnp.floating):
        idx2 = idx2.astype(jnp.int32)
    kw = _KWords(t)
    kw.put(jnp.full_like(t, 1 << mode_id, dtype=jnp.uint32), 0, mode_id + 1)
    bit = mode_id + 1
    if part_bits:
        kw.put(s_blk, bit, part_bits)
        bit += part_bits
    if rot_bits:
        v = rot if not isinstance(rot, int) else jnp.full_like(
            t, rot, dtype=jnp.int32)
        kw.put(v, bit, rot_bits)
        bit += rot_bits
    if im_bits:
        v = im if not isinstance(im, int) else jnp.full_like(
            t, im, dtype=jnp.int32)
        kw.put(v, bit, im_bits)
        bit += im_bits
    for ch in range(4):
        prec = rgba_prec[ch]
        if prec == 0:
            continue
        for sub in range(n_sub):
            kw.put(q0s[sub][ch], bit, prec)
            bit += prec
            kw.put(q1s[sub][ch], bit, prec)
            bit += prec
    if p_bits:
        if p_bits == n_sub:  # shared p-bit per subset (mode 1)
            for sub in range(n_sub):
                kw.put(p0s[sub], bit, 1)
                bit += 1
        else:
            for sub in range(n_sub):
                kw.put(p0s[sub], bit, 1)
                bit += 1
                kw.put(p1s[sub], bit, 1)
                bit += 1
    # index section 1: anchor-compressed offsets
    lo_word = bit // 32
    n_anch = 1 + (a2 is not None) + (a3 is not None)
    for i in range(16):
        off = bit + iprec * i - (1 if i else 0)
        if i == 0:
            kw.put(idx1[0], off, iprec)
            continue
        offd = jnp.full_like(t, off, dtype=jnp.int32)
        if a2 is not None:
            offd = offd - (a2 < i).astype(jnp.int32)
        if a3 is not None:
            offd = offd - (a3 < i).astype(jnp.int32)
        kw.put_dyn(idx1[i], offd, lo_word)
    bit += iprec * 16 - n_anch
    if iprec2:
        for i in range(16):
            off = bit + iprec2 * i - (1 if i else 0)
            kw.put(idx2[i], off, iprec2)
    return kw.stack()


def _k_eval_subsets(xf, masks, mode_id: int, axes=None,
                    aw: float = 1.0):
    """Every subset of one shape candidate in a single fused pass:
    axis fit -> quantize -> projection assign -> LS refit -> second pass ->
    keep better, with the per-pixel plane work (projection, palette
    distance, refit moment planes) computed once and shared by all subsets
    via per-pixel endpoint selection + masked reductions. Math identical
    to running _k_eval_subset per subset (bc67._eval_subset_candidate).

    masks: list of [16, T] bool partition masks, or [None] (single subset).
    xf: per-channel [16, T] f32 pixel planes. Returns (q0s, q1s, p0s,
    p1s, idx_full, errs): per-subset endpoint lists, combined per-pixel
    f32 indices, per-subset errors."""
    rgba_prec, rgba_prec_p, iprec, shared_p, with_alpha = \
        _BC7_MODE_STATICS[mode_id]
    n_sub = len(masks)
    single = masks[0] is None

    def msum(plane, p):
        return jnp.sum(plane if masks[p] is None
                       else jnp.where(masks[p], plane, 0.0), axis=0)

    def sel(vals):
        if single:
            return vals[0][None, :]
        return _k_sel_px(masks, vals)

    def qpal(e0_s, e1_s):
        qs = _k_quant_endpoints_multi(e0_s, e1_s, rgba_prec, rgba_prec_p,
                                      shared_p)
        # unquantized endpoint/axis rows as f32 (values <= 255, exact) so
        # the per-pixel plane math below runs on native f32 multiplies
        u0_s = [[qs[p][4][c].astype(jnp.float32) for c in range(4)]
                for p in range(n_sub)]
        u1_s = [[qs[p][5][c].astype(jnp.float32) for c in range(4)]
                for p in range(n_sub)]
        u0px = [sel([u0_s[p][c] for p in range(n_sub)]) for c in range(4)]
        # axis direction and span are per-subset scalars, selected per-pixel
        e_s = [[u1_s[p][c] - u0_s[p][c] for c in range(4)]
               for p in range(n_sub)]
        span_s = [sum(e_s[p][c] * e_s[p][c] for c in range(4))
                  for p in range(n_sub)]
        e_px = [sel([e_s[p][c] for p in range(n_sub)]) for c in range(4)]
        span_px = sel(span_s)
        idx, dist = _project_assign_px(xf, u0px, None, e_px, span_px,
                                       iprec, aw=aw)
        errs = [msum(dist, p) for p in range(n_sub)]
        return qs, idx, errs

    # axes: optional precomputed _k_axis_multi result — the axis fit
    # depends only on (masks, with_alpha), so modes sharing both (e.g.
    # BC7 modes 1 and 3) can reuse one fit
    e0_s, e1_s = _k_axis_multi(xf, masks, with_alpha) if axes is None \
        else axes
    qsA, idxA, errsA = qpal(e0_s, e1_s)

    # fused least-squares refit: weight planes shared, moments masked
    x = _pal_weight_f(idxA, 1 << iprec) * jnp.float32(1 / 64)
    av = 1.0 - x
    bv = x
    aa, ab_, bb = av * av, av * bv, bv * bv
    avx = [av * xf[c] for c in range(4)]
    bvx = [bv * xf[c] for c in range(4)]
    e0r_s, e1r_s = [], []
    for p in range(n_sub):
        A = msum(aa, p)
        B = msum(ab_, p)
        C = msum(bb, p)
        det = A * C - B * B
        ok = jnp.abs(det) > 1e-6
        inv = 1.0 / jnp.where(ok, det, 1.0)
        e0n, e1n = [], []
        for c in range(4):
            r0 = msum(avx[c], p)
            r1 = msum(bvx[c], p)
            n0 = jnp.clip((C * r0 - B * r1) * inv, 0.0, 255.0)
            n1 = jnp.clip((A * r1 - B * r0) * inv, 0.0, 255.0)
            e0n.append(jnp.where(ok, n0, e0_s[p][c]))
            e1n.append(jnp.where(ok, n1, e1_s[p][c]))
        e0r_s.append(e0n)
        e1r_s.append(e1n)

    qsB, idxB, errsB = qpal(e0r_s, e1r_s)

    better = [errsB[p] < errsA[p] for p in range(n_sub)]
    # int select: mosaic can't broadcast/select i1 vectors
    idx_full = jnp.where(sel([b.astype(jnp.int32) for b in better]) != 0,
                         idxB, idxA)
    q0s, q1s, p0s, p1s, errs = [], [], [], [], []
    for p in range(n_sub):
        bt = better[p]
        q0s.append([jnp.where(bt, qsB[p][0][c], qsA[p][0][c])
                    for c in range(4)])
        q1s.append([jnp.where(bt, qsB[p][1][c], qsA[p][1][c])
                    for c in range(4)])
        p0s.append(jnp.where(bt, qsB[p][2], qsA[p][2]))
        p1s.append(jnp.where(bt, qsB[p][3], qsA[p][3]))
        errs.append(jnp.where(bt, errsB[p], errsA[p]))

    return q0s, q1s, p0s, p1s, idx_full, errs


def _k_float_assign_rgb(xf, u0px, e_px, span_px, iprec: int,
                        score: bool = True):
    """Float-endpoint RGB palette assignment + SSE on per-pixel endpoint
    planes: the precision-free scorer of the 2-subset shared fit (twin:
    bc67._float_assign_rgb_t). Linear (floor-less) palette — steers the
    trajectory only; every mode rescores exactly. score=False skips the
    distance planes (keep-better off, bc67.BC7_SHARED_KEEPBETTER).
    Returns (idx [16, T] f32, dist [16, T] f32 or None)."""
    K = 1 << iprec
    d0 = [xf[c] - u0px[c] for c in range(3)]
    dot = sum((d * e_px[c] for c, d in enumerate(d0)),
              start=jnp.zeros_like(d0[0]))
    p64 = jnp.clip(dot * (64.0 / jnp.where(span_px > 0, span_px, 1.0)),
                   0.0, 64.0)
    kf = jnp.clip(jnp.round(p64 * ((K - 1) / 64.0)), 0.0, K - 1.0)
    wk = _pal_weight_f(kf, K)
    wkp = _pal_weight_f(jnp.minimum(kf + 1.0, K - 1.0), K)
    wkm = _pal_weight_f(jnp.maximum(kf - 1.0, 0.0), K)
    up = (kf < K - 1) & (2.0 * p64 > wk + wkp)
    dn = (kf > 0) & (2.0 * p64 < wk + wkm)
    idx = jnp.where(up, kf + 1.0, jnp.where(dn, kf - 1.0, kf))
    if not score:
        return idx, None
    wkf = _pal_weight_f(idx, K) * jnp.float32(1 / 64)
    dist = jnp.zeros_like(dot)
    for c, d in enumerate(d0):
        r = d - wkf * e_px[c]
        dist = dist + r * r
    return idx, dist


def _k_eval_2sub_shared(xf, masks, mode_ids, axes=None, aw: float = 1.0,
                        rounds: int | None = None,
                        iprec_s: int | None = None):
    """Shared-fit evaluation of one shape candidate for the 2-subset
    family (r5, twin: bc67._eval_2sub_shared): ONE precision-free float
    trajectory per subset — axis fit -> float assign -> LS refit rounds
    -> keep-better — steers every mode in `mode_ids`; each mode then
    quantizes those endpoints at its own precision (ms_aInfo,
    BC6HBC7.cpp:1106-1125) and rescores exactly ONCE. Composes the BC6H
    shared fit (+27%) with the r4 insight that modes 1/3 differ only in
    field precisions. Returns {mode_id: (q0s, q1s, p0s, p1s, idx_full,
    errs)} in _k_eval_subsets' format."""
    from . import bc67 as _bc67

    if rounds is None:
        rounds = _bc67.BC7_SHARED2SUB_ROUNDS
    if iprec_s is None:
        iprec_s = _bc67.BC7_SHARED2SUB_IPREC
    n_sub = len(masks)

    def msum(plane, p):
        return jnp.sum(jnp.where(masks[p], plane, 0.0), axis=0)

    def sel(vals):
        return _k_sel_px(masks, vals)

    from . import bc67 as _bc67_kb
    kb = _bc67_kb.BC7_SHARED_KEEPBETTER

    def fpal(e0_s, e1_s, score):
        # per-pixel planes from per-subset FLOAT endpoint rows (RGB)
        u0px = [sel([e0_s[p][c] for p in range(n_sub)]) for c in range(3)]
        e_s = [[e1_s[p][c] - e0_s[p][c] for c in range(3)]
               for p in range(n_sub)]
        span_s = [sum(e_s[p][c] * e_s[p][c] for c in range(3))
                  for p in range(n_sub)]
        e_px = [sel([e_s[p][c] for p in range(n_sub)]) for c in range(3)]
        span_px = sel(span_s)
        idx, dist = _k_float_assign_rgb(xf, u0px, e_px, span_px, iprec_s,
                                        score=score)
        if dist is None:
            return idx, None
        return idx, [msum(dist, p) for p in range(n_sub)]

    e0_s, e1_s = _k_axis_multi(xf, masks, False) if axes is None else axes
    idx_b, errs0 = fpal(e0_s, e1_s, kb)
    e0c_s = [list(e0_s[p]) for p in range(n_sub)]
    e1c_s = [list(e1_s[p]) for p in range(n_sub)]
    errs_b = errs0
    for r in range(rounds):
        # fused LS refit (RGB): weight planes shared, moments masked
        x = _pal_weight_f(idx_b, 1 << iprec_s) * jnp.float32(1 / 64)
        av = 1.0 - x
        bv = x
        aa, ab_, bb = av * av, av * bv, bv * bv
        avx = [av * xf[c] for c in range(3)]
        bvx = [bv * xf[c] for c in range(3)]
        for p in range(n_sub):
            A = msum(aa, p)
            B = msum(ab_, p)
            C = msum(bb, p)
            det = A * C - B * B
            ok = jnp.abs(det) > 1e-6
            inv = 1.0 / jnp.where(ok, det, 1.0)
            for c in range(3):
                r0 = msum(avx[c], p)
                r1 = msum(bvx[c], p)
                n0 = jnp.clip((C * r0 - B * r1) * inv, 0.0, 255.0)
                n1 = jnp.clip((A * r1 - B * r0) * inv, 0.0, 255.0)
                e0c_s[p][c] = jnp.where(ok, n0, e0c_s[p][c])
                e1c_s[p][c] = jnp.where(ok, n1, e1c_s[p][c])
        if kb or r < rounds - 1:
            idx_b, errs_b = fpal(e0c_s, e1c_s, kb)

    e0f_s, e1f_s = [], []
    for p in range(n_sub):
        if kb:
            better = errs_b[p] < errs0[p]
            e0f_s.append([jnp.where(better, e0c_s[p][c], e0_s[p][c])
                          for c in range(4)])
            e1f_s.append([jnp.where(better, e1c_s[p][c], e1_s[p][c])
                          for c in range(4)])
        else:
            e0f_s.append(list(e0c_s[p]))
            e1f_s.append(list(e1c_s[p]))

    # per-mode: quantize the shared endpoints, ONE exact rescore
    out = {}
    for mode_id in mode_ids:
        rgba_prec, rgba_prec_p, iprec, shared_p, _ = \
            _BC7_MODE_STATICS[mode_id]
        qs = _k_quant_endpoints_multi(e0f_s, e1f_s, rgba_prec,
                                      rgba_prec_p, shared_p)
        u0_s = [[qs[p][4][c].astype(jnp.float32) for c in range(4)]
                for p in range(n_sub)]
        u1_s = [[qs[p][5][c].astype(jnp.float32) for c in range(4)]
                for p in range(n_sub)]
        u0px = [sel([u0_s[p][c] for p in range(n_sub)]) for c in range(4)]
        e_s = [[u1_s[p][c] - u0_s[p][c] for c in range(4)]
               for p in range(n_sub)]
        span_s = [sum(e_s[p][c] * e_s[p][c] for c in range(4))
                  for p in range(n_sub)]
        e_px = [sel([e_s[p][c] for p in range(n_sub)]) for c in range(4)]
        span_px = sel(span_s)
        idx, dist = _project_assign_px(xf, u0px, None, e_px, span_px,
                                       iprec, aw=aw)
        errs = [msum(dist, p) for p in range(n_sub)]
        out[mode_id] = ([qs[p][0] for p in range(n_sub)],
                        [qs[p][1] for p in range(n_sub)],
                        [qs[p][2] for p in range(n_sub)],
                        [qs[p][3] for p in range(n_sub)],
                        idx, errs)
    return out


def _k_partition_fold_multi(xf, cands, mode_ids, axes_list=None,
                            aw: float = 1.0):
    """Shared-fit fold over shape candidates for the 2-subset family:
    each candidate is evaluated ONCE for all `mode_ids` off one float
    trajectory (_k_eval_2sub_shared); per-mode running-best folds,
    anchor swaps and emits. Returns {mode_id: (err, words)}."""
    n_sub = 2
    best = {m: None for m in mode_ids}
    for ci, (s_blk, pp, pa, masks) in enumerate(cands):
        evals = _k_eval_2sub_shared(
            xf, masks, mode_ids,
            axes=None if axes_list is None else axes_list[ci], aw=aw)
        for m in mode_ids:
            q0s, q1s, p0s, p1s, idx_full, errs = evals[m]
            best[m] = _k_fold_state(
                best[m], (sum(errs), s_blk, q0s, q1s, p0s, p1s, idx_full,
                          pp, pa), n_sub)
    return {m: _k_winner_emit(m, best[m]) for m in mode_ids}


def _packed_tables(partitions: int, n_shapes: int):
    """Static per-shape tables packed into python ints: partition ids at
    2 bits/pixel, fixup anchors at 4 bits each (PARTITIONS/FIXUPS)."""
    from .bc67_tables import FIXUPS, PARTITIONS
    parts = PARTITIONS[partitions]
    pp = tuple(int(sum(int(parts[s, i]) << (2 * i) for i in range(16)))
               for s in range(n_shapes))
    pa = tuple(int(FIXUPS[partitions, s, 1])
               | (int(FIXUPS[partitions, s, 2]) << 4)
               for s in range(n_shapes))
    return pp, pa


def _k_decode_cands(sb_rows, parts: int, n_shapes: int):
    """Decode shape-candidate rows into (s_blk, pp, pa, masks) tuples.
    Packed tables: 2 bits/px partition ids (pixel 15 uses bit 31 in
    3-subset tables, so unsigned) and 4-bit anchors."""
    pp_tab, pa_tab = _packed_tables(parts, n_shapes)
    n_sub = parts + 1
    cands = []
    for s_blk in sb_rows:
        pp = jnp.zeros_like(s_blk, dtype=jnp.uint32)
        pa = jnp.zeros_like(s_blk)
        for s in range(n_shapes):
            hit = s_blk == s
            pp = jnp.where(hit, jnp.uint32(pp_tab[s]), pp)
            pa = jnp.where(hit, pa_tab[s], pa)
        pm = jnp.stack([((pp >> (2 * i)) & 3).astype(jnp.int32)
                        for i in range(16)])
        cands.append((s_blk, pp, pa, [pm == p for p in range(n_sub)]))
    return cands


def _k_fold_state(best, state, n_sub: int):
    """Running-best fold of one candidate's evaluation state
    (err, s_blk, q0s, q1s, p0s, p1s, idx_full, pp, pa)."""
    if best is None:
        return state
    bt = state[0] < best[0]
    bt16 = bt[None, :]
    return (
        jnp.where(bt, state[0], best[0]),
        jnp.where(bt, state[1], best[1]),
        [[jnp.where(bt, state[2][s][c], best[2][s][c])
          for c in range(4)] for s in range(n_sub)],
        [[jnp.where(bt, state[3][s][c], best[3][s][c])
          for c in range(4)] for s in range(n_sub)],
        [jnp.where(bt, state[4][s], best[4][s]) for s in range(n_sub)],
        [jnp.where(bt, state[5][s], best[5][s]) for s in range(n_sub)],
        jnp.where(bt16, state[6], best[6]),
        jnp.where(bt, state[7], best[7]),
        jnp.where(bt, state[8], best[8]),
    )


def _k_partition_fold(xf, cands, mode_id: int, axes_list=None,
                      aw: float = 1.0):
    """One partition mode over decoded shape candidates: evaluate each,
    keep the best, anchor-swap and emit the winner. axes_list optionally
    supplies a precomputed axis fit per candidate (shared between modes
    with the same with_alpha). Returns (err, words)."""
    parts = _BC7_FULL_STATICS[mode_id][0]
    n_sub = parts + 1

    best = None
    for ci, (s_blk, pp, pa, masks) in enumerate(cands):
        q0s, q1s, p0s, p1s, idx_full, errs = _k_eval_subsets(
            xf, masks, mode_id,
            axes=None if axes_list is None else axes_list[ci], aw=aw)
        total_err = sum(errs)
        # anchor swaps happen once, on the fold winner, below
        best = _k_fold_state(
            best, (total_err, s_blk, q0s, q1s, p0s, p1s, idx_full, pp, pa),
            n_sub)
    return _k_winner_emit(mode_id, best)


def _k_winner_emit(mode_id: int, best):
    """Anchor-swap and emit a partition mode's fold winner."""
    parts = _BC7_FULL_STATICS[mode_id][0]
    iprec = _BC7_FULL_STATICS[mode_id][5]
    n_sub = parts + 1
    msb, maxi = 1 << (iprec - 1), (1 << iprec) - 1

    err, s_blk, q0s, q1s, p0s, p1s, idx_full, pp, pa = best
    # anchor swaps on the winner only (AssignIndices, BC6HBC7.cpp:3181-3194)
    pm = jnp.stack([((pp >> (2 * i)) & 3).astype(jnp.int32)
                    for i in range(16)])
    anch = [None, pa & 0xF, (pa >> 4) & 0xF][:n_sub + 1]
    for p in range(n_sub):
        if p == 0:
            a_idx = idx_full[0]
        else:
            a_idx = _k_anchor_index(idx_full, anch[p])
        swap = a_idx >= msb                      # f32 idx: msb set test
        sw16 = swap[None, :]
        q0s[p], q1s[p] = (
            [jnp.where(swap, q1s[p][c], q0s[p][c]) for c in range(4)],
            [jnp.where(swap, q0s[p][c], q1s[p][c]) for c in range(4)])
        p0s[p], p1s[p] = (jnp.where(swap, p1s[p], p0s[p]),
                          jnp.where(swap, p0s[p], p1s[p]))
        idx_full = jnp.where(sw16 & (pm == p), maxi - idx_full, idx_full)
    a2, a3 = anch[1], anch[2] if n_sub > 2 else None
    words = _k_emit(mode_id, err, s_blk.astype(jnp.uint32), 0, 0,
                    q0s, q1s, p0s, p1s, idx_full, None, a2, a3)
    return err, words


def _partition_mode_kernel(px_ref, sb_ref, err_ref, w_ref,
                           *, mode_id: int, n_cand: int, n_shapes: int,
                           aw: float = 1.0):
    """Modes 0/1/2/3/7: evaluate n_cand shape candidates, keep the best,
    emit its block. Partition masks and anchors derive in-kernel from the
    shape id via packed constant tables."""
    parts = _BC7_FULL_STATICS[mode_id][0]
    xf = [px_ref[c * 16:(c + 1) * 16, :].astype(jnp.float32)
          for c in range(4)]
    cands = _k_decode_cands([sb_ref[cand, :] for cand in range(n_cand)],
                            parts, n_shapes)
    err, words = _k_partition_fold(xf, cands, mode_id, aw=aw)
    err_ref[...] = jnp.broadcast_to(err[None, :], err_ref.shape)
    w_ref[...] = words


@functools.partial(jax.jit, static_argnames=("mode_id", "n_shapes",
                                              "interpret", "aw"))
def partition_mode_pallas(px_i: jnp.ndarray, s_blks: jnp.ndarray,
                          mode_id: int, n_shapes: int = 64,
                          interpret: bool = False, aw: float = 1.0):
    """Full partition-mode evaluation. px_i [16, 4, NB] i32;
    s_blks [C, NB] shape candidates (partition masks and anchors derive
    in-kernel). Returns (err [NB] f32, words [NB, 4] u32)."""
    from jax.experimental import pallas as pl

    n_cand = s_blks.shape[0]
    nb = px_i.shape[2]
    nb_pad = -(-nb // _TILE) * _TILE
    pad = nb_pad - nb

    px_cm = jnp.transpose(px_i, (1, 0, 2)).reshape(64, nb)
    sb = s_blks.astype(jnp.int32)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))
        sb = jnp.pad(sb, ((0, 0), (0, pad)))

    grid = (nb_pad // _TILE,)
    kern = functools.partial(_partition_mode_kernel, mode_id=mode_id,
                             n_cand=n_cand, n_shapes=n_shapes, aw=aw)
    err8, words = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((64, _TILE), lambda i: (0, i)),
            pl.BlockSpec((n_cand, _TILE), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((8, _TILE), lambda i: (0, i)),
            pl.BlockSpec((4, _TILE), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
            jax.ShapeDtypeStruct((4, nb_pad), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(px_cm, sb)
    return err8[0, :nb], words[:, :nb].T


def _k_mode6(xf0, aw: float = 1.0):
    """Mode 6: one subset, joint RGBA indices. Returns (err, words)."""
    q0s6, q1s6, p0s6, p1s6, idx, errs6 = _k_eval_subsets(xf0, [None],
                                                         6, aw=aw)
    q0, q1, p0, p1, err6 = q0s6[0], q1s6[0], p0s6[0], p1s6[0], errs6[0]
    swap = idx[0] >= 8.0                         # f32 idx: msb set test
    q0f = [jnp.where(swap, q1[c], q0[c]) for c in range(4)]
    q1f = [jnp.where(swap, q0[c], q1[c]) for c in range(4)]
    p0f = jnp.where(swap, p1, p0)
    p1f = jnp.where(swap, p0, p1)
    idx = jnp.where(swap[None, :], 15 - idx, idx)
    w6 = _k_emit(6, err6, 0, 0, 0, [q0f], [q1f], [p0f], [p1f],
                 idx, None, None, None)
    return err6, w6


def _k_rot_data(xf0, rots=(0, 1, 2, 3)):
    """Rotation-dependent data for modes 4/5 (channel permutation, axis
    fit, alpha min/max) — identical for both modes, computed once."""
    rot_data = {}
    for rot in rots:
        if rot == 0:
            xf = xf0
        else:
            perm = list(range(4))
            perm[rot - 1], perm[3] = 3, rot - 1
            xf = [xf0[perm[c]] for c in range(4)]
        e0, e1 = _k_axis(xf, None, False)
        e0[3] = jnp.min(xf[3], axis=0)
        e1[3] = jnp.max(xf[3], axis=0)
        rot_data[rot] = (xf, e0, e1)
    return rot_data


def _k_mode45(rot_data, mode_id: int, aw: float = 1.0,
              rots=(0, 1, 2, 3), ims=(0, 1)):
    """Mode 4 or 5: dual indices over rotation x index-mode combos,
    keep-best, anchor fixes on the winner (bc67._try_single_mode).
    Returns (err, words)."""
    (_, _, _, rot_bits, im_bits, prec1, prec2, rgba_prec,
     rgba_prec_p) = _BC7_FULL_STATICS[mode_id]
    if not im_bits:
        ims = (0,)
    best = None
    for rot in rots:
        xf, e0, e1 = rot_data[rot]
        alpha_ch = 3 if rot == 0 else rot - 1
        # first-pass endpoint quantization AND axis projections depend
        # only on the rotation — both index modes share them
        q0r, q1r, _, _, u0r, u1r = _k_quant_endpoints(
            e0, e1, rgba_prec, rgba_prec_p, False)
        projc_r = _proj_p64(xf, u0r, u1r, 0, 3)
        proja_r = _proj_p64(xf, u0r, u1r, 3, 4)
        for im in ims:
            cprec = prec2 if im else prec1
            aprec = prec1 if im else prec2

            def qpal(e0l, e1l, pre=None):
                if pre is None:
                    q0l, q1l, _, _, u0l, u1l = _k_quant_endpoints(
                        e0l, e1l, rgba_prec, rgba_prec_p, False)
                    projc = _proj_p64(xf, u0l, u1l, 0, 3)
                    proja = _proj_p64(xf, u0l, u1l, 3, 4)
                else:
                    q0l, q1l, projc, proja = pre
                cidx, cdist = _snap_dist(*projc, cprec, 0,
                                         aw=aw, alpha_ch=alpha_ch)
                aidx, adist = _snap_dist(*proja, aprec, 3,
                                         aw=aw, alpha_ch=alpha_ch)
                return (q0l, q1l, cidx, aidx,
                        jnp.sum(cdist, axis=0) + jnp.sum(adist, axis=0))

            q0, q1, cidx, aidx, err = qpal(e0, e1,
                                           pre=(q0r, q1r, projc_r,
                                                proja_r))
            e0c, e1c = _k_refit(xf, cidx, None, cprec, e0, e1, 0, 3)
            e0c, e1c = _k_refit(xf, aidx, None, aprec, e0c, e1c, 3, 4)
            q0b, q1b, cidx_b, aidx_b, err_b = qpal(e0c, e1c)
            bt = err_b < err
            bt16 = bt[None, :]
            q0 = [jnp.where(bt, q0b[c], q0[c]) for c in range(4)]
            q1 = [jnp.where(bt, q1b[c], q1[c]) for c in range(4)]
            cidx = jnp.where(bt16, cidx_b, cidx)
            aidx = jnp.where(bt16, aidx_b, aidx)
            err = jnp.minimum(err_b, err)

            # anchor fixes happen once, on the fold winner, below
            best = _k_fold45(best, (err,
                                    jnp.full_like(err, rot),
                                    jnp.full_like(err, im),
                                    q0, q1, cidx, aidx))
    return _k_mode45_finish(mode_id, best)


def _k_fold45(best, state):
    """Running-best fold of one (rot, im) candidate's modes-4/5 state
    (err, rot, im, q0, q1, cidx, aidx)."""
    if best is None:
        return state
    bt = state[0] < best[0]
    bt16 = bt[None, :]
    return (
        jnp.where(bt, state[0], best[0]),
        jnp.where(bt, state[1], best[1]),
        jnp.where(bt, state[2], best[2]),
        [jnp.where(bt, state[3][c], best[3][c]) for c in range(4)],
        [jnp.where(bt, state[4][c], best[4][c]) for c in range(4)],
        jnp.where(bt16, state[5], best[5]),
        jnp.where(bt16, state[6], best[6]),
    )


def _k_mode45_finish(mode_id: int, best):
    """Anchor-fix and emit a modes-4/5 fold winner."""
    prec1 = _BC7_FULL_STATICS[mode_id][5]
    prec2 = _BC7_FULL_STATICS[mode_id][6]
    err, rot_d, im_d, q0, q1, cidx, aidx = best
    # independent anchor fixes on the winner (BC6HBC7.cpp:3196-3216).
    # int broadcasts + full-shape compares: mosaic can't broadcast i1
    rot_i = rot_d.astype(jnp.int32)
    im_i = im_d.astype(jnp.int32)
    im_is0 = im_i == 0
    im16 = jnp.broadcast_to(im_i[None, :], cidx.shape) == 0
    w1 = jnp.where(im16, cidx, aidx)
    w2 = jnp.where(im16, aidx, cidx)
    msb1, maxi1 = 1 << (prec1 - 1), (1 << prec1) - 1
    msb2, maxi2 = 1 << (prec2 - 1), (1 << prec2) - 1
    swap1 = w1[0] >= msb1                        # f32 idx: msb set test
    w1 = jnp.where(swap1[None, :], maxi1 - w1, w1)
    swap2 = w2[0] >= msb2
    w2 = jnp.where(swap2[None, :], maxi2 - w2, w2)
    swap_rgb = (im_is0 & swap1) | (~im_is0 & swap2)
    swap_a = (im_is0 & swap2) | (~im_is0 & swap1)
    sw = [swap_rgb, swap_rgb, swap_rgb, swap_a]
    q0s = [jnp.where(sw[c], q1[c], q0[c]) for c in range(4)]
    q1s = [jnp.where(sw[c], q0[c], q1[c]) for c in range(4)]
    zero = jnp.zeros_like(err, dtype=jnp.int32)
    words = _k_emit(mode_id, err, 0, rot_i, im_i, [q0s], [q1s],
                    [zero], [zero], w1, w2, None, None)
    return err, words


def _k_float_snap_dist(d0, e, p64, prec: int, score: bool = True):
    """Snap projections to palette weights + LINEAR float-palette
    distance (no >>6 floor): the precision-free scorer of the shared
    fit trajectories (twin: bc67._float_assign_ch_t). score=False skips
    the distance planes (keep-better off). Returns (idx f32, dist f32
    or None)."""
    K = 1 << prec
    kf = jnp.clip(jnp.round(p64 * ((K - 1) / 64.0)), 0.0, K - 1.0)
    wk = _pal_weight_f(kf, K)
    wkp = _pal_weight_f(jnp.minimum(kf + 1.0, K - 1.0), K)
    wkm = _pal_weight_f(jnp.maximum(kf - 1.0, 0.0), K)
    up = (kf < K - 1) & (2.0 * p64 > wk + wkp)
    dn = (kf > 0) & (2.0 * p64 < wk + wkm)
    idx = jnp.where(up, kf + 1.0, jnp.where(dn, kf - 1.0, kf))
    if not score:
        return idx, None
    wkf = _pal_weight_f(idx, K) * jnp.float32(1 / 64)
    dist = jnp.zeros_like(p64)
    for d, ee in zip(d0, e):
        r = d - wkf * ee[None, :]
        dist = dist + r * r
    return idx, dist


def _k_modes45_shared(rot_data, aw: float = 1.0, rots=(0, 1, 2, 3),
                      rounds: int | None = None):
    """Shared-fit evaluation of modes 4/5 at index-mode 0 (r5, twin:
    bc67._try_modes45_shared): per rotation, ONE float trajectory —
    color at the common 2-bit index width, alpha at mode 4's 3-bit
    width — steers both modes' endpoint fits; each mode quantizes +
    rescores exactly once. Returns {mode_id: (err, words)}."""
    from . import bc67 as _bc67

    if rounds is None:
        rounds = _bc67.BC7_SHARED45_ROUNDS
    kb = _bc67.BC7_SHARED_KEEPBETTER
    best = {4: None, 5: None}
    for rot in rots:
        xf, e0, e1 = rot_data[rot]
        alpha_ch = 3 if rot == 0 else rot - 1

        # float trajectory (color K=4, alpha K=8); keep-better measured
        # quality-neutral OFF (bc67.BC7_SHARED_KEEPBETTER)
        def fpal(e0l, e1l, score):
            projc = _proj_p64(xf, e0l, e1l, 0, 3)
            proja = _proj_p64(xf, e0l, e1l, 3, 4)
            cidx, cdist = _k_float_snap_dist(projc[0], projc[1],
                                             projc[2], 2, score=score)
            aidx, adist = _k_float_snap_dist(proja[0], proja[1],
                                             proja[2], 3, score=score)
            if not score:
                return cidx, None, aidx, None
            return (cidx, jnp.sum(cdist, axis=0),
                    aidx, jnp.sum(adist, axis=0))

        cidx, cerr0, aidx, aerr0 = fpal(e0, e1, kb)
        e0c, e1c = list(e0), list(e1)
        cerr_b, aerr_b = cerr0, aerr0
        for r in range(rounds):
            e0c, e1c = _k_refit(xf, cidx, None, 2, e0c, e1c, 0, 3)
            e0c, e1c = _k_refit(xf, aidx, None, 3, e0c, e1c, 3, 4)
            if kb or r < rounds - 1:
                cidx, cerr_b, aidx, aerr_b = fpal(e0c, e1c, kb)
        if kb:
            bc_ = cerr_b < cerr0
            ba_ = aerr_b < aerr0
            e0s = [jnp.where(bc_, e0c[c], e0[c]) for c in range(3)] \
                + [jnp.where(ba_, e0c[3], e0[3])]
            e1s = [jnp.where(bc_, e1c[c], e1[c]) for c in range(3)] \
                + [jnp.where(ba_, e1c[3], e1[3])]
        else:
            e0s, e1s = list(e0c), list(e1c)

        for mode_id in (4, 5):
            (_, _, _, _, _, prec1, prec2, rgba_prec,
             rgba_prec_p) = _BC7_FULL_STATICS[mode_id]
            q0l, q1l, _, _, u0l, u1l = _k_quant_endpoints(
                e0s, e1s, rgba_prec, rgba_prec_p, False)
            projc = _proj_p64(xf, u0l, u1l, 0, 3)
            proja = _proj_p64(xf, u0l, u1l, 3, 4)
            cidx_e, cdist = _snap_dist(*projc, prec1, 0,
                                       aw=aw, alpha_ch=alpha_ch)
            aidx_e, adist = _snap_dist(*proja, prec2, 3,
                                       aw=aw, alpha_ch=alpha_ch)
            err = jnp.sum(cdist, axis=0) + jnp.sum(adist, axis=0)
            best[mode_id] = _k_fold45(
                best[mode_id], (err,
                                jnp.full_like(err, rot),
                                jnp.zeros_like(err),
                                q0l, q1l, cidx_e, aidx_e))
    return {m: _k_mode45_finish(m, best[m]) for m in (4, 5)}


def _single_modes_kernel(px_ref, e4_ref, w4_ref, e5_ref, w5_ref,
                         e6_ref, w6_ref, *, aw: float = 1.0,
                         rots=(0, 1, 2, 3), m4_ims=(0, 1)):
    """Modes 4/5/6 in one pass: all rotation x index-mode combos, keep-best
    per mode, emit each mode's winner (bc67._try_single_mode)."""
    xf0 = [px_ref[c * 16:(c + 1) * 16, :].astype(jnp.float32)
           for c in range(4)]

    err6, w6 = _k_mode6(xf0, aw=aw)
    e6_ref[...] = jnp.broadcast_to(err6[None, :], e6_ref.shape)
    w6_ref[...] = w6

    rot_data = _k_rot_data(xf0, rots)
    for mode_id, out_e, out_w in ((4, e4_ref, w4_ref), (5, e5_ref, w5_ref)):
        err, words = _k_mode45(rot_data, mode_id, aw=aw, rots=rots,
                               ims=m4_ims)
        out_e[...] = jnp.broadcast_to(err[None, :], out_e.shape)
        out_w[...] = words


@functools.partial(jax.jit, static_argnames=("interpret", "aw", "rots",
                                              "m4_ims"))
def single_modes_pallas(px_i: jnp.ndarray, interpret: bool = False,
                        aw: float = 1.0, rots: tuple = (0, 1, 2, 3),
                        m4_ims: tuple | None = None):
    """Modes 4, 5, 6 fused. px_i [16, 4, NB] i32. Returns
    {mode: (err [NB], words [NB, 4] u32)}. m4_ims=None resolves to the
    jnp twin's default (bc67._MODE4_IMS) so both sides share one scope."""
    from jax.experimental import pallas as pl

    if m4_ims is None:
        m4_ims = _MODE4_IMS
    nb = px_i.shape[2]
    nb_pad = -(-nb // _TILE) * _TILE
    pad = nb_pad - nb
    px_cm = jnp.transpose(px_i, (1, 0, 2)).reshape(64, nb)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))

    grid = (nb_pad // _TILE,)
    outs = pl.pallas_call(
        functools.partial(_single_modes_kernel, aw=aw, rots=rots,
                          m4_ims=m4_ims),
        grid=grid,
        in_specs=[pl.BlockSpec((64, _TILE), lambda i: (0, i))],
        out_specs=[pl.BlockSpec((8, _TILE), lambda i: (0, i)),
                   pl.BlockSpec((4, _TILE), lambda i: (0, i))] * 3,
        out_shape=[jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
                   jax.ShapeDtypeStruct((4, nb_pad), jnp.uint32)] * 3,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(px_cm)
    e4, w4, e5, w5, e6, w6 = outs
    return {4: (e4[0, :nb], w4[:, :nb].T),
            5: (e5[0, :nb], w5[:, :nb].T),
            6: (e6[0, :nb], w6[:, :nb].T)}


def _k_shape_topk(xf, mmat, partitions: int, n_shapes: int, nch: int,
                  n_cand: int, off_axis: bool = False,
                  axis_w: float | None = None):
    """Shape estimates + top-k in VMEM (bc67._shape_estimates_table +
    _top_k_shapes): per-(shape, subset) within-subset total variance via
    one MXU dot against the static 0/1 partition matrix mmat
    [n_sub*S, 16], then n_cand sequential argmins.
    Returns a list of n_cand s_blk rows [T] i32. `nch` is unused since
    the channel set is fixed by the plane layout but stays in the
    signature for parity with bc67._shape_estimates_table.

    `off_axis=True` subtracts (1 - axis_w) of the dominant-axis variance
    (power iteration on the within-subset RGB covariance) so two-region
    blocks rank by the residual a linear palette cannot carry: measured
    +0.95 dB on the golden HDR probe (BC6H, axis_w=0) and +0.28 dB on
    LDR albedo (BC7, axis_w=_ON_AXIS_W) at the same candidate count,
    both past the compiled reference encoder."""
    del nch
    if axis_w is None:
        axis_w = _ON_AXIS_W
    n_sub = partitions + 1
    t_lanes = xf[0].shape[1]

    mu = [jnp.mean(f, axis=0) for f in xf]
    xc = [f - m[None, :] for f, m in zip(xf, mu)]
    q = sum(c * c for c in xc)
    planes = [q] + xc                                # 5 x [16, T]
    pairs = [(a, b) for a in range(3) for b in range(a, 3)]
    if off_axis:
        planes += [xc[a] * xc[b] for a, b in pairs]  # 6 cross moments
    rhs = jnp.concatenate(planes, axis=1)            # [16, 5(+6)*T]

    n_inv = 1.0 / jnp.maximum(jnp.sum(mmat, axis=1, keepdims=True), 1.0)
    sp = jax.lax.dot_general(
        mmat, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [n_sub*S, 5(+6)*T]

    est = jnp.zeros((n_shapes, t_lanes), jnp.float32)
    for p in range(n_sub):
        spp = sp[p * n_shapes:(p + 1) * n_shapes]
        ninv = n_inv[p * n_shapes:(p + 1) * n_shapes]

        def col(k, spp=spp):
            return spp[:, k * t_lanes:(k + 1) * t_lanes]

        ch2 = sum(col(1 + c) ** 2 for c in range(4))
        sse = col(0) - ch2 * ninv
        if not off_axis:
            est = est + sse
            continue
        # n-scaled within-subset RGB covariance entries
        C = {}
        for k, (a, b) in enumerate(pairs):
            C[(a, b)] = col(5 + k) - col(1 + a) * col(1 + b) * ninv

        def cdot(a, b):
            return C[(a, b)] if (a, b) in C else C[(b, a)]

        v = [jnp.ones_like(sse) for _ in range(3)]
        for _ in range(_POWER_ITERS):
            w = [sum(cdot(a, b) * v[b] for b in range(3))
                 for a in range(3)]
            nrm = jnp.sqrt(sum(x * x for x in w))
            vinv = 1.0 / jnp.maximum(nrm, 1e-20)
            v = [x * vinv for x in w]
        lam = sum(v[a] * sum(cdot(a, b) * v[b] for b in range(3))
                  for a in range(3))
        est = est + jnp.maximum(sse - lam * (1.0 - axis_w), 0.0)

    big = jnp.float32(jnp.inf)
    out = []
    for cand in range(n_cand):
        best_e = est[0]
        s_blk = jnp.zeros((t_lanes,), jnp.int32)
        for s in range(1, n_shapes):
            b = est[s] < best_e
            best_e = jnp.where(b, est[s], best_e)
            s_blk = jnp.where(b, s, s_blk)
        out.append(s_blk)
        if cand + 1 < n_cand:
            rows = [jnp.where(s == s_blk, big, est[s])
                    for s in range(n_shapes)]
            est = jnp.stack(rows)
    return out


def _shape_topk_kernel(px_ref, m_ref, sb_ref, *, partitions: int,
                       n_shapes: int, nch: int, n_cand: int,
                       off_axis: bool, axis_w: float | None):
    xf = [px_ref[c * 16:(c + 1) * 16, :].astype(jnp.float32)
          for c in range(4)]
    sb_rows = _k_shape_topk(xf, m_ref[...], partitions, n_shapes, nch,
                            n_cand, off_axis=off_axis, axis_w=axis_w)
    for cand, s_blk in enumerate(sb_rows):
        sb_ref[cand, :] = s_blk


@functools.partial(jax.jit, static_argnames=(
    "partitions", "n_shapes", "nch", "n_cand", "interpret", "off_axis",
    "axis_w"))
def partition_shapes_pallas(px_i: jnp.ndarray, partitions: int,
                            n_shapes: int, nch: int, n_cand: int,
                            interpret: bool = False,
                            off_axis: bool = False,
                            axis_w: float | None = None):
    """Top n_cand shape candidates per block. px_i [16, 4, NB] i32.
    Returns s_blks [n_cand, NB] i32."""
    from jax.experimental import pallas as pl

    from .bc67_tables import PARTITIONS

    nb = px_i.shape[2]
    nb_pad = -(-nb // _TILE) * _TILE
    pad = nb_pad - nb
    px_cm = jnp.transpose(px_i, (1, 0, 2)).reshape(64, nb)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))

    parts = PARTITIONS[partitions][:n_shapes]
    n_sub = partitions + 1
    m_host = np.concatenate(
        [(parts == p).astype(np.float32) for p in range(n_sub)], axis=0)

    kern = functools.partial(
        _shape_topk_kernel, partitions=partitions, n_shapes=n_shapes,
        nch=nch, n_cand=n_cand, off_axis=off_axis, axis_w=axis_w)
    sb = pl.pallas_call(
        kern,
        grid=(nb_pad // _TILE,),
        in_specs=[pl.BlockSpec((64, _TILE), lambda i: (0, i)),
                  pl.BlockSpec((n_sub * n_shapes, 16), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((n_cand, _TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n_cand, nb_pad), jnp.int32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(px_cm, jnp.asarray(m_host))
    return sb[:, :nb]


def _bc7_all_kernel(px_ref, m_ref, *refs, modes: tuple,
                    n_cand: int, aw: float = 1.0,
                    rots=(0, 1, 2, 3), m4_ims=(0, 1), ladder=None,
                    share2sub: bool = False, share45: bool = False):
    """The whole BC7 encode in one dispatch: shape ranking, every mode's
    candidate evaluation, anchor swaps, emit, and the cross-mode fold all
    happen in VMEM — HBM sees the pixel planes in and one (err, words)
    pair out. Shape decode and the no-alpha axis fits are shared across
    the partition modes (modes 1 and 3 share with_alpha=False fits).
    `modes` is the fold order (encode_bc7's mode list). When modes 0/2
    (3-subset, BC_FLAGS_USE_3SUBSETS) are present an extra [192, 16]
    3-subset mask matrix ref precedes the two output refs in *refs."""
    if len(refs) == 3:
        m3_ref, err_ref, w_ref = refs
    else:
        m3_ref = None
        err_ref, w_ref = refs
    xf = [px_ref[c * 16:(c + 1) * 16, :].astype(jnp.float32)
          for c in range(4)]
    results = {}

    part3_modes = [m for m in modes if m in (0, 2)]
    if part3_modes:
        m3 = m3_ref[...]
        for m in part3_modes:
            n_sh = 1 << _BC7_FULL_STATICS[m][1]       # 16 for mode 0
            mm = m3 if n_sh == 64 else jnp.concatenate(
                [m3[0:n_sh], m3[64:64 + n_sh], m3[128:128 + n_sh]])
            sb_rows = _k_shape_topk(xf, mm, 2, n_sh, 4, n_cand,
                                    off_axis=True)
            cands3 = _k_decode_cands(sb_rows, 2, n_sh)
            ax3 = [_k_axis_multi(xf, masks, False)
                   for (_, _, _, masks) in cands3]
            results[m] = _k_partition_fold(xf, cands3, m, ax3, aw=aw)

    part_modes = [m for m in modes if m in (1, 3, 7)]
    if part_modes:
        # off-axis ranking in the default tier (r3): +0.28 dB on albedo
        # at the same candidate count, matching the reference full
        # search (BC6HBC7.cpp:2783-2889); same semantics as the jnp
        # default in bc67.encode_bc7
        sb_rows = _k_shape_topk(xf, m_ref[...], 1, 64, 4, n_cand,
                                off_axis=True)
        cands = _k_decode_cands(sb_rows, 1, 64)
        ax_na = None
        if any(m in (1, 3) for m in part_modes):
            ax_na = [_k_axis_multi(xf, masks, False)
                     for (_, _, _, masks) in cands]
        ax_a = None
        if 7 in part_modes:
            ax_a = [_k_axis_multi(xf, masks, True)
                    for (_, _, _, masks) in cands]
        rest = list(part_modes)
        if share2sub and 1 in part_modes and 3 in part_modes:
            # r5 shared-fit: one float trajectory per candidate serves
            # both modes 1 and 3 (bc67.BC7_SHARED2SUB)
            results.update(_k_partition_fold_multi(xf, cands, (1, 3),
                                                   ax_na, aw=aw))
            rest = [m for m in part_modes if m not in (1, 3)]
        for m in rest:
            results[m] = _k_partition_fold(xf, cands, m,
                                           ax_a if m == 7 else ax_na,
                                           aw=aw)
        if 7 in results:
            # no value for opaque blocks (reference skip, BC6HBC7.cpp:2818)
            opaque_blk = jnp.min(xf[3], axis=0) == 255.0
            e7, w7 = results[7]
            results[7] = (jnp.where(opaque_blk, jnp.inf, e7), w7)

    if 6 in modes:
        results[6] = _k_mode6(xf, aw=aw)
    if 4 in modes or 5 in modes:
        rot_data = _k_rot_data(xf, rots)
        if (share45 and 4 in modes and 5 in modes
                and tuple(m4_ims) == (0,)):
            # r5 shared-fit rotation family: one float trajectory per
            # rotation serves both modes (bc67.BC7_SHARED45)
            results.update(_k_modes45_shared(rot_data, aw=aw, rots=rots))
        else:
            for m in (4, 5):
                if m in modes:
                    results[m] = _k_mode45(rot_data, m, aw=aw, rots=rots,
                                           ims=m4_ims)

    best_e, best_w = None, None
    for m in modes:
        e, w = results[m]
        if best_e is None:
            best_e, best_w = e, w
        else:
            bt = e < best_e
            best_e = jnp.where(bt, e, best_e)
            best_w = jnp.where(bt[None, :], w, best_w)

    if ladder is not None:
        # fused winner-ladder (r4): run the endpoint-perturbation ladder
        # on the cross-mode winner in the SAME kernel, after the fold —
        # the search intermediates are dead here, and the pixel planes
        # are already in VMEM, so this reclaims the separate refine
        # dispatch's fixed unpack/score/emit overhead plus its second
        # HBM read of the pixels (the reference's single final
        # EncodeBlockCS pass, BCDirectCompute.cpp:373+).
        b0 = (best_w[0] & 0xFF).astype(jnp.int32)
        mode = jnp.full_like(b0, 8)
        for mv in range(8):
            hit = (b0 & (1 << mv)) != 0
            mode = jnp.where((mode == 8) & hit, mv, mode)
        for mv in modes:
            if mv in (4, 5):
                e_n, e_0, wn = _k_refine_mode45(xf, best_w, mv, ladder,
                                                aw)
            else:
                e_n, e_0, wn = _k_refine_subsets(xf, best_w, mv, ladder,
                                                 aw)
            better = (mode == mv) & (e_n < e_0)
            best_w = jnp.where(better[None, :], wn, best_w)
            best_e = jnp.where(better, e_n, best_e)

    err_ref[...] = jnp.broadcast_to(best_e[None, :], err_ref.shape)
    w_ref[...] = best_w


# measured on v5e at 2K opaque: tile 512 -> 344.8 Mt/s, 384 -> 329.8,
# 256 -> 357.3, 128 -> 338.0
_BC7_ALL_TILE = 256


@functools.partial(jax.jit, static_argnames=("modes", "n_cand",
                                              "interpret", "tile", "aw",
                                              "rots", "m4_ims", "ladder",
                                              "share2sub", "share45"))
def bc7_encode_pallas(px_i: jnp.ndarray, modes: tuple, n_cand: int = 4,
                      interpret: bool = False, tile: int = _BC7_ALL_TILE,
                      aw: float = 1.0, rots: tuple = (0, 1, 2, 3),
                      m4_ims: tuple | None = None,
                      ladder: tuple | None = None,
                      share2sub: bool | None = None,
                      share45: bool | None = None):
    """Full BC7 search as ONE pallas dispatch over modes ⊆ {0..7}
    folded in `modes` order (mode-7 errors are inf-masked for opaque
    blocks in-kernel; modes 0/2 ride a second 3-subset mask matrix).
    `ladder` (rounds, deltas) fuses the winner-refine perturbation
    ladder into the kernel tail after the cross-mode fold (r4) — same
    math as a bc7_refine_pallas dispatch on the result, minus that
    dispatch's fixed overhead and second HBM pixel read. In-search
    laddering of every CANDIDATE measured 304 -> 117 Mtexels/s on v5e
    for LESS quality than winner-refine; laddering the folded WINNER
    in-kernel is the cheap shape.
    px_i [16, 4, NB] i32. Returns (err [NB] f32, words [NB, 4] u32).
    m4_ims=None resolves to bc67._MODE4_IMS (shared twin default)."""
    from jax.experimental import pallas as pl

    from .bc67_tables import PARTITIONS

    if m4_ims is None:
        m4_ims = _MODE4_IMS
    if share2sub is None or share45 is None:
        from . import bc67 as _bc67
        if share2sub is None:
            share2sub = _bc67.BC7_SHARED2SUB
        if share45 is None:
            share45 = _bc67.BC7_SHARED45
    nb = px_i.shape[2]
    nb_pad = -(-nb // tile) * tile
    pad = nb_pad - nb
    px_cm = jnp.transpose(px_i, (1, 0, 2)).reshape(64, nb)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))

    parts = PARTITIONS[1]
    m_host = np.concatenate(
        [(parts == p).astype(np.float32) for p in range(2)], axis=0)

    inputs = [px_cm, jnp.asarray(m_host)]
    in_specs = [pl.BlockSpec((64, tile), lambda i: (0, i)),
                pl.BlockSpec((128, 16), lambda i: (0, 0))]
    if any(m in (0, 2) for m in modes):
        parts3 = PARTITIONS[2]
        m3_host = np.concatenate(
            [(parts3 == p).astype(np.float32) for p in range(3)], axis=0)
        inputs.append(jnp.asarray(m3_host))
        in_specs.append(pl.BlockSpec((192, 16), lambda i: (0, 0)))

    err8, words = pl.pallas_call(
        functools.partial(_bc7_all_kernel, modes=modes, n_cand=n_cand,
                          aw=aw, rots=rots, m4_ims=m4_ims, ladder=ladder,
                          share2sub=share2sub, share45=share45),
        grid=(nb_pad // tile,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((8, tile), lambda i: (0, i)),
                   pl.BlockSpec((4, tile), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
                   jax.ShapeDtypeStruct((4, nb_pad), jnp.uint32)],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*inputs)
    return err8[0, :nb], words[:, :nb].T


# ---------------------------------------------------------------------------
# Winner-refine kernel
# ---------------------------------------------------------------------------
# The search kernel emits each block's best (mode, shape, endpoints,
# indices); this second dispatch unpacks that winning state from the packed
# words and runs the bounded endpoint-perturbation ladder on it ONLY
# (OptimizeEndPoints/PerturbOne analog, BC6HBC7.cpp:2926-3044), then one
# re-assignment, anchor fixes and re-emit where the error improved.
# Winner-scope is both faster AND better than laddering every candidate
# in-search: the in-search light ladder measured 304 -> 117 Mtexels/s on
# v5e and LOST to winner-refine on 4 of 6 corpus contents (the refine's
# re-assignment runs on the final state). bc67.refine_bc7_words is the twin.


def _k_refine_subsets(xf, words, mode_id: int, ladder, aw: float):
    """Refine one partition-family mode (0-3, 6, 7). words [4, T] u32.
    Returns (err_new, err_old [T], words [4, T])."""
    from . import bc67
    (parts, part_bits, p_bits, _, _, iprec, _,
     rgba_prec, rgba_prec_p) = _BC7_FULL_STATICS[mode_id]
    n_sub = parts + 1
    shared_p = p_bits == n_sub and p_bits > 0
    shape, _, _, q0s_, q1s_, p0s, p1s, idx_i, _ = \
        bc67._bc7_unpack_mode(words, mode_id)
    q0s = [[q0s_[p][c] for c in range(4)] for p in range(n_sub)]
    q1s = [[q1s_[p][c] for c in range(4)] for p in range(n_sub)]
    idx_full = idx_i.astype(jnp.float32)

    if parts:
        pp_tab, pa_tab = _packed_tables(parts, 1 << part_bits)
        pp = jnp.zeros_like(shape, dtype=jnp.uint32)
        pa = jnp.zeros_like(shape)
        for sv in range(1 << part_bits):
            hit = shape == sv
            pp = jnp.where(hit, jnp.uint32(pp_tab[sv]), pp)
            pa = jnp.where(hit, pa_tab[sv], pa)
        pm = jnp.stack([((pp >> (2 * i)) & 3).astype(jnp.int32)
                        for i in range(16)])
        masks = [pm == p for p in range(n_sub)]
        a2 = pa & 0xF
        a3 = (pa >> 4) & 0xF if parts == 2 else None
    else:
        masks = [None]
        a2 = a3 = None

    def msum(plane, p):
        return jnp.sum(plane if masks[p] is None
                       else jnp.where(masks[p], plane, 0.0), axis=0)

    def sel(vals):
        if masks[0] is None:
            return vals[0][None, :]
        return _k_sel_px(masks, vals)

    wk = _pal_weight_f(idx_full, 1 << iprec)
    prec_spec = (rgba_prec, rgba_prec_p, shared_p)
    q0t_s, q1t_s, errl_s, err0_s = [], [], [], []
    for p in range(n_sub):
        if ladder == bc67.LADDER_MOMENT:
            q0t, q1t, errl, err0 = _k_moment_subset(
                xf, masks[p], prec_spec, q0s[p], q1s[p], p0s[p], p1s[p],
                [wk] * 4, aw=aw)
        else:
            q0t, q1t, errl, err0 = _k_perturb_subset(
                xf, masks[p], prec_spec, q0s[p], q1s[p], p0s[p], p1s[p],
                [wk] * 4, ladder, aw=aw)
        q0t_s.append(q0t)
        q1t_s.append(q1t)
        errl_s.append(errl)
        err0_s.append(err0)

    def unq(qc, pb, c):
        if rgba_prec[c] == 0:
            return jnp.full_like(qc, 255)
        return _k_unquant_channel(qc, pb, rgba_prec[c], rgba_prec_p[c])

    # one fused re-assignment over all subsets (per-pixel endpoint select)
    p1u_s = [p0s[p] if shared_p else p1s[p] for p in range(n_sub)]
    u0f_s = [[unq(q0t_s[p][c], p0s[p], c).astype(jnp.float32)
              for c in range(4)] for p in range(n_sub)]
    u1f_s = [[unq(q1t_s[p][c], p1u_s[p], c).astype(jnp.float32)
              for c in range(4)] for p in range(n_sub)]
    u0px = [sel([u0f_s[p][c] for p in range(n_sub)]) for c in range(4)]
    e_s = [[u1f_s[p][c] - u0f_s[p][c] for c in range(4)]
           for p in range(n_sub)]
    span_s = [sum(e_s[p][c] * e_s[p][c] for c in range(4))
              for p in range(n_sub)]
    e_px = [sel([e_s[p][c] for p in range(n_sub)]) for c in range(4)]
    span_px = sel(span_s)
    idx_t, dist_t = _project_assign_px(xf, u0px, None, e_px, span_px,
                                       iprec, aw=aw)
    err_new = None
    err_old = None
    for p in range(n_sub):
        err_t = msum(dist_t, p)
        keep = err_t < errl_s[p]
        err_t2 = jnp.minimum(err_t, errl_s[p])
        bt = err_t2 < err0_s[p]
        q0s[p] = [jnp.where(bt, q0t_s[p][c], q0s[p][c]) for c in range(4)]
        q1s[p] = [jnp.where(bt, q1t_s[p][c], q1s[p][c]) for c in range(4)]
        upd = (bt & keep)[None, :]
        if masks[p] is not None:
            upd = upd & masks[p]
        idx_full = jnp.where(upd, idx_t, idx_full)
        en = jnp.minimum(err_t2, err0_s[p])
        err_new = en if err_new is None else err_new + en
        err_old = err0_s[p] if err_old is None else err_old + err0_s[p]

    # anchor swaps on the refined state (AssignIndices, :3181-3194)
    msb, maxi = 1 << (iprec - 1), (1 << iprec) - 1
    anch = [None, a2, a3]
    for p in range(n_sub):
        if p == 0:
            a_idx = idx_full[0]
        else:
            a_idx = _k_anchor_index(idx_full, anch[p])
        swap = a_idx >= msb                      # f32 idx: msb set test
        q0s[p], q1s[p] = (
            [jnp.where(swap, q1s[p][c], q0s[p][c]) for c in range(4)],
            [jnp.where(swap, q0s[p][c], q1s[p][c]) for c in range(4)])
        p0s[p], p1s[p] = (jnp.where(swap, p1s[p], p0s[p]),
                          jnp.where(swap, p0s[p], p1s[p]))
        upd = swap[None, :]
        if masks[p] is not None:
            upd = upd & masks[p]
        idx_full = jnp.where(upd, maxi - idx_full, idx_full)
    words_n = _k_emit(mode_id, err_new, shape.astype(jnp.uint32), 0, 0,
                      q0s, q1s, p0s, p1s, idx_full, None, a2, a3)
    return err_new, err_old, words_n


_GEN_2SUB = (1, 3, 7)


def _k_refine_2sub(xf, words, mode, modes_g: tuple, ladder, aw: float):
    """Unified winner-refine for the 2-subset partition-family modes
    (1/3/7): ONE ladder + ONE fused re-assignment + ONE partition-table
    fold serve all three families, with endpoint/index precision lifted
    from python statics to per-lane DATA rows — the families differ
    ONLY in field precisions (ms_aInfo, BC6HBC7.cpp:1106-1125), and
    each lane belongs to exactly one family, so running three full
    passes (as _k_refine_subsets per mode does) triples the [16, T]
    plane work for no information. Per-lane bit-identical to
    _k_refine_subsets at that lane's mode: the f32 expression trees
    and integer quantization paths are unchanged (dyn helpers select
    the same f32 constants); only python branches became where-selects.
    Returns (err_new, err_old [T], {mode_id: words [4, T]})."""
    from . import bc67
    S = _BC7_FULL_STATICS
    sts = {mv: bc67._bc7_unpack_mode(words, mv) for mv in modes_g}

    def msel(get):
        out = get(modes_g[0])
        for mv in modes_g[1:]:
            out = jnp.where(mode == mv, get(mv), out)
        return out

    def msel16(get):
        m16 = mode[None, :]
        out = get(modes_g[0])
        for mv in modes_g[1:]:
            out = jnp.where(m16 == mv, get(mv), out)
        return out

    def const_row(field, dtype=jnp.int32):
        out = jnp.full(mode.shape, field(modes_g[0]), dtype)
        for mv in modes_g[1:]:
            out = jnp.where(mode == mv, jnp.asarray(field(mv), dtype), out)
        return out

    shape = msel(lambda mv: sts[mv][0])
    q0s = [[msel(lambda mv: sts[mv][3][p][c]) for c in range(4)]
           for p in range(2)]
    q1s = [[msel(lambda mv: sts[mv][4][p][c]) for c in range(4)]
           for p in range(2)]
    p0s = [msel(lambda mv: sts[mv][5][p]) for p in range(2)]
    p1s = [msel(lambda mv: sts[mv][6][p]) for p in range(2)]
    idx_full = msel16(lambda mv: sts[mv][7]).astype(jnp.float32)

    prec_rows = (const_row(lambda mv: S[mv][7][0]),
                 const_row(lambda mv: S[mv][8][0]),
                 const_row(lambda mv: S[mv][7][3]),
                 const_row(lambda mv: S[mv][8][3]))
    a_enc = const_row(lambda mv: S[mv][7][3]) > 0
    km1 = const_row(lambda mv: float((1 << S[mv][5]) - 1), jnp.float32)
    fK = const_row(lambda mv: np.float32(64.0 / ((1 << S[mv][5]) - 1)),
                   jnp.float32)
    msb = const_row(lambda mv: float(1 << (S[mv][5] - 1)), jnp.float32)

    # one partition-table fold: every 2-subset mode indexes the same
    # 64-shape table (g_aPartitionTable, BC6HBC7.cpp:58-262)
    pp_tab, pa_tab = _packed_tables(1, 64)
    pp = jnp.zeros_like(shape, dtype=jnp.uint32)
    pa = jnp.zeros_like(shape)
    for sv in range(64):
        hit = shape == sv
        pp = jnp.where(hit, jnp.uint32(pp_tab[sv]), pp)
        pa = jnp.where(hit, pa_tab[sv], pa)
    pm = jnp.stack([((pp >> (2 * i)) & 3).astype(jnp.int32)
                    for i in range(16)])
    masks = [pm == p for p in range(2)]
    a2 = pa & 0xF

    def msum(plane, p):
        return jnp.sum(jnp.where(masks[p], plane, 0.0), axis=0)

    wk = jnp.floor(idx_full * fK[None, :] + 0.5)
    q0t_s, q1t_s, errl_s, err0_s = [], [], [], []
    for p in range(2):
        if ladder == bc67.LADDER_MOMENT:
            q0t, q1t, errl, err0 = _k_moment_subset_dyn(
                xf, masks[p], prec_rows, q0s[p], q1s[p], p0s[p], p1s[p],
                [wk] * 4, a_enc, aw=aw)
        else:
            q0t, q1t, errl, err0 = _k_perturb_subset_dyn(
                xf, masks[p], prec_rows, q0s[p], q1s[p], p0s[p], p1s[p],
                [wk] * 4, ladder, a_enc, aw=aw)
        q0t_s.append(q0t)
        q1t_s.append(q1t)
        errl_s.append(errl)
        err0_s.append(err0)

    def unq(qc, pb, c):
        u = _k_unquant_dyn(qc, pb, prec_rows[1] if c < 3 else prec_rows[3])
        return u if c < 3 else jnp.where(a_enc, u, 255)

    # one fused re-assignment over both subsets (per-pixel endpoint sel)
    u0f_s = [[unq(q0t_s[p][c], p0s[p], c).astype(jnp.float32)
              for c in range(4)] for p in range(2)]
    u1f_s = [[unq(q1t_s[p][c], p1s[p], c).astype(jnp.float32)
              for c in range(4)] for p in range(2)]
    u0px = [_k_sel_px(masks, [u0f_s[p][c] for p in range(2)])
            for c in range(4)]
    e_s = [[u1f_s[p][c] - u0f_s[p][c] for c in range(4)]
           for p in range(2)]
    span_s = [sum(e_s[p][c] * e_s[p][c] for c in range(4))
              for p in range(2)]
    e_px = [_k_sel_px(masks, [e_s[p][c] for p in range(2)])
            for c in range(4)]
    span_px = _k_sel_px(masks, span_s)
    idx_t, dist_t = _project_assign_px_dyn(xf, u0px, e_px, span_px,
                                           km1, fK, aw=aw)
    err_new = None
    err_old = None
    for p in range(2):
        err_t = msum(dist_t, p)
        keep = err_t < errl_s[p]
        err_t2 = jnp.minimum(err_t, errl_s[p])
        bt = err_t2 < err0_s[p]
        q0s[p] = [jnp.where(bt, q0t_s[p][c], q0s[p][c]) for c in range(4)]
        q1s[p] = [jnp.where(bt, q1t_s[p][c], q1s[p][c]) for c in range(4)]
        upd = (bt & keep)[None, :] & masks[p]
        idx_full = jnp.where(upd, idx_t, idx_full)
        en = jnp.minimum(err_t2, err0_s[p])
        err_new = en if err_new is None else err_new + en
        err_old = err0_s[p] if err_old is None else err_old + err0_s[p]

    # anchor swaps on the refined state (AssignIndices, :3181-3194)
    maxi = 2.0 * msb - 1.0
    for p in range(2):
        if p == 0:
            a_idx = idx_full[0]
        else:
            a_idx = _k_anchor_index(idx_full, a2)
        swap = a_idx >= msb                      # f32 idx: msb set test
        q0s[p], q1s[p] = (
            [jnp.where(swap, q1s[p][c], q0s[p][c]) for c in range(4)],
            [jnp.where(swap, q0s[p][c], q1s[p][c]) for c in range(4)])
        p0s[p], p1s[p] = (jnp.where(swap, p1s[p], p0s[p]),
                          jnp.where(swap, p0s[p], p1s[p]))
        upd = swap[None, :] & masks[p]
        idx_full = jnp.where(upd, maxi[None, :] - idx_full, idx_full)

    words_by_mode = {
        mv: _k_emit(mv, err_new, shape.astype(jnp.uint32), 0, 0,
                    q0s, q1s, p0s, p1s, idx_full, None, a2, None)
        for mv in modes_g}
    return err_new, err_old, words_by_mode


def _k_refine_mode45(xf, words, mode_id: int, ladder, aw: float):
    """Refine modes 4/5: per-lane rotation and index-mode, ladder with
    separate color/alpha weight planes, dual re-assignment, independent
    anchor fixes. Returns (err_new, err_old [T], words [4, T])."""
    from . import bc67
    (_, _, _, _, im_bits, iprec, iprec2,
     rgba_prec, rgba_prec_p) = _BC7_FULL_STATICS[mode_id]
    _, rot, im, q0s_, q1s_, _, _, w1i, w2i = \
        bc67._bc7_unpack_mode(words, mode_id)
    q0 = [q0s_[0][c] for c in range(4)]
    q1 = [q1s_[0][c] for c in range(4)]
    w1 = w1i.astype(jnp.float32)
    w2 = w2i.astype(jnp.float32)
    zero = jnp.zeros_like(rot)
    rot16 = jnp.broadcast_to(rot[None, :], xf[0].shape)

    # rotated pixel planes (channel rot-1 <-> alpha), per-lane
    xr = []
    for c in range(3):
        xr.append(jnp.where(rot16 == c + 1, xf[3], xf[c]))
    xa = xf[3]
    for c in range(3):
        xa = jnp.where(rot16 == c + 1, xf[c], xa)
    xr.append(xa)

    # per-lane alpha-weight rows: the true alpha sits at rot-1 in
    # rotated space (3 when unrotated)
    w_rows = None
    if aw != 1.0:
        w_rows = []
        for c in range(4):
            is_a = (rot == 0) if c == 3 else (rot == c + 1)
            w_rows.append(jnp.where(is_a, jnp.float32(aw),
                                    jnp.float32(1.0)))

    im0 = im == 0
    im0_16 = jnp.broadcast_to(im0[None, :], w1.shape)
    cidx = jnp.where(im0_16, w1, w2)
    aidx = jnp.where(im0_16, w2, w1)
    wkc = jnp.where(im0_16, _pal_weight_f(cidx, 1 << iprec),
                    _pal_weight_f(cidx, 1 << iprec2))
    wka = jnp.where(im0_16, _pal_weight_f(aidx, 1 << iprec2),
                    _pal_weight_f(aidx, 1 << iprec))

    if ladder == bc67.LADDER_MOMENT:
        q0t, q1t, errl, err0 = _k_moment_subset(
            xr, None, (rgba_prec, rgba_prec_p, False), q0, q1, zero,
            zero, [wkc, wkc, wkc, wka], aw=aw, w_rows=w_rows)
    else:
        q0t, q1t, errl, err0 = _k_perturb_subset(
            xr, None, (rgba_prec, rgba_prec_p, False), q0, q1, zero,
            zero, [wkc, wkc, wkc, wka], ladder, aw=aw, w_rows=w_rows)
    u0 = [_k_unquant_channel(q0t[c], zero, rgba_prec[c], rgba_prec_p[c])
          for c in range(4)]
    u1 = [_k_unquant_channel(q1t[c], zero, rgba_prec[c], rgba_prec_p[c])
          for c in range(4)]
    projc = _proj_p64(xr, u0, u1, 0, 3)
    proja = _proj_p64(xr, u0, u1, 3, 4)
    cidx_a, cdist_a = _snap_dist(*projc, iprec, 0, aw=aw, w_rows=w_rows)
    aidx_a, adist_a = _snap_dist(*proja, iprec2, 3, aw=aw, w_rows=w_rows)
    if im_bits:
        cidx_b, cdist_b = _snap_dist(*projc, iprec2, 0, aw=aw,
                                     w_rows=w_rows)
        aidx_b, adist_b = _snap_dist(*proja, iprec, 3, aw=aw,
                                     w_rows=w_rows)
        cidx_t = jnp.where(im0_16, cidx_a, cidx_b)
        aidx_t = jnp.where(im0_16, aidx_a, aidx_b)
        err_t = jnp.where(im0,
                          jnp.sum(cdist_a, axis=0) + jnp.sum(adist_a,
                                                             axis=0),
                          jnp.sum(cdist_b, axis=0) + jnp.sum(adist_b,
                                                             axis=0))
    else:
        cidx_t, aidx_t = cidx_a, aidx_a
        err_t = jnp.sum(cdist_a, axis=0) + jnp.sum(adist_a, axis=0)

    keep = err_t < errl
    keep16 = keep[None, :]
    cidx_t2 = jnp.where(keep16, cidx_t, cidx)
    aidx_t2 = jnp.where(keep16, aidx_t, aidx)
    err_t2 = jnp.minimum(err_t, errl)
    bt = err_t2 < err0
    bt16 = bt[None, :]
    q0f = [jnp.where(bt, q0t[c], q0[c]) for c in range(4)]
    q1f = [jnp.where(bt, q1t[c], q1[c]) for c in range(4)]
    cidx = jnp.where(bt16, cidx_t2, cidx)
    aidx = jnp.where(bt16, aidx_t2, aidx)
    err_new = jnp.minimum(err_t2, err0)

    # independent anchor fixes (AssignIndices, BC6HBC7.cpp:3196-3216)
    w1n = jnp.where(im0_16, cidx, aidx)
    w2n = jnp.where(im0_16, aidx, cidx)
    msb1, maxi1 = 1 << (iprec - 1), (1 << iprec) - 1
    msb2, maxi2 = 1 << (iprec2 - 1), (1 << iprec2) - 1
    swap1 = w1n[0] >= msb1                       # f32 idx: msb set test
    w1n = jnp.where(swap1[None, :], maxi1 - w1n, w1n)
    swap2 = w2n[0] >= msb2
    w2n = jnp.where(swap2[None, :], maxi2 - w2n, w2n)
    swap_rgb = (im0 & swap1) | (~im0 & swap2)
    swap_a = (im0 & swap2) | (~im0 & swap1)
    sw = [swap_rgb, swap_rgb, swap_rgb, swap_a]
    q0e = [jnp.where(sw[c], q1f[c], q0f[c]) for c in range(4)]
    q1e = [jnp.where(sw[c], q0f[c], q1f[c]) for c in range(4)]
    words_n = _k_emit(mode_id, err_new, 0, rot, im, [q0e], [q1e],
                      [zero], [zero], w1n, w2n, None, None)
    return err_new, err0, words_n


def _k_refine_45uni(xf, words, mode, modes_g: tuple, ladder, aw: float):
    """Unified winner-refine for the rotation-family modes (4/5): the
    two families differ ONLY in endpoint precision (RGB5A6 vs RGB7A8)
    and the second index width (3 vs 2 bits; ms_aInfo,
    BC6HBC7.cpp:1106-1125), so one ladder + one dual re-assignment with
    per-lane precision rows replaces the two full _k_refine_mode45
    passes. Per-lane bit-identical to _k_refine_mode45 at that lane's
    mode: the dyn helpers select the same f32 constants per lane, and
    per-lane index widths collapse the static index-mode double-snap
    into one snap at the selected width. Returns
    (err_new, err_old [T], {mode_id: words [4, T]})."""
    from . import bc67
    S = _BC7_FULL_STATICS
    sts = {mv: bc67._bc7_unpack_mode(words, mv) for mv in modes_g}

    def msel(get):
        out = get(modes_g[0])
        for mv in modes_g[1:]:
            out = jnp.where(mode == mv, get(mv), out)
        return out

    def msel16(get):
        m16 = mode[None, :]
        out = get(modes_g[0])
        for mv in modes_g[1:]:
            out = jnp.where(m16 == mv, get(mv), out)
        return out

    def const_row(field, dtype=jnp.int32):
        out = jnp.full(mode.shape, field(modes_g[0]), dtype)
        for mv in modes_g[1:]:
            out = jnp.where(mode == mv, jnp.asarray(field(mv), dtype), out)
        return out

    rot = msel(lambda mv: sts[mv][1])
    im = msel(lambda mv: sts[mv][2])
    q0 = [msel(lambda mv: sts[mv][3][0][c]) for c in range(4)]
    q1 = [msel(lambda mv: sts[mv][4][0][c]) for c in range(4)]
    w1 = msel16(lambda mv: sts[mv][7]).astype(jnp.float32)
    w2 = msel16(lambda mv: sts[mv][8]).astype(jnp.float32)
    zero = jnp.zeros_like(rot)
    rot16 = jnp.broadcast_to(rot[None, :], xf[0].shape)

    # rotated pixel planes (channel rot-1 <-> alpha), per-lane — ONE set
    # now serves both families (each per-mode pass built its own)
    xr = []
    for c in range(3):
        xr.append(jnp.where(rot16 == c + 1, xf[3], xf[c]))
    xa = xf[3]
    for c in range(3):
        xa = jnp.where(rot16 == c + 1, xf[c], xa)
    xr.append(xa)

    w_rows = None
    if aw != 1.0:
        w_rows = []
        for c in range(4):
            is_a = (rot == 0) if c == 3 else (rot == c + 1)
            w_rows.append(jnp.where(is_a, jnp.float32(aw),
                                    jnp.float32(1.0)))

    im0 = im == 0
    im0_16 = jnp.broadcast_to(im0[None, :], w1.shape)
    cidx = jnp.where(im0_16, w1, w2)
    aidx = jnp.where(im0_16, w2, w1)

    # per-lane index widths: color set reads iprec when im==0 else iprec2
    ip_row = const_row(lambda mv: S[mv][5])
    ip2_row = const_row(lambda mv: S[mv][6])
    kc_bits = jnp.where(im0, ip_row, ip2_row)
    ka_bits = jnp.where(im0, ip2_row, ip_row)

    def krows(bits):
        # bits in {2, 3}: the same f32 constants the static helpers bake
        km1 = jnp.where(bits == 3, jnp.float32(7.0), jnp.float32(3.0))
        fK = jnp.where(bits == 3, jnp.float32(np.float32(64.0 / 7.0)),
                       jnp.float32(np.float32(64.0 / 3.0)))
        return km1, fK

    kmc, fKc = krows(kc_bits)
    kma, fKa = krows(ka_bits)
    wkc = jnp.floor(cidx * fKc[None, :] + 0.5)
    wka = jnp.floor(aidx * fKa[None, :] + 0.5)

    prec_c = const_row(lambda mv: S[mv][7][0])
    prec_a = const_row(lambda mv: S[mv][7][3])
    prec_rows = (prec_c, prec_c, prec_a, prec_a)

    if ladder == bc67.LADDER_MOMENT:
        q0t, q1t, errl, err0 = _k_moment_subset_dyn(
            xr, None, prec_rows, q0, q1, zero, zero,
            [wkc, wkc, wkc, wka], None, aw=aw, has_p=False,
            w_rows=w_rows)
    else:
        q0t, q1t, errl, err0 = _k_perturb_subset_dyn(
            xr, None, prec_rows, q0, q1, zero, zero,
            [wkc, wkc, wkc, wka], ladder, None, aw=aw, has_p=False,
            w_rows=w_rows)
    u0 = [_k_unquant_dyn_nop(q0t[c], prec_c if c < 3 else prec_a)
          for c in range(4)]
    u1 = [_k_unquant_dyn_nop(q1t[c], prec_c if c < 3 else prec_a)
          for c in range(4)]
    projc = _proj_p64(xr, u0, u1, 0, 3)
    proja = _proj_p64(xr, u0, u1, 3, 4)
    cidx_t, cdist = _snap_dist_dyn(*projc, kmc, fKc, 0, aw=aw,
                                   w_rows=w_rows)
    aidx_t, adist = _snap_dist_dyn(*proja, kma, fKa, 3, aw=aw,
                                   w_rows=w_rows)
    err_t = jnp.sum(cdist, axis=0) + jnp.sum(adist, axis=0)

    keep = err_t < errl
    keep16 = keep[None, :]
    cidx_t2 = jnp.where(keep16, cidx_t, cidx)
    aidx_t2 = jnp.where(keep16, aidx_t, aidx)
    err_t2 = jnp.minimum(err_t, errl)
    bt = err_t2 < err0
    bt16 = bt[None, :]
    q0f = [jnp.where(bt, q0t[c], q0[c]) for c in range(4)]
    q1f = [jnp.where(bt, q1t[c], q1[c]) for c in range(4)]
    cidx = jnp.where(bt16, cidx_t2, cidx)
    aidx = jnp.where(bt16, aidx_t2, aidx)
    err_new = jnp.minimum(err_t2, err0)

    # independent anchor fixes (AssignIndices, BC6HBC7.cpp:3196-3216)
    w1n = jnp.where(im0_16, cidx, aidx)
    w2n = jnp.where(im0_16, aidx, cidx)
    msb1 = const_row(lambda mv: 1 << (S[mv][5] - 1))
    maxi1 = const_row(lambda mv: (1 << S[mv][5]) - 1)
    msb2 = const_row(lambda mv: 1 << (S[mv][6] - 1))
    maxi2 = const_row(lambda mv: (1 << S[mv][6]) - 1)
    swap1 = w1n[0] >= msb1                       # f32 idx: msb set test
    w1n = jnp.where(swap1[None, :], maxi1[None, :] - w1n, w1n)
    swap2 = w2n[0] >= msb2
    w2n = jnp.where(swap2[None, :], maxi2[None, :] - w2n, w2n)
    swap_rgb = (im0 & swap1) | (~im0 & swap2)
    swap_a = (im0 & swap2) | (~im0 & swap1)
    sw = [swap_rgb, swap_rgb, swap_rgb, swap_a]
    q0e = [jnp.where(sw[c], q1f[c], q0f[c]) for c in range(4)]
    q1e = [jnp.where(sw[c], q0f[c], q1f[c]) for c in range(4)]
    words_by_mode = {
        mv: _k_emit(mv, err_new, 0, rot, im, [q0e], [q1e], [zero],
                    [zero], w1n, w2n, None, None)
        for mv in modes_g}
    return err_new, err0, words_by_mode


def _bc7_refine_kernel(px_ref, w_ref, wout_ref, *, modes: tuple,
                       ladder, aw: float = 1.0, unified: bool = True):
    xf = [px_ref[c * 16:(c + 1) * 16, :].astype(jnp.float32)
          for c in range(4)]
    words = w_ref[...]
    b0 = (words[0] & 0xFF).astype(jnp.int32)
    mode = jnp.full_like(b0, 8)
    for mv in range(8):
        hit = (b0 & (1 << mv)) != 0
        mode = jnp.where((mode == 8) & hit, mv, mode)
    out = words
    gen = tuple(mv for mv in modes if mv in _GEN_2SUB) if unified else ()
    if len(gen) >= 2:
        err_new, err0, wn_map = _k_refine_2sub(xf, words, mode, gen,
                                               ladder, aw)
        for mv in gen:
            better = (mode == mv) & (err_new < err0)
            out = jnp.where(better[None, :], wn_map[mv], out)
    else:
        gen = ()
    gen45 = tuple(mv for mv in modes if mv in (4, 5)) if unified else ()
    if len(gen45) == 2:
        err_new, err0, wn_map = _k_refine_45uni(xf, words, mode, gen45,
                                                ladder, aw)
        for mv in gen45:
            better = (mode == mv) & (err_new < err0)
            out = jnp.where(better[None, :], wn_map[mv], out)
    else:
        gen45 = ()
    for mv in modes:
        if mv in gen or mv in gen45:
            continue
        if mv in (4, 5):
            err_new, err0, wn = _k_refine_mode45(xf, words, mv, ladder, aw)
        else:
            err_new, err0, wn = _k_refine_subsets(xf, words, mv, ladder,
                                                  aw)
        better = (mode == mv) & (err_new < err0)
        out = jnp.where(better[None, :], wn, out)
    wout_ref[...] = out


@functools.partial(jax.jit, static_argnames=("modes", "ladder",
                                              "interpret", "tile", "aw",
                                              "unified"))
def bc7_refine_pallas(px_i: jnp.ndarray, words: jnp.ndarray, ladder,
                      aw: float = 1.0, modes: tuple = (1, 3, 5, 6, 7, 4),
                      interpret: bool = False,
                      tile: int = _BC7_ALL_TILE, unified: bool = True):
    """Winner-refine as one pallas dispatch (bc67.refine_bc7_words twin).
    px_i [16, 4, NB] i32; words [NB, 4] u32 packed blocks.
    unified=False forces the per-mode 2-subset passes (A/B lever for
    benchmarks; bit-identical either way).
    Returns refined words [NB, 4] u32."""
    from jax.experimental import pallas as pl

    nb = px_i.shape[2]
    nb_pad = -(-nb // tile) * tile
    pad = nb_pad - nb
    px_cm = jnp.transpose(px_i, (1, 0, 2)).reshape(64, nb)
    wt = jnp.transpose(words)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))
        # pad lanes carry mode-less zero words; every branch's
        # err_new < err0 comparison is false on them (0 vs 0)
        wt = jnp.pad(wt, ((0, 0), (0, pad)))

    wout = pl.pallas_call(
        functools.partial(_bc7_refine_kernel, modes=modes, ladder=ladder,
                          aw=aw, unified=unified),
        grid=(nb_pad // tile,),
        in_specs=[pl.BlockSpec((64, tile), lambda i: (0, i)),
                  pl.BlockSpec((4, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((4, nb_pad), jnp.uint32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(px_cm, wt)
    return wout[:, :nb].T


# ---------------------------------------------------------------------------
# Decode mega-kernels
# ---------------------------------------------------------------------------
# One dispatch decodes every block: all 8 BC7 (14 BC6H) mode decodes run on
# the lane-major word planes in VMEM with a per-lane mode select — the jnp
# twins in bc67 run the same _decode_*_mode_rows math but leave each mode's
# intermediate planes to XLA fusion boundaries in HBM. Reference decode
# semantics: BC6HBC7.cpp:1658 (BC6H), :2566 (BC7).


def _bc7_decode_kernel(w_ref, out_ref):
    from . import bc67
    words = w_ref[...]
    b0 = (words[0] & 0xFF).astype(jnp.int32)
    mode = jnp.full_like(b0, 8)
    for mv in range(8):
        hit = (b0 & (1 << mv)) != 0
        mode = jnp.where((mode == 8) & hit, mv, mode)

    acc = [[jnp.zeros_like(b0) for _ in range(4)] for _ in range(16)]
    for mv in range(8):
        rows = bc67._decode_bc7_mode_rows(words, mv)
        hit = mode == mv
        for i in range(16):
            for c in range(4):
                acc[i][c] = jnp.where(hit, rows[i][c], acc[i][c])
    # reserved mode (mode == 8): rows stay 0 = transparent black
    out_ref[...] = jnp.stack([acc[i][c]
                              for i in range(16) for c in range(4)])


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def bc7_decode_pallas(words: jnp.ndarray, interpret: bool = False,
                      tile: int = _DEC_TILE):
    """Whole-BC7 decode as one dispatch. words [4, NB] u32 lane-major.
    Returns [64, NB] i32 texel rows (16 px x 4 ch, 0..255)."""
    from jax.experimental import pallas as pl

    nb = words.shape[1]
    nb_pad = -(-nb // tile) * tile
    pad = nb_pad - nb
    if pad:
        words = jnp.pad(words, ((0, 0), (0, pad)))
    out = pl.pallas_call(
        _bc7_decode_kernel,
        grid=(nb_pad // tile,),
        in_specs=[pl.BlockSpec((4, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((64, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((64, nb_pad), jnp.int32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(words)
    return out[:, :nb]


def _bc6h_decode_kernel(w_ref, out_ref, *, signed: bool):
    from . import bc67
    from .bc67_tables import BC6H_MODE_TO_INFO
    words = w_ref[...]
    b0 = words[0].astype(jnp.int32)
    m2 = b0 & 0x3
    m5 = b0 & 0x1F
    header_mode = jnp.where(m2 < 2, m2, m5)
    rowv = jnp.full_like(header_mode, -1)
    for hm in range(32):
        rowv = jnp.where(header_mode == hm,
                         int(BC6H_MODE_TO_INFO[hm]), rowv)

    acc = [[jnp.zeros_like(b0) for _ in range(3)] for _ in range(16)]
    for r in range(14):
        rows = bc67._decode_bc6h_mode_rows(words, r, signed)
        hit = rowv == r
        for i in range(16):
            for c in range(3):
                acc[i][c] = jnp.where(hit, rows[i][c], acc[i][c])
    # reserved header modes (rowv < 0): rows stay 0 = black
    out_ref[...] = jnp.stack([acc[i][c]
                              for i in range(16) for c in range(3)])


@functools.partial(jax.jit, static_argnames=("signed", "interpret", "tile"))
def bc6h_decode_pallas(words: jnp.ndarray, signed: bool,
                       interpret: bool = False, tile: int = _DEC_TILE):
    """Whole-BC6H decode as one dispatch. words [4, NB] u32 lane-major.
    Returns [48, NB] i32 half-bit rows (16 px x 3 ch)."""
    from jax.experimental import pallas as pl

    nb = words.shape[1]
    nb_pad = -(-nb // tile) * tile
    pad = nb_pad - nb
    if pad:
        words = jnp.pad(words, ((0, 0), (0, pad)))
    out = pl.pallas_call(
        functools.partial(_bc6h_decode_kernel, signed=signed),
        grid=(nb_pad // tile,),
        in_specs=[pl.BlockSpec((4, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((48, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((48, nb_pad), jnp.int32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(words)
    return out[:, :nb]


# ---------------------------------------------------------------------------
# BC6H mega-kernels
# ---------------------------------------------------------------------------

from .bc67_tables import BC6H_DESC, BC6H_MODE_INFO


def _idiv_f16max1(a):
    """Exact a // 31744 for 0 <= a < 2^30 without integer division: f32
    reciprocal estimate (quotient <= 2^15 so the f32 error is << 1) plus a
    +-1 correction step."""
    q = jnp.floor(a.astype(jnp.float32)
                  * jnp.float32(1.0 / 31744.0)).astype(jnp.int32)
    r = a - q * 31744
    q = q + (r >= 31744).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q


def _k_bc6h_quant(v, prec: int, signed: bool):
    """D3DX_BC6H::Quantize (BC6HBC7.cpp:1864); v int32."""
    if signed:
        s = v < 0
        a = jnp.abs(v)
        q = a if prec >= 16 else _idiv_f16max1(a << (prec - 1))
        return jnp.where(s, -q, q)
    return v if prec >= 15 else _idiv_f16max1(v << prec)


def _k_bc6h_unquant(c, bits: int, signed: bool):
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


def _k_bc6h_finish(c, signed: bool):
    if signed:
        return jnp.where(c < 0, -(((-c) * 31) >> 5), (c * 31) >> 5)
    return (c * 31) >> 6


def _k_bc6h_finish_f(c, signed: bool):
    """_k_bc6h_finish on integer-valued f32 (exact: |c|*31 < 2^24 and
    /32, /64 are power-of-two scales)."""
    if signed:
        return jnp.sign(c) * jnp.floor(jnp.abs(c) * 31.0 * jnp.float32(1 / 32))
    return jnp.floor(c * 31.0 * jnp.float32(1 / 64))


def _k_bc6h_palette_err_px(xf3, masks, q0_s, q1_s, precW, iprec: int,
                           signed: bool):
    """_k_bc6h_palette_err for every subset in one fused pass: projection
    and palette distance planes computed once with per-pixel endpoint
    selection, per-subset masked error reductions. The palette and weight
    arithmetic runs on integer-valued f32 (all products < 2^24, exact;
    native VPU multiplies instead of emulated i32). Returns (idx [16, T]
    f32, errs)."""
    K = 1 << iprec
    n_sub = len(masks)
    single = masks[0] is None

    def sel(vals):
        if single:
            return vals[0][None, :]
        return _k_sel_px(masks, vals)

    u0_s = [[_k_bc6h_unquant(q0_s[p][c], precW[c], signed)
             .astype(jnp.float32) for c in range(3)] for p in range(n_sub)]
    u1_s = [[_k_bc6h_unquant(q1_s[p][c], precW[c], signed)
             .astype(jnp.float32) for c in range(3)] for p in range(n_sub)]
    f0_s = [[_k_bc6h_finish_f(u0_s[p][c], signed) for c in range(3)]
            for p in range(n_sub)]
    e_s = [[_k_bc6h_finish_f(u1_s[p][c], signed) - f0_s[p][c]
            for c in range(3)] for p in range(n_sub)]
    span_s = [sum(e_s[p][c] * e_s[p][c] for c in range(3))
              for p in range(n_sub)]
    f0_px = [sel([f0_s[p][c] for p in range(n_sub)]) for c in range(3)]
    e_px = [sel([e_s[p][c] for p in range(n_sub)]) for c in range(3)]
    span_px = sel(span_s)

    dot = sum((xf3[c] - f0_px[c]) * e_px[c] for c in range(3))
    p64 = jnp.clip(dot * (64.0 / jnp.where(span_px > 0, span_px, 1.0)),
                   0.0, 64.0)
    kf = jnp.clip(jnp.round(p64 * ((K - 1) / 64.0)), 0.0, K - 1.0)
    wk = _pal_weight_f(kf, K)
    wkp = _pal_weight_f(jnp.minimum(kf + 1.0, K - 1.0), K)
    wkm = _pal_weight_f(jnp.maximum(kf - 1.0, 0.0), K)
    up = (kf < K - 1) & (2.0 * p64 > wk + wkp)
    dn = (kf > 0) & (2.0 * p64 < wk + wkm)
    idx = jnp.where(up, kf + 1.0, jnp.where(dn, kf - 1.0, kf))
    wk = _pal_weight_f(idx, K)
    u0_px = [sel([u0_s[p][c] for p in range(n_sub)]) for c in range(3)]
    u1_px = [sel([u1_s[p][c] for p in range(n_sub)]) for c in range(3)]
    best = jnp.zeros_like(dot)
    for c in range(3):
        pal = _k_bc6h_finish_f(
            jnp.floor((u0_px[c] * (64.0 - wk) + u1_px[c] * wk)
                      * jnp.float32(1 / 64) + 0.5), signed)
        d = xf3[c] - pal
        best = best + d * d
    errs = [jnp.sum(best if masks[p] is None
                    else jnp.where(masks[p], best, 0.0), axis=0)
            for p in range(n_sub)]
    return idx, errs


def _k_bc6h_subsets(xf3, masks, row: int, signed: bool):
    """Every BC6H subset of one shape candidate in a single fused pass:
    min/max endpoints, quantize, projection assign, two least-squares refit
    rounds, keep better — per-pixel plane work shared across subsets
    (math identical to the per-subset bc67._bc6h_eval_candidate body).
    Returns (q0_s, q1_s, idx_full, errs)."""
    _, _, _, iprec, precW, _, _, _ = BC6H_MODE_INFO[row]
    n_sub = len(masks)
    single = masks[0] is None

    def msum(plane, p):
        return jnp.sum(plane if masks[p] is None
                       else jnp.where(masks[p], plane, 0.0), axis=0)

    def sel(vals):
        if single:
            return vals[0][None, :]
        return _k_sel_px(masks, vals)

    mi_s, ma_s = [], []
    big = jnp.float32(1e9)
    for mb in masks:
        if mb is None:
            mi_s.append([jnp.min(f, axis=0) for f in xf3])
            ma_s.append([jnp.max(f, axis=0) for f in xf3])
        else:
            mi_s.append([jnp.min(jnp.where(mb, f, big), axis=0)
                         for f in xf3])
            ma_s.append([jnp.max(jnp.where(mb, f, -big), axis=0)
                         for f in xf3])

    def quant(e_s):
        return [[_k_bc6h_quant(jnp.round(e_s[p][c]).astype(jnp.int32),
                               precW[c], signed) for c in range(3)]
                for p in range(n_sub)]

    q0_s, q1_s = quant(mi_s), quant(ma_s)
    idx, errs = _k_bc6h_palette_err_px(xf3, masks, q0_s, q1_s, precW,
                                       iprec, signed)

    from .bc67 import BC6H_LS_MAG_CAP, BC6H_REFIT_ROUNDS

    lim = float(_BC6H_F16MAX)
    lo = -lim if signed else 0.0
    # LS magnitude cap (bc67.BC6H_LS_MAG_CAP): int-linear extrapolation
    # past the data is float-exponential — see the bc67 constant note
    cap_s = [[jnp.maximum(jnp.abs(mi_s[p][c]), jnp.abs(ma_s[p][c]))
              + jnp.float32(BC6H_LS_MAG_CAP) for c in range(3)]
             for p in range(n_sub)]
    e0f_s, e1f_s = mi_s, ma_s
    q0b_s, q1b_s, idx_b, errs_b = q0_s, q1_s, idx, errs
    for _ in range(BC6H_REFIT_ROUNDS):
        x = _pal_weight_f(idx_b, 1 << iprec) * jnp.float32(1 / 64)
        av = 1.0 - x
        bv = x
        aa, ab_, bb = av * av, av * bv, bv * bv
        avx = [av * xf3[c] for c in range(3)]
        bvx = [bv * xf3[c] for c in range(3)]
        e0n_s, e1n_s = [], []
        for p in range(n_sub):
            A = msum(aa, p)
            B = msum(ab_, p)
            C = msum(bb, p)
            det = A * C - B * B
            ok = jnp.abs(det) > 1e-6
            inv = 1.0 / jnp.where(ok, det, 1.0)
            r0l, r1l = [], []
            for c in range(3):
                r0 = msum(avx[c], p)
                r1 = msum(bvx[c], p)
                n0 = jnp.clip((C * r0 - B * r1) * inv,
                              jnp.maximum(lo, -cap_s[p][c]),
                              jnp.minimum(lim, cap_s[p][c]))
                n1 = jnp.clip((A * r1 - B * r0) * inv,
                              jnp.maximum(lo, -cap_s[p][c]),
                              jnp.minimum(lim, cap_s[p][c]))
                r0l.append(jnp.where(ok, n0, e0f_s[p][c]))
                r1l.append(jnp.where(ok, n1, e1f_s[p][c]))
            e0n_s.append(r0l)
            e1n_s.append(r1l)
        e0f_s, e1f_s = e0n_s, e1n_s
        q0b_s, q1b_s = quant(e0f_s), quant(e1f_s)
        idx_b, errs_b = _k_bc6h_palette_err_px(xf3, masks, q0b_s, q1b_s,
                                               precW, iprec, signed)

    better = [errs_b[p] < errs[p] for p in range(n_sub)]
    # int select: mosaic can't broadcast/select i1 vectors
    idx_full = jnp.where(sel([b.astype(jnp.int32) for b in better]) != 0,
                         idx_b, idx)
    q0f_s, q1f_s, errs_f = [], [], []
    for p in range(n_sub):
        bt = better[p]
        q0f_s.append([jnp.where(bt, q0b_s[p][c], q0_s[p][c])
                      for c in range(3)])
        q1f_s.append([jnp.where(bt, q1b_s[p][c], q1_s[p][c])
                      for c in range(3)])
        errs_f.append(jnp.minimum(errs_b[p], errs[p]))
    return q0f_s, q1f_s, idx_full, errs_f


def _k_bc6h_palette_err_f(xf3, masks, e0_s, e1_s, iprec,
                          score: bool = True):
    """Float-endpoint px-space palette assignment + SSE, fused over
    subsets (bc67._bc6h_palette_err_f twin): the precision-free scorer
    for the shared fit trajectory. Linear (floor-less) palette — only
    steers the fit; per-group errors are rescored exactly afterwards.
    score=False skips the SSE planes (keep-better off,
    bc67.BC6H_SHARED_KEEPBETTER). Returns (idx [16, T] f32, errs)."""
    K = 1 << iprec
    n_sub = len(masks)
    single = masks[0] is None

    def sel(vals):
        if single:
            return vals[0][None, :]
        return _k_sel_px(masks, vals)

    e_s = [[e1_s[p][c] - e0_s[p][c] for c in range(3)]
           for p in range(n_sub)]
    span_s = [sum(e_s[p][c] * e_s[p][c] for c in range(3))
              for p in range(n_sub)]
    e0_px = [sel([e0_s[p][c] for p in range(n_sub)]) for c in range(3)]
    e_px = [sel([e_s[p][c] for p in range(n_sub)]) for c in range(3)]
    span_px = sel(span_s)

    dot = sum((xf3[c] - e0_px[c]) * e_px[c] for c in range(3))
    p64 = jnp.clip(dot * (64.0 / jnp.where(span_px > 0, span_px, 1.0)),
                   0.0, 64.0)
    kf = jnp.clip(jnp.round(p64 * ((K - 1) / 64.0)), 0.0, K - 1.0)
    wk = _pal_weight_f(kf, K)
    wkp = _pal_weight_f(jnp.minimum(kf + 1.0, K - 1.0), K)
    wkm = _pal_weight_f(jnp.maximum(kf - 1.0, 0.0), K)
    up = (kf < K - 1) & (2.0 * p64 > wk + wkp)
    dn = (kf > 0) & (2.0 * p64 < wk + wkm)
    idx = jnp.where(up, kf + 1.0, jnp.where(dn, kf - 1.0, kf))
    if not score:
        return idx, None
    wk64 = _pal_weight_f(idx, K) * jnp.float32(1 / 64)
    best = jnp.zeros_like(dot)
    for c in range(3):
        d = xf3[c] - (e0_px[c] + wk64 * e_px[c])
        best = best + d * d
    errs = [jnp.sum(best if masks[p] is None
                    else jnp.where(masks[p], best, 0.0), axis=0)
            for p in range(n_sub)]
    return idx, errs


def _k_bc6h_shared_fit(xf3, masks, iprec: int, signed: bool):
    """One precision-free fit trajectory per (shape candidate, subset):
    min/max endpoints -> float-palette assignment -> BC6H_REFIT_ROUNDS
    least-squares rounds -> keep-better, on unquantized px-space
    endpoints (bc67._bc6h_shared_fit twin). Every row of a region family
    quantizes THESE endpoints at its own precision and rescores exactly
    (_k_bc6h_group_rescore) — the per-candidate refit work is shared by
    all two-region precision groups (rows differ only in endpoint
    precision, ms_aInfo BC6HBC7.cpp:1013-1067).
    Returns per-subset (e0, e1) channel-row lists, f32."""
    from .bc67 import BC6H_SHARED_ROUNDS

    n_sub = len(masks)

    def msum(plane, p):
        return jnp.sum(plane if masks[p] is None
                       else jnp.where(masks[p], plane, 0.0), axis=0)

    mi_s, ma_s = [], []
    big = jnp.float32(1e9)
    for mb in masks:
        if mb is None:
            mi_s.append([jnp.min(f, axis=0) for f in xf3])
            ma_s.append([jnp.max(f, axis=0) for f in xf3])
        else:
            mi_s.append([jnp.min(jnp.where(mb, f, big), axis=0)
                         for f in xf3])
            ma_s.append([jnp.max(jnp.where(mb, f, -big), axis=0)
                         for f in xf3])

    from .bc67 import BC6H_SHARED_KEEPBETTER
    kb = BC6H_SHARED_KEEPBETTER
    idx_b, errs0 = _k_bc6h_palette_err_f(xf3, masks, mi_s, ma_s, iprec,
                                         score=kb)
    lim = float(_BC6H_F16MAX)
    lo = -lim if signed else 0.0
    from .bc67 import BC6H_LS_MAG_CAP
    cap_s = [[jnp.maximum(jnp.abs(mi_s[p][c]), jnp.abs(ma_s[p][c]))
              + jnp.float32(BC6H_LS_MAG_CAP) for c in range(3)]
             for p in range(n_sub)]
    e0f_s, e1f_s = mi_s, ma_s
    errs_b = errs0
    for r in range(BC6H_SHARED_ROUNDS):
        x = _pal_weight_f(idx_b, 1 << iprec) * jnp.float32(1 / 64)
        av = 1.0 - x
        bv = x
        aa, ab_, bb = av * av, av * bv, bv * bv
        avx = [av * xf3[c] for c in range(3)]
        bvx = [bv * xf3[c] for c in range(3)]
        e0n_s, e1n_s = [], []
        for p in range(n_sub):
            A = msum(aa, p)
            B = msum(ab_, p)
            C = msum(bb, p)
            det = A * C - B * B
            ok = jnp.abs(det) > 1e-6
            inv = 1.0 / jnp.where(ok, det, 1.0)
            r0l, r1l = [], []
            for c in range(3):
                r0 = msum(avx[c], p)
                r1 = msum(bvx[c], p)
                n0 = jnp.clip((C * r0 - B * r1) * inv,
                              jnp.maximum(lo, -cap_s[p][c]),
                              jnp.minimum(lim, cap_s[p][c]))
                n1 = jnp.clip((A * r1 - B * r0) * inv,
                              jnp.maximum(lo, -cap_s[p][c]),
                              jnp.minimum(lim, cap_s[p][c]))
                r0l.append(jnp.where(ok, n0, e0f_s[p][c]))
                r1l.append(jnp.where(ok, n1, e1f_s[p][c]))
            e0n_s.append(r0l)
            e1n_s.append(r1l)
        e0f_s, e1f_s = e0n_s, e1n_s
        if kb or r < BC6H_SHARED_ROUNDS - 1:
            # the last assignment only feeds the keep-better score
            idx_b, errs_b = _k_bc6h_palette_err_f(xf3, masks, e0f_s,
                                                  e1f_s, iprec, score=kb)

    out = []
    for p in range(n_sub):
        if kb:
            bt = errs_b[p] < errs0[p]
            out.append(([jnp.where(bt, e0f_s[p][c], mi_s[p][c])
                         for c in range(3)],
                        [jnp.where(bt, e1f_s[p][c], ma_s[p][c])
                         for c in range(3)]))
        else:
            out.append((list(e0f_s[p]), list(e1f_s[p])))
    return out


def _k_bc6h_group_rescore(xf3, pm, a2, shared, row: int, signed: bool):
    """Quantize the shared-fit endpoints at this row group's precision,
    rescore exactly, then ONE quantized-domain LS refit round (refit on
    the exact indices, requantize, exact rescore, keep-better); anchor
    swaps on the winning indices (bc67._bc6h_group_rescore twin).
    Returns (total_err, fixed q_pairs, idx_full)."""
    (_, partitions, _, iprec, precW, _, _, _) = BC6H_MODE_INFO[row]
    msb, maxi = 1 << (iprec - 1), (1 << iprec) - 1
    n_sub = partitions + 1
    masks = [None] if pm is None else [pm == p for p in range(n_sub)]

    def msum(plane, p):
        return jnp.sum(plane if masks[p] is None
                       else jnp.where(masks[p], plane, 0.0), axis=0)

    def sel(vals):
        if masks[0] is None:
            return vals[0][None, :]
        return _k_sel_px(masks, vals)

    def quant(e_s):
        return [[_k_bc6h_quant(jnp.round(e_s[p][c]).astype(jnp.int32),
                               precW[c], signed) for c in range(3)]
                for p in range(n_sub)]

    e0f_s = [shared[p][0] for p in range(n_sub)]
    e1f_s = [shared[p][1] for p in range(n_sub)]
    q0_s, q1_s = quant(e0f_s), quant(e1f_s)
    idx_full, errs = _k_bc6h_palette_err_px(xf3, masks, q0_s, q1_s, precW,
                                            iprec, signed)
    from .bc67 import BC6H_GROUP_REFIT_MINPREC
    if precW[0] >= BC6H_GROUP_REFIT_MINPREC:
        # fine precision: the quantized endpoints track the float
        # trajectory; rescore-only (bc67._bc6h_group_rescore)
        total_err = sum(errs)
        q_pairs = list(zip(q0_s, q1_s))
        fixed = []
        for p in range(n_sub):
            if p == 0:
                a_idx = idx_full[0]
            else:
                a_idx = _k_anchor_index(idx_full, a2)
            swap = a_idx >= msb                  # f32 idx: msb set test
            q0, q1 = q_pairs[p]
            fixed.append(
                ([jnp.where(swap, q1[c], q0[c]) for c in range(3)],
                 [jnp.where(swap, q0[c], q1[c]) for c in range(3)]))
            keep = (swap[None, :] if pm is None
                    else (swap[None, :] & (pm == p)))
            idx_full = jnp.where(keep, maxi - idx_full, idx_full)
        return total_err, fixed, idx_full

    # quantized-domain refit round (bc67._bc6h_group_rescore)
    lim = float(_BC6H_F16MAX)
    lo = -lim if signed else 0.0
    from .bc67 import BC6H_LS_MAG_CAP
    big = jnp.float32(1e9)
    cap_s = []
    for p in range(n_sub):
        if masks[p] is None:
            cap_s.append([jnp.maximum(jnp.abs(jnp.min(f, axis=0)),
                                      jnp.abs(jnp.max(f, axis=0)))
                          + jnp.float32(BC6H_LS_MAG_CAP) for f in xf3])
        else:
            cap_s.append([jnp.maximum(
                jnp.abs(jnp.min(jnp.where(masks[p], f, big), axis=0)),
                jnp.abs(jnp.max(jnp.where(masks[p], f, -big), axis=0)))
                + jnp.float32(BC6H_LS_MAG_CAP) for f in xf3])
    x = _pal_weight_f(idx_full, 1 << iprec) * jnp.float32(1 / 64)
    av = 1.0 - x
    bv = x
    aa, ab_, bb = av * av, av * bv, bv * bv
    avx = [av * xf3[c] for c in range(3)]
    bvx = [bv * xf3[c] for c in range(3)]
    e0n_s, e1n_s = [], []
    for p in range(n_sub):
        A = msum(aa, p)
        B = msum(ab_, p)
        C = msum(bb, p)
        det = A * C - B * B
        ok = jnp.abs(det) > 1e-6
        inv = 1.0 / jnp.where(ok, det, 1.0)
        r0l, r1l = [], []
        for c in range(3):
            r0 = msum(avx[c], p)
            r1 = msum(bvx[c], p)
            n0 = jnp.clip((C * r0 - B * r1) * inv,
                          jnp.maximum(lo, -cap_s[p][c]),
                          jnp.minimum(lim, cap_s[p][c]))
            n1 = jnp.clip((A * r1 - B * r0) * inv,
                          jnp.maximum(lo, -cap_s[p][c]),
                          jnp.minimum(lim, cap_s[p][c]))
            r0l.append(jnp.where(ok, n0, e0f_s[p][c]))
            r1l.append(jnp.where(ok, n1, e1f_s[p][c]))
        e0n_s.append(r0l)
        e1n_s.append(r1l)
    q0r_s, q1r_s = quant(e0n_s), quant(e1n_s)
    idx_r, errs_r = _k_bc6h_palette_err_px(xf3, masks, q0r_s, q1r_s,
                                           precW, iprec, signed)
    better = [errs_r[p] < errs[p] for p in range(n_sub)]
    # int select: mosaic can't broadcast/select i1 vectors
    idx_full = jnp.where(sel([b.astype(jnp.int32) for b in better]) != 0,
                         idx_r, idx_full)
    q_pairs = []
    total_err = jnp.zeros_like(errs[0])
    for p in range(n_sub):
        bt = better[p]
        q_pairs.append(
            ([jnp.where(bt, q0r_s[p][c], q0_s[p][c]) for c in range(3)],
             [jnp.where(bt, q1r_s[p][c], q1_s[p][c]) for c in range(3)]))
        total_err = total_err + jnp.minimum(errs_r[p], errs[p])

    fixed = []
    for p in range(n_sub):
        if p == 0:
            a_idx = idx_full[0]
        else:
            a_idx = _k_anchor_index(idx_full, a2)
        swap = a_idx >= msb                      # f32 idx: msb set test
        q0, q1 = q_pairs[p]
        fixed.append(([jnp.where(swap, q1[c], q0[c]) for c in range(3)],
                      [jnp.where(swap, q0[c], q1[c]) for c in range(3)]))
        keep = swap[None, :] if pm is None else (swap[None, :] & (pm == p))
        idx_full = jnp.where(keep, maxi - idx_full, idx_full)
    return total_err, fixed, idx_full


def _bc6h_header_runs(row: int):
    """Group the 82-entry per-bit descriptor (BC6H_DESC) into contiguous
    (fid, fbit0, pos0, length) runs for multi-bit puts."""
    _, partitions, _, _, _, _, _, _ = BC6H_MODE_INFO[row]
    header_bits = 82 if partitions else 65
    desc = BC6H_DESC[row]
    runs = []
    pos = 0
    while pos < header_bits:
        fid, fbit = int(desc[pos, 0]), int(desc[pos, 1])
        if fid == 0:
            pos += 1
            continue
        ln = 1
        while (pos + ln < header_bits
               and int(desc[pos + ln, 0]) == fid
               and int(desc[pos + ln, 1]) == fbit + ln):
            ln += 1
        runs.append((fid, fbit, pos, ln))
        pos += ln
    return runs, header_bits


def _k_bc6h_eval(xf3, row: int, signed: bool, pm, a2):
    """Subset evaluation + anchor swaps for one shape candidate; shared by
    every row with the same endpoint precision (precW) and index precision.
    pm/a2 None for 1-region rows. Returns (total_err, q_pairs, idx_full)."""
    (_, partitions, _, iprec, _, _, _, _) = BC6H_MODE_INFO[row]
    msb, maxi = 1 << (iprec - 1), (1 << iprec) - 1
    n_sub = partitions + 1

    masks = [None] if pm is None else [pm == p for p in range(n_sub)]
    q0_s, q1_s, idx_full, errs = _k_bc6h_subsets(xf3, masks, row,
                                                 signed)
    total_err = sum(errs)
    q_pairs = list(zip(q0_s, q1_s))

    fixed = []
    for p in range(n_sub):
        if p == 0:
            a_idx = idx_full[0]
        else:
            a_idx = _k_anchor_index(idx_full, a2)
        swap = a_idx >= msb                      # f32 idx: msb set test
        q0, q1 = q_pairs[p]
        fixed.append(([jnp.where(swap, q1[c], q0[c]) for c in range(3)],
                      [jnp.where(swap, q0[c], q1[c]) for c in range(3)]))
        keep = swap[None, :] if pm is None else (swap[None, :] & (pm == p))
        idx_full = jnp.where(keep, maxi - idx_full, idx_full)
    return total_err, fixed, idx_full


def _k_bc6h_transform_fit(q_pairs, total_err, row: int, signed: bool):
    """Per-row delta transform + endpoint-fit check on an already-evaluated
    candidate (TransformForward + EndPointsFit :1948).
    Returns (err, emit_pairs)."""
    (_, partitions, transformed, iprec, precW, precX, precY, precZ) = \
        BC6H_MODE_INFO[row]
    base = q_pairs[0][0]
    fit = None
    deltas = [(q_pairs[0][1], precX)]
    if partitions:
        deltas.append((q_pairs[1][0], precY))
        deltas.append((q_pairs[1][1], precZ))

    def upd(f, cond):
        return cond if f is None else (f & cond)

    def nfit(v, prec, sgn):
        if sgn:
            lo_, hi_ = -(1 << (prec - 1)), (1 << (prec - 1)) - 1
        else:
            lo_, hi_ = 0, (1 << prec) - 1
        return (v >= lo_) & (v <= hi_)

    if transformed:
        stored = []
        for val, prec in deltas:
            d = [val[c] - base[c] for c in range(3)]
            for c in range(3):
                fit = upd(fit, nfit(d[c], prec[c], True))
            stored.append(d)
    else:
        stored = [v for v, _ in deltas]
        for val, prec in deltas:
            for c in range(3):
                fit = upd(fit, nfit(val[c], prec[c], signed))
    for c in range(3):
        fit = upd(fit, nfit(base[c], precW[c], signed))

    def fmask(v, prec):
        return [v[c] & ((1 << prec[c]) - 1) for c in range(3)]

    emit_pairs = [(fmask(base, precW), fmask(stored[0], precX))]
    if partitions:
        emit_pairs.append((fmask(stored[1], precY),
                           fmask(stored[2], precZ)))
    return jnp.where(fit, total_err, jnp.inf), emit_pairs


def _k_bc6h_candidate(xf3, row: int, signed: bool, pm, a2):
    """One (row, shape) candidate end to end (eval + transform/fit).
    Returns (err, emit_pairs, idx_full)."""
    total_err, q_pairs, idx_full = _k_bc6h_eval(xf3, row, signed,
                                                pm, a2)
    err, emit_pairs = _k_bc6h_transform_fit(q_pairs, total_err, row, signed)
    return err, emit_pairs, idx_full


def _k_bc6h_emit(row: int, t, s_blk, emit_pairs, idx_full, a2):
    """In-kernel BC6H EmitBlock (bc67._bc6h_emit). Returns [4, T] u32."""
    (mode_val, partitions, _, iprec, _, _, _, _) = BC6H_MODE_INFO[row]
    runs, header_bits = _bc6h_header_runs(row)
    # the search carries indices as integer-valued f32 planes; bit
    # packing needs ints — one cast per winner here
    if jnp.issubdtype(idx_full.dtype, jnp.floating):
        idx_full = idx_full.astype(jnp.int32)
    kw = _KWords(t)

    fields = {2: s_blk}
    for ch, fbase in ((0, 3), (1, 7), (2, 11)):
        fields[fbase + 0] = emit_pairs[0][0][ch]
        fields[fbase + 1] = emit_pairs[0][1][ch]
        fields[fbase + 2] = emit_pairs[1][0][ch] if partitions else None
        fields[fbase + 3] = emit_pairs[1][1][ch] if partitions else None

    const_bits = [0, 0, 0, 0]
    for fid, fbit, pos, ln in runs:
        if fid == 1:  # mode bits: compile-time constant
            val = (mode_val >> fbit) & ((1 << ln) - 1)
            wi, sh = pos // 32, pos % 32
            const_bits[wi] |= (val << sh) & 0xFFFFFFFF
            if sh and sh + ln > 32:
                const_bits[wi + 1] |= val >> (32 - sh)
            continue
        f = fields[fid]
        if f is None:
            continue
        kw.put((f >> fbit) & ((1 << ln) - 1), pos, ln)
    for wi in range(4):
        if const_bits[wi]:
            kw.w[wi] = kw.w[wi] | jnp.uint32(const_bits[wi])

    lo_word = header_bits // 32
    for i in range(16):
        off = header_bits + iprec * i - (1 if i else 0)
        if i == 0 or a2 is None:
            kw.put(idx_full[i], off, iprec)
        else:
            offd = jnp.full_like(s_blk, off) - (a2 < i).astype(jnp.int32)
            kw.put_dyn(idx_full[i], offd, lo_word)
    return kw.stack()


_BC6H_F16MAX = 0x7BFF


def _k_bc6h_1region(xf3, signed: bool):
    """Rows 10-13 (single region), folded in row order.
    Returns (err, words)."""
    zero = jnp.zeros_like(xf3[0][0], dtype=jnp.int32)
    best_e, best_w = None, None
    for row in range(10, 14):
        err, pairs, idx = _k_bc6h_candidate(xf3, row, signed,
                                            None, None)
        words = _k_bc6h_emit(row, err, zero, pairs, idx, None)
        if best_e is None:
            best_e, best_w = err, words
        else:
            bt = err < best_e
            best_e = jnp.where(bt, err, best_e)
            best_w = jnp.where(bt[None, :], words, best_w)
    return best_e, best_w


def _bc6h_1region_kernel(px_ref, err_ref, w_ref, *, signed: bool):
    xf3 = [px_ref[c * 16:(c + 1) * 16, :].astype(jnp.float32)
           for c in range(3)]
    best_e, best_w = _k_bc6h_1region(xf3, signed)
    err_ref[...] = jnp.broadcast_to(best_e[None, :], err_ref.shape)
    w_ref[...] = best_w


def _k_bc6h_decode_cands(sb_rows):
    """Decode BC6H shape-candidate rows into (s_blk, pm, a2)."""
    pp_tab, pa_tab = _packed_tables(1, 32)
    cands = []
    for s_blk in sb_rows:
        pp = jnp.zeros_like(s_blk, dtype=jnp.uint32)
        pa = jnp.zeros_like(s_blk)
        for s in range(32):
            hit = s_blk == s
            pp = jnp.where(hit, jnp.uint32(pp_tab[s]), pp)
            pa = jnp.where(hit, pa_tab[s], pa)
        pm = jnp.stack([((pp >> (2 * i)) & 1).astype(jnp.int32)
                        for i in range(16)])
        cands.append((s_blk, pm, pa & 0xF))
    return cands


def _k_bc6h_group(xf3, cands, rows: tuple, signed: bool):
    """2-region rows sharing endpoint/index precision: the expensive
    subset evaluation runs once per shape candidate, then each row applies
    its own delta transform + fit check and emit; rows fold in order
    (modes 3/4/5 and 7/8/9 differ only in which channel gets the wider
    delta field, ms_aInfo BC6HBC7.cpp:1051-1067). Returns (err, words)."""
    shared = []
    for s_blk, pm, a2 in cands:
        terr, q_pairs, idx = _k_bc6h_eval(xf3, rows[0], signed, pm, a2)
        shared.append((s_blk, a2, terr, q_pairs, idx))
    n_cand = len(cands)

    best_e, best_w = None, None
    for row in rows:
        best = None
        for cand in range(n_cand):
            s_blk, a2, terr, q_pairs, idx = shared[cand]
            err, pairs = _k_bc6h_transform_fit(q_pairs, terr, row, signed)
            state = (err, s_blk, pairs, idx, a2)
            if best is None:
                best = state
                continue
            bt = state[0] < best[0]
            bt16 = bt[None, :]
            best = (
                jnp.where(bt, state[0], best[0]),
                jnp.where(bt, state[1], best[1]),
                [([jnp.where(bt, state[2][p][0][c], best[2][p][0][c])
                   for c in range(3)],
                  [jnp.where(bt, state[2][p][1][c], best[2][p][1][c])
                   for c in range(3)]) for p in range(2)],
                jnp.where(bt16, state[3], best[3]),
                jnp.where(bt, state[4], best[4]),
            )
        err, s_blk, pairs, idx, a2 = best
        words = _k_bc6h_emit(row, err, s_blk, pairs, idx, a2)
        if best_e is None:
            best_e, best_w = err, words
        else:
            bt = err < best_e
            best_e = jnp.where(bt, err, best_e)
            best_w = jnp.where(bt[None, :], words, best_w)
    return best_e, best_w


def _bc6h_2region_kernel(px_ref, sb_ref, err_ref, w_ref, *, rows: tuple,
                         signed: bool, n_cand: int):
    xf3 = [px_ref[c * 16:(c + 1) * 16, :].astype(jnp.float32)
           for c in range(3)]
    cands = _k_bc6h_decode_cands([sb_ref[cand, :]
                                  for cand in range(n_cand)])
    best_e, best_w = _k_bc6h_group(xf3, cands, rows, signed)
    err_ref[...] = jnp.broadcast_to(best_e[None, :], err_ref.shape)
    w_ref[...] = best_w


def _bc6h_row_groups(rows=range(10)):
    """Consecutive 2-region rows sharing (precW, iprec), whose subset
    evaluation is identical (only delta-fit + emit differ)."""
    groups = []
    for row in rows:
        key = (BC6H_MODE_INFO[row][3], BC6H_MODE_INFO[row][4])
        if groups and groups[-1][0] == key:
            groups[-1][1].append(row)
        else:
            groups.append((key, [row]))
    return [tuple(rs) for _, rs in groups]


def _k_bc6h_1region_shared(xf3, signed: bool):
    """Rows 10-13 via ONE shared fit trajectory (bc67.encode_bc6h
    BC6H_SHARED_FIT path): each row only quantizes + rescores + one
    refit round at its own precW. Returns (err, words)."""
    shared = _k_bc6h_shared_fit(xf3, [None], BC6H_MODE_INFO[10][3],
                                signed)
    zero = jnp.zeros_like(xf3[0][0], dtype=jnp.int32)
    best_e, best_w = None, None
    for row in range(10, 14):
        terr, q_pairs, idx = _k_bc6h_group_rescore(xf3, None, None,
                                                   shared, row, signed)
        err, pairs = _k_bc6h_transform_fit(q_pairs, terr, row, signed)
        words = _k_bc6h_emit(row, err, zero, pairs, idx, None)
        if best_e is None:
            best_e, best_w = err, words
        else:
            bt = err < best_e
            best_e = jnp.where(bt, err, best_e)
            best_w = jnp.where(bt[None, :], words, best_w)
    return best_e, best_w


def _k_bc6h_group_shared(xf3, cands, shared_s, rows: tuple, signed: bool):
    """2-region rows sharing endpoint/index precision, on the shared fit
    trajectories: per shape candidate one quantize + rescore + refit
    round at the group's precision (_k_bc6h_group_rescore), then each
    row applies its own delta transform + fit check; candidate state
    folds before the per-row emit (same fold order as the jnp twin's
    word fold — strict < keeps the first-seen winner either way).
    Returns (err, words)."""
    rescored = []
    for (s_blk, pm, a2), shared in zip(cands, shared_s):
        terr, q_pairs, idx = _k_bc6h_group_rescore(xf3, pm, a2, shared,
                                                   rows[0], signed)
        rescored.append((s_blk, a2, terr, q_pairs, idx))

    best_e, best_w = None, None
    for row in rows:
        best = None
        for s_blk, a2, terr, q_pairs, idx in rescored:
            err, pairs = _k_bc6h_transform_fit(q_pairs, terr, row, signed)
            state = (err, s_blk, pairs, idx, a2)
            if best is None:
                best = state
                continue
            bt = state[0] < best[0]
            bt16 = bt[None, :]
            best = (
                jnp.where(bt, state[0], best[0]),
                jnp.where(bt, state[1], best[1]),
                [([jnp.where(bt, state[2][p][0][c], best[2][p][0][c])
                   for c in range(3)],
                  [jnp.where(bt, state[2][p][1][c], best[2][p][1][c])
                   for c in range(3)]) for p in range(2)],
                jnp.where(bt16, state[3], best[3]),
                jnp.where(bt, state[4], best[4]),
            )
        err, s_blk, pairs, idx, a2 = best
        words = _k_bc6h_emit(row, err, s_blk, pairs, idx, a2)
        if best_e is None:
            best_e, best_w = err, words
        else:
            bt = err < best_e
            best_e = jnp.where(bt, err, best_e)
            best_w = jnp.where(bt[None, :], words, best_w)
    return best_e, best_w


def _bc6h_all_kernel(px_ref, m_ref, err_ref, w_ref, *, signed: bool,
                     n_cand: int, rows_sel: tuple | None = None):
    """The whole BC6H encode in one dispatch: shape ranking over the 32
    2-region shapes, the four 1-region rows, every precision group's
    shared subset evaluation, per-row delta fits, emit, and the row fold
    all stay in VMEM. Fold order matches bc67.encode_bc6h: 1-region rows
    first, then 2-region rows 0-9. With bc67.BC6H_SHARED_FIT the
    per-group full evaluation is replaced by one precision-free fit
    trajectory per (shape candidate, region family) plus a per-group
    quantize + rescore + single refit round. `rows_sel` (profiling only,
    benchmarks/profile_bc6h.py) restricts the fold to a subset: "r1" for
    the 1-region rows plus 2-region row ids."""
    from .bc67 import BC6H_SHARED_FIT

    xf3 = [px_ref[c * 16:(c + 1) * 16, :].astype(jnp.float32)
           for c in range(3)]

    rows2 = [r for r in range(10) if rows_sel is None or r in rows_sel]
    best_e, best_w = None, None
    if rows_sel is None or "r1" in rows_sel:
        best_e, best_w = (_k_bc6h_1region_shared(xf3, signed)
                          if BC6H_SHARED_FIT
                          else _k_bc6h_1region(xf3, signed))

    if rows2:
        xf4 = xf3 + [jnp.zeros_like(xf3[0])]
        # axis_w=0: the HDR probe measured best at the pure off-axis
        # residual (bc67.encode_bc6h uses the same setting)
        sb_rows = _k_shape_topk(xf4, m_ref[...], 1, 32, 3, n_cand,
                                off_axis=True, axis_w=0.0)
        cands = _k_bc6h_decode_cands(sb_rows)
        if BC6H_SHARED_FIT:
            shared_s = [_k_bc6h_shared_fit(xf3, [pm == 0, pm == 1],
                                           BC6H_MODE_INFO[0][3], signed)
                        for _, pm, _ in cands]
        for rows in _bc6h_row_groups(rows2):
            if BC6H_SHARED_FIT:
                err, words = _k_bc6h_group_shared(xf3, cands, shared_s,
                                                  rows, signed)
            else:
                err, words = _k_bc6h_group(xf3, cands, rows, signed)
            if best_e is None:
                best_e, best_w = err, words
                continue
            bt = err < best_e
            best_e = jnp.where(bt, err, best_e)
            best_w = jnp.where(bt[None, :], words, best_w)
    err_ref[...] = jnp.broadcast_to(best_e[None, :], err_ref.shape)
    w_ref[...] = best_w


# measured on v5e at 2K: tile 512 -> 124.8 Mt/s (VMEM pressure), 256 ->
# 155.0, 128 -> 151.8; the grouped multi-dispatch path peaks at 137.1
_BC6H_ALL_TILE = 256


def _bc6h_refine_kernel(px_ref, w_ref, wout_ref, *, ladder, ladder2,
                        signed: bool, remap: bool, cross2: bool):
    """BC6H winner-refine as a kernel: bc67._refine_bc6h_core with the
    in-kernel emit (the core is lane-major throughout — same sharing
    pattern as the decode mega-kernels)."""
    from . import bc67
    px3 = tuple(px_ref[c * 16:(c + 1) * 16, :] for c in range(3))
    words = w_ref[...]

    def emit(row, shp, pairs, idx, a2):
        partitions = BC6H_MODE_INFO[row][1]
        s_blk = (jnp.zeros_like(words[0], dtype=jnp.uint32)
                 if isinstance(shp, int) else shp)
        return _k_bc6h_emit(row, words[0], s_blk, pairs, idx,
                            a2 if partitions else None)

    wout_ref[...] = bc67._refine_bc6h_core(px3, words, ladder, signed,
                                           remap, cross2, emit, ladder2)


@functools.partial(jax.jit, static_argnames=("ladder", "ladder2",
                                              "signed", "remap", "cross2",
                                              "interpret", "tile"))
def bc6h_refine_pallas(px_int: jnp.ndarray, words: jnp.ndarray, ladder,
                       signed: bool, remap: bool = True,
                       cross2: bool = False, ladder2=None,
                       interpret: bool = False,
                       tile: int = _BC6H_ALL_TILE):
    """Winner-refine as one pallas dispatch (bc67.refine_bc6h_words
    twin). px_int [16, 3, NB] i32 F16-int; words [NB, 4] u32.
    Returns refined words [NB, 4] u32."""
    from jax.experimental import pallas as pl

    nb = px_int.shape[2]
    nb_pad = -(-nb // tile) * tile
    pad = nb_pad - nb
    px_cm = jnp.transpose(px_int, (1, 0, 2)).reshape(48, nb)
    wt = jnp.transpose(words)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))
        # pad lanes carry zero words (header mode 0 = a valid 2-region
        # row over zero pixels); whatever the refine does to them is
        # sliced off below
        wt = jnp.pad(wt, ((0, 0), (0, pad)))

    wout = pl.pallas_call(
        functools.partial(_bc6h_refine_kernel, ladder=ladder,
                          ladder2=ladder2, signed=signed, remap=remap,
                          cross2=cross2),
        grid=(nb_pad // tile,),
        in_specs=[pl.BlockSpec((48, tile), lambda i: (0, i)),
                  pl.BlockSpec((4, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((4, nb_pad), jnp.uint32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(px_cm, wt)
    return wout[:, :nb].T


@functools.partial(jax.jit, static_argnames=("signed", "n_cand",
                                              "interpret", "tile",
                                              "rows_sel"))
def bc6h_encode_pallas(px_int: jnp.ndarray, signed: bool, n_cand: int = 4,
                       interpret: bool = False, tile: int = _BC6H_ALL_TILE,
                       rows_sel: tuple | None = None):
    """Full BC6H encode as ONE pallas dispatch. px_int [16, 3, NB] i32
    (F16-int). Returns (err [NB] f32, words [NB, 4] u32)."""
    from jax.experimental import pallas as pl

    from .bc67_tables import PARTITIONS

    nb = px_int.shape[2]
    nb_pad = -(-nb // tile) * tile
    px_cm = jnp.transpose(px_int, (1, 0, 2)).reshape(48, nb)
    if nb_pad - nb:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, nb_pad - nb)))
    parts = PARTITIONS[1][:32]
    m_host = np.concatenate(
        [(parts == p).astype(np.float32) for p in range(2)], axis=0)

    err8, words = pl.pallas_call(
        functools.partial(_bc6h_all_kernel, signed=signed, n_cand=n_cand,
                          rows_sel=rows_sel),
        grid=(nb_pad // tile,),
        in_specs=[pl.BlockSpec((48, tile), lambda i: (0, i)),
                  pl.BlockSpec((64, 16), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((8, tile), lambda i: (0, i)),
                   pl.BlockSpec((4, tile), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
                   jax.ShapeDtypeStruct((4, nb_pad), jnp.uint32)],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(px_cm, jnp.asarray(m_host))
    return err8[0, :nb], words[:, :nb].T


def _bc6h_px_prep(px_int):
    nb = px_int.shape[2]
    nb_pad = -(-nb // _TILE) * _TILE
    pad = nb_pad - nb
    px_cm = jnp.transpose(px_int, (1, 0, 2)).reshape(48, nb)
    if pad:
        px_cm = jnp.pad(px_cm, ((0, 0), (0, pad)))
    return px_cm, nb, nb_pad


@functools.partial(jax.jit, static_argnames=("signed", "interpret"))
def bc6h_1region_pallas(px_int: jnp.ndarray, signed: bool,
                        interpret: bool = False):
    """BC6H rows 10-13 folded. px_int [16, 3, NB] i32 (F16-int).
    Returns (err [NB], words [NB, 4] u32)."""
    from jax.experimental import pallas as pl

    px_cm, nb, nb_pad = _bc6h_px_prep(px_int)
    err8, words = pl.pallas_call(
        functools.partial(_bc6h_1region_kernel, signed=signed),
        grid=(nb_pad // _TILE,),
        in_specs=[pl.BlockSpec((48, _TILE), lambda i: (0, i))],
        out_specs=[pl.BlockSpec((8, _TILE), lambda i: (0, i)),
                   pl.BlockSpec((4, _TILE), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
                   jax.ShapeDtypeStruct((4, nb_pad), jnp.uint32)],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(px_cm)
    return err8[0, :nb], words[:, :nb].T


@functools.partial(jax.jit, static_argnames=("rows", "signed", "interpret"))
def bc6h_2region_pallas(px_int: jnp.ndarray, s_blks: jnp.ndarray,
                        rows: tuple, signed: bool, interpret: bool = False):
    """BC6H 2-region rows sharing (precW, iprec) over s_blks candidates.
    px_int [16, 3, NB]; s_blks [C, NB] i32.
    Returns (err [NB], words [NB, 4] u32), folded over `rows` in order."""
    from jax.experimental import pallas as pl

    px_cm, nb, nb_pad = _bc6h_px_prep(px_int)
    sb = s_blks.astype(jnp.int32)
    if nb_pad != nb:
        sb = jnp.pad(sb, ((0, 0), (0, nb_pad - nb)))
    n_cand = s_blks.shape[0]
    err8, words = pl.pallas_call(
        functools.partial(_bc6h_2region_kernel, rows=rows, signed=signed,
                          n_cand=n_cand),
        grid=(nb_pad // _TILE,),
        in_specs=[pl.BlockSpec((48, _TILE), lambda i: (0, i)),
                  pl.BlockSpec((n_cand, _TILE), lambda i: (0, i))],
        out_specs=[pl.BlockSpec((8, _TILE), lambda i: (0, i)),
                   pl.BlockSpec((4, _TILE), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((8, nb_pad), jnp.float32),
                   jax.ShapeDtypeStruct((4, nb_pad), jnp.uint32)],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(px_cm, sb)
    return err8[0, :nb], words[:, :nb].T
