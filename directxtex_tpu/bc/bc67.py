"""BC6H/BC7 codecs — the flagship (reference: BC6HBC7.cpp, 3659 LoC).

Decode is bit-exact per the D3D spec: mode-descriptor-driven bit extraction,
endpoint unquantization ((c << (8-p)) | (c >> (2p-8)), BC6HBC7.cpp:826),
integer interpolation ((64-w)*a + w*b + 32) >> 6 with the spec weight tables,
anchor-index compression, rotations and index-mode swaps.

The vectorization strategy: bit layouts are static *per mode*, so each mode
decodes every block with fully static offsets and the per-block mode selects
among the 8 results — 8x arithmetic for perfectly-shaped SIMD, the right
trade on a VPU. Only the per-pixel index offsets depend on the (dynamic)
shape; those come from host-precomputed [64, 16] offset tables gathered by
shape id.

Encode follows the reference's own GPU decomposition (BCDirectCompute.cpp,
Shaders/BC7Encode.hlsl): evaluate a static candidate set (mode x shape x
rotation) for all blocks -> least-squares refinement -> argmin -> emit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .bc67_tables import FIXUPS, PARTITIONS, WEIGHTS2, WEIGHTS3, WEIGHTS4

__all__ = ["decode_bc7", "encode_bc7", "decode_bc6h", "encode_bc6h"]

_WEIGHTS = {2: WEIGHTS2, 3: WEIGHTS3, 4: WEIGHTS4}

# exact u8 -> f32 table (HDRColorA(LDRColorA): c * (1/255), BC6HBC7.cpp:427)
_T255 = np.arange(256, dtype=np.float32) * np.float32(1.0 / 255.0)


@dataclasses.dataclass(frozen=True)
class _BC7Mode:
    """ms_aInfo (BC6HBC7.cpp:1106-1125)."""
    partitions: int       # uPartitions (subsets - 1)
    partition_bits: int
    p_bits: int
    rotation_bits: int
    index_mode_bits: int
    index_prec: int
    index_prec2: int
    rgba_prec: tuple      # (r, g, b, a)
    rgba_prec_p: tuple    # with p-bit


_BC7_MODES = [
    _BC7Mode(2, 4, 6, 0, 0, 3, 0, (4, 4, 4, 0), (5, 5, 5, 0)),
    _BC7Mode(1, 6, 2, 0, 0, 3, 0, (6, 6, 6, 0), (7, 7, 7, 0)),
    _BC7Mode(2, 6, 0, 0, 0, 2, 0, (5, 5, 5, 0), (5, 5, 5, 0)),
    _BC7Mode(1, 6, 4, 0, 0, 2, 0, (7, 7, 7, 0), (8, 8, 8, 0)),
    _BC7Mode(0, 0, 0, 2, 1, 2, 3, (5, 5, 5, 6), (5, 5, 5, 6)),
    _BC7Mode(0, 0, 0, 2, 0, 2, 2, (7, 7, 7, 8), (7, 7, 7, 8)),
    _BC7Mode(0, 0, 2, 0, 0, 4, 0, (7, 7, 7, 7), (8, 8, 8, 8)),
    _BC7Mode(1, 6, 4, 0, 0, 2, 0, (5, 5, 5, 5), (6, 6, 6, 6)),
]


def _bytes_to_words(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16] u8 -> [NB, 4] u32 little-endian."""
    return lax.bitcast_convert_type(
        jnp.asarray(blocks, jnp.uint8).reshape(-1, 4, 4), jnp.uint32)


def _get_bits_static(words: jnp.ndarray, start: int, n: int) -> jnp.ndarray:
    """Extract n bits (n <= 24) at a static offset from [NB, 4] u32."""
    if n == 0:
        return jnp.zeros(words.shape[0], jnp.uint32)
    wi = start // 32
    sh = start % 32
    v = words[:, wi] >> sh
    if sh + n > 32:
        v = v | (words[:, wi + 1] << (32 - sh))
    return v & ((1 << n) - 1)


def _get_bits_dynamic(words: jnp.ndarray, start: jnp.ndarray,
                      n: jnp.ndarray) -> jnp.ndarray:
    """Extract bits at per-element offsets. words [NB, 4];
    start/n broadcastable [NB, ...] int32. Returns u32."""
    wi = (start >> 5).astype(jnp.int32)
    sh = (start & 31).astype(jnp.uint32)
    w0 = jnp.take_along_axis(words, wi, axis=1)
    wi1 = jnp.minimum(wi + 1, 3)
    w1 = jnp.take_along_axis(words, wi1, axis=1)
    lo = w0 >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), w1 << ((32 - sh) & 31))
    mask = (jnp.uint32(1) << n.astype(jnp.uint32)) - 1
    return (lo | hi) & mask


def _unquantize(c: jnp.ndarray, prec: int) -> jnp.ndarray:
    """(c << (8-p)) | (c >> (2p-8)) (BC6HBC7.cpp:826)."""
    if prec >= 8:
        return c
    c = (c << (8 - prec)) & 0xFF
    return c | (c >> prec)


# per-(partition-count, shape) index bit layout: offsets[shape, pixel],
# nbits[shape, pixel] for a given index precision. Host-precomputed.
def _index_layout(n_partitions: int, prec: int) -> tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros((64, 16), np.int32)
    nbits = np.zeros((64, 16), np.int32)
    for s in range(64):
        anchors = {0}
        for p in range(1, n_partitions + 1):
            anchors.add(int(FIXUPS[n_partitions, s, p]))
        off = 0
        for i in range(16):
            nb = prec - 1 if i in anchors else prec
            offsets[s, i] = off
            nbits[s, i] = nb
            off += nb
    return offsets, nbits


_INDEX_LAYOUTS: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _get_index_layout(n_partitions: int, prec: int):
    key = (n_partitions, prec)
    if key not in _INDEX_LAYOUTS:
        _INDEX_LAYOUTS[key] = _index_layout(n_partitions, prec)
    return _INDEX_LAYOUTS[key]


def _interp(e0: jnp.ndarray, e1: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """((64 - w)*e0 + w*e1 + 32) >> 6 in integers (InterpolateRGB)."""
    return ((64 - w) * e0 + w * e1 + 32) >> 6


def _gb_t(words, start: int, n: int):
    """Static-offset bit read over lane-major words [4, NB] -> [NB] u32."""
    if n == 0:
        return jnp.zeros(words.shape[1], jnp.uint32)
    wi, sh = start // 32, start % 32
    v = words[wi] >> sh
    if sh + n > 32:
        v = v | (words[wi + 1] << (32 - sh))
    return v & ((1 << n) - 1)


def _gb_dyn_t(words, start, width_minus, base_width: int):
    """Bit read at per-block offsets. words [4, NB]; start [NB] i32;
    width = base_width - width_minus (width_minus in {0, 1})."""
    wi = (start >> 5).astype(jnp.int32)
    sh = (start & 31).astype(jnp.uint32)
    w0 = words[0]
    w1n = words[1]
    for k in (1, 2, 3):
        hit = wi == k
        w0 = jnp.where(hit, words[k], w0)
        w1n = jnp.where(hit, words[min(k + 1, 3)], w1n)
    lo = w0 >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), w1n << ((32 - sh) & 31))
    mask = jnp.where(width_minus != 0,
                     jnp.uint32((1 << (base_width - 1)) - 1),
                     jnp.uint32((1 << base_width) - 1))
    return (lo | hi) & mask


def _packed_shape_tables_bc7(partitions: int, n_shapes: int):
    """(pp, pa) python-int tables: 2-bit/px partition ids, 4-bit anchors."""
    pp = tuple(int(sum(int(PARTITIONS[partitions][s, i]) << (2 * i)
                       for i in range(16))) for s in range(n_shapes))
    pa = tuple(int(FIXUPS[partitions, s, 1])
               | (int(FIXUPS[partitions, s, 2]) << 4)
               for s in range(n_shapes))
    return pp, pa


def _decode_bc7_mode_rows(words, mode: int):
    """Decode ALL blocks assuming `mode`, lane-major.
    words [4, NB] u32 -> [16][4] lists of [NB] int32 texel rows (0..255).
    Row-structured so the pallas decode mega-kernel can consume the rows
    without materializing a 3D stack (pallas_kernels.bc7_decode_pallas);
    _decode_bc7_mode_t stacks them for the jnp path."""
    m = _BC7_MODES[mode]
    nb = words.shape[1]
    n_sub = m.partitions + 1
    n_ep = n_sub * 2
    bit = mode + 1

    shape = _gb_t(words, bit, m.partition_bits).astype(jnp.int32)
    bit += m.partition_bits
    rotation = _gb_t(words, bit, m.rotation_bits).astype(jnp.int32)
    bit += m.rotation_bits
    index_mode = _gb_t(words, bit, m.index_mode_bits).astype(jnp.int32)
    bit += m.index_mode_bits

    # endpoints [n_ep][4] of [NB]
    ep = [[None] * 4 for _ in range(n_ep)]
    for ch in range(4):
        prec = m.rgba_prec[ch]
        if prec == 0:
            for e in range(n_ep):
                ep[e][ch] = jnp.full((nb,), 255, jnp.int32)
            continue
        for e in range(n_ep):
            ep[e][ch] = _gb_t(words, bit, prec).astype(jnp.int32)
            bit += prec

    if m.p_bits:
        pbits = []
        for _ in range(m.p_bits):
            pbits.append(_gb_t(words, bit, 1).astype(jnp.int32))
            bit += 1
        for e in range(n_ep):
            pi = e * m.p_bits // n_ep
            for ch in range(4):
                if m.rgba_prec[ch] != m.rgba_prec_p[ch]:
                    ep[e][ch] = (ep[e][ch] << 1) | pbits[pi]

    for ch in range(4):
        prec = m.rgba_prec_p[ch]
        if prec == 0 or prec >= 8:
            continue
        for e in range(n_ep):
            c = (ep[e][ch] << (8 - prec)) & 0xFF
            ep[e][ch] = c | (c >> prec)

    # partition ids + anchors via packed-int selects over the shape id
    if m.partitions:
        pp_tab, pa_tab = _packed_shape_tables_bc7(m.partitions,
                                                  1 << m.partition_bits)
        pp = jnp.zeros((nb,), jnp.uint32)
        pa = jnp.zeros((nb,), jnp.int32)
        for sv in range(1 << m.partition_bits):
            hit = shape == sv
            pp = jnp.where(hit, jnp.uint32(pp_tab[sv]), pp)
            pa = jnp.where(hit, pa_tab[sv], pa)
        a2 = pa & 0xF
        a3 = (pa >> 4) & 0xF if m.partitions == 2 else None
    else:
        pp = jnp.zeros((nb,), jnp.uint32)
        a2 = a3 = None

    def read_indices(base_bit: int, prec: int, with_anchors: bool):
        """Anchor-compressed index reads; returns (vals [16][NB], nbits)."""
        vals = []
        total = 0
        for i in range(16):
            if with_anchors and a2 is not None:
                before = (1 if i > 0 else 0) \
                    + (a2 < i).astype(jnp.int32) \
                    + ((a3 < i).astype(jnp.int32) if a3 is not None else 0)
                is_anchor = jnp.where(
                    (i == 0) | (a2 == i)
                    | ((a3 == i) if a3 is not None else False), 1, 0)
                start = base_bit + prec * i - before
                vals.append(_gb_dyn_t(words, start, is_anchor,
                                      prec).astype(jnp.int32))
            else:
                # single subset: only pixel 0 is an anchor; offsets static
                width = prec - (1 if i == 0 else 0)
                start = base_bit + prec * i - (1 if i > 0 else 0)
                vals.append(_gb_t(words, start, width).astype(jnp.int32))
        n_anchors = 1 + (m.partitions if with_anchors else 0)
        total = 16 * prec - n_anchors
        return vals, total

    w1, total1 = read_indices(bit, m.index_prec, True)
    bit += total1
    if m.index_prec2:
        w2, _ = read_indices(bit, m.index_prec2, False)
    else:
        w2 = w1

    K1 = 1 << m.index_prec
    K2 = 1 << m.index_prec2 if m.index_prec2 else K1
    swap = index_mode == 1

    out_px = []
    for i in range(16):
        if m.partitions:
            reg = ((pp >> (2 * i)) & 3).astype(jnp.int32)
            e0 = [ep[0][ch] for ch in range(4)]
            e1 = [ep[1][ch] for ch in range(4)]
            for sv in range(1, n_sub):
                hit = reg == sv
                e0 = [jnp.where(hit, ep[2 * sv][ch], e0[ch])
                      for ch in range(4)]
                e1 = [jnp.where(hit, ep[2 * sv + 1][ch], e1[ch])
                      for ch in range(4)]
        else:
            e0 = [ep[0][ch] for ch in range(4)]
            e1 = [ep[1][ch] for ch in range(4)]

        wc = _pal_weight(w1[i], K1)
        if m.index_prec2:
            wa = _pal_weight(w2[i], K2)
            wc, wa = (jnp.where(swap, wa, wc), jnp.where(swap, wc, wa))
        else:
            wa = wc
        px = [((64 - wc) * e0[ch] + wc * e1[ch] + 32) >> 6
              for ch in range(3)]
        px.append(((64 - wa) * e0[3] + wa * e1[3] + 32) >> 6)

        if m.rotation_bits:
            r, g, b, al = px
            nr = jnp.where(rotation == 1, al, r)
            ng = jnp.where(rotation == 2, al, g)
            nbl = jnp.where(rotation == 3, al, b)
            na = jnp.where(rotation == 1, r, jnp.where(
                rotation == 2, g, jnp.where(rotation == 3, b, al)))
            px = [nr, ng, nbl, na]
        out_px.append(px)
    return out_px                                 # [16][4] of [NB]


def _decode_bc7_mode_t(words, mode: int):
    """_decode_bc7_mode_rows stacked to [16, 4, NB] int32."""
    return jnp.stack([jnp.stack(px) for px in
                      _decode_bc7_mode_rows(words, mode)])


def decode_bc7(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16] u8 -> [NB, 16, 4] f32 (D3DXDecodeBC7, bit-exact).

    Lane-major: all math runs on [NB]-lane vectors (block index minor) —
    the previous [NB, 16, 4]-major decoder wasted ~97% of each vreg and
    measured 0.005 Gtexels/s on a v5e; this one measures 0.64. On TPU the
    whole decode runs as one pallas dispatch (bc7_decode_pallas)."""
    w = _bytes_to_words(blocks)                   # [NB, 4]
    words = jnp.transpose(w)                      # [4, NB] lane-major

    try:
        from .pallas_kernels import _use_pallas, bc7_decode_pallas
        use_pallas = _use_pallas()
    except Exception:
        use_pallas = False
    if use_pallas:
        out = bc7_decode_pallas(words)            # [64, NB] i32
        outf = (jnp.clip(out, 0, 255).astype(jnp.float32)
                * jnp.float32(1 / 255))
        return jnp.transpose(outf.reshape(16, 4, -1), (2, 0, 1))

    b0 = (words[0] & 0xFF).astype(jnp.int32)
    mode = jnp.full_like(b0, 8)
    for mv in range(8):
        hit = (b0 & (1 << mv)) != 0
        mode = jnp.where((mode == 8) & hit, mv, mode)

    out = jnp.zeros((16, 4, words.shape[1]), jnp.int32)
    for mv in range(8):
        res = _decode_bc7_mode_t(words, mv)
        out = jnp.where(mode[None, None, :] == mv, res, out)
    # reserved mode: transparent black (BC6HBC7.cpp:2781)
    out = jnp.where(mode[None, None, :] >= 8, 0, out)
    # float(c)/255 — identical arithmetic to the _T255 table entries
    outf = jnp.clip(out, 0, 255).astype(jnp.float32) * jnp.float32(1 / 255)
    return jnp.transpose(outf, (2, 0, 1))         # [NB, 16, 4]\n



# ---------------------------------------------------------------------------
# BC7 encode
# ---------------------------------------------------------------------------
#
# Search policy mirrors the reference driver (BC6HBC7.cpp:2783-2889): modes
# {1,3,5,6} always, 7 for blocks with alpha, 0/2 behind BC_FLAGS_USE_3SUBSETS,
# mode 6 only under BC7_QUICK. Where the reference ranks shapes by RoughMSE
# and refines the top quarter with PerturbOne/Exhaustive hill climbs, the TPU
# formulation evaluates EVERY shape for every block inside a lax.fori_loop
# (uniform work is free on a vector unit — the same trade the reference's own
# compute shaders make, Shaders/BC7Encode.hlsl) and refines with closed-form
# least-squares endpoint refits, keeping a running argmin.
#
# Layout: TPU vector registers are (8 sublanes, 128 lanes) over the two minor
# dims, so all per-candidate math runs on [16, C, NB] / [16, NB] planes with
# the block index minor (full lanes); [NB, ...] appears only at the API edge.

_BC7_QUICK = 0x100000       # TEX_COMPRESS_BC7_QUICK / BC_FLAGS_FORCE_BC7_MODE6
_BC7_USE_3SUBSETS = 0x80000
_BC7_MAXQUALITY = 0x200000  # TEX_COMPRESS_BC7_MAXQUALITY (OptimizeEndPoints tier)
_BC6H_MID = 0x400000        # extension: BC6H mid quality tier (r5)


def _quantize_u8(c: jnp.ndarray, prec: int) -> jnp.ndarray:
    """Quantize (BC6HBC7.cpp:806): (min(255, c + (1 << (7-p)))) >> (8-p)."""
    if prec >= 8:
        return c
    rnd = jnp.minimum(c + (1 << (7 - prec)), 255)
    return rnd >> (8 - prec)


def _quantize_endpoints_t(e0f, e1f, mode: "_BC7Mode"):
    """Float endpoints [4, NB] (u8 scale) -> quantized codes + p-bit majority
    vote (Quantize + FixEndpointPBits semantics). Returns (q0, q1 [4, NB]
    codes at rgba_prec without the p bit, p0, p1 [NB])."""
    e0 = jnp.clip(jnp.round(e0f), 0, 255).astype(jnp.int32)
    e1 = jnp.clip(jnp.round(e1f), 0, 255).astype(jnp.int32)
    q0_rows, q1_rows = [], []
    vote0 = jnp.zeros(e0.shape[1], jnp.int32)
    vote1 = jnp.zeros(e1.shape[1], jnp.int32)
    nvote = 0
    for ch in range(4):
        prec = mode.rgba_prec[ch]
        prec_p = mode.rgba_prec_p[ch]
        if prec == 0:
            q0_rows.append(jnp.zeros_like(vote0))
            q1_rows.append(jnp.zeros_like(vote1))
            continue
        if prec != prec_p:
            f0 = _quantize_u8(e0[ch], prec_p)
            f1 = _quantize_u8(e1[ch], prec_p)
            vote0 = vote0 + (f0 & 1)
            vote1 = vote1 + (f1 & 1)
            nvote += 1
            q0_rows.append(f0 >> 1)
            q1_rows.append(f1 >> 1)
        else:
            q0_rows.append(_quantize_u8(e0[ch], prec))
            q1_rows.append(_quantize_u8(e1[ch], prec))
    if nvote:
        p0 = (vote0 > (nvote >> 1)).astype(jnp.int32)
        p1 = (vote1 > (nvote >> 1)).astype(jnp.int32)
    else:
        p0 = jnp.zeros(e0.shape[1], jnp.int32)
        p1 = p0
    return jnp.stack(q0_rows), jnp.stack(q1_rows), p0, p1


def _unquantize_with_p_t(q0, q1, p0, p1, mode: "_BC7Mode", shared_p: bool):
    """Quantized codes [4, NB] + p-bits -> unquantized u8 endpoint values."""
    if shared_p:
        p1 = p0
    u0_rows, u1_rows = [], []
    for ch in range(4):
        prec = mode.rgba_prec[ch]
        prec_p = mode.rgba_prec_p[ch]
        if prec == 0:
            u0_rows.append(jnp.full_like(p0, 255))
            u1_rows.append(jnp.full_like(p1, 255))
            continue
        if prec != prec_p:
            c0 = (q0[ch] << 1) | p0
            c1 = (q1[ch] << 1) | p1
        else:
            c0, c1 = q0[ch], q1[ch]
        u0_rows.append(_unquantize(c0, prec_p))
        u1_rows.append(_unquantize(c1, prec_p))
    return jnp.stack(u0_rows), jnp.stack(u1_rows)


def _pal_weight(k, K: int):
    """Interpolation weight for index k: the g_aWeights2/3/4 tables are
    exactly round(64k/(K-1)) (BC6HBC7.cpp:327-329); closed form keeps the
    projection search table-free. Computed as an exact multiply-shift
    because integer division is slow on the TPU VPU."""
    m = -(-65536 // (2 * K - 2))
    return ((128 * k + (K - 1)) * m) >> 16


def _pal_weight_f(kf, K: int):
    """_pal_weight on an f32 index plane, staying in f32 (the
    pallas_kernels._pal_weight_f twin): floor(64k/(K-1) + 1/2) — exact
    quotients sit on a 1/(K-1) grid, so the ~2^-22 f32 quotient error
    never crosses a rounding boundary."""
    return jnp.floor(kf * (64.0 / (K - 1)) + 0.5)


def _assign_indices_t(px_i, u0, u1, prec: int, mask, channels=4,
                      ch_start=0, aw: float = 1.0, alpha_ch: int = 3,
                      w_rows=None):
    """Projection-based index assignment over lane-major planes.

    Follows the reference's own GPU encoder (BC7Encode.hlsl:501-533 /
    BCDirectCompute.cpp): project each pixel onto the endpoint axis, snap
    the 0..64 projection to the nearest interpolation weight (the aStep
    table, here closed-form with a +/-1 nearest-weight correction), then
    score the chosen index with the exact integer palette — O(1) per pixel
    instead of the CPU codec's O(2^prec) exhaustive palette search.

    px_i [16, 4, NB] int32; u0/u1 [4, NB] unquantized endpoints.
    Returns (idx [16, NB], err [NB]) over channels [ch_start, channels)."""
    K = 1 << prec
    d0 = [px_i[:, c, :] - u0[c][None, :] for c in range(ch_start, channels)]
    e = [u1[c] - u0[c] for c in range(ch_start, channels)]          # [NB]
    dot = sum((d * ee[None, :] for d, ee in zip(d0, e)),
              start=jnp.zeros_like(d0[0])).astype(jnp.float32)
    span = sum((ee * ee for ee in e),
               start=jnp.zeros_like(e[0])).astype(jnp.float32)      # [NB]
    p64 = jnp.clip(dot * (64.0 / jnp.where(span > 0, span, 1.0))[None, :],
                   0.0, 64.0)
    kf = jnp.round(p64 * ((K - 1) / 64.0)).astype(jnp.int32)
    kf = jnp.clip(kf, 0, K - 1)
    # nearest-weight correction: the uniform inverse can land one off
    # because the weight table itself is rounded
    wk = _pal_weight(kf, K)
    wkp = _pal_weight(jnp.minimum(kf + 1, K - 1), K)
    wkm = _pal_weight(jnp.maximum(kf - 1, 0), K)
    up = (kf < K - 1) & (2.0 * p64 > (wk + wkp).astype(jnp.float32))
    dn = (kf > 0) & (2.0 * p64 < (wk + wkm).astype(jnp.float32))
    idx = jnp.where(up, kf + 1, jnp.where(dn, kf - 1, kf))
    wk = _pal_weight(idx, K)
    # exact integer-palette error at the chosen index:
    # ((64-w)u0 + w u1 + 32) >> 6 == u0 + ((w (u1-u0) + 32) >> 6)
    dist = jnp.zeros_like(p64)
    for c, (d, ee) in enumerate(zip(d0, e), start=ch_start):
        r = (d - ((wk * ee[None, :] + 32) >> 6)).astype(jnp.float32)
        # alpha error weighting: scoring only, the projection stays
        # unweighted; under modes 4/5 rotation the true alpha channel sits
        # at alpha_ch, matching the shader's un-rotate before ComputeError
        # (BC7Encode.hlsl:239-241, :519-533). w_rows: per-channel [NB]
        # weights for callers whose alpha channel is per-lane (refine).
        if w_rows is not None:
            dist = dist + r * r * w_rows[c][None, :]
        else:
            dist = dist + (r * r if (c != alpha_ch or aw == 1.0)
                           else r * r * aw)
    err = jnp.sum(jnp.where(mask, dist, 0.0), axis=0)
    return idx, err


def _ls_refit_t(px_f, idx, mask, prec: int, e0, e1, ch_start=0, ch_end=4):
    """Least-squares endpoint refit over planes.

    px_f [16, 4, NB]; idx [16, NB]; mask [16, NB]; e0/e1 [4, NB] float.
    Refits channels [ch_start, ch_end); others pass through."""
    # w[idx]/64 in closed form (exact: 1/64 is a power of two)
    x = _pal_weight(idx, 1 << prec).astype(jnp.float32) * jnp.float32(1 / 64)
    m = mask.astype(jnp.float32)
    a = (1.0 - x) * m
    b = x * m
    A = jnp.sum(a * a, axis=0)
    B = jnp.sum(a * b, axis=0)
    C = jnp.sum(b * b, axis=0)
    det = A * C - B * B
    ok = jnp.abs(det) > 1e-6
    inv = 1.0 / jnp.where(ok, det, 1.0)

    e0_rows = [e0[c] for c in range(4)]
    e1_rows = [e1[c] for c in range(4)]
    for c in range(ch_start, ch_end):
        r0 = jnp.sum(a * px_f[:, c, :], axis=0)
        r1 = jnp.sum(b * px_f[:, c, :], axis=0)
        n0 = jnp.clip((C * r0 - B * r1) * inv, 0.0, 255.0)
        n1 = jnp.clip((A * r1 - B * r0) * inv, 0.0, 255.0)
        e0_rows[c] = jnp.where(ok, n0, e0_rows[c])
        e1_rows[c] = jnp.where(ok, n1, e1_rows[c])
    return jnp.stack(e0_rows), jnp.stack(e1_rows)


def _minmax_axis_endpoints_t(px_f, mask, with_alpha: bool):
    """Initial endpoints: masked min/max box + best-diagonal axis pick
    (OptimizeRGBA init, BC6HBC7.cpp:1392-1460).

    px_f [16, 4, NB]; mask [16, NB]. Returns e0, e1 [4, NB]."""
    big = jnp.float32(1e9)
    m = mask[:, None, :]
    mi = jnp.min(jnp.where(m, px_f, big), axis=0)    # [4, NB]
    ma = jnp.max(jnp.where(m, px_f, -big), axis=0)
    mid = (mi + ma) * 0.5
    ab = ma - mi
    nch = 4 if with_alpha else 3
    fab = jnp.sum(ab[:nch] * ab[:nch], axis=0)
    dirv = ab / jnp.where(fab > 0, fab, 1.0)[None, :]
    pt = (px_f - mid[None, :, :]) * dirv[None, :, :] * m  # [16, 4, NB]

    best_score = jnp.full(px_f.shape[2], -1.0)
    best_sg = jnp.ones(px_f.shape[2])
    best_sb = jnp.ones(px_f.shape[2])
    best_sa = jnp.ones(px_f.shape[2])
    signs = [(sg, sb, sa)
             for sg in (1.0, -1.0) for sb in (1.0, -1.0)
             for sa in ((1.0, -1.0) if with_alpha else (1.0,))]
    for sg, sb, sa in signs:
        f = pt[:, 0, :] + sg * pt[:, 1, :] + sb * pt[:, 2, :]
        if with_alpha:
            f = f + sa * pt[:, 3, :]
        score = jnp.sum(f * f, axis=0)
        better = score > best_score
        best_score = jnp.where(better, score, best_score)
        best_sg = jnp.where(better, sg, best_sg)
        best_sb = jnp.where(better, sb, best_sb)
        best_sa = jnp.where(better, sa, best_sa)

    def flip(lo, hi, sgn):
        return (jnp.where(sgn < 0, hi, lo), jnp.where(sgn < 0, lo, hi))

    g0, g1 = flip(mi[1], ma[1], best_sg)
    b0, b1 = flip(mi[2], ma[2], best_sb)
    if with_alpha:
        a0, a1 = flip(mi[3], ma[3], best_sa)
    else:
        a0, a1 = mi[3], ma[3]
    e0 = jnp.stack([mi[0], g0, b0, a0])
    e1 = jnp.stack([ma[0], g1, b1, a1])
    return e0, e1


def _scatter_bits(words: jnp.ndarray, value: jnp.ndarray,
                  offset, nbits) -> jnp.ndarray:
    """OR `value` (u32 [NB] or [K, NB]) into 128-bit blocks [NB, 4] at bit
    `offset` (static int, or [K, NB] / [1, K] array of dynamic offsets)."""
    if isinstance(offset, int):
        wi = offset // 32
        sh = offset % 32
        v = value.astype(jnp.uint32)
        words = words.at[:, wi].set(words[:, wi] | (v << sh))
        if sh and sh + int(nbits) > 32:
            words = words.at[:, wi + 1].set(words[:, wi + 1] | (v >> (32 - sh)))
        return words
    # dynamic offsets: accumulate into each of the 4 words with masks
    v = value.astype(jnp.uint32)
    wi = (offset >> 5).astype(jnp.int32)
    sh = (offset & 31).astype(jnp.uint32)
    for w in range(4):
        lo = jnp.where(wi == w, v << sh, 0)
        hi = jnp.where((wi == w - 1) & (sh != 0), v >> ((32 - sh) & 31), 0)
        contrib = jnp.bitwise_or(lo, hi)
        if contrib.ndim > 1:
            red = contrib[0]
            for k in range(1, contrib.shape[0]):
                red = red | contrib[k]
        else:
            red = contrib
        words = words.at[:, w].set(words[:, w] | red)
    return words


def _emit_bc7(mode_id: int, shape, rotation: int, index_mode: int,
              q0_list, q1_list, p0_list, p1_list,
              idx1: jnp.ndarray, idx2: jnp.ndarray | None,
              nb: int) -> jnp.ndarray:
    """Pack one candidate into [NB, 4] u32 words (EmitBlock, BC6HBC7.cpp:3221).

    q0_list/q1_list: per-subset quantized endpoint codes [4, NB].
    idx1/idx2: [16, NB] full-precision indices (anchor compression applied
    via the per-shape offset/width tables)."""
    m = _BC7_MODES[mode_id]
    n_sub = m.partitions + 1
    words = jnp.zeros((nb, 4), jnp.uint32)
    words = _scatter_bits(words, jnp.full((nb,), 1 << mode_id, jnp.uint32),
                          0, mode_id + 1)
    bit = mode_id + 1
    if m.partition_bits:
        sh = shape if not isinstance(shape, int) else jnp.full((nb,), shape, jnp.uint32)
        words = _scatter_bits(words, sh.astype(jnp.uint32), bit, m.partition_bits)
        bit += m.partition_bits
    if m.rotation_bits:
        words = _scatter_bits(words, jnp.full((nb,), rotation, jnp.uint32),
                              bit, m.rotation_bits)
        bit += m.rotation_bits
    if m.index_mode_bits:
        words = _scatter_bits(words, jnp.full((nb,), index_mode, jnp.uint32),
                              bit, m.index_mode_bits)
        bit += m.index_mode_bits
    for ch in range(4):
        prec = m.rgba_prec[ch]
        if prec == 0:
            continue
        for sub in range(n_sub):
            words = _scatter_bits(words, q0_list[sub][ch].astype(jnp.uint32),
                                  bit, prec)
            bit += prec
            words = _scatter_bits(words, q1_list[sub][ch].astype(jnp.uint32),
                                  bit, prec)
            bit += prec
    if m.p_bits:
        if m.p_bits == n_sub:  # shared p-bit per subset (mode 1)
            for sub in range(n_sub):
                words = _scatter_bits(words, p0_list[sub].astype(jnp.uint32), bit, 1)
                bit += 1
        else:  # per-endpoint
            for sub in range(n_sub):
                words = _scatter_bits(words, p0_list[sub].astype(jnp.uint32), bit, 1)
                bit += 1
                words = _scatter_bits(words, p1_list[sub].astype(jnp.uint32), bit, 1)
                bit += 1
    # index section 1 (anchor-compressed widths depend on the shape)
    offs_t, nbits_t = _get_index_layout(m.partitions, m.index_prec)
    if isinstance(shape, int):
        offs = jnp.asarray(offs_t[shape])[:, None] + bit        # [16, 1]
        nb1 = jnp.asarray(nbits_t[shape])[:, None]
    else:
        offs = jnp.asarray(offs_t)[shape].T + bit               # [16, NB]
        nb1 = jnp.asarray(nbits_t)[shape].T
    total1 = int(offs_t[0, 15] + nbits_t[0, 15])
    words = _scatter_bits(words, idx1.astype(jnp.uint32), offs, nb1)
    bit += total1
    if m.index_prec2 and idx2 is not None:
        offs2_t, nbits2_t = _get_index_layout(0, m.index_prec2)
        offs2 = jnp.asarray(offs2_t[0])[:, None] + bit
        words = _scatter_bits(words, idx2.astype(jnp.uint32), offs2,
                              jnp.asarray(nbits2_t[0])[:, None])
    return words


def _unquant_channel_t(q, p, prec: int, prec_p: int):
    """One channel of _unquantize_with_p_t."""
    c = ((q << 1) | p) if prec != prec_p else q
    return _unquantize(c, prec_p)


# Quality/cost of the perturbation ladder (rounds=2, deltas=(2,1)),
# measured on the golden corpus vs the default LS-refit search:
# albedo +0.371 dB, two-region +0.473, alpha-gradient +0.491,
# normal +0.929, at ~2.2x encode time (jnp path).
_PERTURB_DELTAS = (2, 1)
_PERTURB_ROUNDS = 2

# Ladder tiers: (rounds, deltas) for the winner-refine pass. Measured on
# the golden corpus vs the compiled reference at power=3
# (benchmarks/quality_refine_scope.py; deltas ours-ref):
#   base (no refine) albedo -0.090  normal +2.100  flower -0.176
#   light (1,(1,))   albedo +0.118  normal +2.927  flower +0.130
#   2r1   (2,(1,))   albedo +0.125  normal +2.980  flower +0.137
#   full  (2,(2,1))  albedo +0.126  normal +2.983  flower +0.137
#   (3,(2,1)) is bit-identical to full — the fixed-index ladder saturates.
# The DEFAULT tier refines with LIGHT (beats the reference everywhere at
# half the refine-dispatch cost, 4.43 vs 9.64 ms/2K on v5e); the
# max-quality tier runs FULL twice (the second pass re-ladders the
# re-assigned indices, +0.02-0.03 dB over one full pass).
LADDER_FULL = (_PERTURB_ROUNDS, _PERTURB_DELTAS)
LADDER_LIGHT = (1, (1,))


def _perturb_channels_t(px_i, mask, m, shared_p, q0, q1, p0, p1, wk_ch,
                        aw: float = 1.0, alpha_ch: int = 3,
                        deltas=_PERTURB_DELTAS, rounds=_PERTURB_ROUNDS,
                        w_rows=None):
    """Bounded per-channel endpoint perturbation ladder — the TPU-shaped
    analog of the reference CPU codec's OptimizeEndPoints/PerturbOne hill
    climb (BC6HBC7.cpp:2926-3044). With the palette indices held fixed the
    block error is separable per channel, so each quantized endpoint
    channel greedily tries +/-delta steps on a shrinking ladder, keeping
    per-lane improvements; the caller re-runs the projection assignment
    once afterwards (the reference instead re-maps per step, :2968).

    wk_ch: per-channel [16, NB] palette weights (modes 4/5 pass the alpha
    channel's separate index weights). w_rows: optional per-channel [NB]
    f32 error weights overriding (aw, alpha_ch) — the winner-refine pass
    needs them because modes 4/5's rotated alpha channel is per-lane
    there. Returns (q0, q1, err, err0) with err the ladder's final
    fixed-index error and err0 the pre-ladder fixed-index error."""
    p1u = p0 if shared_p else p1
    q0r = [q0[c] for c in range(4)]
    q1r = [q1[c] for c in range(4)]
    ch_err = []
    chans = [c for c in range(4) if m.rgba_prec[c] > 0]

    def cherr(c, u0c, u1c):
        wk = wk_ch[c]
        d = px_i[:, c, :]
        r = (d - (((64 - wk) * u0c[None, :] + wk * u1c[None, :] + 32)
                  >> 6)).astype(jnp.float32)
        if w_rows is not None:
            r2 = r * r * w_rows[c][None, :]
        else:
            w = aw if c == alpha_ch and aw != 1.0 else 1.0
            r2 = r * r * w
        return jnp.sum(jnp.where(mask, r2, 0.0), axis=0)

    full = jnp.full(px_i.shape[2], 255, jnp.int32)
    for c in range(4):
        if m.rgba_prec[c] == 0:
            # unencoded channel decodes as 255; its constant error term
            # must stay in err so cross-mode folds compare like for like
            # (matches _assign_indices_t, which scores all 4 channels)
            ch_err.append(cherr(c, full, full))
            continue
        prec, prec_p = m.rgba_prec[c], m.rgba_prec_p[c]
        u0c = _unquant_channel_t(q0r[c], p0, prec, prec_p)
        u1c = _unquant_channel_t(q1r[c], p1u, prec, prec_p)
        ch_err.append(cherr(c, u0c, u1c))

    err0 = sum(ch_err)
    for _ in range(rounds):
        for c in chans:
            prec, prec_p = m.rgba_prec[c], m.rgba_prec_p[c]
            maxq = (1 << prec) - 1
            base = ch_err[c]
            for which in (0, 1):
                rows = q0r if which == 0 else q1r
                pbit = p0 if which == 0 else p1u
                other_u = _unquant_channel_t(
                    (q1r if which == 0 else q0r)[c],
                    p1u if which == 0 else p0, prec, prec_p)
                for delta in deltas:
                    for sgn in (delta, -delta):
                        qt = jnp.clip(rows[c] + sgn, 0, maxq)
                        ut = _unquant_channel_t(qt, pbit, prec, prec_p)
                        e = cherr(c, ut, other_u) if which == 0 else \
                            cherr(c, other_u, ut)
                        better = e < base
                        rows[c] = jnp.where(better, qt, rows[c])
                        base = jnp.minimum(e, base)
            ch_err[c] = base

    err = sum(ch_err)
    return jnp.stack(q0r), jnp.stack(q1r), err, err0


# Ladder sentinel: the analytic moment ladder (r4). Instead of 12-16
# exact palette evaluations per subset (the ±1 probe grid), compute the
# 5 residual/weight moments per channel and pick the best joint
# (d_endpoint0, d_endpoint1) ∈ {-1,0,+1}² q-step move from the exact
# quadratic model of the fixed-index error (the palette is affine in
# each endpoint up to the >>6 floor); ONE exact re-assignment +
# rescore then accepts or rejects the combined move, so quality can
# never regress below the unrefined search. Joint moves also reach
# (±1, ±1) corners the sequential exact ladder only finds when the
# first axis move helps on its own.
LADDER_MOMENT = "moment"


def _moment_channels_t(px_i, mask, m, shared_p, q0, q1, p0, p1, wk_ch,
                       aw: float = 1.0, alpha_ch: int = 3, w_rows=None):
    """Analytic single-step endpoint move per channel (LADDER_MOMENT):
    the quadratic-model argmin over the 3x3 q-step grid. Same signature
    contract as _perturb_channels_t but err_l is +inf — the caller's
    one exact re-assignment supplies the accept/reject error. Per-lane
    channel weights scale a channel's quadratic uniformly, so the pick
    is weight-independent; err0 keeps them (acceptance bar)."""
    p1u = p0 if shared_p else p1
    q0r = [q0[c] for c in range(4)]
    q1r = [q1[c] for c in range(4)]
    nb = px_i.shape[2]
    chans = [c for c in range(4) if m.rgba_prec[c] > 0]

    err0 = jnp.zeros((nb,), jnp.float32)
    full = jnp.full((nb,), 255, jnp.int32)
    moments_cache = {}
    for c in range(4):
        if m.rgba_prec[c] == 0:
            d = (px_i[:, c, :] - 255).astype(jnp.float32)
            r2 = d * d
            if w_rows is not None:
                r2 = r2 * w_rows[c][None, :]
            elif c == alpha_ch and aw != 1.0:
                r2 = r2 * aw
            err0 = err0 + jnp.sum(jnp.where(mask, r2, 0.0), axis=0)
            continue
        prec, prec_p = m.rgba_prec[c], m.rgba_prec_p[c]
        maxq = (1 << prec) - 1
        u0c = _unquant_channel_t(q0r[c], p0, prec, prec_p)
        u1c = _unquant_channel_t(q1r[c], p1u, prec, prec_p)
        wk = wk_ch[c]
        pal = ((64 - wk) * u0c[None, :] + wk * u1c[None, :] + 32) >> 6
        r = (px_i[:, c, :] - pal).astype(jnp.float32)
        r2 = r * r
        if w_rows is not None:
            r2 = r2 * w_rows[c][None, :]
        elif c == alpha_ch and aw != 1.0:
            r2 = r2 * aw
        err0 = err0 + jnp.sum(jnp.where(mask, r2, 0.0), axis=0)

        key = id(wk)
        if key not in moments_cache:
            a = (64 - wk).astype(jnp.float32) * jnp.float32(1 / 64)
            b = wk.astype(jnp.float32) * jnp.float32(1 / 64)
            moments_cache[key] = (
                a, b,
                jnp.sum(jnp.where(mask, a * a, 0.0), axis=0),
                jnp.sum(jnp.where(mask, a * b, 0.0), axis=0),
                jnp.sum(jnp.where(mask, b * b, 0.0), axis=0))
        a, b, saa, sab, sbb = moments_cache[key]
        sra = jnp.sum(jnp.where(mask, r * a, 0.0), axis=0)
        srb = jnp.sum(jnp.where(mask, r * b, 0.0), axis=0)

        # exact unquantized steps of a ±1 q move (0 at the field rail)
        q0p, q0m = jnp.minimum(q0r[c] + 1, maxq), jnp.maximum(q0r[c] - 1, 0)
        q1p, q1m = jnp.minimum(q1r[c] + 1, maxq), jnp.maximum(q1r[c] - 1, 0)
        d0 = {0: jnp.zeros((nb,), jnp.float32),
              1: (_unquant_channel_t(q0p, p0, prec, prec_p)
                  - u0c).astype(jnp.float32),
              -1: (_unquant_channel_t(q0m, p0, prec, prec_p)
                   - u0c).astype(jnp.float32)}
        d1 = {0: jnp.zeros((nb,), jnp.float32),
              1: (_unquant_channel_t(q1p, p1u, prec, prec_p)
                  - u1c).astype(jnp.float32),
              -1: (_unquant_channel_t(q1m, p1u, prec, prec_p)
                   - u1c).astype(jnp.float32)}
        qs0 = {0: q0r[c], 1: q0p, -1: q0m}
        qs1 = {0: q1r[c], 1: q1p, -1: q1m}

        best = jnp.zeros((nb,), jnp.float32)
        bq0, bq1 = q0r[c], q1r[c]
        for s0 in (0, 1, -1):
            for s1 in (0, 1, -1):
                if s0 == 0 and s1 == 0:
                    continue
                e0, e1 = d0[s0], d1[s1]
                de = (e0 * e0 * saa + e1 * e1 * sbb
                      + 2.0 * e0 * e1 * sab
                      - 2.0 * (e0 * sra + e1 * srb))
                better = de < best
                best = jnp.minimum(de, best)
                bq0 = jnp.where(better, qs0[s0], bq0)
                bq1 = jnp.where(better, qs1[s1], bq1)
        q0r[c] = bq0
        q1r[c] = bq1

    errl = jnp.full((nb,), jnp.inf, jnp.float32)
    return jnp.stack(q0r), jnp.stack(q1r), errl, err0


def _eval_subset_candidate(px_i, px_f, mask_list, anchors, mode_id,
                           aw: float = 1.0):
    """Evaluate one (mode, shape) candidate for all blocks.

    px_i [16, 4, NB] int32, px_f float, mask_list: per-subset [16, NB] bool,
    anchors: per-subset anchor pixel ([NB] array or int).
    Returns (err [NB], q0s, q1s, p0s, p1s [lists], idx [16, NB])."""
    m = _BC7_MODES[mode_id]
    shared_p = m.p_bits == (m.partitions + 1) and m.p_bits > 0
    prec = m.index_prec

    total_err = jnp.zeros(px_i.shape[2], jnp.float32)
    e_pairs, p_pairs = [], []
    idx_full = jnp.zeros((px_i.shape[0], px_i.shape[2]), jnp.int32)

    for sub, mask in enumerate(mask_list):
        e0f, e1f = _minmax_axis_endpoints_t(px_f, mask,
                                            with_alpha=m.rgba_prec[3] > 0)

        def qpal(e0f_, e1f_):
            q0, q1, p0, p1 = _quantize_endpoints_t(e0f_, e1f_, m)
            u0, u1 = _unquantize_with_p_t(q0, q1, p0, p1, m, shared_p)
            idx, err = _assign_indices_t(px_i, u0, u1, prec, mask, aw=aw)
            return q0, q1, p0, p1, idx, err

        q0a, q1a, p0a, p1a, idx_a, err_a = qpal(e0f, e1f)
        idx_r, err_r = idx_a, err_a
        q0b, q1b, p0b, p1b = q0a, q1a, p0a, p1a
        e0c, e1c = e0f, e1f
        for _ in range(1):
            e0c, e1c = _ls_refit_t(px_f, idx_r, mask, prec, e0c, e1c)
            q0b, q1b, p0b, p1b, idx_r, err_r = qpal(e0c, e1c)
        better = err_r < err_a
        q0 = jnp.where(better[None, :], q0b, q0a)
        q1 = jnp.where(better[None, :], q1b, q1a)
        p0 = jnp.where(better, p0b, p0a)
        p1 = jnp.where(better, p1b, p1a)
        idx = jnp.where(better[None, :], idx_r, idx_a)
        err = jnp.where(better, err_r, err_a)

        total_err = total_err + err
        e_pairs.append((q0, q1))
        p_pairs.append((p0, p1))
        idx_full = jnp.where(mask, idx, idx_full)

    # anchor swaps (AssignIndices, BC6HBC7.cpp:3181-3194)
    msb = 1 << (prec - 1)
    maxi = (1 << prec) - 1
    q0s, q1s, p0s, p1s = [], [], [], []
    for sub, (mask, anchor) in enumerate(zip(mask_list, anchors)):
        if isinstance(anchor, int):
            a_idx = idx_full[anchor]
        else:
            # anchor is [NB] pixel positions; one-hot select over 16 rows
            a_idx = jnp.zeros(idx_full.shape[1], jnp.int32)
            for i in range(16):
                a_idx = jnp.where(anchor == i, idx_full[i], a_idx)
        swap = (a_idx & msb) != 0
        q0, q1 = e_pairs[sub]
        p0, p1 = p_pairs[sub]
        q0s.append(jnp.where(swap[None, :], q1, q0))
        q1s.append(jnp.where(swap[None, :], q0, q1))
        p0s.append(jnp.where(swap, p1, p0))
        p1s.append(jnp.where(swap, p0, p1))
        idx_full = jnp.where(swap[None, :] & mask, maxi - idx_full, idx_full)
    return total_err, q0s, q1s, p0s, p1s, idx_full


# Shared-fit trajectory for the BC7 2-subset mode family (r5): modes 1
# and 3 evaluate the SAME shape candidates and differ only in endpoint
# precision (6.6.6+shared-pbit vs 7.7.7+pbit) and index width (3 vs 2
# bits) — ms_aInfo, BC6HBC7.cpp:1106-1125. Like BC6H's shared fit
# (BC6H_SHARED_FIT, +27%), one precision-free float trajectory per
# (shape candidate, subset) — axis fit -> float-palette assignment ->
# LS refit rounds -> keep-better — is shared by both modes; each mode
# then quantizes THOSE endpoints at its own precision and rescores
# exactly once. This removes one full exact assign pass + one LS refit
# per mode per candidate vs the independent A/B evaluation.
# BC7_SHARED2SUB_IPREC: index width of the float trajectory (3 = mode
# 1's; the refit weight grid). BC7_SHARED2SUB_ROUNDS: refit->rescore
# rounds (BC6H saturates at 3; BC7's LDR domain is tamer).
BC7_SHARED2SUB = True
BC7_SHARED2SUB_IPREC = 3
BC7_SHARED2SUB_ROUNDS = 1
# Float keep-better in the shared trajectories (compare the refit
# result's float score against the axis init and keep the better —
# the BC6H shared-fit guard). Measured OFF for BC7 (r5): the refit
# never loses on LDR content — every corpus delta is IDENTICAL with
# the guard removed — so the float dist/score passes are pure
# overhead. The det-ok fallback inside the refit still guards the
# singular case.
BC7_SHARED_KEEPBETTER = False


def _float_assign_ch_t(px_f, mask, e0, e1, iprec: int,
                       ch_start: int = 0, ch_end: int = 3,
                       score: bool = True):
    """Float-endpoint palette assignment + SSE over a channel range: the
    precision-free scorer for the shared fit trajectories (the BC7
    analog of _bc6h_palette_err_f). Same projection/snap geometry as
    _assign_indices_t but with unquantized endpoints and a linear
    (floor-less) palette — only used to steer the fit; every mode's
    error is rescored exactly afterwards. Modes 1/3 use channels [0, 3)
    (alpha decodes as 255, a constant per-subset error term that cannot
    affect the trajectory's keep-better); modes 4/5 use [0, 3) for the
    color set and [3, 4) for the alpha set.

    px_f [16, 4, NB] f32; e0/e1 [4, NB] f32. Returns (idx f32 [16, NB],
    err [NB])."""
    K = 1 << iprec
    dot = jnp.zeros((px_f.shape[0], px_f.shape[2]), jnp.float32)
    span = jnp.zeros((px_f.shape[2],), jnp.float32)
    for c in range(ch_start, ch_end):
        e = e1[c] - e0[c]
        dot = dot + (px_f[:, c, :] - e0[c][None, :]) * e[None, :]
        span = span + e * e
    p64 = jnp.clip(dot * (64.0 / jnp.where(span > 0, span, 1.0))[None, :],
                   0.0, 64.0)
    kf = jnp.clip(jnp.round(p64 * ((K - 1) / 64.0)), 0.0, K - 1.0)
    wk = _pal_weight_f(kf, K)
    wkp = _pal_weight_f(jnp.minimum(kf + 1.0, K - 1.0), K)
    wkm = _pal_weight_f(jnp.maximum(kf - 1.0, 0.0), K)
    up = (kf < K - 1) & (2.0 * p64 > wk + wkp)
    dn = (kf > 0) & (2.0 * p64 < wk + wkm)
    idx = jnp.where(up, kf + 1.0, jnp.where(dn, kf - 1.0, kf))
    if not score:
        # idx-only trajectory step (BC7_SHARED_KEEPBETTER off): the
        # scoring exists only for the keep-better guard
        return idx, None
    wkf = _pal_weight_f(idx, K) * jnp.float32(1 / 64)
    dist = jnp.zeros_like(dot)
    # (px - e0) - wkf*e, NOT px - (e0 + wkf*e): matches the kernel twins'
    # op order (_k_float_assign_rgb / _k_float_snap_dist) bit-for-bit
    for c in range(ch_start, ch_end):
        d = (px_f[:, c, :] - e0[c][None, :]) \
            - wkf * (e1[c] - e0[c])[None, :]
        dist = dist + d * d
    err = jnp.sum(jnp.where(mask, dist, 0.0), axis=0)
    return idx, err


def _float_assign_rgb_t(px_f, mask, e0, e1, iprec: int,
                        score: bool = True):
    """Channels [0, 3) of _float_assign_ch_t (the 2-subset family)."""
    return _float_assign_ch_t(px_f, mask, e0, e1, iprec, 0, 3,
                              score=score)


def _ls_refit_f_t(px_f, idx_f, mask, iprec: int, e0, e1,
                  ch_start: int = 0, ch_end: int = 3):
    """LS refit from an f32 index plane over a channel range (the
    shared-fit trajectory's refit; other rows pass through). Mirrors
    _ls_refit_t with _pal_weight_f weights."""
    x = _pal_weight_f(idx_f, 1 << iprec) * jnp.float32(1 / 64)
    m = mask.astype(jnp.float32)
    a = (1.0 - x) * m
    b = x * m
    A = jnp.sum(a * a, axis=0)
    B = jnp.sum(a * b, axis=0)
    C = jnp.sum(b * b, axis=0)
    det = A * C - B * B
    ok = jnp.abs(det) > 1e-6
    inv = 1.0 / jnp.where(ok, det, 1.0)
    e0_rows = [e0[c] for c in range(4)]
    e1_rows = [e1[c] for c in range(4)]
    for c in range(ch_start, ch_end):
        r0 = jnp.sum(a * px_f[:, c, :], axis=0)
        r1 = jnp.sum(b * px_f[:, c, :], axis=0)
        n0 = jnp.clip((C * r0 - B * r1) * inv, 0.0, 255.0)
        n1 = jnp.clip((A * r1 - B * r0) * inv, 0.0, 255.0)
        e0_rows[c] = jnp.where(ok, n0, e0_rows[c])
        e1_rows[c] = jnp.where(ok, n1, e1_rows[c])
    return jnp.stack(e0_rows), jnp.stack(e1_rows)


def _ls_refit_f_rgb_t(px_f, idx_f, mask, iprec: int, e0, e1):
    """Channels [0, 3) of _ls_refit_f_t (the 2-subset family)."""
    return _ls_refit_f_t(px_f, idx_f, mask, iprec, e0, e1, 0, 3)


def _eval_2sub_shared(px_i, px_f, mask_list, anchors, mode_ids,
                      aw: float = 1.0):
    """Shared-fit evaluation of one shape candidate for the 2-subset
    family: ONE float trajectory per subset steers BOTH modes' endpoint
    fits; each mode quantizes the trajectory's endpoints at its own
    precision and rescores exactly once (pallas twin:
    pallas_kernels._k_eval_2sub_shared). Returns {mode_id: (err, q0s,
    q1s, p0s, p1s, idx)} in _eval_subset_candidate's format (anchor
    swaps applied)."""
    nb = px_i.shape[2]
    iprec_s = BC7_SHARED2SUB_IPREC

    # precision-free trajectory per subset (BC6H_SHARED_FIT pattern);
    # keep-better measured quality-neutral OFF for BC7 (see
    # BC7_SHARED_KEEPBETTER) — the scoring passes are skipped then
    kb = BC7_SHARED_KEEPBETTER
    shared = []
    for mask in mask_list:
        e0f, e1f = _minmax_axis_endpoints_t(px_f, mask, with_alpha=False)
        idx_b, err0 = _float_assign_rgb_t(px_f, mask, e0f, e1f, iprec_s,
                                          score=kb)
        e0c, e1c = e0f, e1f
        err_b = err0
        for r in range(BC7_SHARED2SUB_ROUNDS):
            e0c, e1c = _ls_refit_f_rgb_t(px_f, idx_b, mask, iprec_s,
                                         e0c, e1c)
            last = r == BC7_SHARED2SUB_ROUNDS - 1
            if kb or not last:
                # the post-refit assignment only feeds the next round's
                # refit or the keep-better score
                idx_b, err_b = _float_assign_rgb_t(px_f, mask, e0c, e1c,
                                                   iprec_s, score=kb)
        if kb:
            better = err_b < err0
            shared.append((jnp.where(better[None, :], e0c, e0f),
                           jnp.where(better[None, :], e1c, e1f)))
        else:
            shared.append((e0c, e1c))

    out = {}
    for mode_id in mode_ids:
        m = _BC7_MODES[mode_id]
        shared_p = m.p_bits == (m.partitions + 1) and m.p_bits > 0
        prec = m.index_prec
        total_err = jnp.zeros(nb, jnp.float32)
        e_pairs, p_pairs = [], []
        idx_full = jnp.zeros((px_i.shape[0], nb), jnp.int32)
        for sub, mask in enumerate(mask_list):
            e0c, e1c = shared[sub]
            q0, q1, p0, p1 = _quantize_endpoints_t(e0c, e1c, m)
            u0, u1 = _unquantize_with_p_t(q0, q1, p0, p1, m, shared_p)
            idx, err = _assign_indices_t(px_i, u0, u1, prec, mask, aw=aw)
            total_err = total_err + err
            e_pairs.append((q0, q1))
            p_pairs.append((p0, p1))
            idx_full = jnp.where(mask, idx, idx_full)

        # anchor swaps (AssignIndices, BC6HBC7.cpp:3181-3194)
        msb = 1 << (prec - 1)
        maxi = (1 << prec) - 1
        q0s, q1s, p0s, p1s = [], [], [], []
        idx_m = idx_full
        for sub, (mask, anchor) in enumerate(zip(mask_list, anchors)):
            if isinstance(anchor, int):
                a_idx = idx_m[anchor]
            else:
                a_idx = jnp.zeros(nb, jnp.int32)
                for i in range(16):
                    a_idx = jnp.where(anchor == i, idx_m[i], a_idx)
            swap = (a_idx & msb) != 0
            q0, q1 = e_pairs[sub]
            p0, p1 = p_pairs[sub]
            q0s.append(jnp.where(swap[None, :], q1, q0))
            q1s.append(jnp.where(swap[None, :], q0, q1))
            p0s.append(jnp.where(swap, p1, p0))
            p1s.append(jnp.where(swap, p0, p1))
            idx_m = jnp.where(swap[None, :] & mask, maxi - idx_m, idx_m)
        out[mode_id] = (total_err, q0s, q1s, p0s, p1s, idx_m)
    return out


def _try_2sub_modes_shared(px_i, px_f, mode_ids, ests, aw: float = 1.0):
    """Shared-fit twin of _try_partition_mode for modes (1, 3): rank
    shapes once, evaluate each candidate for both modes off one float
    trajectory, fold per mode. Returns {mode_id: (err, words)}."""
    nb = px_i.shape[2]
    parts_tab = jnp.asarray(PARTITIONS[1])
    fix_tab = jnp.asarray(FIXUPS[1])
    best = {mode_id: (jnp.full((nb,), jnp.inf, jnp.float32),
                      jnp.zeros((nb, 4), jnp.uint32))
            for mode_id in mode_ids}
    for s_blk in _top_k_shapes(ests[:64], BC7_SHAPE_CANDIDATES):
        pmask = parts_tab[s_blk].T
        mask_list = [pmask == 0, pmask == 1]
        anchors = [0, fix_tab[s_blk, 1].astype(jnp.int32)]
        evals = _eval_2sub_shared(px_i, px_f, mask_list, anchors,
                                  mode_ids, aw=aw)
        for mode_id in mode_ids:
            err, q0s, q1s, p0s, p1s, idx = evals[mode_id]
            words = _emit_bc7(mode_id, s_blk.astype(jnp.uint32), 0, 0,
                              q0s, q1s, p0s, p1s, idx, None, nb)
            b_err, b_words = best[mode_id]
            better = err < b_err
            best[mode_id] = (jnp.minimum(err, b_err),
                             jnp.where(better[:, None], words, b_words))
    return best


# Shapes fully refined per partitioned mode after the cheap estimate pass.
# Measured quality on hard two-region content: 1 cand -36.23 dB,
# 2 -36.36, 4 -36.47, 8 -36.57 (reference refines 16 = uShapes/4,
# BC6HBC7.cpp:2831); on smooth albedo 1..16 are within 0.02 dB. 4 is the
# speed/quality knee: each extra candidate costs ~1ms/mode at 2K.
BC7_SHAPE_CANDIDATES = 4


# Fraction of the dominant-axis variance kept in the off-axis shape
# proxy (0 = pure off-axis residual, 1 = plain total variance).
# Swept on the golden corpus vs the compiled reference (r3):
#   w=0     albedo -0.164  tworegion -0.007  normal +1.768  alpha +0.151
#   w=0.05  albedo -0.163  tworegion +0.020  normal +1.993  alpha +0.150
#   w=0.1   albedo -0.189  tworegion +0.020  normal +1.956  alpha +0.147
#   w=0.5   albedo -0.400  tworegion +0.033  normal +1.654  alpha +0.101
# (deltas vs reference full search; BC6H keeps w=0 semantics via its own
# call site — the HDR probe measured best at the pure residual.)
_ON_AXIS_W = 0.05

# Search-scope knobs shared by the jnp path and the pallas mega kernel
# (static at trace time; bc7_encode_pallas takes them as jit-static
# args). _MODE4_IMS: index modes tried for mode 4 (the reference tries
# both, BC6HBC7.cpp:2850); _MODE45_ROTS: rotations tried for modes 4/5
# (:2841). The r3 cut sweep (benchmarks/quality_search_cuts.py, golden
# corpus vs the compiled reference; TPU cost in profile_cuts_tpu.py)
# measured, with the LIGHT winner-ladder recovering fixed-index error:
#   im0 skip:  min slack +0.120 -> +0.067 dB, 245.1 -> 278.9 Mt/s
#   cand 4->3: min slack +0.069; combined c3-im0 +0.017 (too thin)
#   any rotation cut: LOSES to the reference outright (-0.08..-0.27)
# The default tier skips mode-4's second index mode (winner-ladder
# re-derives indices on the final state, so im=1's extra alpha
# precision is mostly recovered); the maxq tier keeps full scope.
_MODE4_IMS = (0,)
_MODE45_ROTS = (0, 1, 2, 3)


# Power-iteration count for the dominant-axis eigenvalue inside the
# off-axis shape proxy. The iteration runs on [n_shapes, NB] planes (the
# single biggest cost of the off-axis ranking), so the count is a direct
# perf lever. Swept on the golden corpus vs the compiled reference
# (benchmarks/quality_offaxis_sweep.py, r3): 3 iterations is quality-
# identical to 6 (every content within +-0.007 dB); 2 costs -0.019 on
# albedo, 1 costs -0.058. off_axis=OFF loses albedo/china/flower
# outright (-0.19/-0.13/-0.23), so the ranking itself must stay.
_POWER_ITERS = 3


def _shape_estimates_table(px_f, partitions: int, nch: int,
                           n_shapes: int | None = None,
                           off_axis: bool = False,
                           axis_w: float | None = None):
    """[n_shapes, NB] cheap error proxy for every shape of a partition class.

    For each (shape, subset): the within-subset total variance
    Σ|x - mean_subset|². All per-subset sums are matmuls of static
    [n_shapes, 16] mask matrices against [16, NB] pixel planes, so the
    whole table rides the MXU — no per-shape loop. Channels beyond `nch`
    still participate but contribute zero once centered when constant
    (e.g. opaque alpha), so one table serves BC7 modes 1/3/7.

    `off_axis=True` (BC6H) subtracts the dominant-axis variance, ranking
    shapes by the residual a linear palette CANNOT represent — the total
    variance punishes large on-axis spread, which is exactly what HDR
    two-region blocks have. Measured on the golden corpus vs the
    compiled reference encoder: BC6H 46.42 -> 47.37 dB at 4 candidates
    (the all-32-shapes ceiling, and past the reference's 47.33); for
    BC7's LDR content the term is worth ~0.005 dB and stays off. Costs
    6 cross-moment planes + an unrolled power iteration."""
    if n_shapes is None:
        n_shapes = 64 if partitions else 1
    nb = px_f.shape[2]

    mu = jnp.mean(px_f, axis=0)                       # [4, NB]
    xc = px_f - mu[None, :, :]                        # [16, 4, NB] centered
    q = jnp.sum(xc * xc, axis=1)                      # [16, NB] per-px |xc|^2

    # one fused mask matmul: rows = every (subset, shape) pair, contracting
    # the 16-pixel axis; planes: |xc|^2, 4 channels, + 6 cross moments
    # when the off-axis term is on
    parts = PARTITIONS[partitions][:n_shapes]         # host [S, 16]
    n_sub = partitions + 1
    m_host = np.concatenate(
        [(parts == p).astype(np.float32) for p in range(n_sub)], axis=0)
    n_inv = 1.0 / np.maximum(m_host.sum(axis=1), 1.0)  # [n_sub*S]
    planes = [q[:, None, :], xc]
    pairs = [(a, b) for a in range(3) for b in range(a, 3)]
    if off_axis:
        planes.append(jnp.stack([xc[:, a, :] * xc[:, b, :]
                                 for a, b in pairs], axis=1))
    rhs = jnp.concatenate(planes, axis=1)             # [16, 5(+6), NB]
    s_all = jnp.einsum("mk,kqn->mqn", jnp.asarray(m_host), rhs,
                       preferred_element_type=jnp.float32)

    est = jnp.zeros((n_shapes, nb), jnp.float32)
    for p in range(n_sub):
        sp = s_all[p * n_shapes:(p + 1) * n_shapes]    # [S, 5(+6), NB]
        ninv = jnp.asarray(n_inv[p * n_shapes:(p + 1) * n_shapes])[:, None]
        sse = sp[:, 0] - jnp.sum(sp[:, 1:5] * sp[:, 1:5], axis=1) * ninv
        if not off_axis:
            est = est + sse
            continue
        # within-subset centered second moments (n-scaled covariance):
        # C[a,b] = sum(x_a x_b) - sum(x_a) sum(x_b) / n, RGB only
        C = {}
        for k, (a, b) in enumerate(pairs):
            C[(a, b)] = sp[:, 5 + k] - sp[:, 1 + a] * sp[:, 1 + b] * ninv

        def cdot(a, b):
            return C[(a, b)] if (a, b) in C else C[(b, a)]

        # dominant eigenvalue by unrolled power iteration
        v = [jnp.ones_like(sse) for _ in range(3)]
        for _ in range(_POWER_ITERS):
            w = [sum(cdot(a, b) * v[b] for b in range(3)) for a in range(3)]
            nrm = jnp.sqrt(sum(x * x for x in w))
            inv = 1.0 / jnp.maximum(nrm, 1e-20)
            v = [x * inv for x in w]
        lam = sum(v[a] * sum(cdot(a, b) * v[b] for b in range(3))
                  for a in range(3))
        # the off-axis residual (the fourth plane is BC6H's zero-padded
        # alpha, so sse is the pure RGB within-subset SSE), plus a small
        # on-axis term: the palette carries the axis with only 4-16
        # levels, so residual on-axis spread still costs quantization
        # error on smooth content (sweep at _ON_AXIS_W)
        w_axis = _ON_AXIS_W if axis_w is None else axis_w
        est = est + jnp.maximum(sse - lam * (1.0 - w_axis), 0.0)
    return est


def _top_k_shapes(ests, k: int):
    """Per-block indices of the k smallest estimates. ests [S, NB]."""
    picks = []
    work = ests
    rows = jnp.arange(ests.shape[0])[:, None]
    for _ in range(min(k, ests.shape[0])):
        s_blk = jnp.argmin(work, axis=0).astype(jnp.int32)    # [NB]
        picks.append(s_blk)
        work = jnp.where(rows == s_blk[None, :], jnp.inf, work)
    return picks


def _try_partition_mode(px_i, px_f, mode_id, ests=None, s_blks=None,
                        aw: float = 1.0):
    """Modes 0/1/2/3/7: estimate all shapes, fully refine the best
    BC7_SHAPE_CANDIDATES per block. Returns (err [NB], words [NB, 4])."""
    m = _BC7_MODES[mode_id]
    nb = px_i.shape[2]
    parts_tab = jnp.asarray(PARTITIONS[m.partitions])   # [64, 16]
    fix_tab = jnp.asarray(FIXUPS[m.partitions])         # [64, 3]

    use_pallas = False
    try:
        from .pallas_kernels import (_use_pallas, partition_mode_pallas,
                                     partition_shapes_pallas)
        use_pallas = _use_pallas()
    except Exception:
        pass
    if use_pallas:
        # whole-mode mega-kernels: shape ranking (estimates + top-k) and
        # candidate evaluation + emit, each one VMEM pass (same math as
        # the jnp path below)
        if s_blks is None:
            s_blks = partition_shapes_pallas(
                px_i, m.partitions, 1 << m.partition_bits, 4,
                BC7_SHAPE_CANDIDATES, off_axis=True)
        return partition_mode_pallas(px_i, s_blks.astype(jnp.int32),
                                     mode_id, 1 << m.partition_bits, aw=aw)

    if ests is None:
        ests = _shape_estimates_table(px_f, m.partitions,
                                      4 if m.rgba_prec[3] else 3)
    # mode 0 has a 4-bit partition field: only shapes 0..15 are encodable
    ests = ests[:1 << m.partition_bits]

    best_err = jnp.full((nb,), jnp.inf, jnp.float32)
    best_words = jnp.zeros((nb, 4), jnp.uint32)
    for s_blk in _top_k_shapes(ests, BC7_SHAPE_CANDIDATES):
        pmask = parts_tab[s_blk].T                       # [16, NB]
        mask_list = [pmask == p for p in range(m.partitions + 1)]
        anchors = [0 if p == 0 else fix_tab[s_blk, p].astype(jnp.int32)
                   for p in range(m.partitions + 1)]
        err, q0s, q1s, p0s, p1s, idx = _eval_subset_candidate(
            px_i, px_f, mask_list, anchors, mode_id, aw=aw)
        words = _emit_bc7(mode_id, s_blk.astype(jnp.uint32), 0, 0,
                          q0s, q1s, p0s, p1s, idx, None, nb)
        better = err < best_err
        best_words = jnp.where(better[:, None], words, best_words)
        best_err = jnp.minimum(err, best_err)
    return best_err, best_words


def _dual_eval_ref(pr_i, pr_f, mode_id, im, aw: float = 1.0,
                   alpha_ch: int = 3):
    """Dual-index (modes 4/5) candidate evaluation, jnp reference path.

    RGB axis-fit + alpha min/max endpoints (RoughMSE, BC6HBC7.cpp:3553),
    quantize, independent color/alpha palette searches at the two index
    precisions, one least-squares refit per group, second evaluation,
    keep-best. Returns (q0, q1 [4, NB], p0, p1 [NB], cidx, aidx [16, NB],
    err [NB]). pallas_kernels.dual_eval_pallas fuses this same math."""
    m = _BC7_MODES[mode_id]
    nb = pr_i.shape[2]
    mask = jnp.ones((16, nb), bool)
    cprec = m.index_prec2 if im else m.index_prec
    aprec = m.index_prec if im else m.index_prec2

    def qpal(e0f_, e1f_):
        q0, q1, p0, p1 = _quantize_endpoints_t(e0f_, e1f_, m)
        u0, u1 = _unquantize_with_p_t(q0, q1, p0, p1, m, False)
        cidx, cerr = _assign_indices_t(pr_i, u0, u1, cprec, mask,
                                       channels=3, aw=aw,
                                       alpha_ch=alpha_ch)
        aidx, aerr = _assign_indices_t(pr_i, u0, u1, aprec, mask,
                                       channels=4, ch_start=3, aw=aw,
                                       alpha_ch=alpha_ch)
        return q0, q1, p0, p1, cidx, aidx, cerr + aerr

    e0f, e1f = _minmax_axis_endpoints_t(pr_f, mask, with_alpha=False)
    a_min = jnp.min(pr_f[:, 3, :], axis=0)
    a_max = jnp.max(pr_f[:, 3, :], axis=0)
    e0f = e0f.at[3].set(a_min)
    e1f = e1f.at[3].set(a_max)

    q0, q1, p0, p1, cidx, aidx, err = qpal(e0f, e1f)
    e0c, e1c = e0f, e1f
    e0c, e1c = _ls_refit_t(pr_f, cidx, mask, cprec, e0c, e1c,
                           ch_start=0, ch_end=3)
    e0c, e1c = _ls_refit_t(pr_f, aidx, mask, aprec, e0c, e1c,
                           ch_start=3, ch_end=4)
    q0b, q1b, p0b, p1b, cidx_b, aidx_b, err_b = qpal(e0c, e1c)
    better = err_b < err
    q0 = jnp.where(better[None, :], q0b, q0)
    q1 = jnp.where(better[None, :], q1b, q1)
    cidx = jnp.where(better[None, :], cidx_b, cidx)
    aidx = jnp.where(better[None, :], aidx_b, aidx)
    err = jnp.minimum(err_b, err)
    p0 = jnp.where(better, p0b, p0)
    p1 = jnp.where(better, p1b, p1)

    return q0, q1, p0, p1, cidx, aidx, err


def _try_single_mode(px_i, px_f, mode_id, aw: float = 1.0,
                     m4_ims=None):
    """Modes 4/5/6: single subset, rotations x index modes.
    Returns (err [NB], words [NB, 4])."""
    m = _BC7_MODES[mode_id]
    nb = px_i.shape[2]
    mask = jnp.ones((16, nb), bool)
    rots = _MODE45_ROTS if m.rotation_bits else (0,)
    if m4_ims is None:
        m4_ims = _MODE4_IMS
    ims = m4_ims if m.index_mode_bits else (0,)

    best_err = jnp.full((nb,), jnp.inf, jnp.float32)
    best_words = jnp.zeros((nb, 4), jnp.uint32)

    for rot in rots:
        if rot == 0:
            pr_i, pr_f = px_i, px_f
        else:
            ch = rot - 1  # swap channel ch with alpha
            perm = list(range(4))
            perm[ch], perm[3] = 3, ch
            pr_i = px_i[:, perm, :]
            pr_f = px_f[:, perm, :]
        alpha_ch = 3 if rot == 0 else rot - 1
        for im in ims:
            if m.index_prec2 == 0:
                # mode 6: joint RGBA indices
                err, q0s, q1s, p0s, p1s, idx = _eval_subset_candidate(
                    pr_i, pr_f, [mask], [0], mode_id, aw=aw)
                words = _emit_bc7(mode_id, 0, rot, im, q0s, q1s, p0s, p1s,
                                  idx, None, nb)
            else:
                q0, q1, p0, p1, cidx, aidx, err = _dual_eval_ref(
                    pr_i, pr_f, mode_id, im, aw=aw, alpha_ch=alpha_ch)

                # anchor fixes: color and alpha endpoint components swap
                # INDEPENDENTLY (AssignIndices, BC6HBC7.cpp:3196-3216)
                w1 = cidx if im == 0 else aidx
                w2 = aidx if im == 0 else cidx
                p1_, p2_ = m.index_prec, m.index_prec2
                msb1, maxi1 = 1 << (p1_ - 1), (1 << p1_) - 1
                msb2, maxi2 = 1 << (p2_ - 1), (1 << p2_) - 1
                swap1 = (w1[0] & msb1) != 0
                w1 = jnp.where(swap1[None, :], maxi1 - w1, w1)
                swap2 = (w2[0] & msb2) != 0
                w2 = jnp.where(swap2[None, :], maxi2 - w2, w2)
                swap_rgb = swap1 if im == 0 else swap2
                swap_a = swap2 if im == 0 else swap1
                do_swap = jnp.stack([swap_rgb, swap_rgb, swap_rgb, swap_a])
                q0f = jnp.where(do_swap, q1, q0)
                q1f = jnp.where(do_swap, q0, q1)
                words = _emit_bc7(mode_id, 0, rot, im, [q0f], [q1f],
                                  [p0], [p1], w1, w2, nb)
            better = err < best_err
            best_words = jnp.where(better[:, None], words, best_words)
            best_err = jnp.minimum(err, best_err)
    return best_err, best_words


# Shared-fit trajectory for the rotation family (r5): modes 4 and 5
# differ only in endpoint precision (5.5.5.6 vs 7.7.7.8) and alpha
# index width (3 vs 2 bits at index-mode 0) — ms_aInfo,
# BC6HBC7.cpp:1106-1125. Per rotation, ONE float trajectory (color at
# the common 2-bit width, alpha at mode 4's 3-bit width) steers both
# modes; each quantizes + rescores exactly once. Default tier only
# (mode-4 index-mode 0); maxq keeps the independent A/B evaluation.
BC7_SHARED45 = True
BC7_SHARED45_ROUNDS = 1


def _try_modes45_shared(px_i, px_f, aw: float = 1.0):
    """Shared-fit evaluation of modes 4/5 at index-mode 0 (pallas twin:
    pallas_kernels._k_modes45_shared). Returns {mode_id: (err, words)}."""
    nb = px_i.shape[2]
    mask = jnp.ones((16, nb), bool)
    best = {m: (jnp.full((nb,), jnp.inf, jnp.float32),
                jnp.zeros((nb, 4), jnp.uint32)) for m in (4, 5)}
    for rot in _MODE45_ROTS:
        if rot == 0:
            pr_i, pr_f = px_i, px_f
        else:
            ch = rot - 1
            perm = list(range(4))
            perm[ch], perm[3] = 3, ch
            pr_i = px_i[:, perm, :]
            pr_f = px_f[:, perm, :]
        alpha_ch = 3 if rot == 0 else rot - 1

        e0f, e1f = _minmax_axis_endpoints_t(pr_f, mask, with_alpha=False)
        e0f = e0f.at[3].set(jnp.min(pr_f[:, 3, :], axis=0))
        e1f = e1f.at[3].set(jnp.max(pr_f[:, 3, :], axis=0))

        # float trajectory: color channels at the common 2-bit index
        # width, alpha at mode 4's 3-bit width; keep-better measured
        # quality-neutral OFF (BC7_SHARED_KEEPBETTER)
        kb = BC7_SHARED_KEEPBETTER
        cidx, cerr0 = _float_assign_ch_t(pr_f, mask, e0f, e1f, 2, 0, 3,
                                         score=kb)
        aidx, aerr0 = _float_assign_ch_t(pr_f, mask, e0f, e1f, 3, 3, 4,
                                         score=kb)
        e0c, e1c = e0f, e1f
        cerr_b, aerr_b = cerr0, aerr0
        for r in range(BC7_SHARED45_ROUNDS):
            e0c, e1c = _ls_refit_f_t(pr_f, cidx, mask, 2, e0c, e1c, 0, 3)
            e0c, e1c = _ls_refit_f_t(pr_f, aidx, mask, 3, e0c, e1c, 3, 4)
            last = r == BC7_SHARED45_ROUNDS - 1
            if kb or not last:
                cidx, cerr_b = _float_assign_ch_t(pr_f, mask, e0c, e1c,
                                                  2, 0, 3, score=kb)
                aidx, aerr_b = _float_assign_ch_t(pr_f, mask, e0c, e1c,
                                                  3, 3, 4, score=kb)
        if kb:
            # keep-better per index set (the color and alpha fits are
            # independent: separate palettes, separate refits)
            bc_ = cerr_b < cerr0
            ba_ = aerr_b < aerr0
            e0s = jnp.stack(
                [jnp.where(bc_, e0c[c], e0f[c]) for c in range(3)]
                + [jnp.where(ba_, e0c[3], e0f[3])])
            e1s = jnp.stack(
                [jnp.where(bc_, e1c[c], e1f[c]) for c in range(3)]
                + [jnp.where(ba_, e1c[3], e1f[3])])
        else:
            e0s, e1s = e0c, e1c

        for mode_id in (4, 5):
            m = _BC7_MODES[mode_id]
            cprec, aprec = m.index_prec, m.index_prec2   # index-mode 0
            q0, q1, p0, p1 = _quantize_endpoints_t(e0s, e1s, m)
            u0, u1 = _unquantize_with_p_t(q0, q1, p0, p1, m, False)
            cidx_e, cerr_e = _assign_indices_t(pr_i, u0, u1, cprec, mask,
                                               channels=3, aw=aw,
                                               alpha_ch=alpha_ch)
            aidx_e, aerr_e = _assign_indices_t(pr_i, u0, u1, aprec, mask,
                                               channels=4, ch_start=3,
                                               aw=aw, alpha_ch=alpha_ch)
            err = cerr_e + aerr_e

            # anchor fixes (AssignIndices, BC6HBC7.cpp:3196-3216), im=0
            msb1, maxi1 = 1 << (cprec - 1), (1 << cprec) - 1
            msb2, maxi2 = 1 << (aprec - 1), (1 << aprec) - 1
            w1, w2 = cidx_e, aidx_e
            swap1 = (w1[0] & msb1) != 0
            w1 = jnp.where(swap1[None, :], maxi1 - w1, w1)
            swap2 = (w2[0] & msb2) != 0
            w2 = jnp.where(swap2[None, :], maxi2 - w2, w2)
            do_swap = jnp.stack([swap1, swap1, swap1, swap2])
            q0f = jnp.where(do_swap, q1, q0)
            q1f = jnp.where(do_swap, q0, q1)
            words = _emit_bc7(mode_id, 0, rot, 0, [q0f], [q1f],
                              [p0], [p1], w1, w2, nb)
            b_err, b_words = best[mode_id]
            better = err < b_err
            best[mode_id] = (jnp.minimum(err, b_err),
                             jnp.where(better[:, None], words, b_words))
    return best


def _bc7_unpack_mode(words_t, mode: int):
    """Unpack encoder state from packed blocks assuming `mode` (the
    EmitBlock inverse; field layout BC6HBC7.cpp:3221+). words_t [4, NB]
    lane-major u32. Returns (shape, rot, im [NB] i32; q0s/q1s per-subset
    [4, NB] endpoint codes WITHOUT the p bit; p0s/p1s per-subset [NB];
    idx1, idx2 [16, NB] full-precision index values, idx2 None when the
    mode has no second index set)."""
    m = _BC7_MODES[mode]
    nb = words_t.shape[1]
    n_sub = m.partitions + 1
    n_ep = n_sub * 2
    bit = mode + 1

    shape = _gb_t(words_t, bit, m.partition_bits).astype(jnp.int32)
    bit += m.partition_bits
    rot = _gb_t(words_t, bit, m.rotation_bits).astype(jnp.int32)
    bit += m.rotation_bits
    im = _gb_t(words_t, bit, m.index_mode_bits).astype(jnp.int32)
    bit += m.index_mode_bits

    zero = jnp.zeros((nb,), jnp.int32)
    ep = [[zero] * 4 for _ in range(n_ep)]
    for ch in range(4):
        prec = m.rgba_prec[ch]
        if prec == 0:
            continue
        for e in range(n_ep):
            ep[e][ch] = _gb_t(words_t, bit, prec).astype(jnp.int32)
            bit += prec
    p0s = [zero for _ in range(n_sub)]
    p1s = [zero for _ in range(n_sub)]
    if m.p_bits:
        pbits = []
        for _ in range(m.p_bits):
            pbits.append(_gb_t(words_t, bit, 1).astype(jnp.int32))
            bit += 1
        for sub in range(n_sub):
            if m.p_bits == n_sub:            # shared p-bit (mode 1)
                p0s[sub] = p1s[sub] = pbits[sub]
            else:
                p0s[sub] = pbits[2 * sub]
                p1s[sub] = pbits[2 * sub + 1]

    # anchors for index decompression
    if m.partitions:
        _, pa_tab = _packed_shape_tables_bc7(m.partitions,
                                             1 << m.partition_bits)
        pa = jnp.zeros((nb,), jnp.int32)
        for sv in range(1 << m.partition_bits):
            pa = jnp.where(shape == sv, pa_tab[sv], pa)
        a2 = pa & 0xF
        a3 = (pa >> 4) & 0xF if m.partitions == 2 else None
    else:
        a2 = a3 = None

    def read_indices(base_bit, prec, with_anchors):
        vals = []
        for i in range(16):
            if with_anchors and a2 is not None:
                before = (1 if i > 0 else 0) \
                    + (a2 < i).astype(jnp.int32) \
                    + ((a3 < i).astype(jnp.int32) if a3 is not None else 0)
                is_anchor = jnp.where(
                    (i == 0) | (a2 == i)
                    | ((a3 == i) if a3 is not None else False), 1, 0)
                start = base_bit + prec * i - before
                vals.append(_gb_dyn_t(words_t, start, is_anchor,
                                      prec).astype(jnp.int32))
            else:
                width = prec - (1 if i == 0 else 0)
                start = base_bit + prec * i - (1 if i > 0 else 0)
                vals.append(_gb_t(words_t, start, width).astype(jnp.int32))
        n_anchors = 1 + (m.partitions if with_anchors else 0)
        return jnp.stack(vals), 16 * prec - n_anchors

    idx1, total1 = read_indices(bit, m.index_prec, True)
    bit += total1
    idx2 = None
    if m.index_prec2:
        idx2, _ = read_indices(bit, m.index_prec2, False)

    q0s = [jnp.stack([ep[2 * sub][ch] for ch in range(4)])
           for sub in range(n_sub)]
    q1s = [jnp.stack([ep[2 * sub + 1][ch] for ch in range(4)])
           for sub in range(n_sub)]
    return shape, rot, im, q0s, q1s, p0s, p1s, idx1, idx2


def _refine_mode_subsets(px_i, words_t, mode_id: int, ladder, aw: float):
    """Winner-refine one partition-family mode (0-3, 6, 7): unpack the
    block state, run the perturbation ladder per subset with indices
    fixed, one re-assignment, anchor-swap and re-emit.
    Returns (err_new, err_old [NB], words [NB, 4])."""
    m = _BC7_MODES[mode_id]
    nb = px_i.shape[2]
    n_sub = m.partitions + 1
    shared_p = m.p_bits == n_sub and m.p_bits > 0
    prec = m.index_prec
    shape, _, _, q0s, q1s, p0s, p1s, idx_full, _ = _bc7_unpack_mode(
        words_t, mode_id)

    if m.partitions:
        pp_tab, pa_tab = _packed_shape_tables_bc7(m.partitions,
                                                  1 << m.partition_bits)
        pp = jnp.zeros((nb,), jnp.uint32)
        pa = jnp.zeros((nb,), jnp.int32)
        for sv in range(1 << m.partition_bits):
            hit = shape == sv
            pp = jnp.where(hit, jnp.uint32(pp_tab[sv]), pp)
            pa = jnp.where(hit, pa_tab[sv], pa)
        pm = jnp.stack([((pp >> (2 * i)) & 3).astype(jnp.int32)
                        for i in range(16)])
        mask_list = [pm == p for p in range(n_sub)]
        anchors = [0, pa & 0xF] + ([(pa >> 4) & 0xF]
                                   if m.partitions == 2 else [])
    else:
        mask_list = [jnp.ones((16, nb), bool)]
        anchors = [0]

    wk = _pal_weight(idx_full, 1 << prec)
    err_new = jnp.zeros((nb,), jnp.float32)
    err_old = jnp.zeros((nb,), jnp.float32)
    for sub, mask in enumerate(mask_list):
        if ladder == LADDER_MOMENT:
            q0t, q1t, err_l, err0 = _moment_channels_t(
                px_i, mask, m, shared_p, q0s[sub], q1s[sub], p0s[sub],
                p1s[sub], [wk] * 4, aw=aw)
        else:
            q0t, q1t, err_l, err0 = _perturb_channels_t(
                px_i, mask, m, shared_p, q0s[sub], q1s[sub], p0s[sub],
                p1s[sub], [wk] * 4, aw=aw, rounds=ladder[0],
                deltas=ladder[1])
        u0, u1 = _unquantize_with_p_t(q0t, q1t, p0s[sub], p1s[sub], m,
                                      shared_p)
        idx_t, err_t = _assign_indices_t(px_i, u0, u1, prec, mask, aw=aw)
        keep_idx = err_t < err_l
        idx_t2 = jnp.where(keep_idx[None, :], idx_t, idx_full)
        err_t2 = jnp.minimum(err_t, err_l)
        bt = err_t2 < err0
        q0s[sub] = jnp.where(bt[None, :], q0t, q0s[sub])
        q1s[sub] = jnp.where(bt[None, :], q1t, q1s[sub])
        idx_full = jnp.where(bt[None, :] & mask, idx_t2, idx_full)
        err_new = err_new + jnp.minimum(err_t2, err0)
        err_old = err_old + err0

    # anchor swaps (AssignIndices, BC6HBC7.cpp:3181-3194)
    msb = 1 << (prec - 1)
    maxi = (1 << prec) - 1
    for sub, (mask, anchor) in enumerate(zip(mask_list, anchors)):
        if isinstance(anchor, int):
            a_idx = idx_full[anchor]
        else:
            a_idx = jnp.zeros(nb, jnp.int32)
            for i in range(16):
                a_idx = jnp.where(anchor == i, idx_full[i], a_idx)
        swap = (a_idx & msb) != 0
        q0s[sub], q1s[sub] = (
            jnp.where(swap[None, :], q1s[sub], q0s[sub]),
            jnp.where(swap[None, :], q0s[sub], q1s[sub]))
        p0s[sub], p1s[sub] = (jnp.where(swap, p1s[sub], p0s[sub]),
                              jnp.where(swap, p0s[sub], p1s[sub]))
        idx_full = jnp.where(swap[None, :] & mask, maxi - idx_full,
                             idx_full)
    words = _emit_bc7(mode_id, shape, 0, 0, q0s, q1s, p0s, p1s,
                      idx_full, None, nb)
    return err_new, err_old, words


def _refine_mode45(px_i, words_t, mode_id: int, ladder, aw: float):
    """Winner-refine modes 4/5: per-lane rotation and index-mode, ladder
    with separate color/alpha weight planes, dual re-assignment (both
    index modes where the mode has two), independent anchor fixes.
    Returns (err_new, err_old [NB], words [NB, 4])."""
    m = _BC7_MODES[mode_id]
    nb = px_i.shape[2]
    mask = jnp.ones((16, nb), bool)
    prec1, prec2 = m.index_prec, m.index_prec2
    _, rot, im, q0s_, q1s_, p0s_, p1s_, w1, w2 = _bc7_unpack_mode(
        words_t, mode_id)
    q0, q1 = q0s_[0], q1s_[0]
    p0, p1 = p0s_[0], p1s_[0]

    # rotated pixel planes (channel rot-1 <-> alpha), per-lane
    pr = []
    for c in range(3):
        pr.append(jnp.where((rot == c + 1)[None, :], px_i[:, 3, :],
                            px_i[:, c, :]))
    pal = px_i[:, 3, :]
    for c in range(3):
        pal = jnp.where((rot == c + 1)[None, :], px_i[:, c, :], pal)
    pr_i = jnp.stack(pr + [pal], axis=1)

    # per-lane alpha-weight rows: the true alpha sits at rot-1 in
    # rotated space (3 when unrotated)
    w_rows = None
    if aw != 1.0:
        w_rows = []
        for c in range(4):
            is_a = (rot == 0) if c == 3 else (rot == c + 1)
            w_rows.append(jnp.where(is_a, jnp.float32(aw), 1.0))

    im0 = im == 0
    im0_16 = im0[None, :]
    cidx = jnp.where(im0_16, w1, w2)
    aidx = jnp.where(im0_16, w2, w1)
    wkc = jnp.where(im0_16, _pal_weight(cidx, 1 << prec1),
                    _pal_weight(cidx, 1 << prec2))
    wka = jnp.where(im0_16, _pal_weight(aidx, 1 << prec2),
                    _pal_weight(aidx, 1 << prec1))

    if ladder == LADDER_MOMENT:
        q0t, q1t, err_l, err0 = _moment_channels_t(
            pr_i, mask, m, False, q0, q1, p0, p1, [wkc, wkc, wkc, wka],
            aw=aw, w_rows=w_rows)
    else:
        q0t, q1t, err_l, err0 = _perturb_channels_t(
            pr_i, mask, m, False, q0, q1, p0, p1, [wkc, wkc, wkc, wka],
            aw=aw, rounds=ladder[0], deltas=ladder[1], w_rows=w_rows)
    u0, u1 = _unquantize_with_p_t(q0t, q1t, p0, p1, m, False)
    cidx_a, cerr_a = _assign_indices_t(pr_i, u0, u1, prec1, mask,
                                       channels=3, aw=aw, w_rows=w_rows)
    aidx_a, aerr_a = _assign_indices_t(pr_i, u0, u1, prec2, mask,
                                       channels=4, ch_start=3, aw=aw,
                                       w_rows=w_rows)
    if m.index_mode_bits:
        cidx_b, cerr_b = _assign_indices_t(pr_i, u0, u1, prec2, mask,
                                           channels=3, aw=aw,
                                           w_rows=w_rows)
        aidx_b, aerr_b = _assign_indices_t(pr_i, u0, u1, prec1, mask,
                                           channels=4, ch_start=3, aw=aw,
                                           w_rows=w_rows)
        cidx_t = jnp.where(im0_16, cidx_a, cidx_b)
        aidx_t = jnp.where(im0_16, aidx_a, aidx_b)
        err_t = jnp.where(im0, cerr_a + aerr_a, cerr_b + aerr_b)
    else:
        cidx_t, aidx_t = cidx_a, aidx_a
        err_t = cerr_a + aerr_a

    keep_idx = err_t < err_l
    cidx_t2 = jnp.where(keep_idx[None, :], cidx_t, cidx)
    aidx_t2 = jnp.where(keep_idx[None, :], aidx_t, aidx)
    err_t2 = jnp.minimum(err_t, err_l)
    bt = err_t2 < err0
    q0f = jnp.where(bt[None, :], q0t, q0)
    q1f = jnp.where(bt[None, :], q1t, q1)
    cidx = jnp.where(bt[None, :], cidx_t2, cidx)
    aidx = jnp.where(bt[None, :], aidx_t2, aidx)
    err_new = jnp.minimum(err_t2, err0)

    # independent anchor fixes (AssignIndices, BC6HBC7.cpp:3196-3216)
    w1n = jnp.where(im0_16, cidx, aidx)
    w2n = jnp.where(im0_16, aidx, cidx)
    msb1, maxi1 = 1 << (prec1 - 1), (1 << prec1) - 1
    msb2, maxi2 = 1 << (prec2 - 1), (1 << prec2) - 1
    swap1 = (w1n[0] & msb1) != 0
    w1n = jnp.where(swap1[None, :], maxi1 - w1n, w1n)
    swap2 = (w2n[0] & msb2) != 0
    w2n = jnp.where(swap2[None, :], maxi2 - w2n, w2n)
    swap_rgb = jnp.where(im0, swap1, swap2)
    swap_a = jnp.where(im0, swap2, swap1)
    do_swap = jnp.stack([swap_rgb, swap_rgb, swap_rgb, swap_a])
    q0e = jnp.where(do_swap, q1f, q0f)
    q1e = jnp.where(do_swap, q0f, q1f)
    words = _emit_bc7(mode_id, 0, rot, im, [q0e], [q1e], [p0], [p1],
                      w1n, w2n, nb)
    return err_new, err0, words


def refine_bc7_words(px_i, words, ladder, aw: float = 1.0,
                     modes: tuple = (1, 3, 5, 6, 7, 4)):
    """Winner-refine pass: unpack each encoded block's winning state from
    its packed words and run the endpoint-perturbation ladder on that
    state only (OptimizeEndPoints analog, BC6HBC7.cpp:2926-3044), then
    re-assign indices once and re-emit where the error improved.

    Refining only the cross-mode winner keeps the search kernel lean:
    the in-search per-candidate ladder measured 304 -> 117 Mtexels/s on
    the v5e (37 ladder units/block), while the winner carries nearly all
    of the quality (r3 measurements next to LADDER_LIGHT).

    px_i [16, 4, NB] i32 LDR pixels; words [NB, 4] u32 packed blocks.
    Returns refined words [NB, 4]."""
    words_t = jnp.transpose(words)
    b0 = (words_t[0] & 0xFF).astype(jnp.int32)
    mode = jnp.full_like(b0, 8)
    for mv in range(8):
        hit = (b0 & (1 << mv)) != 0
        mode = jnp.where((mode == 8) & hit, mv, mode)

    out = words
    for mv in modes:
        if mv in (4, 5):
            err_new, err0, wn = _refine_mode45(px_i, words_t, mv,
                                               ladder, aw)
        else:
            err_new, err0, wn = _refine_mode_subsets(px_i, words_t, mv,
                                                     ladder, aw)
        better = (mode == mv) & (err_new < err0)
        out = jnp.where(better[:, None], wn, out)
    return out


def encode_bc7(blocks: jnp.ndarray, flags: int = 0,
               opaque: bool = False,
               alpha_weight: float = 1.0) -> jnp.ndarray:
    """[NB, 16, 4] f32 -> [NB, 16] u8 (D3DXEncodeBC7, BC6HBC7.cpp:2783).

    `opaque=True` (a static hint the caller derives on host, e.g. from
    IsAlphaAllOpaque) skips mode 7 for the whole batch — the reference
    skips mode 7 per-block for opaque blocks (:2818); with uniform alpha
    the skip specializes the compiled graph instead."""
    px_f32 = jnp.asarray(blocks, jnp.float32)
    nb = px_f32.shape[0]
    # LDR quantization with the reference's +0.01 rounding bias (:2794),
    # transposed to lane-major [16, 4, NB]
    px_i = jnp.clip(jnp.transpose(px_f32, (1, 2, 0)) * 255.0 + 0.01,
                    0.0, 255.0).astype(jnp.int32)
    px_f = px_i.astype(jnp.float32)
    has_alpha = jnp.any(px_i[:, 3, :] != 255, axis=0)

    best_err = jnp.full((nb,), jnp.inf, jnp.float32)
    best_words = jnp.zeros((nb, 4), jnp.uint32)

    quick = bool(flags & _BC7_QUICK)
    use3 = bool(flags & _BC7_USE_3SUBSETS)
    maxq = bool(flags & _BC7_MAXQUALITY)
    # Winner-refine architecture (r3): the search runs WITHOUT any
    # in-search ladder; the cross-mode winner then gets the perturbation
    # ladder via refine_bc7_words (vs the in-search per-candidate ladder:
    # better quality AND ~2.5x faster — the re-assignment runs on the
    # final state). Tier choice measured on the golden corpus vs the
    # compiled reference (benchmarks/quality_refine_scope.py, power=3)
    # and on the v5e (benchmarks/profile_refine.py):
    #   winner light x1  albedo +0.118  flower +0.130   4.43 ms/2K
    #   winner full  x1  albedo +0.126  flower +0.137   9.64 ms/2K
    #   winner full  x2  (maxq) +0.145 / +0.164 at power=6
    # The default tier takes light x1 — it already beats the reference
    # full search on every corpus content; full's extra 0.007-0.056 dB
    # doubles the refine dispatch, so it rides the maxq tier instead.
    # r4 ladders: default = one MOMENT dispatch (analytic joint-step
    # ladder — beats exact LIGHT on 5/6 corpus contents, albedo +0.066
    # -> +0.081, at equal dispatch cost and 281.6 vs 273.8 Mt/s e2e at
    # 2K); maxq = MOMENT then FULL exact ladder (beats the old FULL x2
    # on EVERY content — the joint (±1,±1) move reaches corners the
    # sequential exact climb cannot, then FULL polishes). Measured:
    # benchmarks/quality_moment.py + profile_moment.py.
    ladders = [LADDER_MOMENT, LADDER_FULL] if maxq else [LADDER_MOMENT]
    # Default-tier refine scope skips mode 6 (r4): its 7777+pbit
    # endpoints sit at the search's LS optimum already — laddering it
    # measured +0.000..0.003 dB on every corpus content for ~0.50 ms of
    # the 4.53 ms refine dispatch at 2K
    # (benchmarks/quality_refine_modes.py + profile_refine_modes.py).
    # maxq keeps the full scope. Modes 4/5 and 1/3 each carry real
    # quality (-0.05..-0.48 dB if dropped) and stay.
    # maxq keeps the reference's full mode-4 index-mode scope; the
    # default tier takes the measured im0 cut (see _MODE4_IMS)
    m4_ims = (0, 1) if maxq else _MODE4_IMS

    if quick:
        modes = [6]
    else:
        modes = ([0, 2] if use3 else []) + [1, 3, 5, 6] \
            + ([] if opaque else [7]) + [4]

    use_pallas = False
    try:
        from .pallas_kernels import (_use_pallas, bc7_encode_pallas,
                                     bc7_refine_pallas)
        use_pallas = _use_pallas()
    except Exception:
        pass

    refine_modes = tuple(modes) if maxq \
        else tuple(m for m in modes if m != 6)

    if use_pallas:
        # the whole search (shape ranking, every mode, cross-mode fold,
        # mode-7 opaque masking) as ONE pallas dispatch, then the
        # winner-ladder as a second dispatch. Fusing the LIGHT ladder
        # into the search kernel's tail measured SLOWER (265.1 -> 247.9
        # Mt/s at 2K, benchmarks/profile_fused.py): the refine
        # "overhead" is unpack/score/emit COMPUTE that fusion still
        # pays, the saved HBM pixel re-read is ~0.1 ms, and the bigger
        # kernel loses more to VMEM pressure at every tile size.
        # the shared 2-subset fit serves the DEFAULT tier only: maxq
        # keeps the independent per-mode A/B evaluation (shared measured
        # maxq min slack +0.149 vs +0.166 — both beat the reference, but
        # the quality tier keeps the stronger search; the default tier
        # takes the +7% e2e, benchmarks/profile_shared13.py)
        _, best_words = bc7_encode_pallas(px_i, tuple(modes),
                                          BC7_SHAPE_CANDIDATES,
                                          aw=alpha_weight,
                                          rots=_MODE45_ROTS,
                                          m4_ims=m4_ims,
                                          share2sub=(BC7_SHARED2SUB
                                                     and not maxq),
                                          share45=(BC7_SHARED45
                                                   and not maxq))
        for ladder in ladders:
            if refine_modes:
                best_words = bc7_refine_pallas(px_i, best_words, ladder,
                                               aw=alpha_weight,
                                               modes=refine_modes)
        return lax.bitcast_convert_type(best_words,
                                        jnp.uint8).reshape(nb, 16)

    est_cache = {}
    # shared-fit 2-subset family (r5): one float trajectory serves both
    # modes 1 and 3 per shape candidate (BC7_SHARED2SUB). Default tier
    # only — maxq keeps the independent per-mode A/B evaluation (see the
    # pallas branch note above).
    shared13 = {}
    if BC7_SHARED2SUB and not maxq and 1 in modes and 3 in modes:
        est_cache[1] = _shape_estimates_table(px_f, 1, 4, off_axis=True)
        shared13 = _try_2sub_modes_shared(px_i, px_f, (1, 3),
                                          est_cache[1], aw=alpha_weight)
    # shared-fit rotation family (r5): one float trajectory per rotation
    # serves both modes 4 and 5 at index-mode 0 (BC7_SHARED45)
    if (BC7_SHARED45 and not maxq and tuple(m4_ims) == (0,)
            and 4 in modes and 5 in modes):
        shared13.update(_try_modes45_shared(px_i, px_f, aw=alpha_weight))
    for mode_id in modes:
        if mode_id in shared13:
            err, words = shared13[mode_id]
        elif mode_id in (0, 1, 2, 3, 7):
            m = _BC7_MODES[mode_id]
            if m.partitions not in est_cache:
                # rank shapes by the off-axis residual in EVERY tier
                # (r3): +0.28 dB on albedo vs the old variance proxy,
                # matching the full-search quality of
                # BC6HBC7.cpp:2783-2889 at 4 candidates
                est_cache[m.partitions] = _shape_estimates_table(
                    px_f, m.partitions, 4, off_axis=True)
            err, words = _try_partition_mode(
                px_i, px_f, mode_id, ests=est_cache[m.partitions],
                aw=alpha_weight)
            if mode_id == 7:
                # no value for opaque blocks (reference skip, :2818)
                err = jnp.where(has_alpha, err, jnp.inf)
        else:
            err, words = _try_single_mode(px_i, px_f, mode_id,
                                          aw=alpha_weight, m4_ims=m4_ims)
        better = err < best_err
        best_err = jnp.minimum(err, best_err)
        best_words = jnp.where(better[:, None], words, best_words)

    for ladder in ladders:
        if refine_modes:
            best_words = refine_bc7_words(px_i, best_words, ladder,
                                          aw=alpha_weight,
                                          modes=refine_modes)
    return lax.bitcast_convert_type(best_words, jnp.uint8).reshape(nb, 16)


# ---------------------------------------------------------------------------
# BC6H
# ---------------------------------------------------------------------------

from .bc67_tables import BC6H_DESC, BC6H_MODE_INFO, BC6H_MODE_TO_INFO

_F16MAX = 0x7BFF

# Quantize -> palette-score -> LS-refit rounds per BC6H candidate.
# Shared by the pallas kernel (_k_bc6h_subsets). Measured on the golden
# HDR probe vs the compiled reference (r3): 0 rounds -1.751 dB,
# 1 -> -0.050, 2 -> +0.041, 3 -> +0.013 — two rounds is the knee and the
# minimum that keeps the "beats the reference" gate.
BC6H_REFIT_ROUNDS = 2

# Share one precision-free fit trajectory across all rows of a region
# family, instead of re-running the full quantize/score/refit per
# precision group (r3): the six 2-region groups cost ~3.8-4.7 ms each
# on v5e at 2K (benchmarks/profile_bc6h.py) and differ only in endpoint
# precision. Quality measured on the golden HDR corpus
# (benchmarks/quality_bc6h_shared.py): the PURE float trajectory
# (rescore-only per group) turns the frozen-HDR gate from +0.041 to
# -0.048 dB — quantization snap steers the refit at coarse precW, so
# each group gets one quantized-domain refit round after the rescore
# (see _bc6h_group_rescore refit_rounds).
BC6H_SHARED_FIT = True

# LS rounds of the precision-free shared trajectory. Unlike
# BC6H_REFIT_ROUNDS these are amortized once per (candidate, family)
# across ALL precision groups, so extra rounds are cheap. Frozen-HDR
# gate delta (benchmarks/quality_bc6h_shared.py convention): 2 ->
# +0.003, 3 -> +0.017, 4 -> +0.019 — three is the knee.
BC6H_SHARED_ROUNDS = 3

# Float keep-better guard of the shared trajectory (refit result vs
# min/max init at the float score). Measured OFF (r5): encoded words
# are BITWISE IDENTICAL with the guard removed on every HDR probe
# content incl. sun_sky and signed zero-crossing — the assign->refit
# alternation never loses at the float level; the per-group
# quantized-domain rescore/refit (above) is what handles quantization
# snap. Dropping it skips the SSE planes of every trajectory
# assignment plus the final assignment entirely (the BC7 lever's
# pattern, BC7_SHARED_KEEPBETTER). A/B: benchmarks/quality_bc6h_nokb.py.
BC6H_SHARED_KEEPBETTER = False

# Per-group quantized refit only where quantization snap can actually
# move the LS solution: groups with endpoint precision below this many
# bits refit; at >=11 bits the quantized endpoints track the float
# trajectory closely enough that the refit round never wins. Frozen-HDR
# gate delta by threshold: 10 -> -0.013 (W10 groups DO need it),
# 11 -> +0.018, 12/17 -> +0.017.
BC6H_GROUP_REFIT_MINPREC = 11

# LS-refit endpoint magnitude cap, in F16-int units (r4). The search
# metric is SSE over F16-ints (INTColor Norm, BC6HBC7.cpp:1167) — linear
# in int units — but float VALUE is exponential in them (1024 int = one
# exponent octave). An LS solution that extrapolates endpoint magnitude
# far past the subset's data (legal under the int metric: the clip was
# only ±F16MAX) decodes to float values orders of magnitude outside the
# source: sign-crossing content measured -13.4 dB vs the compiled
# reference before the cap (hdr_signed probe; the reference never hits
# this because its fit is min/max + PerturbOne steps, which stay near
# the data). One octave of headroom above max|data| keeps every
# legitimate extrapolation (unsigned corpus gates unchanged).
BC6H_LS_MAG_CAP = 1024.0


def _bc6h_unquantize(comp: jnp.ndarray, bits: int, signed: bool) -> jnp.ndarray:
    """D3DX_BC6H::Unquantize (BC6HBC7.cpp:1892)."""
    if signed:
        if bits >= 16:
            return comp
        s = comp < 0
        c = jnp.abs(comp)
        unq = jnp.where(c == 0, 0,
                        jnp.where(c >= (1 << (bits - 1)) - 1, 0x7FFF,
                                  ((c << 15) + 0x4000) >> (bits - 1)))
        return jnp.where(s, -unq, unq)
    if bits >= 15:
        return comp
    return jnp.where(comp == 0, 0,
                     jnp.where(comp == (1 << bits) - 1, 0xFFFF,
                               ((comp << 16) + 0x8000) >> bits))


def _bc6h_finish_unquantize(comp: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """FinishUnquantize (BC6HBC7.cpp:1930): scale by 31/32 (S) or 31/64 (U)."""
    if signed:
        return jnp.where(comp < 0, -(((-comp) * 31) >> 5), (comp * 31) >> 5)
    return (comp * 31) >> 6


def _bc6h_int_to_half_bits(comp: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """INT2F16 (BC6HBC7.cpp:559): sign-magnitude int -> half bit pattern,
    kept as int32 (the f16 bitcast happens outside the pallas kernel)."""
    if signed:
        s = comp < 0
        mag = jnp.abs(comp) & 0x7FFF
        return jnp.where(s, mag | 0x8000, mag)
    return comp & 0xFFFF


def _bc6h_int_to_half(comp: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """INT2F16: sign-magnitude int -> half bits -> f32."""
    bits = _bc6h_int_to_half_bits(comp, signed).astype(jnp.uint16)
    return lax.bitcast_convert_type(bits, jnp.float16).astype(jnp.float32)


def _sext(v: jnp.ndarray, bits: int) -> jnp.ndarray:
    sh = 32 - bits
    return (v.astype(jnp.int32) << sh) >> sh


def _bc6h_unpack_endpoints(words, row: int, signed: bool):
    """Header-field extraction for mode row `row`: shape + ABSOLUTE
    quantized endpoints (sign-extended, inverse delta transform applied —
    Decode BC6HBC7.cpp:1719-1736 + TransformInverse :1153, stopping
    before Unquantize). Shared by the decoder and the winner-refine
    unpack. words [4, NB] -> (shape [NB] i32,
    e dict {(region, end, ch): [NB] i32})."""
    _, partitions, transformed, iprec, precW, precX, precY, precZ = \
        BC6H_MODE_INFO[row]
    nb = words.shape[1]
    header_bits = 82 if partitions else 65

    # gather header fields via the descriptor: field ids 2..14; contiguous
    # descriptor runs fold into multi-bit extracts
    fields = {fid: jnp.zeros(nb, jnp.int32) for fid in range(2, 15)}
    desc = BC6H_DESC[row]
    pos = 0
    while pos < header_bits:
        fid, fbit = int(desc[pos, 0]), int(desc[pos, 1])
        run = 1
        while (pos + run < header_bits
               and int(desc[pos + run, 0]) == fid
               and int(desc[pos + run, 1]) == fbit + run):
            run += 1
        if fid >= 2:
            v = _gb_t(words, pos, run).astype(jnp.int32)
            fields[fid] = fields[fid] | (v << fbit)
        pos += run

    shape = fields[2]
    e = {}
    for ch, base in ((0, 3), (1, 7), (2, 11)):
        e[(0, 0, ch)] = fields[base + 0]
        e[(0, 1, ch)] = fields[base + 1]
        e[(1, 0, ch)] = fields[base + 2]
        e[(1, 1, ch)] = fields[base + 3]

    # sign extension (Decode :1719-1736)
    if signed:
        for ch in range(3):
            e[(0, 0, ch)] = _sext(e[(0, 0, ch)], precW[ch])
    if signed or transformed:
        for ch in range(3):
            e[(0, 1, ch)] = _sext(e[(0, 1, ch)], precX[ch])
            if partitions:
                e[(1, 0, ch)] = _sext(e[(1, 0, ch)], precY[ch])
                e[(1, 1, ch)] = _sext(e[(1, 1, ch)], precZ[ch])

    # inverse delta transform (TransformInverse :1153)
    if transformed:
        for ch in range(3):
            mask = (1 << precW[ch]) - 1
            for key in ((0, 1, ch), (1, 0, ch), (1, 1, ch)):
                v = (e[key] + e[(0, 0, ch)]) & mask
                if signed:
                    v = _sext(v, precW[ch])
                e[key] = v
    return shape, e


def _decode_bc6h_mode_rows(words, row: int, signed: bool):
    """Decode ALL blocks assuming mode row `row`, lane-major.
    words [4, NB] u32 -> [16][3] lists of [NB] int32 half-bit rows.
    Row-structured for the pallas decode mega-kernel
    (pallas_kernels.bc6h_decode_pallas); _decode_bc6h_mode_t converts
    to f32 and stacks for the jnp path."""
    _, partitions, transformed, iprec, precW, precX, precY, precZ = \
        BC6H_MODE_INFO[row]
    nb = words.shape[1]
    header_bits = 82 if partitions else 65
    shape, e = _bc6h_unpack_endpoints(words, row, signed)

    u = {}
    for (reg, ab, ch), v in e.items():
        u[(reg, ab, ch)] = _bc6h_unquantize(v, precW[ch], signed)

    # anchors for the 2-region rows: packed selects over 32 shapes
    if partitions:
        pa_tab = tuple(int(FIXUPS[1, sv, 1]) for sv in range(32))
        pp_tab = tuple(int(sum(int(PARTITIONS[1][sv, i]) << (2 * i)
                               for i in range(16))) for sv in range(32))
        a2 = jnp.zeros((nb,), jnp.int32)
        pp = jnp.zeros((nb,), jnp.uint32)
        for sv in range(32):
            hit = shape == sv
            a2 = jnp.where(hit, pa_tab[sv], a2)
            pp = jnp.where(hit, jnp.uint32(pp_tab[sv]), pp)
    else:
        a2 = None
        pp = jnp.zeros((nb,), jnp.uint32)

    K = 1 << iprec
    out_px = []
    for i in range(16):
        if partitions:
            before = (1 if i > 0 else 0) + (a2 < i).astype(jnp.int32)
            is_anchor = jnp.where((i == 0) | (a2 == i), 1, 0)
            start = header_bits + iprec * i - before
            idx = _gb_dyn_t(words, start, is_anchor,
                            iprec).astype(jnp.int32)
            reg = ((pp >> (2 * i)) & 1).astype(jnp.int32)
        else:
            width = iprec - (1 if i == 0 else 0)
            start = header_bits + iprec * i - (1 if i > 0 else 0)
            idx = _gb_t(words, start, width).astype(jnp.int32)
            reg = None

        w = _pal_weight(idx, K)
        px = []
        for ch in range(3):
            if partitions:
                e0 = jnp.where(reg == 0, u[(0, 0, ch)], u[(1, 0, ch)])
                e1 = jnp.where(reg == 0, u[(0, 1, ch)], u[(1, 1, ch)])
            else:
                e0, e1 = u[(0, 0, ch)], u[(0, 1, ch)]
            comp = (e0 * (64 - w) + e1 * w + 32) >> 6
            comp = _bc6h_finish_unquantize(comp, signed)
            px.append(_bc6h_int_to_half_bits(comp, signed))
        out_px.append(px)
    return out_px                                  # [16][3] of [NB] bits


def _decode_bc6h_mode_t(words, row: int, signed: bool):
    """_decode_bc6h_mode_rows as stacked [16, 3, NB] f32 half values."""
    rows = _decode_bc6h_mode_rows(words, row, signed)
    return jnp.stack([jnp.stack([
        lax.bitcast_convert_type(c.astype(jnp.uint16),
                                 jnp.float16).astype(jnp.float32)
        for c in px]) for px in rows])


def decode_bc6h(blocks: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """[NB, 16] u8 -> [NB, 16, 4] f32 (D3DXDecodeBC6HU/S, bit-exact).

    Lane-major ([NB] minor) like the encoders; see decode_bc7. On TPU the
    whole decode runs as one pallas dispatch (bc6h_decode_pallas)."""
    w = _bytes_to_words(blocks)
    words = jnp.transpose(w)                       # [4, NB]

    try:
        from .pallas_kernels import _use_pallas, bc6h_decode_pallas
        use_pallas = _use_pallas()
    except Exception:
        use_pallas = False
    if use_pallas:
        bits = bc6h_decode_pallas(words, signed)   # [48, NB] i32 half bits
        outf = lax.bitcast_convert_type(
            bits.astype(jnp.uint16), jnp.float16).astype(jnp.float32)
        rgb = jnp.transpose(outf.reshape(16, 3, -1), (2, 0, 1))
        a = jnp.ones(rgb.shape[:2] + (1,), jnp.float32)
        return jnp.concatenate([rgb, a], axis=-1)

    b0 = words[0].astype(jnp.int32)
    m2 = b0 & 0x3
    m5 = b0 & 0x1F
    header_mode = jnp.where(m2 < 2, m2, m5)
    # 32-entry host-table select chain (not a gather)
    rowv = jnp.full_like(header_mode, -1)
    for hm in range(32):
        rowv = jnp.where(header_mode == hm,
                         int(BC6H_MODE_TO_INFO[hm]), rowv)

    out = jnp.zeros((16, 3, words.shape[1]), jnp.float32)
    for r in range(14):
        res = _decode_bc6h_mode_t(words, r, signed)
        out = jnp.where(rowv[None, None, :] == r, res, out)
    out = jnp.where(rowv[None, None, :] < 0, 0.0, out)  # reserved: black
    rgb = jnp.transpose(out, (2, 0, 1))            # [NB, 16, 3]
    a = jnp.ones(rgb.shape[:2] + (1,), jnp.float32)
    return jnp.concatenate([rgb, a], axis=-1)


# ---------------------------------------------------------------------------
# BC6H encode
# ---------------------------------------------------------------------------
#
# Search policy: the reference tries all 14 modes, ranking 32 shapes by
# RoughMSE and refining the top quarter with per-channel hill climbs
# (BC6HBC7.cpp:1817-1859). Here every (mode, shape) candidate is evaluated
# for every block (fori_loop over shapes, static loop over modes) with
# closed-form least-squares refinement in the F16-int space, the delta
# "endpoints fit" constraint enforced as an error mask (EndPointsFit :1948),
# and a running argmin.

def _f16_to_int(rgb: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """float32 -> sign-magnitude F16-int space (INTColor::F16ToINT :534)."""
    h = lax.bitcast_convert_type(rgb.astype(jnp.float16), jnp.uint16)
    h = h.astype(jnp.int32)
    mag = h & 0x7FFF
    mag = jnp.minimum(mag, _F16MAX)
    if signed:
        return jnp.where((h & 0x8000) != 0, -mag, mag)
    return jnp.where((h & 0x8000) != 0, 0, mag)


def _bc6h_quantize(v: jnp.ndarray, prec: int, signed: bool) -> jnp.ndarray:
    """D3DX_BC6H::Quantize (BC6HBC7.cpp:1864)."""
    if signed:
        s = v < 0
        a = jnp.abs(v)
        q = a if prec >= 16 else (a << (prec - 1)) // (_F16MAX + 1)
        return jnp.where(s, -q, q)
    return v if prec >= 15 else (v << prec) // (_F16MAX + 1)


def _nbits_fit(v: jnp.ndarray, prec: int, is_signed_field: bool) -> jnp.ndarray:
    """True where v fits in a prec-bit (two's complement if signed) field."""
    if is_signed_field:
        lo = -(1 << (prec - 1))
        hi = (1 << (prec - 1)) - 1
    else:
        lo, hi = 0, (1 << prec) - 1
    return (v >= lo) & (v <= hi)


def _bc6h_palette_err_t(px_int, mask, q0, q1, precW, iprec, signed):
    """Quantized endpoints -> palette -> indices + masked error, lane-major.

    px_int [16, 3, NB]; q0/q1 [3, NB]; mask [16, NB]. The metric compares
    source F16-ints against the FINISHED palette (GeneratePaletteQuantized
    applies FinishUnquantize, BC6HBC7.cpp:2028)."""
    u = [(_bc6h_unquantize(q0[c], precW[c], signed),
          _bc6h_unquantize(q1[c], precW[c], signed)) for c in range(3)]
    K = 1 << iprec
    # projection onto the finished-endpoint axis (FinishUnquantize is a
    # uniform per-channel scaling, so nearest-weight along the axis is
    # preserved); float dot because F16-int products overflow int32
    f0 = [_bc6h_finish_unquantize(u[c][0], signed).astype(jnp.float32)
          for c in range(3)]
    f1 = [_bc6h_finish_unquantize(u[c][1], signed).astype(jnp.float32)
          for c in range(3)]
    dot = jnp.zeros((px_int.shape[0], px_int.shape[2]), jnp.float32)
    span = jnp.zeros((px_int.shape[2],), jnp.float32)
    for c in range(3):
        e = f1[c] - f0[c]
        dot = dot + (px_int[:, c, :].astype(jnp.float32) - f0[c][None, :]) \
            * e[None, :]
        span = span + e * e
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
    # exact error at the chosen index with the true integer palette
    best = jnp.zeros_like(dot)
    for c in range(3):
        pal = (u[c][0][None, :] * (64 - wk) + u[c][1][None, :] * wk
               + 32) >> 6
        pal = _bc6h_finish_unquantize(pal, signed)
        dd = (px_int[:, c, :] - pal).astype(jnp.float32)
        best = best + dd * dd
    err = jnp.sum(jnp.where(mask, best, 0.0), axis=0)
    return idx, err


def _bc6h_palette_err_f(px_f, mask, e0, e1, iprec, score: bool = True):
    """Float-endpoint (px-space) palette assignment + SSE: the
    precision-free scorer for the shared fit trajectory
    (BC6H_SHARED_FIT). Same projection/snap geometry as
    _bc6h_palette_err_t but with unquantized endpoints and a linear
    (floor-less) palette — only used to steer the fit; every
    per-precision-group error is rescored exactly afterwards.
    score=False skips the SSE planes (keep-better off,
    BC6H_SHARED_KEEPBETTER) and returns (idx, None).

    px_f [16, 3, NB] f32 (F16-int values); e0/e1 [3, NB] f32."""
    K = 1 << iprec
    dot = jnp.zeros((px_f.shape[0], px_f.shape[2]), jnp.float32)
    span = jnp.zeros((px_f.shape[2],), jnp.float32)
    for c in range(3):
        e = e1[c] - e0[c]
        dot = dot + (px_f[:, c, :] - e0[c][None, :]) * e[None, :]
        span = span + e * e
    p64 = jnp.clip(dot * (64.0 / jnp.where(span > 0, span, 1.0))[None, :],
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
    wk = _pal_weight_f(idx, K) * jnp.float32(1 / 64)
    best = jnp.zeros_like(dot)
    for c in range(3):
        pal = e0[c][None, :] + wk * (e1[c] - e0[c])[None, :]
        d = px_f[:, c, :] - pal
        best = best + d * d
    err = jnp.sum(jnp.where(mask, best, 0.0), axis=0)
    return idx, err


def _bc6h_shared_fit(px_f, mask_list, iprec, signed):
    """One precision-free fit trajectory per (shape candidate, subset):
    min/max endpoints -> float-palette assignment -> BC6H_REFIT_ROUNDS
    least-squares rounds -> keep-better, all on unquantized px-space
    endpoints. Every row of a region family then quantizes THESE
    endpoints at its own precision and rescores exactly
    (_bc6h_group_rescore) — the expensive per-candidate refit work is
    shared by all 6 two-region precision groups instead of re-run per
    group (the rows differ only in endpoint precision, ms_aInfo
    BC6HBC7.cpp:1013-1067). Returns per-subset (e0, e1) [3, NB] f32."""
    lim = float(_F16MAX)
    lo = -lim if signed else 0.0
    out = []
    for mask in mask_list:
        big = jnp.float32(1e9)
        m3 = mask[:, None, :]
        mi = jnp.min(jnp.where(m3, px_f, big), axis=0)
        ma = jnp.max(jnp.where(m3, px_f, -big), axis=0)
        cap = jnp.maximum(jnp.abs(mi), jnp.abs(ma)) \
            + jnp.float32(BC6H_LS_MAG_CAP)
        kb = BC6H_SHARED_KEEPBETTER
        idx_b, err0 = _bc6h_palette_err_f(px_f, mask, mi, ma, iprec,
                                          score=kb)
        e0f, e1f = mi, ma
        err_b = err0
        for r in range(BC6H_SHARED_ROUNDS):
            x = _pal_weight_f(idx_b, 1 << iprec) * jnp.float32(1 / 64)
            mm = mask.astype(jnp.float32)
            a = (1.0 - x) * mm
            b = x * mm
            A = jnp.sum(a * a, axis=0)
            B = jnp.sum(a * b, axis=0)
            C = jnp.sum(b * b, axis=0)
            det = A * C - B * B
            ok = jnp.abs(det) > 1e-6
            inv = 1.0 / jnp.where(ok, det, 1.0)
            rows0, rows1 = [], []
            for c in range(3):
                r0 = jnp.sum(a * px_f[:, c, :], axis=0)
                r1 = jnp.sum(b * px_f[:, c, :], axis=0)
                n0 = jnp.clip((C * r0 - B * r1) * inv,
                              jnp.maximum(lo, -cap[c]),
                              jnp.minimum(lim, cap[c]))
                n1 = jnp.clip((A * r1 - B * r0) * inv,
                              jnp.maximum(lo, -cap[c]),
                              jnp.minimum(lim, cap[c]))
                rows0.append(jnp.where(ok, n0, e0f[c]))
                rows1.append(jnp.where(ok, n1, e1f[c]))
            e0f = jnp.stack(rows0)
            e1f = jnp.stack(rows1)
            if kb or r < BC6H_SHARED_ROUNDS - 1:
                # the last assignment only feeds the keep-better score
                # (group rescore re-derives indices from quantized
                # endpoints)
                idx_b, err_b = _bc6h_palette_err_f(px_f, mask, e0f, e1f,
                                                   iprec, score=kb)
        if kb:
            better = err_b < err0
            out.append((jnp.where(better[None, :], e0f, mi),
                        jnp.where(better[None, :], e1f, ma)))
        else:
            out.append((e0f, e1f))
    return out


def _bc6h_group_rescore(px_int, mask_list, anchors, shared, row, signed):
    """Quantize the shared-fit endpoints at this row group's precision,
    rescore exactly, then ONE quantized-domain LS refit round (refit on
    the exact indices, requantize, exact rescore, keep-better) — the
    pure float trajectory loses 0.09 dB on the frozen HDR gate because
    quantization snap at coarse precW shifts which indices are optimal;
    the single per-group round recovers it at ~60% of the old per-group
    full eval. Anchor swaps on the winning indices. Shared by every row
    of the group (same precW/iprec). Returns (total_err, q_pairs
    anchor-fixed, idx_full)."""
    _, partitions, _, iprec, precW, _, _, _ = BC6H_MODE_INFO[row]
    nb = px_int.shape[2]
    px_f = px_int.astype(jnp.float32)
    lim = float(_F16MAX)
    lo = -lim if signed else 0.0
    idx_full = jnp.zeros((px_int.shape[0], nb), jnp.int32)
    total_err = jnp.zeros(nb, jnp.float32)
    q_pairs = []
    for sub, mask in enumerate(mask_list):
        e0, e1 = shared[sub]

        def quant(ef):
            return jnp.stack([_bc6h_quantize(
                jnp.round(ef[c]).astype(jnp.int32), precW[c], signed)
                for c in range(3)])

        q0, q1 = quant(e0), quant(e1)
        idx, err = _bc6h_palette_err_t(px_int, mask, q0, q1, precW, iprec,
                                       signed)
        if precW[0] < BC6H_GROUP_REFIT_MINPREC:
            # quantized-domain refit round (coarse-precision groups only)
            big = jnp.float32(1e9)
            m3 = mask[:, None, :]
            cap = jnp.maximum(
                jnp.abs(jnp.min(jnp.where(m3, px_f, big), axis=0)),
                jnp.abs(jnp.max(jnp.where(m3, px_f, -big), axis=0))) \
                + jnp.float32(BC6H_LS_MAG_CAP)
            x = _pal_weight(idx, 1 << iprec).astype(jnp.float32) \
                * jnp.float32(1 / 64)
            mm = mask.astype(jnp.float32)
            a = (1.0 - x) * mm
            b = x * mm
            A = jnp.sum(a * a, axis=0)
            B = jnp.sum(a * b, axis=0)
            C = jnp.sum(b * b, axis=0)
            det = A * C - B * B
            ok = jnp.abs(det) > 1e-6
            inv = 1.0 / jnp.where(ok, det, 1.0)
            rows0, rows1 = [], []
            for c in range(3):
                r0 = jnp.sum(a * px_f[:, c, :], axis=0)
                r1 = jnp.sum(b * px_f[:, c, :], axis=0)
                n0 = jnp.clip((C * r0 - B * r1) * inv,
                              jnp.maximum(lo, -cap[c]),
                              jnp.minimum(lim, cap[c]))
                n1 = jnp.clip((A * r1 - B * r0) * inv,
                              jnp.maximum(lo, -cap[c]),
                              jnp.minimum(lim, cap[c]))
                rows0.append(jnp.where(ok, n0, e0[c]))
                rows1.append(jnp.where(ok, n1, e1[c]))
            q0r = quant(jnp.stack(rows0))
            q1r = quant(jnp.stack(rows1))
            idx_r, err_r = _bc6h_palette_err_t(px_int, mask, q0r, q1r,
                                               precW, iprec, signed)
            better = err_r < err
            q0 = jnp.where(better[None, :], q0r, q0)
            q1 = jnp.where(better[None, :], q1r, q1)
            idx = jnp.where(better[None, :], idx_r, idx)
            err = jnp.minimum(err_r, err)

        total_err = total_err + err
        q_pairs.append((q0, q1))
        idx_full = jnp.where(mask, idx, idx_full)

    msb = 1 << (iprec - 1)
    maxi = (1 << iprec) - 1
    fixed = []
    for sub, (mask, anchor) in enumerate(zip(mask_list, anchors)):
        if isinstance(anchor, int):
            a_idx = idx_full[anchor]
        else:
            a_idx = jnp.zeros(nb, jnp.int32)
            for i in range(16):
                a_idx = jnp.where(anchor == i, idx_full[i], a_idx)
        swap = (a_idx & msb) != 0
        q0, q1 = q_pairs[sub]
        fixed.append((jnp.where(swap[None, :], q1, q0),
                      jnp.where(swap[None, :], q0, q1)))
        idx_full = jnp.where(swap[None, :] & mask, maxi - idx_full,
                             idx_full)
    return total_err, fixed, idx_full


def _bc6h_transform_fit_t(q_pairs, total_err, row, signed, nb):
    """Per-row delta transform + endpoint-fit check on anchor-fixed
    quantized endpoints (TransformForward + EndPointsFit :1948).
    Returns (err, emit_pairs)."""
    _, partitions, transformed, _, precW, precX, precY, precZ = \
        BC6H_MODE_INFO[row]
    base = q_pairs[0][0]
    fit = jnp.ones(nb, bool)
    deltas = [(q_pairs[0][1], precX)]
    if partitions:
        deltas.append((q_pairs[1][0], precY))
        deltas.append((q_pairs[1][1], precZ))
    if transformed:
        stored = []
        for val, prec in deltas:
            d = val - base
            for c in range(3):
                fit = fit & _nbits_fit(d[c], prec[c], True)
            stored.append(d)
    else:
        stored = [v for v, _ in deltas]
        for val, prec in deltas:
            for c in range(3):
                fit = fit & _nbits_fit(val[c], prec[c], signed)
    for c in range(3):
        fit = fit & _nbits_fit(base[c], precW[c], signed)

    def field_mask(v, prec):
        return jnp.stack([v[c] & ((1 << prec[c]) - 1) for c in range(3)])

    emit_pairs = [(field_mask(base, precW), field_mask(stored[0], precX))]
    if partitions:
        emit_pairs.append((field_mask(stored[1], precY),
                           field_mask(stored[2], precZ)))
    else:
        emit_pairs.append(emit_pairs[0])  # unused filler
    return jnp.where(fit, total_err, jnp.inf), emit_pairs


def _bc6h_row_groups(rows=range(10)):
    """Consecutive 2-region rows sharing (iprec, precW), whose quantized
    rescore is identical (only delta-fit + emit differ)."""
    groups = []
    for row in rows:
        key = (BC6H_MODE_INFO[row][3], BC6H_MODE_INFO[row][4])
        if groups and groups[-1][0] == key:
            groups[-1][1].append(row)
        else:
            groups.append((key, [row]))
    return [tuple(rs) for _, rs in groups]


def _bc6h_emit(row: int, shape, q_pairs, idx, nb) -> jnp.ndarray:
    """Pack one BC6H candidate into [NB, 4] u32 (EmitBlock :2330).

    q_pairs: per-region pairs of [3, NB] stored field values; idx [16, NB]."""
    mode_val, partitions, transformed, iprec, precW, precX, precY, precZ = \
        BC6H_MODE_INFO[row]
    header_bits = 82 if partitions else 65
    words = jnp.zeros((nb, 4), jnp.uint32)

    fields = {}
    if isinstance(shape, int):
        fields[2] = jnp.full((nb,), shape, jnp.int32)
    else:
        fields[2] = shape.astype(jnp.int32)
    zero = jnp.zeros((nb,), jnp.int32)
    for ch, base in ((0, 3), (1, 7), (2, 11)):
        fields[base + 0] = q_pairs[0][0][ch]
        fields[base + 1] = q_pairs[0][1][ch]
        fields[base + 2] = q_pairs[1][0][ch] if partitions else zero
        fields[base + 3] = q_pairs[1][1][ch] if partitions else zero

    desc = BC6H_DESC[row]
    mode_arr = jnp.full((nb,), mode_val, jnp.uint32)
    for pos in range(header_bits):
        fid, fbit = int(desc[pos, 0]), int(desc[pos, 1])
        if fid == 0:
            continue
        if fid == 1:
            bit = (mode_arr >> fbit) & 1
        else:
            bit = (fields[fid].astype(jnp.uint32) >> fbit) & 1
        words = _scatter_bits(words, bit, pos, 1)

    offs_t, nbits_t = _get_index_layout(partitions, iprec)
    if isinstance(shape, int):
        offs = jnp.asarray(offs_t[shape])[:, None] + header_bits
        nbw = jnp.asarray(nbits_t[shape])[:, None]
    else:
        offs = jnp.asarray(offs_t)[shape].T + header_bits
        nbw = jnp.asarray(nbits_t)[shape].T
    words = _scatter_bits(words, idx.astype(jnp.uint32), offs, nbw)
    return words


# ---------------------------------------------------------------------------
# BC6H winner-refine (r3): unpack each encoded block's winning state and
# run the quantized-endpoint perturbation ladder on it only — the BC6H
# analog of refine_bc7_words (OptimizeEndPoints, BC6HBC7.cpp:2081-2226).
# All 14 mode rows merge into TWO ladder units (one-region / two-region)
# by carrying the endpoint precision as a per-lane value: precW is
# channel-uniform in every BC6H mode (ms_aInfo :1013-1067), so the
# unquantize/clip grids become lane-wise shifts instead of 14 static
# variants.
# ---------------------------------------------------------------------------

def _bc6h_unquantize_dyn(comp, bits, signed: bool):
    """_bc6h_unquantize with per-lane bit widths (bits [NB] i32)."""
    if signed:
        s = comp < 0
        c = jnp.abs(comp)
        full = bits >= 16
        unq = jnp.where(c == 0, 0,
                        jnp.where(c >= (1 << (bits - 1)) - 1, 0x7FFF,
                                  ((c << 15) + 0x4000) >> (bits - 1)))
        unq = jnp.where(full, c, unq)
        return jnp.where(s, -unq, unq)
    full = bits >= 15
    safe = jnp.where(full, 0, comp)       # keep comp<<16 inside int32
    unq = jnp.where(comp == 0, 0,
                    jnp.where(comp == (1 << bits) - 1, 0xFFFF,
                              ((safe << 16) + 0x8000) >> bits))
    return jnp.where(full, comp, unq)


def _bc6h_palette_err_dyn(px3, mask, q0, q1, precw, iprec: int, signed):
    """_bc6h_palette_err_t with per-lane endpoint precision precw [NB].
    px3: per-channel [16, NB] i32 F16-int pixel planes (kernel-friendly
    — no [16, 3, NB] middle axis)."""
    u = [(_bc6h_unquantize_dyn(q0[c], precw, signed),
          _bc6h_unquantize_dyn(q1[c], precw, signed)) for c in range(3)]
    K = 1 << iprec
    f0 = [_bc6h_finish_unquantize(u[c][0], signed).astype(jnp.float32)
          for c in range(3)]
    f1 = [_bc6h_finish_unquantize(u[c][1], signed).astype(jnp.float32)
          for c in range(3)]
    dot = jnp.zeros(px3[0].shape, jnp.float32)
    span = jnp.zeros((px3[0].shape[1],), jnp.float32)
    for c in range(3):
        e = f1[c] - f0[c]
        dot = dot + (px3[c].astype(jnp.float32) - f0[c][None, :]) \
            * e[None, :]
        span = span + e * e
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
    best = jnp.zeros_like(dot)
    for c in range(3):
        pal = (u[c][0][None, :] * (64 - wk) + u[c][1][None, :] * wk
               + 32) >> 6
        pal = _bc6h_finish_unquantize(pal, signed)
        dd = (px3[c] - pal).astype(jnp.float32)
        best = best + dd * dd
    err = jnp.sum(jnp.where(mask, best, 0.0), axis=0)
    return idx, err


def _bc6h_cherr_dyn(px_c, mask, u0c, u1c, wk, signed):
    """One channel's exact masked SSE at fixed palette weights wk [16, NB]
    (the BC6H analog of _perturb_channels_t's cherr)."""
    pal = (u0c[None, :] * (64 - wk) + u1c[None, :] * wk + 32) >> 6
    pal = _bc6h_finish_unquantize(pal, signed)
    d = (px_c - pal).astype(jnp.float32)
    return jnp.sum(jnp.where(mask, d * d, 0.0), axis=0)


def _bc6h_quantize_dyn(v, precw, signed: bool):
    """_bc6h_quantize with per-lane precision precw [NB]."""
    if signed:
        s = v < 0
        a = jnp.abs(v)
        q = jnp.where(precw >= 16, a,
                      (a << jnp.maximum(precw - 1, 0)) // (_F16MAX + 1))
        return jnp.where(s, -q, q)
    return jnp.where(precw >= 15, v, (v << precw) // (_F16MAX + 1))


def _bc6h_ladder_caps(px3, mask, q0, q1, precw, signed):
    """Per-channel q-space magnitude cap for the perturbation ladders:
    the subset's data magnitude + one F16 octave (see BC6H_LS_MAG_CAP —
    int-linear steps past the data are float-exponential), never below
    the entry state's own magnitude so a legitimate start is not
    clipped into a jump."""
    caps = []
    for c in range(3):
        capint = jnp.max(jnp.where(mask, jnp.abs(px3[c]), 0),
                         axis=0) + int(BC6H_LS_MAG_CAP)
        capq = _bc6h_quantize_dyn(capint, precw, signed)
        caps.append(jnp.maximum(capq,
                                jnp.maximum(jnp.abs(q0[c]),
                                            jnp.abs(q1[c]))))
    return caps


def _bc6h_perturb_dyn(px3, mask, q0, q1, wk, precw, signed,
                      rounds: int, deltas):
    """Fixed-index per-channel endpoint ladder with per-lane precision.

    q0/q1 [3, NB] quantized endpoints; wk [16, NB] palette weights held
    fixed (the caller re-assigns indices once afterwards, like
    refine_bc7_words); precw [NB]. Returns (q0, q1, err, err0)."""
    if signed:
        qhi = jnp.where(precw >= 16, _F16MAX, (1 << (precw - 1)) - 1)
        qlo = -qhi
    else:
        qhi = jnp.where(precw >= 15, _F16MAX, (1 << precw) - 1)
        qlo = jnp.zeros_like(qhi)
    caps = _bc6h_ladder_caps(px3, mask, q0, q1, precw, signed)
    qhi_c = [jnp.minimum(qhi, caps[c]) for c in range(3)]
    qlo_c = [jnp.maximum(qlo, -caps[c]) for c in range(3)]
    q0r = [q0[c] for c in range(3)]
    q1r = [q1[c] for c in range(3)]
    ch_err = []
    for c in range(3):
        u0c = _bc6h_unquantize_dyn(q0r[c], precw, signed)
        u1c = _bc6h_unquantize_dyn(q1r[c], precw, signed)
        ch_err.append(_bc6h_cherr_dyn(px3[c], mask, u0c, u1c,
                                      wk, signed))
    err0 = sum(ch_err)
    for _ in range(rounds):
        for c in range(3):
            base = ch_err[c]
            for which in (0, 1):
                rows = q0r if which == 0 else q1r
                other_u = _bc6h_unquantize_dyn(
                    (q1r if which == 0 else q0r)[c], precw, signed)
                for delta in deltas:
                    for sgn in (delta, -delta):
                        qt = jnp.clip(rows[c] + sgn, qlo_c[c], qhi_c[c])
                        ut = _bc6h_unquantize_dyn(qt, precw, signed)
                        e = (_bc6h_cherr_dyn(px3[c], mask, ut,
                                             other_u, wk, signed)
                             if which == 0 else
                             _bc6h_cherr_dyn(px3[c], mask,
                                             other_u, ut, wk, signed))
                        better = e < base
                        rows[c] = jnp.where(better, qt, rows[c])
                        base = jnp.minimum(e, base)
            ch_err[c] = base
    return (jnp.stack(q0r), jnp.stack(q1r), sum(ch_err), err0)


def _bc6h_perturb_remap_dyn(px3, mask, q0, q1, precw, iprec, signed,
                            rounds: int, deltas):
    """Re-mapping endpoint ladder: every probe re-assigns indices via the
    full projection scorer (the reference's PerturbOne re-maps per step,
    BC6HBC7.cpp:2128 via MapColors) — joint endpoint+index moves reach
    interpolated exact representations the fixed-index ladder cannot
    (e.g. a constant block hit exactly at weight 4 with both endpoints
    individually off-grid). ~4x the cost of _bc6h_perturb_dyn per probe.
    Returns (q0 [3, NB], q1 [3, NB], idx, err, err0)."""
    if signed:
        qhi = jnp.where(precw >= 16, _F16MAX, (1 << (precw - 1)) - 1)
        qlo = -qhi
    else:
        # the full field range, not F16MAX: Unquantize's upper half is
        # how bright values become reachable at W16 (PerturbOne clips to
        # the field range, not the source range)
        qhi = (1 << precw) - 1
        qlo = jnp.zeros_like(qhi)
    caps = _bc6h_ladder_caps(px3, mask, q0, q1, precw, signed)
    qhi_c = [jnp.minimum(qhi, caps[c]) for c in range(3)]
    qlo_c = [jnp.maximum(qlo, -caps[c]) for c in range(3)]
    q0r = [q0[c] for c in range(3)]
    q1r = [q1[c] for c in range(3)]
    idx, err = _bc6h_palette_err_dyn(px3, mask, q0r, q1r, precw, iprec,
                                     signed)
    err0 = err
    for _ in range(rounds):
        for c in range(3):
            for which in (0, 1):
                rows = q0r if which == 0 else q1r
                for delta in deltas:
                    for sgn in (delta, -delta):
                        qt = jnp.clip(rows[c] + sgn, qlo_c[c], qhi_c[c])
                        keep, rows[c] = rows[c], qt
                        idx_t, err_t = _bc6h_palette_err_dyn(
                            px3, mask, q0r, q1r, precw, iprec, signed)
                        bt = err_t < err
                        rows[c] = jnp.where(bt, qt, keep)
                        idx = jnp.where(bt[None, :], idx_t, idx)
                        err = jnp.minimum(err_t, err)
    return jnp.stack(q0r), jnp.stack(q1r), idx, err, err0


# Winner-refine ladder tiers (rounds, deltas) — see BC6H_LADDER notes in
# BASELINE.md for the measured quality/cost of each.
BC6H_LADDER_LIGHT = (1, (1,))
BC6H_LADDER_FULL = (2, (16, 4, 1))
# mid tier (r5, VERDICT r4 #2): ONE remap round at deltas (4, 1), own
# precision group only — measured on the HDR probes
# (benchmarks/quality_bc6h_refine.py): closes the sun_sky hot-disk gap
# fully (-1.201 -> -0.000, like maxq), reaches 56-77% of maxq's gains
# elsewhere (hdr +0.067 vs +0.105, dim_smooth -0.201 vs -0.164,
# signed +0.565 vs +0.613); the cross2 variant measured identical
# quality at 6x the 2-region cost and stays maxq-only.
BC6H_LADDER_MID = (1, (4, 1))
# maxq tier: re-mapping ladder with log-spaced deltas — measured best on
# every content (benchmarks/quality_bc6h_refine.py), closes the sun_sky
# hot-disk gap fully (the reference's PerturbOne climb reaches joint
# endpoint+index states the fixed-index ladder cannot).
BC6H_LADDER_MAXQ = (2, (32, 16, 8, 4, 2, 1))


def refine_bc6h_words(px_int, words, ladder, signed: bool,
                      remap: bool = False, cross2: bool = False,
                      ladder2=None):
    """Winner-refine pass: unpack each block's winning (mode row, shape,
    endpoints, indices) from its packed words, run the quantized-endpoint
    perturbation ladder on that state only, re-assign indices once, and
    re-emit where the error improved AND the row's delta-transform still
    fits (EndPointsFit :1948 — the ladder can push a delta out of its
    field range, in which case the original block is kept).

    remap=True uses the re-mapping ladder (_bc6h_perturb_remap_dyn):
    indices re-assigned per probe, reference PerturbOne semantics.
    cross2=True ladders 2-region winners at every 2-region precision
    group (like unit A's cross-precision refine) — the maxq tier.

    px_int [16, 3, NB] i32 F16-int pixels; words [NB, 4] u32.
    Returns refined words [NB, 4]."""
    nb = px_int.shape[2]
    px3 = tuple(px_int[:, c, :] for c in range(3))
    words_t = jnp.transpose(words)

    def emit(row, shp, pairs, idx, a2):
        return jnp.transpose(_bc6h_emit(row, shp, pairs, idx, nb))

    out_t = _refine_bc6h_core(px3, words_t, ladder, signed, remap,
                              cross2, emit, ladder2)
    return jnp.transpose(out_t)


def _refine_bc6h_core(px3, words_t, ladder, signed, remap, cross2, emit,
                      ladder2=None):
    """Lane-major refine body shared by the jnp wrapper and the pallas
    kernel (pallas_kernels._bc6h_refine_kernel). px3: 3x [16, NB] i32;
    words_t [4, NB] u32; emit(row, shape, pairs, idx, a2) -> [4, NB].
    ladder2: the 2-region unit's (rounds, deltas), defaults to ladder —
    the cross-row groups saturate at smaller deltas than unit A's
    cross-precision ladder, so maxq runs them cheaper.
    Returns refined words [4, NB]."""
    nb = words_t.shape[1]
    ladder_b = ladder2 if ladder2 is not None else ladder

    # mode row per block (ms_aModeToInfo :1069): 2-bit mode values 0/1,
    # else the full 5-bit field
    b5 = (words_t[0] & 0x1F).astype(jnp.int32)
    mode_val = jnp.where((b5 & 3) < 2, b5 & 3, b5)
    row_idx = jnp.full((nb,), -1, jnp.int32)
    for mv in range(32):
        r = int(BC6H_MODE_TO_INFO[mv])
        if r >= 0:
            row_idx = jnp.where(mode_val == mv, r, row_idx)

    # merge the 14 rows' unpacked states into per-unit planes
    qm = {k: jnp.zeros((3, nb), jnp.int32)
          for k in ((0, 0), (0, 1), (1, 0), (1, 1))}
    shape = jnp.zeros((nb,), jnp.int32)
    precw = jnp.full((nb,), 10, jnp.int32)
    for row in range(14):
        hit = row_idx == row
        s_r, e = _bc6h_unpack_endpoints(words_t, row, signed)
        info = BC6H_MODE_INFO[row]
        precw = jnp.where(hit, info[4][0], precw)
        if info[1]:
            shape = jnp.where(hit, s_r, shape)
        for key in qm:
            if info[1] or key[0] == 0:
                vals = jnp.stack([e[(key[0], key[1], c)]
                                  for c in range(3)])
                qm[key] = jnp.where(hit[None, :], vals, qm[key])

    ones = jnp.ones((16, nb), bool)
    out = words_t

    # ---- unit A: one-region rows 10-13 (iprec 4, header 65) ----
    # The winner is laddered at ALL FOUR one-region precisions, not just
    # its own: each precision's Unquantize/FinishUnquantize grid
    # (:1892/:1930) reaches different F16 values, so a block's exact
    # representation can exist at W11 but not W12 (the sun_sky hot-disk
    # constant blocks) — the reference finds it because its climb runs
    # per mode (:2081). Fold keeps the best fitting row.
    idx1 = jnp.stack([
        _gb_t(words_t, 65 + 4 * i - (1 if i > 0 else 0),
              4 - (1 if i == 0 else 0)).astype(jnp.int32)
        for i in range(16)])
    wk1 = _pal_weight(idx1, 16)
    # the winner's endpoints in F16-int space, for re-quantization at
    # the other rows' precisions
    ef = [jnp.stack([_bc6h_finish_unquantize(
        _bc6h_unquantize_dyn(qm[(0, e)][c], precw, signed), signed)
        for c in range(3)]) for e in (0, 1)]
    unit_a = {}
    err1_old = None
    if remap:
        # Acceptance bar = the winner's pre-ladder error at its STORED
        # indices (the non-remap path's fixed-wk err0), not the error
        # after index re-assignment: otherwise an index-only remap
        # improvement ties the bar and the strict '<' fold drops it.
        err1_old = jnp.zeros((nb,), jnp.float32)
        for c in range(3):
            u0w = _bc6h_unquantize_dyn(qm[(0, 0)][c], precw, signed)
            u1w = _bc6h_unquantize_dyn(qm[(0, 1)][c], precw, signed)
            err1_old = err1_old + _bc6h_cherr_dyn(px3[c], ones, u0w,
                                                  u1w, wk1, signed)
    for row in range(10, 14):
        precA = BC6H_MODE_INFO[row][4][0]
        pA = jnp.full((nb,), precA, jnp.int32)
        same = precw == precA
        q0s = jnp.where(same[None, :], qm[(0, 0)], jnp.stack(
            [_bc6h_quantize(ef[0][c], precA, signed) for c in range(3)]))
        q1s = jnp.where(same[None, :], qm[(0, 1)], jnp.stack(
            [_bc6h_quantize(ef[1][c], precA, signed) for c in range(3)]))
        if remap:
            q0n, q1n, idx1f, err1_new, err0 = _bc6h_perturb_remap_dyn(
                px3, ones, q0s, q1s, pA, 4, signed,
                ladder[0], ladder[1])
        else:
            q0n, q1n, err_l, err0 = _bc6h_perturb_dyn(
                px3, ones, q0s, q1s, wk1, pA, signed,
                ladder[0], ladder[1])
            idx_t, err_t = _bc6h_palette_err_dyn(px3, ones, q0n, q1n,
                                                 pA, 4, signed)
            keep = err_t < err_l
            idx1f = jnp.where(keep[None, :], idx_t, idx1)
            err1_new = jnp.minimum(err_t, err_l)
        if not remap:
            if err1_old is None:
                # pre-ladder error at the winner's own precision = the
                # bar every candidate row must beat
                err1_old = jnp.where(same, err0, jnp.inf)
            else:
                err1_old = jnp.where(same, err0, err1_old)
        swap = (idx1f[0] & 8) != 0
        q0a = jnp.where(swap[None, :], q1n, q0n)
        q1a = jnp.where(swap[None, :], q0n, q1n)
        idx1f = jnp.where(swap[None, :], 15 - idx1f, idx1f)
        unit_a[row] = (err1_new, q0a, q1a, idx1f)

    # ---- unit B: two-region rows 0-9 (iprec 3, header 82) ----
    pa_tab = tuple(int(FIXUPS[1, sv, 1]) for sv in range(32))
    pp_tab = tuple(int(sum(int(PARTITIONS[1][sv, i]) << (2 * i)
                           for i in range(16))) for sv in range(32))
    a2 = jnp.zeros((nb,), jnp.int32)
    pp = jnp.zeros((nb,), jnp.uint32)
    for sv in range(32):
        hit = shape == sv
        a2 = jnp.where(hit, pa_tab[sv], a2)
        pp = jnp.where(hit, jnp.uint32(pp_tab[sv]), pp)
    pm = jnp.stack([((pp >> (2 * i)) & 1).astype(jnp.int32)
                    for i in range(16)])
    mask_list = [pm == 0, pm == 1]
    idx2_rows = []
    for i in range(16):
        before = (1 if i > 0 else 0) + (a2 < i).astype(jnp.int32)
        is_anchor = jnp.where((i == 0) | (a2 == i), 1, 0)
        start = 82 + 3 * i - before
        idx2_rows.append(_gb_dyn_t(words_t, start, is_anchor,
                                   3).astype(jnp.int32))
    idx2 = jnp.stack(idx2_rows)
    wk2 = _pal_weight(idx2, 8)
    err2_stored = None
    if remap:
        # same stored-index bar as unit A (see err1_old above)
        err2_stored = jnp.zeros((nb,), jnp.float32)
        for sub, mask_s in enumerate(mask_list):
            for c in range(3):
                u0w = _bc6h_unquantize_dyn(qm[(sub, 0)][c], precw,
                                           signed)
                u1w = _bc6h_unquantize_dyn(qm[(sub, 1)][c], precw,
                                           signed)
                err2_stored = err2_stored + _bc6h_cherr_dyn(
                    px3[c], mask_s, u0w, u1w, wk2, signed)

    # cross2 (maxq): ladder the 2-region winner at EVERY 2-region
    # precision group, not just its own — like unit A, a block's best
    # representation can live at a different endpoint precision/delta
    # layout than the row the search picked (the in-search ladder found
    # these by perturbing every candidate; measured on dim_smooth,
    # benchmarks/quality_bc6h_refine.py). Winner endpoints re-quantized
    # per group from F16-int space; fold keeps the best fitting row.
    if cross2:
        groups = _bc6h_row_groups()
        ef2 = {}
        for sub in (0, 1):
            for e in (0, 1):
                ef2[(sub, e)] = [_bc6h_finish_unquantize(
                    _bc6h_unquantize_dyn(qm[(sub, e)][c], precw, signed),
                    signed) for c in range(3)]
    else:
        groups = [None]

    unit_b = []
    err2_old = err2_stored
    for g in groups:
        if g is None:
            pB = precw
            same = None
        else:
            precB = BC6H_MODE_INFO[g[0]][4][0]
            pB = jnp.full((nb,), precB, jnp.int32)
            same = precw == precB
        q2 = {}
        err2_new = jnp.zeros((nb,), jnp.float32)
        err2_pre = jnp.zeros((nb,), jnp.float32)
        idx2f = idx2
        for sub, mask in enumerate(mask_list):
            if g is None:
                q0s, q1s = qm[(sub, 0)], qm[(sub, 1)]
            else:
                q0s = jnp.where(same[None, :], qm[(sub, 0)], jnp.stack(
                    [_bc6h_quantize(ef2[(sub, 0)][c], precB, signed)
                     for c in range(3)]))
                q1s = jnp.where(same[None, :], qm[(sub, 1)], jnp.stack(
                    [_bc6h_quantize(ef2[(sub, 1)][c], precB, signed)
                     for c in range(3)]))
            if remap:
                q0n2, q1n2, idx_t2, err_n2, err02 = \
                    _bc6h_perturb_remap_dyn(
                        px3, mask, q0s, q1s, pB, 3,
                        signed, ladder_b[0], ladder_b[1])
                idx2f = jnp.where(mask, idx_t2, idx2f)
            else:
                q0n2, q1n2, err_l2, err02 = _bc6h_perturb_dyn(
                    px3, mask, q0s, q1s, wk2, pB,
                    signed, ladder_b[0], ladder_b[1])
                idx_t2, err_t2 = _bc6h_palette_err_dyn(
                    px3, mask, q0n2, q1n2, pB, 3, signed)
                keep2 = err_t2 < err_l2
                idx2f = jnp.where(keep2[None, :] & mask, idx_t2, idx2f)
                err_n2 = jnp.minimum(err_t2, err_l2)
            q2[sub] = (q0n2, q1n2)
            err2_new = err2_new + err_n2
            err2_pre = err2_pre + err02
        # anchor swaps (SwapIndices :2228)
        for sub, (mask, anchor) in enumerate(zip(mask_list, (0, a2))):
            if isinstance(anchor, int):
                a_idx = idx2f[anchor]
            else:
                a_idx = jnp.zeros(nb, jnp.int32)
                for i in range(16):
                    a_idx = jnp.where(anchor == i, idx2f[i], a_idx)
            swap2 = (a_idx & 4) != 0
            q0s, q1s = q2[sub]
            q2[sub] = (jnp.where(swap2[None, :], q1s, q0s),
                       jnp.where(swap2[None, :], q0s, q1s))
            idx2f = jnp.where(swap2[None, :] & mask, 7 - idx2f, idx2f)
        unit_b.append((g, err2_new, q2, idx2f))
        if not remap:
            if g is None:
                err2_old = err2_pre
            else:
                # pre-ladder error at the winner's own precision = bar
                prev = jnp.full((nb,), jnp.inf, jnp.float32) \
                    if err2_old is None else err2_old
                err2_old = jnp.where(same, err2_pre, prev)

    # ---- per-row delta transform + fit + emit, fold where improved ----
    # 1-region winners fold over all four rows (cross-precision refine);
    # 2-region winners over their own row (default) or every row whose
    # precision group was laddered (cross2) — running-best on error.
    shape_u = shape.astype(jnp.uint32)
    best1 = err1_old
    for row in range(10, 14):
        err1_new, q0a, q1a, idx1f = unit_a[row]
        errf, pairs = _bc6h_transform_fit_t(
            [(q0a, q1a)], err1_new, row, signed, nb)
        wn = emit(row, 0, pairs, idx1f, None)
        better = (row_idx >= 10) & (errf < best1)
        best1 = jnp.where(better, errf, best1)
        out = jnp.where(better[None, :], wn, out)

    is2 = (row_idx >= 0) & (row_idx <= 9)
    best2 = err2_old
    for g, err2_new, q2, idx2f in unit_b:
        rows_g = range(10) if g is None else g
        for row in rows_g:
            errf, pairs = _bc6h_transform_fit_t(
                [q2[0], q2[1]], err2_new, row, signed, nb)
            wn = emit(row, shape_u, pairs, idx2f, a2)
            gate = is2 if g is not None else (row_idx == row)
            better = gate & (errf < best2)
            best2 = jnp.where(better, errf, best2)
            out = jnp.where(better[None, :], wn, out)
    return out


def _bc6h_eval_candidate(px_int, px_f, mask_list, anchors, row, signed):
    """One (mode, shape) candidate over lane-major planes.

    px_int/px_f [16, 3, NB]; masks [16, NB]. Returns (err [NB], emit_pairs,
    idx [16, NB])."""
    mode_val, partitions, transformed, iprec, precW, precX, precY, precZ = \
        BC6H_MODE_INFO[row]
    nb = px_int.shape[2]
    idx_full = jnp.zeros((px_int.shape[0], nb), jnp.int32)
    total_err = jnp.zeros(nb, jnp.float32)
    q_pairs = []

    for sub, mask in enumerate(mask_list):
        big = jnp.float32(1e9)
        m3 = mask[:, None, :]
        mi = jnp.min(jnp.where(m3, px_f, big), axis=0)    # [3, NB]
        ma = jnp.max(jnp.where(m3, px_f, -big), axis=0)

        def quant(e):
            ei = jnp.round(e).astype(jnp.int32)
            return jnp.stack([_bc6h_quantize(ei[c], precW[c], signed)
                              for c in range(3)])

        q0, q1 = quant(mi), quant(ma)
        idx, err = _bc6h_palette_err_t(px_int, mask, q0, q1, precW, iprec,
                                       signed)

        # least-squares refinement in int space
        e0f, e1f = mi, ma
        q0b, q1b, idx_b, err_b = q0, q1, idx, err
        cap = jnp.maximum(jnp.abs(mi), jnp.abs(ma)) \
            + jnp.float32(BC6H_LS_MAG_CAP)
        for _ in range(BC6H_REFIT_ROUNDS):
            x = _pal_weight(idx_b, 1 << iprec).astype(jnp.float32) \
                * jnp.float32(1 / 64)
            mm = mask.astype(jnp.float32)
            a = (1.0 - x) * mm
            b = x * mm
            A = jnp.sum(a * a, axis=0)
            B = jnp.sum(a * b, axis=0)
            C = jnp.sum(b * b, axis=0)
            det = A * C - B * B
            ok = jnp.abs(det) > 1e-6
            inv = 1.0 / jnp.where(ok, det, 1.0)
            lim = float(_F16MAX)
            lo = -lim if signed else 0.0
            rows0, rows1 = [], []
            for c in range(3):
                r0 = jnp.sum(a * px_f[:, c, :], axis=0)
                r1 = jnp.sum(b * px_f[:, c, :], axis=0)
                n0 = jnp.clip((C * r0 - B * r1) * inv,
                              jnp.maximum(lo, -cap[c]),
                              jnp.minimum(lim, cap[c]))
                n1 = jnp.clip((A * r1 - B * r0) * inv,
                              jnp.maximum(lo, -cap[c]),
                              jnp.minimum(lim, cap[c]))
                rows0.append(jnp.where(ok, n0, e0f[c]))
                rows1.append(jnp.where(ok, n1, e1f[c]))
            e0f = jnp.stack(rows0)
            e1f = jnp.stack(rows1)
            q0b, q1b = quant(e0f), quant(e1f)
            idx_b, err_b = _bc6h_palette_err_t(px_int, mask, q0b, q1b,
                                               precW, iprec, signed)
        better = err_b < err
        q0 = jnp.where(better[None, :], q0b, q0)
        q1 = jnp.where(better[None, :], q1b, q1)
        idx = jnp.where(better[None, :], idx_b, idx)
        err = jnp.minimum(err_b, err)

        total_err = total_err + err
        q_pairs.append((q0, q1))
        idx_full = jnp.where(mask, idx, idx_full)

    # anchor swap (SwapIndices :2228)
    msb = 1 << (iprec - 1)
    maxi = (1 << iprec) - 1
    fixed = []
    for sub, (mask, anchor) in enumerate(zip(mask_list, anchors)):
        if isinstance(anchor, int):
            a_idx = idx_full[anchor]
        else:
            a_idx = jnp.zeros(nb, jnp.int32)
            for i in range(16):
                a_idx = jnp.where(anchor == i, idx_full[i], a_idx)
        swap = (a_idx & msb) != 0
        q0, q1 = q_pairs[sub]
        fixed.append((jnp.where(swap[None, :], q1, q0),
                      jnp.where(swap[None, :], q0, q1)))
        idx_full = jnp.where(swap[None, :] & mask, maxi - idx_full, idx_full)
    q_pairs = fixed

    # delta transform + fit check (TransformForward + EndPointsFit :1948)
    base = q_pairs[0][0]
    fit = jnp.ones(nb, bool)
    deltas = [(q_pairs[0][1], precX)]
    if partitions:
        deltas.append((q_pairs[1][0], precY))
        deltas.append((q_pairs[1][1], precZ))
    if transformed:
        stored = []
        for val, prec in deltas:
            d = val - base
            for c in range(3):
                fit = fit & _nbits_fit(d[c], prec[c], True)
            stored.append(d)
    else:
        stored = [v for v, _ in deltas]
        for val, prec in deltas:
            for c in range(3):
                fit = fit & _nbits_fit(val[c], prec[c], signed)
    for c in range(3):
        fit = fit & _nbits_fit(base[c], precW[c], signed)

    def field_mask(v, prec):
        return jnp.stack([v[c] & ((1 << prec[c]) - 1) for c in range(3)])

    emit_pairs = [(field_mask(base, precW), field_mask(stored[0], precX))]
    if partitions:
        emit_pairs.append((field_mask(stored[1], precY),
                           field_mask(stored[2], precZ)))
    else:
        emit_pairs.append(emit_pairs[0])  # unused filler

    total_err = jnp.where(fit, total_err, jnp.inf)
    return total_err, emit_pairs, idx_full


def encode_bc6h(blocks: jnp.ndarray, signed: bool,
                flags: int = 0,
                rows_sel: tuple | None = None) -> jnp.ndarray:
    """[NB, 16, 4] f32 -> [NB, 16] u8 (D3DXEncodeBC6HU/S, BC6HBC7.cpp:1817).

    The max-quality flag runs the default search, then the re-mapping
    winner-refine ladder (refine_bc6h_words, BC6H_LADDER_MAXQ) on each
    block's winning state — OptimizeEndPoints/PerturbOne analog,
    BC6HBC7.cpp:2081-2226.

    `rows_sel` restricts the search scope (profiling/dry-run only, the
    pallas kernel's knob mirrored): a tuple of 2-region row ids 0-9
    and/or "r1" for the four 1-region rows. None = full scope. The
    reduced graph is what XLA-CPU can compile in multi-device dry-run
    budget (VERDICT r4 #5); sharding structure is identical at any
    scope (block axis data-parallel, zero collectives)."""
    rgb = jnp.asarray(blocks, jnp.float32)[..., :3]
    nb = rgb.shape[0]
    maxq = bool(flags & _BC7_MAXQUALITY)
    mid = bool(flags & _BC6H_MID) and not maxq
    # lane-major [16, 3, NB]
    px_int = _f16_to_int(jnp.transpose(rgb, (1, 2, 0)), signed)
    px_f = px_int.astype(jnp.float32)

    if mid:
        # Mid quality tier (r5): default search + ONE remap-ladder round
        # at the winner's own precision group (BC6H_LADDER_MID) — the
        # measured knee between the default (no refine) and maxq (the
        # full cross-precision re-mapping ladder): closes the sun_sky
        # hot-disk gap entirely at ~1/10 of maxq's refine cost
        # (benchmarks/quality_bc6h_refine.py + profile numbers in
        # BASELINE.md). PerturbOne analog: BC6HBC7.cpp:2081-2226.
        words8 = encode_bc6h(blocks, signed, flags & ~_BC6H_MID,
                             rows_sel=rows_sel)
        w32 = lax.bitcast_convert_type(
            words8.reshape(nb, 4, 4), jnp.uint32)
        use_pallas = False
        try:
            from .pallas_kernels import _use_pallas, bc6h_refine_pallas
            use_pallas = _use_pallas()
        except Exception:
            pass
        if use_pallas:
            refined = bc6h_refine_pallas(px_int, w32, BC6H_LADDER_MID,
                                         signed, remap=True, cross2=False)
        else:
            refined = refine_bc6h_words(px_int, w32, BC6H_LADDER_MID,
                                        signed, remap=True, cross2=False)
        return lax.bitcast_convert_type(refined, jnp.uint8).reshape(
            nb, 16)

    if maxq:
        # Winner-refine maxq (r3): run the default search (the pallas
        # mega kernel on TPU), then the re-mapping perturbation ladder
        # on each block's winning state only — the BC6H analog of the
        # BC7 maxq architecture and of OptimizeEndPoints/PerturbOne
        # (BC6HBC7.cpp:2081-2226). Beats the old in-search ladder on
        # every probe at a fraction of its cost, and keeps maxq on the
        # kernel path (the in-search tier disabled pallas entirely).
        words8 = encode_bc6h(blocks, signed, flags & ~_BC7_MAXQUALITY)
        w32 = lax.bitcast_convert_type(
            words8.reshape(nb, 4, 4), jnp.uint32)
        use_pallas = False
        try:
            from .pallas_kernels import _use_pallas, bc6h_refine_pallas
            use_pallas = _use_pallas()
        except Exception:
            pass
        if use_pallas:
            refined = bc6h_refine_pallas(px_int, w32, BC6H_LADDER_MAXQ,
                                         signed, remap=True, cross2=True)
        else:
            refined = refine_bc6h_words(px_int, w32, BC6H_LADDER_MAXQ,
                                        signed, remap=True, cross2=True)
        return lax.bitcast_convert_type(refined, jnp.uint8).reshape(
            nb, 16)

    best_err = jnp.full((nb,), jnp.inf, jnp.float32)
    best_words = jnp.zeros((nb, 4), jnp.uint32)

    use_pallas = False
    try:
        from .pallas_kernels import (_use_pallas, bc6h_1region_pallas,
                                     bc6h_2region_pallas)
        use_pallas = _use_pallas()
    except Exception:
        pass

    if use_pallas:
        # the whole encode (shape ranking, 1-region rows, every 2-region
        # precision group, the row fold) as ONE pallas dispatch
        from .pallas_kernels import bc6h_encode_pallas
        _, best_words = bc6h_encode_pallas(px_int, signed,
                                           BC7_SHAPE_CANDIDATES,
                                           rows_sel=rows_sel)
        return lax.bitcast_convert_type(best_words, jnp.uint8).reshape(
            nb, 16)

    do_r1 = rows_sel is None or "r1" in rows_sel
    rows2 = [r for r in range(10) if rows_sel is None or r in rows_sel]
    ones = jnp.ones((16, nb), bool)

    def fold_candidate(best_err, best_words, err, words):
        better = err < best_err
        return (jnp.minimum(err, best_err),
                jnp.where(better[:, None], words, best_words))

    if BC6H_SHARED_FIT:
        # Shared-fit search (r3): one precision-free fit trajectory per
        # (shape candidate, region family); each precision group only
        # quantizes + rescores it. Same structure as the pallas mega
        # kernel (_bc6h_all_kernel).
        if do_r1:
            shared1 = _bc6h_shared_fit(px_f, [ones],
                                       BC6H_MODE_INFO[10][3], signed)
            for row in range(10, 14):
                terr, q_pairs, idx = _bc6h_group_rescore(
                    px_int, [ones], [0], shared1, row, signed)
                err, pairs = _bc6h_transform_fit_t(q_pairs, terr, row,
                                                   signed, nb)
                words = _bc6h_emit(row, 0, pairs, idx, nb)
                best_err, best_words = fold_candidate(best_err,
                                                      best_words,
                                                      err, words)

        if rows2:
            parts_tab = jnp.asarray(PARTITIONS[1])
            fix_tab = jnp.asarray(FIXUPS[1])
            px4 = jnp.concatenate(
                [px_f, jnp.zeros((16, 1, nb), jnp.float32)], axis=1)
            ests = _shape_estimates_table(px4, 1, 3, n_shapes=32,
                                          off_axis=True, axis_w=0.0)
            cands = []
            for s_blk in _top_k_shapes(ests, BC7_SHAPE_CANDIDATES):
                pmask = parts_tab[s_blk].T
                mask_list = [pmask == 0, pmask == 1]
                anchors = [0, fix_tab[s_blk, 1].astype(jnp.int32)]
                shared = _bc6h_shared_fit(px_f, mask_list,
                                          BC6H_MODE_INFO[0][3], signed)
                cands.append((s_blk, mask_list, anchors, shared))
            for rows in _bc6h_row_groups(rows2):
                rescored = []
                for s_blk, mask_list, anchors, shared in cands:
                    terr, q_pairs, idx = _bc6h_group_rescore(
                        px_int, mask_list, anchors, shared, rows[0],
                        signed)
                    rescored.append((s_blk, terr, q_pairs, idx))
                for row in rows:
                    for s_blk, terr, q_pairs, idx in rescored:
                        err, pairs = _bc6h_transform_fit_t(
                            q_pairs, terr, row, signed, nb)
                        words = _bc6h_emit(row, s_blk.astype(jnp.uint32),
                                           pairs, idx, nb)
                        best_err, best_words = fold_candidate(
                            best_err, best_words, err, words)
        return lax.bitcast_convert_type(best_words, jnp.uint8).reshape(
            nb, 16)

    def eval_one(mask_list, anchors, row, s_blk):
        err, pairs, idx = _bc6h_eval_candidate(
            px_int, px_f, mask_list, anchors, row, signed)
        return err, _bc6h_emit(row, s_blk, pairs, idx, nb)

    # 1-region modes (rows 10-13): one candidate each
    for row in (range(10, 14) if do_r1 else ()):
        err, words = eval_one([ones], [0], row, 0)
        best_err, best_words = fold_candidate(best_err, best_words,
                                              err, words)

    # 2-region modes (rows 0-9): shared estimate over the 32 BC6H shapes,
    # then full refinement of the best BC7_SHAPE_CANDIDATES shapes per row.
    # px_f here is [16, 3, NB]; pad a zero alpha plane for the estimator.
    parts_tab = jnp.asarray(PARTITIONS[1])
    fix_tab = jnp.asarray(FIXUPS[1])
    px4 = jnp.concatenate([px_f, jnp.zeros((16, 1, nb), jnp.float32)], axis=1)
    # axis_w=0: the HDR probe measured best at the pure off-axis residual
    ests = _shape_estimates_table(px4, 1, 3, n_shapes=32, off_axis=True,
                                  axis_w=0.0)
    shape_picks = _top_k_shapes(ests, BC7_SHAPE_CANDIDATES)
    for row in rows2:
        for s_blk in shape_picks:
            pmask = parts_tab[s_blk].T                   # [16, NB]
            mask_list = [pmask == 0, pmask == 1]
            anchors = [0, fix_tab[s_blk, 1].astype(jnp.int32)]
            err, words = eval_one(mask_list, anchors, row,
                                  s_blk.astype(jnp.uint32))
            best_err, best_words = fold_candidate(best_err, best_words,
                                                  err, words)

    return lax.bitcast_convert_type(best_words, jnp.uint8).reshape(nb, 16)
