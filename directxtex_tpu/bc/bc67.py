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


def _decode_bc7_mode(words: jnp.ndarray, mode: int) -> jnp.ndarray:
    """Decode ALL blocks assuming `mode`; [NB, 16, 4] u8 texels (int32)."""
    m = _BC7_MODES[mode]
    nb = words.shape[0]
    n_ep = (m.partitions + 1) * 2
    bit = mode + 1

    shape = _get_bits_static(words, bit, m.partition_bits).astype(jnp.int32)
    bit += m.partition_bits
    rotation = _get_bits_static(words, bit, m.rotation_bits).astype(jnp.int32)
    bit += m.rotation_bits
    index_mode = _get_bits_static(words, bit, m.index_mode_bits).astype(jnp.int32)
    bit += m.index_mode_bits

    # endpoints, channel-major
    ep = jnp.zeros((nb, n_ep, 4), jnp.int32)
    for ch in range(4):
        prec = m.rgba_prec[ch]
        if prec == 0:
            ep = ep.at[:, :, ch].set(255)
            continue
        for e in range(n_ep):
            v = _get_bits_static(words, bit, prec).astype(jnp.int32)
            ep = ep.at[:, e, ch].set(v)
            bit += prec

    # p-bits
    if m.p_bits:
        pbits = []
        for i in range(m.p_bits):
            pbits.append(_get_bits_static(words, bit, 1).astype(jnp.int32))
            bit += 1
        for e in range(n_ep):
            pi = e * m.p_bits // n_ep
            for ch in range(4):
                if m.rgba_prec[ch] != m.rgba_prec_p[ch]:
                    ep = ep.at[:, e, ch].set((ep[:, e, ch] << 1) | pbits[pi])

    # unquantize with the with-P precision
    for ch in range(4):
        prec = m.rgba_prec_p[ch]
        if prec == 0:
            continue
        ep = ep.at[:, :, ch].set(_unquantize(ep[:, :, ch], prec))

    # color indices (anchor-compressed, shape-dependent offsets)
    offs_t, nbits_t = _get_index_layout(m.partitions, m.index_prec)
    offs = jnp.asarray(offs_t)[shape] + bit          # [NB, 16]
    nb1 = jnp.asarray(nbits_t)[shape]
    total_index1 = int(offs_t[0, 15] + nbits_t[0, 15])  # same for all shapes
    w1 = _get_bits_dynamic(words, offs, nb1).astype(jnp.int32)
    bit += total_index1

    if m.index_prec2:
        offs2_t, nbits2_t = _get_index_layout(0, m.index_prec2)
        offs2 = jnp.asarray(offs2_t)[jnp.zeros_like(shape)] + bit
        nb2 = jnp.asarray(nbits2_t)[jnp.zeros_like(shape)]
        w2 = _get_bits_dynamic(words, offs2, nb2).astype(jnp.int32)
    else:
        w2 = w1

    # region per pixel
    region = jnp.asarray(PARTITIONS[m.partitions])[shape]  # [NB, 16]
    e0 = jnp.take_along_axis(ep, (region * 2)[:, :, None], axis=1)
    e1 = jnp.take_along_axis(ep, (region * 2 + 1)[:, :, None], axis=1)

    wc_tab = jnp.asarray(_WEIGHTS[m.index_prec])
    wcol = wc_tab[w1]
    if m.index_prec2:
        wa_tab = jnp.asarray(_WEIGHTS[m.index_prec2])
        walp = wa_tab[w2]
        # index_mode swaps which index set drives color vs alpha
        swap = index_mode[:, None] == 1
        wc = jnp.where(swap, walp, wcol)
        wa = jnp.where(swap, wcol, walp)
    else:
        wc = wcol
        wa = wcol

    rgb = _interp(e0[:, :, :3], e1[:, :, :3], wc[:, :, None])
    a = _interp(e0[:, :, 3], e1[:, :, 3], wa)
    out = jnp.concatenate([rgb, a[:, :, None]], axis=2)  # [NB, 16, 4] int32

    # rotation: swap one channel with alpha (rotations are exclusive)
    if m.rotation_bits:
        rot = rotation[:, None]
        r, g, b, al = out[..., 0], out[..., 1], out[..., 2], out[..., 3]
        nr = jnp.where(rot == 1, al, r)
        ng = jnp.where(rot == 2, al, g)
        nbl = jnp.where(rot == 3, al, b)
        na = jnp.where(rot == 1, r, jnp.where(rot == 2, g,
                       jnp.where(rot == 3, b, al)))
        out = jnp.stack([nr, ng, nbl, na], axis=-1)
    return out


def decode_bc7(blocks: jnp.ndarray) -> jnp.ndarray:
    """[NB, 16] u8 -> [NB, 16, 4] f32 (D3DXDecodeBC7, bit-exact)."""
    words = _bytes_to_words(blocks)
    b = (words[:, 0] & 0xFF).astype(jnp.int32)
    # mode = index of the lowest set bit of byte 0; all-zero -> reserved
    mode = jnp.full_like(b, 8)
    for m in range(8):
        hit = (b & (1 << m)) != 0
        mode = jnp.where((mode == 8) & hit, m, mode)

    results = [_decode_bc7_mode(words, m) for m in range(8)]
    stacked = jnp.stack(results)  # [8, NB, 16, 4]
    safe_mode = jnp.clip(mode, 0, 7)
    out = jnp.take_along_axis(
        stacked, safe_mode[None, :, None, None].astype(jnp.int32), axis=0)[0]
    # reserved mode: transparent black (BC6HBC7.cpp:2781)
    out = jnp.where((mode >= 8)[:, None, None], 0, out)
    return jnp.asarray(_T255)[jnp.clip(out, 0, 255)]


# ---------------------------------------------------------------------------
# BC7 encode / BC6H (land in subsequent stages)
# ---------------------------------------------------------------------------

def encode_bc7(blocks: jnp.ndarray, flags: int = 0) -> jnp.ndarray:
    raise NotImplementedError("BC7 encode lands with the next bc67 stage")


def decode_bc6h(blocks: jnp.ndarray, signed: bool) -> jnp.ndarray:
    raise NotImplementedError("BC6H decode lands with the next bc67 stage")


def encode_bc6h(blocks: jnp.ndarray, signed: bool) -> jnp.ndarray:
    raise NotImplementedError("BC6H encode lands with the next bc67 stage")
