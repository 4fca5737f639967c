"""Pallas TPU kernel vs jnp reference (interpret mode on CPU).

The pallas path is only taken on real TPUs; these tests run the kernel
through the Pallas interpreter and require bit-exact agreement with the
jnp implementation in bc67.py.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from directxtex_tpu.bc import bc67


@pytest.mark.parametrize("K", [4, 8, 16])
def test_pal_weight_matches_tables(K):
    from directxtex_tpu.bc.bc67_tables import WEIGHTS2, WEIGHTS3, WEIGHTS4
    from directxtex_tpu.bc import pallas_kernels, bc67
    tab = {4: WEIGHTS2, 8: WEIGHTS3, 16: WEIGHTS4}[K]
    ks = jnp.arange(K)
    np.testing.assert_array_equal(np.asarray(pallas_kernels._pal_weight(ks, K)),
                                  np.asarray(tab))
    np.testing.assert_array_equal(np.asarray(bc67._pal_weight(ks, K)),
                                  np.asarray(tab))


def _mk_blocks(nb=300, seed=11, alpha=True):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (16, 4, nb)).astype(np.int32)
    if not alpha:
        px[:, 3, :] = 255
    return jnp.asarray(px), jnp.asarray(px.astype(np.float32))


def _assert_equivalent(err_p, err_r, words_p, words_r, px_i):
    """Mega-kernel vs jnp path: identical math, but XLA-CPU FMA contraction
    can flip near-tie candidate picks vs the pallas interpreter. Require
    exact words for the overwhelming majority and, for the rare tie flips,
    errors within 0.2% and a decode that is as good as the reference's."""
    err_p, err_r = np.asarray(err_p), np.asarray(err_r)
    words_p, words_r = np.asarray(words_p), np.asarray(words_r)
    differ = np.any(words_p != words_r, axis=1)
    nb = len(differ)
    assert differ.sum() <= max(2, nb // 50), f"{differ.sum()}/{nb} differ"
    np.testing.assert_allclose(err_p, err_r, rtol=1e-2, atol=2.0)
    if differ.any():
        blocks = np.transpose(np.asarray(px_i), (2, 0, 1)).astype(np.float32)
        dec_p = np.asarray(bc67.decode_bc7(
            words_p[differ].astype(np.uint32).view(np.uint8))) * 255.0
        dec_r = np.asarray(bc67.decode_bc7(
            words_r[differ].astype(np.uint32).view(np.uint8))) * 255.0
        src = blocks[differ]
        mse_p = ((dec_p - src) ** 2).sum(axis=(1, 2))
        mse_r = ((dec_r - src) ** 2).sum(axis=(1, 2))
        np.testing.assert_allclose(mse_p, mse_r, rtol=2e-2, atol=4.0)


@pytest.mark.parametrize("mode_id", [0, 1, 2, 3, 7])
def test_partition_mode_megakernel_matches_jnp(mode_id):
    from directxtex_tpu.bc.pallas_kernels import partition_mode_pallas
    from directxtex_tpu.bc.bc67 import (
        BC7_SHAPE_CANDIDATES, FIXUPS, PARTITIONS, _BC7_MODES,
        _shape_estimates_table, _top_k_shapes)

    px_i, px_f = _mk_blocks(alpha=(mode_id == 7))
    m = _BC7_MODES[mode_id]
    ests = _shape_estimates_table(px_f, m.partitions, 4)
    ests = ests[:1 << m.partition_bits]
    err_r, words_r = bc67._try_partition_mode(px_i, px_f, mode_id,
                                              ests=ests)

    s_blks = jnp.stack(_top_k_shapes(ests, BC7_SHAPE_CANDIDATES))
    err_p, words_p = partition_mode_pallas(
        px_i, s_blks.astype(jnp.int32), mode_id, 1 << m.partition_bits,
        interpret=True)
    _assert_equivalent(err_p, err_r, words_p, words_r, px_i)


@pytest.mark.parametrize("mode_id", [4, 5, 6])
def test_single_modes_megakernel_matches_jnp(mode_id):
    from directxtex_tpu.bc.pallas_kernels import single_modes_pallas

    px_i, px_f = _mk_blocks(seed=13)
    err_r, words_r = bc67._try_single_mode(px_i, px_f, mode_id)
    out = single_modes_pallas(px_i, interpret=True)
    err_p, words_p = out[mode_id]
    _assert_equivalent(err_p, err_r, words_p, words_r, px_i)


@pytest.mark.parametrize("partitions,n_shapes,off_axis",
                         [(1, 64, False), (2, 64, False), (2, 16, False),
                          (1, 32, True)])
def test_shape_topk_kernel_matches_jnp(partitions, n_shapes, off_axis):
    from directxtex_tpu.bc.pallas_kernels import partition_shapes_pallas
    px_i, px_f = _mk_blocks(seed=21)
    ests = bc67._shape_estimates_table(px_f, partitions, 4,
                                       off_axis=off_axis)[:n_shapes]
    ref = np.stack([np.asarray(s) for s in bc67._top_k_shapes(ests, 4)])
    got = np.asarray(partition_shapes_pallas(px_i, partitions, n_shapes, 4,
                                             4, interpret=True,
                                             off_axis=off_axis))
    # float associativity (XLA FMA contraction vs interpreter) may flip
    # near-tie rankings on a few blocks
    mismatch = (got != ref).any(axis=0)
    assert mismatch.mean() < 0.05, mismatch.mean()


@pytest.mark.parametrize("signed", [False, True])
def test_bc6h_megakernels_match_jnp(signed):
    from directxtex_tpu.bc.pallas_kernels import (
        bc6h_1region_pallas, bc6h_2region_pallas, partition_shapes_pallas)
    from directxtex_tpu.bc.bc67 import (
        BC7_SHAPE_CANDIDATES, FIXUPS, PARTITIONS, _bc6h_emit,
        _bc6h_eval_candidate, _f16_to_int, _shape_estimates_table,
        _top_k_shapes)

    rng = np.random.default_rng(5)
    nb = 200
    scale = 8.0 if not signed else 4.0
    rgb = rng.random((nb, 16, 3)).astype(np.float32) * scale
    if signed:
        rgb = rgb - scale / 2
    px_int = _f16_to_int(jnp.asarray(np.transpose(rgb, (1, 2, 0))), signed)
    px_f = px_int.astype(jnp.float32)

    # 1-region rows folded
    ones = jnp.ones((16, nb), bool)
    be = jnp.full((nb,), jnp.inf, jnp.float32)
    bw = jnp.zeros((nb, 4), jnp.uint32)
    for row in range(10, 14):
        err, pairs, idx = _bc6h_eval_candidate(px_int, px_f, [ones], [0],
                                               row, signed)
        words = _bc6h_emit(row, 0, pairs, idx, nb)
        bt = err < be
        be = jnp.minimum(err, be)
        bw = jnp.where(bt[:, None], words, bw)
    err_p, words_p = bc6h_1region_pallas(px_int, signed, interpret=True)
    _assert_equivalent_bc6h(err_p, err_r=be, words_p=words_p, words_r=bw)

    # one 2-region row (row 2: transformed deltas; row 9: untransformed)
    px4 = jnp.concatenate([px_f, jnp.zeros((16, 1, nb), jnp.float32)],
                          axis=1)
    ests = _shape_estimates_table(px4, 1, 3, n_shapes=32)
    picks = _top_k_shapes(ests, BC7_SHAPE_CANDIDATES)
    parts_tab = jnp.asarray(PARTITIONS[1])
    fix_tab = jnp.asarray(FIXUPS[1])
    px4i = jnp.concatenate([px_int, jnp.zeros((16, 1, nb), jnp.int32)],
                           axis=1)
    s_blks = jnp.stack(picks)
    for row in (2, 9):
        be = jnp.full((nb,), jnp.inf, jnp.float32)
        bw = jnp.zeros((nb, 4), jnp.uint32)
        for s_blk in picks:
            pmask = parts_tab[s_blk].T
            mask_list = [pmask == 0, pmask == 1]
            anchors = [0, fix_tab[s_blk, 1].astype(jnp.int32)]
            err, pairs, idx = _bc6h_eval_candidate(px_int, px_f, mask_list,
                                                   anchors, row, signed)
            words = _bc6h_emit(row, s_blk.astype(jnp.uint32), pairs, idx, nb)
            bt = err < be
            bw = jnp.where(bt[:, None], words, bw)
            be = jnp.minimum(err, be)
        err_p, words_p = bc6h_2region_pallas(px_int, s_blks, (row,), signed,
                                             interpret=True)
        _assert_equivalent_bc6h(err_p, be, words_p, bw)

    # grouped rows (3/4/5 share precision): fold matches per-row jnp folds
    be = jnp.full((nb,), jnp.inf, jnp.float32)
    bw = jnp.zeros((nb, 4), jnp.uint32)
    for row in (2, 3, 4):
        for s_blk in picks:
            pmask = parts_tab[s_blk].T
            mask_list = [pmask == 0, pmask == 1]
            anchors = [0, fix_tab[s_blk, 1].astype(jnp.int32)]
            err, pairs, idx = _bc6h_eval_candidate(px_int, px_f, mask_list,
                                                   anchors, row, signed)
            words = _bc6h_emit(row, s_blk.astype(jnp.uint32), pairs, idx, nb)
            bt = err < be
            bw = jnp.where(bt[:, None], words, bw)
            be = jnp.minimum(err, be)
    err_p, words_p = bc6h_2region_pallas(px_int, s_blks, (2, 3, 4), signed,
                                         interpret=True)
    _assert_equivalent_bc6h(err_p, be, words_p, bw)


def _assert_equivalent_bc6h(err_p, err_r, words_p, words_r):
    err_p, err_r = np.asarray(err_p), np.asarray(err_r)
    words_p, words_r = np.asarray(words_p), np.asarray(words_r)
    # words only matter where the candidate fit (err finite): the jnp fold
    # leaves unfit blocks zeroed while the kernel emits them anyway, and
    # encode-level selection never picks err=inf rows
    fin_r = np.isfinite(err_r)
    differ = np.any(words_p != words_r, axis=1) & fin_r
    nb = len(differ)
    assert differ.sum() <= max(2, nb // 50), f"{differ.sum()}/{nb} differ"
    fin = np.isfinite(err_r) | np.isfinite(err_p)
    both = np.isfinite(err_r) & np.isfinite(err_p)
    assert (both == fin).all()
    np.testing.assert_allclose(err_p[both], err_r[both], rtol=1e-2,
                               atol=2.0)


def test_bc7_single_dispatch_3subset_matches_jnp():
    """Modes 0/2 (BC_FLAGS_USE_3SUBSETS) inside the one-dispatch kernel:
    3-region content so the 3-subset modes actually win some blocks."""
    from directxtex_tpu.bc.pallas_kernels import (bc7_encode_pallas,
                                                  bc7_refine_pallas)

    rng = np.random.default_rng(41)
    nb = 64
    blocks = rng.random((nb, 16, 4)).astype(np.float32)
    # three flat regions per block (partition-shaped): rows 0-1 / 2 / 3
    lv = rng.random((nb, 3, 1, 4)).astype(np.float32)
    b4 = blocks.reshape(nb, 4, 4, 4)
    b4[:, :2] = lv[:, 0:1]
    b4[:, 2] = lv[:, 1]
    b4[:, 3] = lv[:, 2]
    blocks = np.clip(b4.reshape(nb, 16, 4), 0, 1)
    blocks[..., 3] = 1.0
    bj = jnp.asarray(blocks)
    px_i = jnp.clip(jnp.transpose(bj, (1, 2, 0)) * 255.0 + 0.01,
                    0.0, 255.0).astype(jnp.int32)

    ref = np.asarray(bc67.encode_bc7(bj, flags=0x80000, opaque=True))
    modes = (0, 2, 1, 3, 5, 6, 4)
    err_p, words_p = bc7_encode_pallas(px_i, modes, interpret=True)
    # default tier: MOMENT ladder, refine scope skips mode 6 (encode_bc7)
    words_p = bc7_refine_pallas(px_i, words_p, bc67.LADDER_MOMENT,
                                modes=(0, 2, 1, 3, 5, 4), interpret=True)
    got = np.asarray(words_p).view(np.uint8).reshape(nb, 16)

    differ = np.any(got != ref, axis=1)
    assert differ.sum() <= max(2, nb // 25), f"{differ.sum()}/{nb}"
    if differ.any():
        src = np.transpose(np.asarray(px_i), (2, 0, 1)).astype(np.float32)
        dec_p = np.asarray(bc67.decode_bc7(got[differ])) * 255.0
        dec_r = np.asarray(bc67.decode_bc7(ref[differ])) * 255.0
        mse_p = ((dec_p - src[differ]) ** 2).sum(axis=(1, 2))
        mse_r = ((dec_r - src[differ]) ** 2).sum(axis=(1, 2))
        np.testing.assert_allclose(mse_p, mse_r, rtol=2e-2, atol=4.0)


@pytest.mark.parametrize("opaque,share2sub,kb",
                         [(False, True, False), (True, True, False),
                          (True, False, False), (True, True, True)])
def test_bc7_single_dispatch_matches_jnp(opaque, share2sub, kb):
    """bc7_encode_pallas (one-dispatch full encode) vs the full jnp
    encode_bc7 path at identical settings. Parametrized over the r5
    shared-fit lever (BC7_SHARED2SUB) so both the shared 2-subset
    trajectory and the independent per-mode evaluation stay
    twin-covered, and over BC7_SHARED_KEEPBETTER so the retired float
    keep-better guard keeps a bit-exact twin too (it is the documented
    fallback if a future corpus needs it)."""
    from directxtex_tpu.bc.pallas_kernels import (bc7_encode_pallas,
                                                  bc7_refine_pallas)

    px_i, _ = _mk_blocks(seed=31, alpha=not opaque)
    nb = px_i.shape[2]
    blocks = jnp.transpose(px_i, (2, 0, 1)).astype(jnp.float32) / 255.0

    prev = bc67.BC7_SHARED2SUB
    prev_kb = bc67.BC7_SHARED_KEEPBETTER
    try:
        bc67.BC7_SHARED2SUB = share2sub
        bc67.BC7_SHARED_KEEPBETTER = kb
        ref = np.asarray(bc67.encode_bc7(blocks, opaque=opaque))
        modes = (1, 3, 5, 6, 4) if opaque else (1, 3, 5, 6, 7, 4)
        # the kernel reads BC7_SHARED_KEEPBETTER at trace time
        err_p, words_p = bc7_encode_pallas(px_i, modes, interpret=True,
                                           share2sub=share2sub)
    finally:
        bc67.BC7_SHARED2SUB = prev
        bc67.BC7_SHARED_KEEPBETTER = prev_kb
    # default tier: MOMENT ladder, refine scope skips mode 6 (encode_bc7)
    words_p = bc7_refine_pallas(px_i, words_p, bc67.LADDER_MOMENT,
                                modes=tuple(m for m in modes if m != 6),
                                interpret=True)
    got = np.asarray(words_p).view(np.uint8).reshape(nb, 16)

    differ = np.any(got != ref, axis=1)
    # float associativity (XLA FMA contraction vs interpreter) may flip
    # near-tie mode/candidate picks on a few blocks; require the decoded
    # quality of the disagreeing blocks to match
    assert differ.sum() <= max(2, nb // 25), f"{differ.sum()}/{nb}"
    if differ.any():
        src = np.transpose(np.asarray(px_i), (2, 0, 1)).astype(np.float32)
        dec_p = np.asarray(bc67.decode_bc7(got[differ])) * 255.0
        dec_r = np.asarray(bc67.decode_bc7(ref[differ])) * 255.0
        mse_p = ((dec_p - src[differ]) ** 2).sum(axis=(1, 2))
        mse_r = ((dec_r - src[differ]) ** 2).sum(axis=(1, 2))
        np.testing.assert_allclose(mse_p, mse_r, rtol=2e-2, atol=4.0)


@pytest.mark.parametrize("unified", [True, False])
def test_bc7_refine_kernel_matches_jnp(unified):
    """bc7_refine_pallas (winner-refine dispatch) vs refine_bc7_words,
    bit-exact: unpack, ladder, re-assign, anchor fixes and re-emit all
    run the same exact-in-f32 integer math on both sides. Parametrized
    over the unified A/B lever so BOTH the per-lane-precision unified
    passes (r4 production default) and the per-mode passes stay
    twin-covered."""
    from directxtex_tpu.bc.pallas_kernels import bc7_refine_pallas

    rng = np.random.default_rng(11)
    nb = 192
    blocks = rng.random((nb, 16, 4)).astype(np.float32)
    blocks[:nb // 2, :, 3] = 1.0          # mixed alpha: all mode families
    bj = jnp.asarray(blocks)
    px_i = jnp.clip(jnp.transpose(bj, (1, 2, 0)) * 255.0 + 0.01,
                    0.0, 255.0).astype(jnp.int32)
    bc = np.asarray(bc67.encode_bc7(bj))
    words = jnp.asarray(
        np.ascontiguousarray(bc).view(np.uint32).reshape(-1, 4))

    modes = (1, 3, 5, 6, 7, 4)
    ref = np.asarray(bc67.refine_bc7_words(px_i, words, bc67.LADDER_FULL,
                                           modes=modes))
    got = np.asarray(bc7_refine_pallas(px_i, words, bc67.LADDER_FULL,
                                       modes=modes, interpret=True,
                                       unified=unified))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("unified", [True, False])
def test_bc7_refine_moment_ladder_matches_jnp(unified):
    """LADDER_MOMENT (analytic joint-step ladder, r4) twin equivalence:
    all moment math is exact-in-f32 integers/64ths, so the kernel must
    reproduce refine_bc7_words bit-for-bit. Parametrized over the
    unified A/B lever (like the LADDER_FULL test) so the per-mode
    moment path (_k_moment_subset via modes 1/3/7/4/5, unified=False)
    keeps twin coverage too."""
    from directxtex_tpu.bc.pallas_kernels import bc7_refine_pallas

    rng = np.random.default_rng(19)
    nb = 192
    blocks = rng.random((nb, 16, 4)).astype(np.float32)
    blocks[:nb // 2, :, 3] = 1.0          # mixed alpha: all mode families
    bj = jnp.asarray(blocks)
    px_i = jnp.clip(jnp.transpose(bj, (1, 2, 0)) * 255.0 + 0.01,
                    0.0, 255.0).astype(jnp.int32)
    bc = np.asarray(bc67.encode_bc7(bj))
    words = jnp.asarray(
        np.ascontiguousarray(bc).view(np.uint32).reshape(-1, 4))

    modes = (1, 3, 5, 7, 4)
    ref = np.asarray(bc67.refine_bc7_words(px_i, words,
                                           bc67.LADDER_MOMENT,
                                           modes=modes))
    got = np.asarray(bc7_refine_pallas(px_i, words, bc67.LADDER_MOMENT,
                                       modes=modes, interpret=True,
                                       unified=unified))
    np.testing.assert_array_equal(got, ref)


def test_bc7_refine_kernel_alpha_weight_matches_jnp():
    """Refine with TEX_COMPRESS_BC7_ALPHA_WEIGHT != 1: the per-lane
    rotated-alpha weight rows must agree between kernel and jnp."""
    from directxtex_tpu.bc.pallas_kernels import bc7_refine_pallas

    rng = np.random.default_rng(13)
    nb = 96
    blocks = rng.random((nb, 16, 4)).astype(np.float32)
    bj = jnp.asarray(blocks)
    px_i = jnp.clip(jnp.transpose(bj, (1, 2, 0)) * 255.0 + 0.01,
                    0.0, 255.0).astype(jnp.int32)
    bc = np.asarray(bc67.encode_bc7(bj, alpha_weight=2.0))
    words = jnp.asarray(
        np.ascontiguousarray(bc).view(np.uint32).reshape(-1, 4))

    modes = (1, 3, 5, 6, 7, 4)
    ref = np.asarray(bc67.refine_bc7_words(px_i, words, bc67.LADDER_FULL,
                                           aw=2.0, modes=modes))
    got = np.asarray(bc7_refine_pallas(px_i, words, bc67.LADDER_FULL,
                                       aw=2.0, modes=modes,
                                       interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not os.environ.get("DXT_HEAVY_TESTS"),
                    reason="three big-kernel CPU compiles; the fused "
                           "tail is a measured-slower optional path "
                           "(benchmarks/profile_fused.py) not used by "
                           "production (DXT_HEAVY_TESTS=1 to force)")
def test_bc7_fused_ladder_matches_two_dispatch():
    """bc7_encode_pallas(ladder=L) — the winner-ladder fused into the
    search kernel's tail — must be bit-identical to the two-dispatch
    chain (search kernel + bc7_refine_pallas at the same ladder/modes):
    same math, same fold order, just one dispatch."""
    from directxtex_tpu.bc.pallas_kernels import (bc7_encode_pallas,
                                                  bc7_refine_pallas)

    px_i, _ = _mk_blocks(seed=43, alpha=False)
    modes = (1, 3, 5, 6, 4)
    _, words_s = bc7_encode_pallas(px_i, modes, interpret=True)
    ref = np.asarray(bc7_refine_pallas(px_i, words_s, bc67.LADDER_LIGHT,
                                       modes=modes, interpret=True))
    _, words_f = bc7_encode_pallas(px_i, modes, interpret=True,
                                   ladder=bc67.LADDER_LIGHT)
    np.testing.assert_array_equal(np.asarray(words_f), ref)


@pytest.mark.skipif(not os.environ.get("DXT_HEAVY_TESTS"),
                    reason="the second refine pass roughly doubles the "
                           "already-slow CPU compile of the one-dispatch "
                           "kernel chain; verified on TPU via benchmarks/"
                           "verify_bc7_tpu.py (DXT_HEAVY_TESTS=1 to force)")
def test_bc7_single_dispatch_maxq_matches_jnp():
    """Base kernel + bc7_refine_pallas x2 — the BC_FLAGS_MAX_QUALITY
    tier — vs the jnp maxq path (near-tie tolerance applies)."""
    from directxtex_tpu.bc.pallas_kernels import (bc7_encode_pallas,
                                                  bc7_refine_pallas)

    px_i, _ = _mk_blocks(seed=7, alpha=True)
    nb = px_i.shape[2]
    blocks = jnp.transpose(px_i, (2, 0, 1)).astype(jnp.float32) / 255.0

    ref = np.asarray(bc67.encode_bc7(blocks, flags=0x200000, opaque=False))
    modes = (1, 3, 5, 6, 7, 4)
    # maxq keeps the full mode-4 index-mode scope (the default resolves
    # to the im0 cut)
    err_p, words_p = bc7_encode_pallas(px_i, modes, interpret=True,
                                       m4_ims=(0, 1))
    for ladder in (bc67.LADDER_MOMENT, bc67.LADDER_FULL):
        words_p = bc7_refine_pallas(px_i, words_p, ladder,
                                    modes=modes, interpret=True)
    got = np.asarray(words_p).view(np.uint8).reshape(nb, 16)

    differ = np.any(got != ref, axis=1)
    assert differ.sum() <= max(2, nb // 25), f"{differ.sum()}/{nb}"
    if differ.any():
        src = np.transpose(np.asarray(px_i), (2, 0, 1)).astype(np.float32)
        dec_p = np.asarray(bc67.decode_bc7(got[differ])) * 255.0
        dec_r = np.asarray(bc67.decode_bc7(ref[differ])) * 255.0
        mse_p = ((dec_p - src[differ]) ** 2).sum(axis=(1, 2))
        mse_r = ((dec_r - src[differ]) ** 2).sum(axis=(1, 2))
        np.testing.assert_allclose(mse_p, mse_r, rtol=2e-2, atol=4.0)


@pytest.mark.skipif(not os.environ.get("DXT_HEAVY_TESTS"),
                    reason="CPU XLA needs >10min to compile the whole-BC6H "
                           "mega kernel; verified on TPU via "
                           "benchmarks/verify_bc6h_tpu.py (DXT_HEAVY_TESTS=1 "
                           "to force)")
@pytest.mark.parametrize("signed", [False, True])
def test_bc6h_single_dispatch_matches_jnp(signed):
    """bc6h_encode_pallas (one-dispatch full encode) vs the full jnp
    encode_bc6h path at identical settings."""
    from directxtex_tpu.bc.pallas_kernels import bc6h_encode_pallas
    from directxtex_tpu.bc.bc67 import _f16_to_int

    rng = np.random.default_rng(17)
    nb = 200
    scale = 8.0 if not signed else 4.0
    rgb = rng.random((nb, 16, 3)).astype(np.float32) * scale
    if signed:
        rgb = rgb - scale / 2
    blocks = np.concatenate([rgb, np.ones((nb, 16, 1), np.float32)], -1)

    ref = np.asarray(bc67.encode_bc6h(jnp.asarray(blocks), signed))
    px_int = _f16_to_int(jnp.asarray(np.transpose(rgb, (1, 2, 0))), signed)
    _, words_p = bc6h_encode_pallas(px_int, signed, interpret=True)
    got = np.ascontiguousarray(np.asarray(words_p)).view(
        np.uint8).reshape(nb, 16)

    differ = np.any(got != ref, axis=1)
    # float associativity may flip near-tie row/candidate picks
    assert differ.sum() <= max(2, nb // 25), f"{differ.sum()}/{nb}"
    if differ.any():
        dec_p = bc67.decode_bc6h(got[differ], signed)
        dec_r = bc67.decode_bc6h(ref[differ], signed)
        src = rgb[differ]
        mse_p = ((np.asarray(dec_p)[..., :3] - src) ** 2).sum(axis=(1, 2))
        mse_r = ((np.asarray(dec_r)[..., :3] - src) ** 2).sum(axis=(1, 2))
        np.testing.assert_allclose(mse_p, mse_r, rtol=5e-2, atol=1e-4)


@pytest.mark.parametrize("signed,tier", [(False, "light"), (True, "light"),
                                         (False, "mid"), (True, "mid")])
def test_bc6h_refine_pallas_matches_jnp(signed, tier):
    """bc6h_refine_pallas (winner-ladder dispatch) vs the jnp twin
    refine_bc6h_words on mixed 1-/2-region winner words (the maxq path,
    OptimizeEndPoints/PerturbOne analog BC6HBC7.cpp:2081-2226).
    tier="mid" covers the r5 BC6H_LADDER_MID production config."""
    from directxtex_tpu.bc.pallas_kernels import bc6h_refine_pallas
    from directxtex_tpu.bc.bc67 import (
        BC6H_LADDER_LIGHT, BC6H_LADDER_MAXQ, BC6H_LADDER_MID,
        _f16_to_int, refine_bc6h_words)
    from jax import lax

    rng = np.random.default_rng(23)
    nb = 160
    scale = 8.0 if not signed else 4.0
    rgb = rng.random((nb, 16, 3)).astype(np.float32) * scale
    # two-region structure on half the blocks so 2-region rows win some
    rgb[: nb // 2, 8:, :] += scale
    if signed:
        rgb = rgb - scale / 2
    blocks = np.concatenate([rgb, np.ones((nb, 16, 1), np.float32)], -1)

    words8 = bc67.encode_bc6h(jnp.asarray(blocks), signed)
    w32 = lax.bitcast_convert_type(
        words8.reshape(nb, 4, 4), jnp.uint32)
    px_int = _f16_to_int(jnp.asarray(np.transpose(rgb, (1, 2, 0))), signed)

    if tier == "mid":
        ladder, cross2 = BC6H_LADDER_MID, False   # the r5 mid tier
    elif os.environ.get("DXT_HEAVY_TESTS"):
        ladder, cross2 = BC6H_LADDER_MAXQ, True   # the real maxq config
    else:
        ladder, cross2 = BC6H_LADDER_LIGHT, False  # CPU-compilable slice

    ref = np.asarray(refine_bc6h_words(px_int, w32, ladder, signed,
                                       remap=True, cross2=cross2))
    got = np.asarray(bc6h_refine_pallas(px_int, w32, ladder, signed,
                                        remap=True, cross2=cross2,
                                        interpret=True))
    differ = np.any(got != ref, axis=1)
    # float associativity may flip near-tie accept folds on a few blocks
    assert differ.sum() <= max(2, nb // 50), f"{differ.sum()}/{nb}"


@pytest.mark.parametrize("mode_id", [4, 5, 6, 7])
def test_alpha_weight_kernels_match_jnp(mode_id):
    """aw-weighted kernels vs the jnp path at the same alpha_weight
    (CompressOptions.alphaWeight, scoring-only per BC7Encode.hlsl:241)."""
    px_i, px_f = _mk_blocks(seed=29, alpha=True)
    aw = 4.0
    if mode_id == 7:
        from directxtex_tpu.bc.pallas_kernels import partition_mode_pallas
        from directxtex_tpu.bc.bc67 import (
            BC7_SHAPE_CANDIDATES, _BC7_MODES, _shape_estimates_table,
            _top_k_shapes)
        m = bc67._BC7_MODES[mode_id]
        ests = bc67._shape_estimates_table(px_f, m.partitions, 4)
        ests = ests[:1 << m.partition_bits]
        err_r, words_r = bc67._try_partition_mode(px_i, px_f, mode_id,
                                                  ests=ests, aw=aw)
        s_blks = jnp.stack(bc67._top_k_shapes(ests, 4))
        err_p, words_p = partition_mode_pallas(
            px_i, s_blks.astype(jnp.int32), mode_id, 1 << m.partition_bits,
            interpret=True, aw=aw)
    else:
        from directxtex_tpu.bc.pallas_kernels import single_modes_pallas
        err_r, words_r = bc67._try_single_mode(px_i, px_f, mode_id, aw=aw)
        out = single_modes_pallas(px_i, interpret=True, aw=aw)
        err_p, words_p = out[mode_id]
    _assert_equivalent(err_p, err_r, words_p, words_r, px_i)


@pytest.mark.parametrize("signed,kb", [(False, False), (False, True),
                                       (True, False)])
def test_bc6h_shared_fit_twins_match(signed, kb):
    """_k_bc6h_shared_fit (lane-major fused-subset kernel helper) vs
    bc67._bc6h_shared_fit (per-subset jnp twin), directly — both are
    plain jnp so this covers the BC6H shared-fit trajectory (incl. the
    r5 BC6H_SHARED_KEEPBETTER lever, both settings) without compiling
    the heavy mega kernel. Bitwise-equal endpoints expected: identical
    op order, per-pixel selection only routes the same subset values."""
    from directxtex_tpu.bc.bc67 import _f16_to_int
    from directxtex_tpu.bc.pallas_kernels import _k_bc6h_shared_fit

    rng = np.random.default_rng(29)
    nb = 128
    scale = 8.0 if not signed else 4.0
    rgb = rng.random((nb, 16, 3)).astype(np.float32) * scale
    rgb[: nb // 2, 8:, :] += scale          # two-region structure
    if signed:
        rgb = rgb - scale / 2
    px_int = _f16_to_int(jnp.asarray(np.transpose(rgb, (1, 2, 0))), signed)
    px_f = px_int.astype(jnp.float32)
    # a representative 2-subset partition mask (top half vs bottom half)
    m0 = np.zeros((16, nb), bool)
    m0[:8, :] = True
    masks = [jnp.asarray(m0), jnp.asarray(~m0)]
    xf3 = [px_f[:, c, :] for c in range(3)]

    prev = bc67.BC6H_SHARED_KEEPBETTER
    try:
        bc67.BC6H_SHARED_KEEPBETTER = kb
        ref = bc67._bc6h_shared_fit(px_f, masks, 3, signed)
        got = _k_bc6h_shared_fit(xf3, masks, 3, signed)
        # 1-region scope too (masks=[None] in the kernel helper)
        ones = jnp.ones((16, nb), bool)
        ref1 = bc67._bc6h_shared_fit(px_f, [ones], 4, signed)
        got1 = _k_bc6h_shared_fit(xf3, [None], 4, signed)
    finally:
        bc67.BC6H_SHARED_KEEPBETTER = prev

    for (re0, re1), (ge0, ge1) in zip(ref + ref1, got + got1):
        for c in range(3):
            np.testing.assert_allclose(np.asarray(ge0[c]),
                                       np.asarray(re0)[c], rtol=2e-6,
                                       atol=2e-2)
            np.testing.assert_allclose(np.asarray(ge1[c]),
                                       np.asarray(re1)[c], rtol=2e-6,
                                       atol=2e-2)
