"""Pallas TPU kernel vs jnp reference (interpret mode on CPU).

The pallas path is only taken on real TPUs; these tests run the kernel
through the Pallas interpreter and require bit-exact agreement with the
jnp implementation in bc67.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from directxtex_tpu.bc import bc67
from directxtex_tpu.bc.pallas_kernels import assign_indices_pallas


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    nb = 700  # deliberately not a multiple of the kernel tile
    return (jnp.asarray(rng.integers(0, 256, (16, 4, nb)).astype(np.int32)),
            jnp.asarray(rng.integers(0, 256, (4, nb)).astype(np.int32)),
            jnp.asarray(rng.integers(0, 256, (4, nb)).astype(np.int32)),
            jnp.asarray(rng.random((16, nb)) > 0.3))


@pytest.mark.parametrize("prec", [2, 3, 4])
def test_assign_indices_matches_reference(data, prec):
    px, u0, u1, mask = data
    idx_p, err_p = assign_indices_pallas(px, u0, u1, mask, prec,
                                         interpret=True)
    idx_r, err_r = bc67._assign_indices_t(px, u0, u1, prec, mask)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(err_p), np.asarray(err_r),
                               rtol=1e-6, atol=1e-3)


def test_assign_indices_channel_ranges(data):
    px, u0, u1, mask = data
    # RGB-only (dual-index color pass)
    idx_p, _ = assign_indices_pallas(px, u0, u1, mask, 2, ch_start=0,
                                     ch_end=3, interpret=True)
    idx_r, _ = bc67._assign_indices_t(px, u0, u1, 2, mask, channels=3)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))


@pytest.mark.parametrize("mode_id", [4, 5])
@pytest.mark.parametrize("im", [0, 1])
def test_dual_eval_matches_reference(mode_id, im):
    from directxtex_tpu.bc.pallas_kernels import dual_eval_pallas

    if mode_id == 5 and im == 1:
        pytest.skip("mode 5 has no index-mode bit")
    rng = np.random.default_rng(7)
    nb = 600
    px_i = jnp.asarray(rng.integers(0, 256, (16, 4, nb)).astype(np.int32))
    px_f = px_i.astype(jnp.float32)

    q0p, q1p, cip, aip, errp = dual_eval_pallas(px_i, mode_id, im,
                                                interpret=True)
    q0r, q1r, _, _, cir, air, errr = bc67._dual_eval_ref(
        px_i, px_f, mode_id, im)
    np.testing.assert_array_equal(np.asarray(q0p), np.asarray(q0r))
    np.testing.assert_array_equal(np.asarray(q1p), np.asarray(q1r))
    np.testing.assert_array_equal(np.asarray(cip), np.asarray(cir))
    np.testing.assert_array_equal(np.asarray(aip), np.asarray(air))
    np.testing.assert_allclose(np.asarray(errp), np.asarray(errr),
                               rtol=1e-5, atol=1e-2)


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


@pytest.mark.parametrize("partitions,n_shapes", [(1, 64), (2, 64), (2, 16)])
def test_shape_topk_kernel_matches_jnp(partitions, n_shapes):
    from directxtex_tpu.bc.pallas_kernels import partition_shapes_pallas
    px_i, px_f = _mk_blocks(seed=21)
    ests = bc67._shape_estimates_table(px_f, partitions, 4)[:n_shapes]
    ref = np.stack([np.asarray(s) for s in bc67._top_k_shapes(ests, 4)])
    got = np.asarray(partition_shapes_pallas(px_i, partitions, n_shapes, 4,
                                             4, interpret=True))
    # float associativity (XLA FMA contraction vs interpreter) may flip
    # near-tie rankings on a few blocks
    mismatch = (got != ref).any(axis=0)
    assert mismatch.mean() < 0.05, mismatch.mean()
