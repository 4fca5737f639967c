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
