"""Color-primary rotation / PQ tests (texconv -rotatecolor,
Texconv/texconv.cpp:2696-2965)."""

import numpy as np
import pytest

import jax.numpy as jnp

from directxtex_tpu.ops.rotatecolor import (
    ROTATE_COLOR, pq_decode, pq_encode, rotate_color,
)


@pytest.fixture
def rgba():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((8, 8, 4)).astype(np.float32))


@pytest.mark.parametrize("fwd,bwd", [
    (ROTATE_COLOR._709_TO_2020, ROTATE_COLOR._2020_TO_709),
    (ROTATE_COLOR._709_TO_P3D65, ROTATE_COLOR.P3D65_TO_709),
    (ROTATE_COLOR._709_TO_HDR10, ROTATE_COLOR.HDR10_TO_709),
])
def test_rotation_roundtrip(rgba, fwd, bwd):
    out = rotate_color(rotate_color(rgba, fwd), bwd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgba), atol=1e-4)


def test_rotation_preserves_alpha(rgba):
    out = rotate_color(rgba, ROTATE_COLOR._709_TO_2020)
    np.testing.assert_array_equal(np.asarray(out[..., 3]),
                                  np.asarray(rgba[..., 3]))


def test_white_point_maps_to_white():
    # D65 white must be invariant under any primary rotation
    white = jnp.ones((1, 1, 4), jnp.float32)
    for rot in (ROTATE_COLOR._709_TO_2020, ROTATE_COLOR._2020_TO_709,
                ROTATE_COLOR._709_TO_P3D65, ROTATE_COLOR.P3D65_TO_709,
                ROTATE_COLOR.P3D65_TO_2020):
        out = np.asarray(rotate_color(white, rot))
        np.testing.assert_allclose(out[..., :3], 1.0, atol=2e-4)


def test_pq_roundtrip():
    v = jnp.asarray(np.linspace(0.0, 10.0, 64, dtype=np.float32))
    back = pq_decode(pq_encode(v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), rtol=1e-3,
                               atol=1e-5)


def test_pq_paper_white():
    # 1.0 at 200 nits paper white is the canonical HDR10 ~0.58 signal level
    n = float(pq_encode(jnp.float32(1.0), 200.0))
    assert abs(n - 0.5791) < 2e-3
    # 10000 nits saturates the signal
    assert float(pq_encode(jnp.float32(50.0), 200.0)) == pytest.approx(
        1.0, abs=1e-5)


def test_rotation_string_values():
    # texconv CLI passes the raw option string
    out = rotate_color(jnp.ones((1, 1, 4)), "709to2020")
    assert out.shape == (1, 1, 4)
    with pytest.raises(ValueError):
        rotate_color(jnp.ones((1, 1, 4)), "bogus")
