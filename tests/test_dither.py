"""Dithered quantization tests (ordered + Floyd-Steinberg), mirroring
StoreScanlineDither semantics (DirectXTexConvert.cpp:3887,4049)."""

import numpy as np
import pytest

from directxtex_tpu.formats import FMT
from directxtex_tpu.ops import dither
from directxtex_tpu.ops.flags import TEX_FILTER_FLAGS as TF


def _gradient(h=32, w=32):
    g = np.linspace(0.2, 0.3, w, dtype=np.float32)
    img = np.broadcast_to(g[None, :, None], (h, w, 4)).copy()
    img[..., 3] = 1.0
    return img


def test_ordered_dither_quantizes():
    img = _gradient()
    out = np.asarray(dither.ordered_dither(img, FMT.B5G6R5_UNORM))
    # values land exactly on the 565 grid
    assert np.allclose(out[..., 0] * 31, np.round(out[..., 0] * 31))
    assert np.allclose(out[..., 1] * 63, np.round(out[..., 1] * 63))
    # a flat-ish gradient uses at least 2 levels per channel (dither noise)
    assert len(np.unique(out[..., 0])) >= 2


def test_ordered_dither_mean_preserved():
    img = _gradient(64, 64)
    out = np.asarray(dither.ordered_dither(img, FMT.B5G6R5_UNORM))
    # dithering preserves the mean much better than plain rounding
    assert abs(out[..., 0].mean() - img[..., 0].mean()) < 0.005


def test_fs_dither_native_matches_python():
    rng = np.random.default_rng(0)
    img = rng.random((9, 13, 4)).astype(np.float32)
    sc = np.array([31, 63, 31, 1], np.float32)
    from directxtex_tpu import native
    got = native.fs_dither(img.copy(), sc, True)
    if got is None:
        pytest.skip("native library unavailable")
    ref = dither._fs_dither_py(img, sc, True)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_fs_dither_mean_preserved():
    img = _gradient(32, 32)
    out = dither.diffusion_dither(img, FMT.B5G6R5_UNORM)
    assert abs(out[..., 0].mean() - img[..., 0].mean()) < 0.003
    # quantized to the grid
    assert np.allclose(out[..., 0] * 31, np.round(out[..., 0] * 31))


def test_apply_dither_dispatch():
    img = _gradient(8, 8)
    plain = dither.apply_dither(img, FMT.R8G8B8A8_UNORM, 0)
    np.testing.assert_array_equal(np.asarray(plain), img)
    o = np.asarray(dither.apply_dither(img, FMT.B5G6R5_UNORM, TF.DITHER))
    d = np.asarray(dither.apply_dither(img, FMT.B5G6R5_UNORM,
                                       TF.DITHER_DIFFUSION))
    assert not np.array_equal(o, img)
    assert not np.array_equal(d, img)
    # non-ditherable format passes through
    f = dither.apply_dither(img, FMT.R32G32B32A32_FLOAT, TF.DITHER)
    np.testing.assert_array_equal(np.asarray(f), img)


def test_convert_with_dither_flag():
    from directxtex_tpu.ops.convert import convert
    from directxtex_tpu.texture import Texture
    img = _gradient(16, 16)
    tex = Texture.from_array(img, FMT.R32G32B32A32_FLOAT)
    out = convert(tex, FMT.B5G6R5_UNORM, TF.DITHER_DIFFUSION)
    v = np.asarray(out.levels[0][0])
    assert np.allclose(v[..., 0] * 31, np.round(v[..., 0] * 31))
    assert len(np.unique(v[..., 0])) >= 2
