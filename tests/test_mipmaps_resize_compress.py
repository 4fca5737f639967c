"""Tests for mipmaps, resize, and the compress/decompress driver ops."""

import numpy as np
import pytest

from directxtex_tpu.formats import FMT
from directxtex_tpu.io import load_from_dds_memory, save_to_dds_memory
from directxtex_tpu.ops import (
    TEX_COMPRESS_FLAGS, TEX_FILTER_FLAGS, calculate_alpha_coverage, compress,
    compute_psnr, decompress, generate_mipmaps, generate_mipmaps_3d, resize,
    scale_mipmaps_alpha_for_coverage,
)
from directxtex_tpu.texture import CompressedTexture, TexDimension, Texture

TF = TEX_FILTER_FLAGS


def rand_tex(h=16, w=16, n=1, seed=0, fmt=FMT.R8G8B8A8_UNORM, opaque=True):
    rng = np.random.default_rng(seed)
    data = (rng.integers(0, 256, (n, h, w, 4)) / 255.0).astype(np.float32)
    if opaque:
        # BC1's color-key path punches alpha<threshold pixels to transparent
        # black, so quality gates use opaque inputs
        data[..., 3] = 1.0
    return Texture.from_array(data, fmt=fmt)


# -- mipmaps --

def test_mipmap_chain_shapes():
    tex = rand_tex(16, 8)
    mips = generate_mipmaps(tex)
    assert mips.mip_levels == 5
    shapes = [tuple(l.shape[1:3]) for l in mips.levels]
    assert shapes == [(16, 8), (8, 4), (4, 2), (2, 1), (1, 1)]
    assert mips.metadata.mip_levels == 5


def test_mipmap_box_average():
    img = np.zeros((1, 4, 4, 4), np.float32)
    img[0, :2, :2] = 1.0  # top-left quadrant white
    tex = Texture.from_array(img[0], fmt=FMT.R32G32B32A32_FLOAT)
    mips = generate_mipmaps(tex, TF.BOX)
    l1 = np.asarray(mips.levels[1])
    np.testing.assert_allclose(l1[0, 0, 0], 1.0)
    np.testing.assert_allclose(l1[0, 1, 1], 0.0)
    l2 = np.asarray(mips.levels[2])
    np.testing.assert_allclose(l2[0, 0, 0, :3], 0.25)


def test_mipmap_levels_arg():
    tex = rand_tex(32, 32)
    assert generate_mipmaps(tex, levels=3).mip_levels == 3
    with pytest.raises(ValueError):
        generate_mipmaps(tex, levels=10)


def test_mipmap_srgb_correct():
    # sRGB-correct filtering averages in linear space: 0 and 1 mix brighter
    # than 0.5 in sRGB terms
    img = np.zeros((1, 2, 2, 4), np.float32)
    img[0, :, 0] = [1, 1, 1, 1]
    tex_lin = Texture.from_array(img[0], fmt=FMT.R8G8B8A8_UNORM)
    tex_srgb = Texture.from_array(img[0], fmt=FMT.R8G8B8A8_UNORM_SRGB)
    m_lin = np.asarray(generate_mipmaps(tex_lin, TF.BOX).levels[1])[0, 0, 0, 0]
    m_srgb = np.asarray(generate_mipmaps(tex_srgb, TF.BOX).levels[1])[0, 0, 0, 0]
    assert abs(m_lin - 0.5) < 1e-6
    assert m_srgb > 0.7  # linear-average 0.5 maps to ~0.735 sRGB


def test_mipmap_3d():
    rng = np.random.default_rng(2)
    vol = rng.random((4, 4, 4, 4)).astype(np.float32)
    tex = Texture.from_array(vol, fmt=FMT.R32G32B32A32_FLOAT,
                             dimension=TexDimension.TEXTURE3D)
    mips = generate_mipmaps_3d(tex)
    assert mips.mip_levels == 3
    assert mips.levels[1].shape == (2, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(mips.levels[2])[0, 0, 0],
                               vol.mean(axis=(0, 1, 2)), rtol=1e-5)


def test_alpha_coverage_preserved():
    rng = np.random.default_rng(3)
    img = rng.random((1, 32, 32, 4)).astype(np.float32)  # random alpha wanted
    tex = Texture.from_array(img[0], fmt=FMT.R32G32B32A32_FLOAT)
    mips = generate_mipmaps(tex, TF.BOX)
    scaled = scale_mipmaps_alpha_for_coverage(mips, 0.5)
    base = float(calculate_alpha_coverage(mips.levels[0][..., 3], 0.5))
    for lvl in scaled.levels[1:4]:
        cov = float(calculate_alpha_coverage(lvl[..., 3], 0.5))
        assert abs(cov - base) < 0.15, (cov, base)


# -- resize --

def test_resize_point_and_linear():
    img = np.zeros((8, 8, 4), np.float32)
    img[:, 4:] = 1.0
    tex = Texture.from_array(img, fmt=FMT.R32G32B32A32_FLOAT)
    up = resize(tex, 16, 16, TF.POINT)
    assert up.metadata.width == 16
    out = up.to_numpy()
    assert out[0, 0, 0] == 0.0 and out[0, 15, 0] == 1.0

    lin = resize(tex, 16, 16, TF.LINEAR).to_numpy()
    # monotone ramp across the edge
    assert lin[8, 7, 0] < lin[8, 8, 0] <= lin[8, 9, 0]


def test_resize_identity():
    tex = rand_tex(8, 8)
    for mode in (TF.POINT, TF.LINEAR, TF.TRIANGLE):
        out = resize(tex, 8, 8, mode)
        np.testing.assert_allclose(out.to_numpy(), tex.to_numpy(), atol=1e-5)


def test_resize_fant_area_average():
    # 4x4 -> 2x2 with default (Fant) == exact box average
    rng = np.random.default_rng(4)
    img = rng.random((4, 4, 4)).astype(np.float32)
    tex = Texture.from_array(img, fmt=FMT.R32G32B32A32_FLOAT)
    out = resize(tex, 2, 2).to_numpy()
    expect = img.reshape(2, 2, 2, 2, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expect, rtol=1e-5)
    # non-integer ratio also works (3x3)
    out3 = resize(tex, 3, 3).to_numpy()
    assert out3.shape == (3, 3, 4)
    np.testing.assert_allclose(out3.mean(), img.mean(), rtol=1e-4)


def test_resize_wrap_vs_clamp_differ():
    img = np.zeros((8, 8, 4), np.float32)
    img[:, 0] = 1.0
    tex = Texture.from_array(img, fmt=FMT.R32G32B32A32_FLOAT)
    clamp = resize(tex, 16, 16, TF.CUBIC).to_numpy()
    wrap = resize(tex, 16, 16, TF.CUBIC | TF.WRAP).to_numpy()
    assert not np.allclose(clamp, wrap)


def test_resize_box_any_ratio():
    # BOX==FANT: exact 2x uses the box matrix, any other ratio falls through
    # to the Fant area filter (reference resolves BOX/FANT resize via WIC's
    # Fant resampler at arbitrary ratios, DirectXTexResize.cpp:24)
    tex = rand_tex(8, 8)
    out = resize(tex, 4, 4, TF.BOX)
    assert out.metadata.width == 4
    out = resize(tex, 3, 3, TF.BOX)
    assert out.metadata.width == 3
    # 3x3 of a constant image stays constant (area weights normalized)
    const = Texture.from_array(np.full((8, 8, 4), 0.25, np.float32))
    out = resize(const, 3, 3, TF.BOX)
    np.testing.assert_allclose(np.asarray(out.levels[0][0]), 0.25, atol=1e-6)


# -- compress / decompress --

def test_compress_decompress_bc1():
    tex = rand_tex(16, 16, seed=5)
    ctex = compress(tex, FMT.BC1_UNORM)
    assert isinstance(ctex, CompressedTexture)
    assert ctex.metadata.format == FMT.BC1_UNORM
    assert ctex.levels[0].shape == (1, 16 * 8)  # 4x4 blocks of 8 bytes
    back = decompress(ctex)
    assert back.metadata.format == FMT.R8G8B8A8_UNORM
    assert float(compute_psnr(back.to_numpy(), tex.to_numpy())) > 12


def test_compress_bc5_channels():
    tex = rand_tex(8, 8, seed=6)
    back = decompress(compress(tex, FMT.BC5_UNORM))
    assert back.metadata.format == FMT.R8G8_UNORM
    np.testing.assert_allclose(back.to_numpy()[..., 0],
                               tex.to_numpy()[..., 0], atol=0.12)
    assert np.all(back.to_numpy()[..., 2] == 0)


def test_compress_mips_roundtrip_dds():
    tex = generate_mipmaps(rand_tex(16, 16, seed=7))
    ctex = compress(tex, FMT.BC1_UNORM)
    assert ctex.mip_levels == 5
    blob = save_to_dds_memory(ctex)
    loaded = load_from_dds_memory(blob)
    assert isinstance(loaded, CompressedTexture)
    for m in range(5):
        np.testing.assert_array_equal(loaded.level_bytes(m),
                                      ctex.level_bytes(m))
    back = decompress(loaded)
    assert back.mip_levels == 5
    assert float(compute_psnr(back.to_numpy(), tex.to_numpy())) > 12


def test_compress_srgb_formats():
    tex = rand_tex(8, 8, fmt=FMT.R8G8B8A8_UNORM_SRGB, seed=8)
    ctex = compress(tex, FMT.BC1_UNORM_SRGB)
    back = decompress(ctex)
    assert back.metadata.format == FMT.R8G8B8A8_UNORM_SRGB
    # srgb-in == srgb-out: values unchanged by colorspace plumbing
    assert float(compute_psnr(back.to_numpy(), tex.to_numpy())) > 12


def test_compress_rejects():
    tex = rand_tex(8, 8)
    with pytest.raises(ValueError):
        compress(tex, FMT.R8G8B8A8_UNORM)
    ctex = compress(tex, FMT.BC1_UNORM)
    with pytest.raises(ValueError):
        decompress(ctex, FMT.BC3_UNORM)


def test_compress_odd_sizes():
    tex = rand_tex(5, 3, seed=9)
    ctex = compress(tex, FMT.BC3_UNORM)
    assert ctex.levels[0].shape == (1, 2 * 1 * 16)
    back = decompress(ctex)
    assert back.to_numpy().shape == (5, 3, 4)


def test_generate_mipmaps_3d_filtered():
    import numpy as np
    from directxtex_tpu.ops.mipmaps import generate_mipmaps_3d
    from directxtex_tpu.ops.flags import TEX_FILTER_FLAGS as TF
    from directxtex_tpu.texture import TexDimension, Texture

    rng = np.random.default_rng(0)
    vol = rng.random((8, 16, 16, 4)).astype(np.float32)
    tex = Texture.from_array(vol, dimension=TexDimension.TEXTURE3D)
    for mode in (TF.LINEAR, TF.CUBIC, TF.TRIANGLE, TF.BOX, TF.POINT):
        out = generate_mipmaps_3d(tex, mode)
        assert out.levels[1].shape == (4, 8, 8, 4), mode
        assert out.levels[-1].shape == (1, 1, 1, 4), mode
        v = np.asarray(out.levels[1])
        assert np.isfinite(v).all()
        if mode != TF.POINT:
            # mean-preserving reductions
            assert abs(float(v.mean()) - float(vol.mean())) < 0.05, mode


def test_compress_bc4_bc5_channel_copy():
    """compress() to BC4/BC5 keeps RED (and GREEN) instead of grayscale —
    DetermineEncoderSettings cflags (DirectXTexCompress.cpp:56-59)."""
    import numpy as np
    from directxtex_tpu.formats import FMT
    from directxtex_tpu.ops import compress, decompress
    from directxtex_tpu.texture import Texture

    rng = np.random.default_rng(6)
    img = rng.random((16, 16, 4)).astype(np.float32)
    img[..., 1] = 1.0 - img[..., 0]  # green anti-correlated with red
    tex = Texture.from_array(img)

    back4 = decompress(compress(tex, FMT.BC4_UNORM)).to_numpy()
    err_red = np.abs(back4[..., 0] - img[..., 0]).max()
    assert err_red < 0.1, err_red  # grayscale would be ~0.3+ off

    back5 = decompress(compress(tex, FMT.BC5_UNORM)).to_numpy()
    assert np.abs(back5[..., 0] - img[..., 0]).max() < 0.1
    assert np.abs(back5[..., 1] - img[..., 1]).max() < 0.1


def test_compress_many_bucketing_traces_and_outputs():
    """Mixed-size batched compress (VERDICT r3 #6): block counts are
    padded to a coarse geometric grid so a heterogeneous library reuses
    jit traces (every distinct count is a fresh multi-minute TPU
    compile); outputs must be byte-identical to per-texture compress."""
    import importlib
    comp_mod = importlib.import_module("directxtex_tpu.ops.compress")
    from directxtex_tpu.ops.compress import _bucket_size, compress_many

    # grid properties: monotone, >= n, <= 12.5% + one granule padding,
    # powers of two map to themselves
    for n in (1, 17, 256, 1000, 4096, 5000, 262144, 262145, 999999):
        b = _bucket_size(n)
        assert b >= n and b % 256 == 0
        assert b <= int(n * 1.125) + 256, (n, b)
    for k in (8, 10, 14, 18):
        assert _bucket_size(1 << k) == max(256, 1 << k)

    # 7 textures of mixed sizes -> few distinct encode shapes
    sizes = [(16, 16), (24, 8), (32, 32), (16, 24), (8, 8), (48, 16),
             (20, 12)]
    texs = [rand_tex(h, w, seed=10 + i) for i, (h, w) in enumerate(sizes)]

    shapes_seen = []
    orig = comp_mod._encode_blocks

    def counting(kind, blocks, *a, **kw):
        shapes_seen.append(blocks.shape)
        return orig(kind, blocks, *a, **kw)

    comp_mod._encode_blocks = counting
    try:
        batched = compress_many(texs, FMT.BC1_UNORM)
        singles = [compress(t, FMT.BC1_UNORM) for t in texs]
    finally:
        comp_mod._encode_blocks = orig

    # every dispatch shape sits on the bucket grid; the 7 mixed singles
    # collapse onto <= 3 distinct shapes (trace reuse)
    for s in shapes_seen:
        assert s[0] == _bucket_size(s[0]) or s[0] % 256 == 0, s
    single_shapes = {s[0] for s in shapes_seen[1:]}
    assert len(single_shapes) <= 3, shapes_seen

    for b, s in zip(batched, singles):
        for lb, ls in zip(b.levels, s.levels):
            np.testing.assert_array_equal(np.asarray(lb), np.asarray(ls))
