"""CLI tool tests: texconv / texdiag / texassemble end-to-end."""

import os

import numpy as np
import pytest

from directxtex_tpu.formats import FMT
from directxtex_tpu.io import load_texture, save_texture
from directxtex_tpu.texture import CompressedTexture, Texture
from directxtex_tpu.tools import texassemble, texconv, texdiag


@pytest.fixture
def png(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.integers(0, 256, (16, 16, 4)) / 255.0).astype(np.float32)
    img[..., 3] = 1.0
    p = tmp_path / "in.png"
    save_texture(Texture.from_array(img), str(p))
    return str(p)


def test_texconv_png_to_bc1_dds(png, tmp_path):
    rc = texconv.main(["-nologo", "-y", "-f", "BC1_UNORM", "-m", "0",
                       "-o", str(tmp_path), png])
    assert rc == 0
    out = tmp_path / "in.dds"
    tex = load_texture(str(out))
    assert isinstance(tex, CompressedTexture)
    assert tex.metadata.format == FMT.BC1_UNORM
    assert tex.mip_levels == 5


def test_texconv_resize_and_format(png, tmp_path):
    rc = texconv.main(["-nologo", "-y", "-w", "8", "-ht", "8",
                       "-f", "B5G6R5_UNORM", "-o", str(tmp_path),
                       "-sx", "_out", png])
    assert rc == 0
    tex = load_texture(str(tmp_path / "in_out.dds"))
    assert tex.metadata.width == 8
    assert tex.metadata.format == FMT.B5G6R5_UNORM


def test_texconv_nmap(png, tmp_path):
    rc = texconv.main(["-nologo", "-y", "-nmap", "l", "-nmapamp", "2",
                       "-f", "R8G8B8A8_UNORM", "-o", str(tmp_path),
                       "-sx", "_n", png])
    assert rc == 0
    tex = load_texture(str(tmp_path / "in_n.dds"))
    out = tex.to_numpy()
    # normals biased to ~[0.5, 0.5, 1.0] on average
    assert 0.3 < out[..., 0].mean() < 0.7
    assert out[..., 2].mean() > 0.5


def test_texconv_pipeline_flags(png, tmp_path):
    rc = texconv.main(["-nologo", "-y", "-hflip", "-vflip", "-pmalpha",
                       "-swizzle", "bgra", "-f", "R8G8B8A8_UNORM",
                       "-o", str(tmp_path), "-px", "p_", png])
    assert rc == 0
    from directxtex_tpu.ops import srgb_to_linear
    src = load_texture(png).to_numpy()  # loads as R8G8B8A8_UNORM_SRGB
    out = load_texture(str(tmp_path / "p_in.dds")).to_numpy()
    # pipeline: flip x2, swizzle, then sRGB->UNORM convert linearizes RGB
    flipped = src[::-1, ::-1][..., [2, 1, 0, 3]]
    expect = flipped.copy()
    expect[..., :3] = np.asarray(srgb_to_linear(flipped[..., :3]))
    np.testing.assert_allclose(out, expect, atol=1.5 / 255)


def test_texconv_missing_file(tmp_path):
    rc = texconv.main(["-nologo", str(tmp_path / "missing.png")])
    assert rc == 1


def test_texdiag_info_analyze_compare(png, tmp_path, capsys):
    assert texdiag.main(["-nologo", "info", png]) == 0
    out = capsys.readouterr().out
    assert "width: 16" in out and "R8G8B8A8_UNORM" in out

    assert texdiag.main(["-nologo", "analyze", png]) == 0
    out = capsys.readouterr().out
    assert "luminance" in out

    assert texdiag.main(["-nologo", "compare", png, png]) == 0
    out = capsys.readouterr().out
    assert "MSE: 0.000000000" in out


def test_texdiag_analyzebc_and_dumpbc(png, tmp_path, capsys):
    texconv.main(["-nologo", "-y", "-f", "BC7_UNORM", "-bc", "q",
                  "-o", str(tmp_path), png])
    dds = str(tmp_path / "in.dds")
    assert texdiag.main(["-nologo", "analyzebc", dds]) == 0
    out = capsys.readouterr().out
    assert "mode 6" in out
    assert texdiag.main(["-nologo", "dumpbc", "-x", "1", "-y", "1", dds]) == 0
    out = capsys.readouterr().out
    assert "block (1,1)" in out


def test_texdiag_diff(png, tmp_path):
    out = str(tmp_path / "d.png")
    assert texdiag.main(["-nologo", "diff", png, png, "-o", out]) == 0
    d = load_texture(out).to_numpy()
    assert np.all(d[..., :3] == 0.0)


def test_texassemble_cube_and_cross(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(6):
        img = np.full((8, 8, 4), (i + 1) / 8.0, np.float32)
        img[..., 3] = 1.0
        p = str(tmp_path / f"f{i}.png")
        save_texture(Texture.from_array(img), p)
        paths.append(p)

    cube = str(tmp_path / "cube.dds")
    assert texassemble.main(["-nologo", "cube", "-o", cube, "-y"] + paths) == 0
    tex = load_texture(cube)
    assert tex.metadata.is_cubemap() and tex.array_size == 6

    cross = str(tmp_path / "cross.png")
    assert texassemble.main(["-nologo", "h-cross", "-o", cross, cube]) == 0
    img = load_texture(cross)
    assert img.metadata.width == 32 and img.metadata.height == 24

    # decompose the cross back into a cubemap
    cube2 = str(tmp_path / "cube2.dds")
    assert texassemble.main(["-nologo", "cube-from-hc", "-o", cube2, cross]) == 0
    t2 = load_texture(cube2)
    assert t2.metadata.is_cubemap()
    np.testing.assert_allclose(np.asarray(t2.levels[0]),
                               np.asarray(load_texture(cube).levels[0]),
                               atol=1 / 255)


def test_texassemble_volume_array_merge(tmp_path):
    paths = []
    for i in range(4):
        img = np.full((4, 4, 4), i / 4.0, np.float32)
        img[..., 3] = 1.0
        p = str(tmp_path / f"v{i}.png")
        save_texture(Texture.from_array(img), p)
        paths.append(p)

    vol = str(tmp_path / "vol.dds")
    assert texassemble.main(["-nologo", "volume", "-o", vol] + paths) == 0
    t = load_texture(vol)
    assert t.metadata.depth == 4

    arr = str(tmp_path / "arr.dds")
    assert texassemble.main(["-nologo", "array", "-o", arr] + paths) == 0
    assert load_texture(arr).array_size == 4

    merged = str(tmp_path / "m.dds")
    assert texassemble.main(["-nologo", "merge", "-o", merged,
                             "--swizzle", "rGba", paths[0], paths[3]]) == 0
    mt = load_texture(merged)
    # green channel pulled from image 2 (value 3/4)
    np.testing.assert_allclose(mt.to_numpy()[..., 1], 0.75, atol=1 / 255)
    np.testing.assert_allclose(mt.to_numpy()[..., 0], 0.0, atol=1 / 255)
