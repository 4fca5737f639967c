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
    # -targetx/-targety are pixel coordinates (texdiag.cpp:1504)
    assert texdiag.main(["-nologo", "dumpbc", "-targetx", "5",
                         "-targety", "6", dds]) == 0
    out = capsys.readouterr().out
    assert "block (1,1)" in out
    # no target: every block is dumped
    assert texdiag.main(["-nologo", "dumpbc", dds]) == 0
    out = capsys.readouterr().out
    assert "block (0,0)" in out and "block (1,1)" in out


def test_texconv_batched_multifile_compress(tmp_path, monkeypatch):
    """N same-target files run the BC encode as ONE batched device
    dispatch (SURVEY §2.4: many files -> one batched device call), and
    the batched outputs are identical to per-file compression."""
    import importlib
    from PIL import Image
    rng = np.random.default_rng(9)
    paths = []
    for i in range(3):
        img = rng.integers(0, 256, (16, 16, 4), np.uint8)
        img[..., 3] = 255
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)

    compress_mod = importlib.import_module("directxtex_tpu.ops.compress")
    calls = []
    orig = compress_mod._encode_blocks

    def counting(kind, blocks, *a, **kw):
        calls.append(int(blocks.shape[0]))
        return orig(kind, blocks, *a, **kw)

    monkeypatch.setattr(compress_mod, "_encode_blocks", counting)
    rc = texconv.main(["-nologo", "-y", "-f", "BC1_UNORM", "-m", "1",
                       "-o", str(tmp_path)] + paths)
    assert rc == 0
    # one dispatch for all 3 files: 3 * (16/4)^2 = 48 blocks, padded to
    # the 256-block trace bucket (compress._bucket_size, r4)
    assert calls == [256], calls

    outs = [load_texture(str(tmp_path / f"f{i}.dds")) for i in range(3)]
    for i, p in enumerate(paths):
        rc = texconv.main(["-nologo", "-y", "-f", "BC1_UNORM", "-m", "1",
                           "-sx", "_s", "-o", str(tmp_path), p])
        assert rc == 0
        serial = load_texture(str(tmp_path / f"f{i}_s.dds"))
        np.testing.assert_array_equal(np.asarray(outs[i].levels[0]),
                                      np.asarray(serial.levels[0]))


def test_texdiag_analyzebc_partition_histogram(tmp_path, capsys):
    """Partitioned BC7 modes print per-mode partition histograms
    (AnalyzeBC, Texdiag/texdiag.cpp:906+)."""
    from PIL import Image
    rng = np.random.default_rng(3)
    img = np.zeros((16, 16, 4), np.uint8)
    img[..., 3] = 255
    # hard two-region blocks so the partitioned modes (1/3) win
    img[:, :, 0] = 230
    img[np.triu_indices(16)] = (10, 200, 60, 255)
    img[..., :3] += rng.integers(0, 12, (16, 16, 3), np.uint8)
    p = str(tmp_path / "two.png")
    Image.fromarray(img).save(p)
    texconv.main(["-nologo", "-y", "-f", "BC7_UNORM", "-m", "1",
                  "-o", str(tmp_path), p])
    dds = str(tmp_path / "two.dds")
    assert texdiag.main(["-nologo", "analyzebc", dds]) == 0
    out = capsys.readouterr().out
    assert "partitions:" in out


def test_texdiag_diff(png, tmp_path):
    out = str(tmp_path / "d.png")
    assert texdiag.main(["-nologo", "diff", png, png, "-o", out]) == 0
    d = load_texture(out).to_numpy()
    assert np.all(d[..., :3] == 0.0)
    # existing output without -y is refused; -y overwrites
    assert texdiag.main(["-nologo", "diff", png, png, "-o", out]) == 1
    assert texdiag.main(["-nologo", "-y", "diff", png, png, "-o", out]) == 0


def test_texdiag_diff_highlight(png, tmp_path):
    """-c paints pixels whose rgb deltas all reach -t (texdiag.cpp:1300)."""
    import numpy as np
    from PIL import Image
    a = np.zeros((8, 8, 4), np.uint8)
    a[..., 3] = 255
    b = a.copy()
    b[2, 3, :3] = 255  # one fully-different pixel
    pa, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    Image.fromarray(a).save(pa)
    Image.fromarray(b).save(pb)
    out = str(tmp_path / "d.png")
    assert texdiag.main(["-nologo", "diff", pa, pb, "-o", out,
                         "-c", "00FF00", "-t", "0.5"]) == 0
    d = load_texture(out).to_numpy()
    assert np.allclose(d[2, 3, :3], [0, 1, 0], atol=1 / 255)
    assert np.all(d[0, 0, :3] == 0.0)


def test_texdiag_multifile_info(png, tmp_path, capsys):
    assert texdiag.main(["-nologo", "info", png, png]) == 0
    out = capsys.readouterr().out
    assert out.count("width:") == 2


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


@pytest.mark.parametrize("layout,inverse", [
    ("v-cross", "cube-from-vc"),
    ("v-cross-fnz", "cube-from-vc-fnz"),
    ("h-tee", "cube-from-ht"),
    ("h-strip", "cube-from-hs"),
    ("v-strip", "cube-from-vs"),
])
def test_texassemble_layout_roundtrips(tmp_path, layout, inverse):
    """Every cross/tee/strip layout decomposes back to the same cubemap
    (CMD_H_CROSS..CMD_CUBE_FROM_VS, texassemble.cpp:2103-2520)."""
    rng = np.random.default_rng(7)
    paths = []
    for i in range(6):
        img = rng.random((8, 8, 4)).astype(np.float32)
        img[..., 3] = 1.0
        p = str(tmp_path / f"f{i}.png")
        save_texture(Texture.from_array(img), p)
        paths.append(p)
    cube = str(tmp_path / "cube.dds")
    assert texassemble.main(["-nologo", "cube", "-o", cube, "-y"] + paths) == 0

    lay = str(tmp_path / "lay.png")
    assert texassemble.main(["-nologo", layout, "-o", lay, cube]) == 0
    cube2 = str(tmp_path / "cube2.dds")
    assert texassemble.main(["-nologo", inverse, "-o", cube2, lay]) == 0
    np.testing.assert_allclose(np.asarray(load_texture(cube2).levels[0]),
                               np.asarray(load_texture(cube).levels[0]),
                               atol=1.5 / 255)


def test_texassemble_cube_from_mips(tmp_path):
    paths = []
    for f in range(6):
        for m, size in enumerate((8, 4, 2)):
            img = np.full((size, size, 4), (f * 3 + m + 1) / 20.0, np.float32)
            img[..., 3] = 1.0
            p = str(tmp_path / f"f{f}m{m}.png")
            save_texture(Texture.from_array(img), p)
            paths.append(p)
    out = str(tmp_path / "cube.dds")
    assert texassemble.main(["-nologo", "cube-from-mips", "-o", out, "-y"]
                            + paths) == 0
    t = load_texture(out)
    assert t.metadata.is_cubemap() and t.mip_levels == 3
    assert t.levels[0].shape[1] == 8 and t.levels[2].shape[1] == 2
    np.testing.assert_allclose(float(np.asarray(t.levels[1])[2, 0, 0, 0]),
                               (2 * 3 + 1 + 1) / 20.0, atol=1 / 255)


def test_texconv_flist_tolower_fl(png, tmp_path):
    """-flist input file, -l lowercase output, -fl size validation
    (OPT_FILELIST/OPT_TOLOWER/OPT_FEATURE_LEVEL, texconv.cpp)."""
    flist = tmp_path / "files.txt"
    flist.write_text(f"# comment\n{png}\n")
    rc = texconv.main(["-nologo", "-y", "-f", "R8G8B8A8_UNORM", "-m", "1",
                       "-o", str(tmp_path), "-sx", "_FL", "-l",
                       "-flist", str(flist)])
    assert rc == 0
    assert (tmp_path / "in_fl.dds").exists()

    # 16x16 exceeds no feature level; a fake tiny level must fail
    rc = texconv.main(["-nologo", "-y", "-fl", "9.1", "-w", "4096",
                       "-o", str(tmp_path), png])
    assert rc == 0  # 16x16 input is within 9.1's 2048 limit at load

    big = tmp_path / "big.png"
    save_texture(Texture.from_array(
        np.zeros((1, 4096, 4), np.float32)), str(big))
    rc = texconv.main(["-nologo", "-y", "-fl", "9.1",
                       "-o", str(tmp_path), str(big)])
    assert rc == 1  # 4096 wide > 2048 limit


def test_texconv_ignoresrgb_and_dword(png, tmp_path):
    """-ignoresrgb drops sRGB metadata; -dword uses legacy pitch."""
    srgb_dds = tmp_path / "srgb.dds"
    rc = texconv.main(["-nologo", "-y", "-f", "R8G8B8A8_UNORM_SRGB",
                       "-m", "1", "-o", str(tmp_path), "-sx", "_s", png])
    assert rc == 0
    os.rename(tmp_path / "in_s.dds", srgb_dds)

    rc = texconv.main(["-nologo", "-y", "-ignoresrgb", "-dword", "-m", "1",
                       "-o", str(tmp_path), "-sx", "_lin", str(srgb_dds)])
    assert rc == 0
    tex = load_texture(str(tmp_path / "srgb_lin.dds"))
    assert tex.metadata.format == FMT.R8G8B8A8_UNORM


def test_texdiag_dumpdds_naming(tmp_path, monkeypatch):
    """dumpdds extracts each surface with reference naming
    (_itemNNN_mipNNN, texdiag.cpp:3753+) in the chosen container."""
    import jax.numpy as jnp
    from directxtex_tpu.texture import TexMetadata, TexDimension
    rng = np.random.default_rng(3)
    lvl0 = jnp.asarray(rng.random((2, 8, 8, 4)).astype(np.float32))
    lvl1 = jnp.asarray(rng.random((2, 4, 4, 4)).astype(np.float32))
    meta = TexMetadata(width=8, height=8, depth=1, array_size=2,
                       mip_levels=2, misc_flags=0,
                       format=FMT.R8G8B8A8_UNORM,
                       dimension=TexDimension.TEXTURE2D)
    src = tmp_path / "arr.dds"
    save_texture(Texture(meta, [lvl0, lvl1]), str(src))

    monkeypatch.chdir(tmp_path)
    rc = texdiag.main(["-nologo", "dumpdds", "-ft", "dds", str(src)])
    assert rc == 0
    for item in range(2):
        for mip in range(2):
            out = tmp_path / f"arr_item{item:03d}_mip{mip:03d}.dds"
            assert out.exists(), out
    t = load_texture(str(tmp_path / "arr_item001_mip001.dds"))
    np.testing.assert_allclose(t.to_numpy(), np.asarray(lvl1[1]),
                               atol=1 / 255)


def test_texassemble_flist_tolower_dx10(tmp_path):
    rng = np.random.default_rng(8)
    paths = []
    for i in range(2):
        img = rng.random((8, 8, 4)).astype(np.float32)
        p = str(tmp_path / f"i{i}.png")
        save_texture(Texture.from_array(img), p)
        paths.append(p)
    flist = tmp_path / "in.txt"
    flist.write_text("\n".join(paths) + "\n")
    out = str(tmp_path / "ARR.dds")
    rc = texassemble.main(["-nologo", "array", "-o", out, "-y", "-l",
                           "-dx10", "-flist", str(flist)])
    assert rc == 0
    t = load_texture(str(tmp_path / "arr.dds"))
    assert t.metadata.array_size == 2
    # DX10 header forced: fourCC DX10 at offset 84
    raw = (tmp_path / "arr.dds").read_bytes()
    assert raw[84:88] == b"DX10"


def test_texconv_swizzle_literals(png, tmp_path):
    """HLSL-style swizzle masks with 0/1 literals
    (ParseSwizzleMask, texconv.cpp:1157-1240)."""
    rc = texconv.main(["-nologo", "-y", "-swizzle", "r01a", "-m", "1",
                       "-f", "R8G8B8A8_UNORM", "-o", str(tmp_path),
                       "-sx", "_sw", png])
    assert rc == 0
    rc = texconv.main(["-nologo", "-y", "-swizzle", "rgba", "-m", "1",
                       "-f", "R8G8B8A8_UNORM", "-o", str(tmp_path),
                       "-sx", "_id", png])
    assert rc == 0
    out = load_texture(str(tmp_path / "in_sw.dds")).to_numpy()
    ident = load_texture(str(tmp_path / "in_id.dds")).to_numpy()
    np.testing.assert_allclose(out[..., 0], ident[..., 0], atol=1 / 255)
    np.testing.assert_allclose(out[..., 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 2], 1.0, atol=1e-6)


def test_ddsview_cube_cross_and_navigation(tmp_path, monkeypatch):
    """ddsview renders a cubemap as the reference's horizontal cross
    (ddsview.cpp:578) and navigates items/mips like its key handling
    (ddsview.cpp:364-386)."""
    from directxtex_tpu.tools import ddsview, texassemble

    paths = []
    for i in range(6):
        img = np.full((8, 8, 4), (i + 1) / 8.0, np.float32)
        img[..., 3] = 1.0
        p = str(tmp_path / f"f{i}.png")
        save_texture(Texture.from_array(img), p)
        paths.append(p)
    cube = str(tmp_path / "cube.dds")
    assert texassemble.main(["-nologo", "cube", "-o", cube, "-y"] + paths) == 0

    out = str(tmp_path / "v.png")
    assert ddsview.main(["-nologo", "-o", out, cube]) == 0
    img = load_texture(out)
    assert (img.metadata.width, img.metadata.height) == (32, 24)  # 4x3 cross

    # single-item view (one face)
    assert ddsview.main(["-nologo", "-o", out, "-i", "2", cube]) == 0
    img2 = load_texture(out)
    assert (img2.metadata.width, img2.metadata.height) == (8, 8)
    np.testing.assert_allclose(img2.to_numpy()[0, ..., 0], 3 / 8.0,
                               atol=1 / 255)

    # mip strip of a mipped 2D texture
    rng = np.random.default_rng(3)
    t = Texture.from_array(rng.random((16, 16, 4)).astype(np.float32))
    from directxtex_tpu.ops.mipmaps import generate_mipmaps
    src = str(tmp_path / "m.dds")
    save_texture(generate_mipmaps(t), src)
    assert ddsview.main(["-nologo", "-o", out, "--mips", src]) == 0
    strip = load_texture(out)
    assert strip.metadata.width == 16 + 8 + 4 + 2 + 1

    # interactive loop: next, jump, mip-cycle, quit
    feed = iter(["n", "3", "m", "q"])
    monkeypatch.setattr("builtins.input", lambda: next(feed))
    assert ddsview.main(["-nologo", "-o", out, "--interactive", cube]) == 0


def test_texconv_long_form_aliases():
    """Reference texconv accepts long option names (texconv.cpp option
    table); aliases must map onto the same dests as the short forms."""
    from directxtex_tpu.tools.texconv import build_parser
    p = build_parser()
    a = p.parse_args(["--format", "BC7_UNORM", "--mip-levels", "3",
                      "--separate-alpha", "--premultiplied-alpha",
                      "--normal-map", "lo", "--block-compress", "q",
                      "--file-list", "x.txt", "--color-key", "00FF00",
                      "--fit-power-of-2", "--wic-quality", "0.9", "in.png"])
    assert a.format == "BC7_UNORM" and a.mips == 3
    assert a.sepalpha and a.pmalpha and a.fit_pow2
    assert a.nmap == "lo" and a.bc == "q" and a.flist == "x.txt"
    assert a.colorkey == "00FF00" and a.wicq == 0.9


def test_texconv_version(capsys):
    from directxtex_tpu.tools import texconv
    assert texconv.main(["-version"]) == 0
    assert "texconv" in capsys.readouterr().out


def test_texconv_ignored_options_reported(tmp_path, capsys):
    import numpy as np
    from PIL import Image
    from directxtex_tpu.tools import texconv
    src = tmp_path / "a.png"
    Image.fromarray(np.zeros((8, 8, 4), np.uint8)).save(src)
    rc = texconv.main(["-nogpu", "-singleproc", "-f", "R8G8B8A8_UNORM",
                       "-o", str(tmp_path), str(src)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "ignored (TPU path): -singleproc -nogpu" in out


def test_texassemble_mips_and_version(png, tmp_path, capsys):
    assert texassemble.main(["-version"]) == 0
    assert "texassemble" in capsys.readouterr().out
    out = str(tmp_path / "arr.dds")
    # -m 0: full mip chain on the assembled array (OPT_MIPLEVELS)
    assert texassemble.main(["-nologo", "array", "-o", out,
                             "-m", "0", png, png]) == 0
    t = load_texture(out)
    assert t.metadata.array_size == 2
    assert t.mip_levels > 1


def test_texdiag_version(capsys):
    assert texdiag.main(["-version"]) == 0
    assert "texdiag" in capsys.readouterr().out


def test_texconv_profile_trace(png, tmp_path):
    """-profile writes a JAX profiler (XPlane) trace dir (SURVEY §5)."""
    logdir = tmp_path / "xprof"
    rc = texconv.main(["-nologo", "-y", "-f", "R8G8B8A8_UNORM",
                       "-m", "1", "-profile", str(logdir),
                       "-o", str(tmp_path), png])
    assert rc == 0
    prof = logdir / "plugins" / "profile"
    assert prof.is_dir() and any(prof.iterdir())
