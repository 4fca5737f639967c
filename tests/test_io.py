"""Container I/O tests: DDS, TGA, HDR, WIC-bridge round trips."""

import struct

import numpy as np
import pytest

from directxtex_tpu.formats import FMT
from directxtex_tpu.io import (
    DDS_FLAGS, TGA_FLAGS, WIC_CODEC,
    get_metadata_from_dds_memory, get_metadata_from_hdr_memory,
    get_metadata_from_tga_memory,
    load_from_dds_memory, load_from_hdr_memory, load_from_tga_memory,
    load_from_wic_memory,
    save_to_dds_memory, save_to_hdr_memory, save_to_tga_memory,
    save_to_wic_memory,
)
from directxtex_tpu.texture import (
    CompressedTexture, TexAlphaMode, TexDimension, TexMetadata, Texture,
)


def rand_tex(h=8, w=8, n=1, seed=0, fmt=FMT.R8G8B8A8_UNORM, **kw):
    rng = np.random.default_rng(seed)
    # quantize to 8 bits so unorm8 containers round-trip exactly
    data = (rng.integers(0, 256, (n, h, w, 4)) / 255.0).astype(np.float32)
    return Texture.from_array(data, fmt=fmt, **kw)


# ---------------------------------------------------------------------------
# TGA
# ---------------------------------------------------------------------------

def test_tga_roundtrip_32bpp():
    tex = rand_tex(5, 7)
    blob = save_to_tga_memory(tex)
    meta = get_metadata_from_tga_memory(blob)
    assert meta.width == 7 and meta.height == 5
    assert meta.format == FMT.R8G8B8A8_UNORM
    back = load_from_tga_memory(blob)
    np.testing.assert_allclose(back.to_numpy(), tex.to_numpy(), atol=1e-6)


def test_tga_roundtrip_24bpp_and_gray():
    tex = rand_tex(4, 4, fmt=FMT.B8G8R8X8_UNORM)
    blob = save_to_tga_memory(tex)
    back = load_from_tga_memory(blob, TGA_FLAGS.BGR)
    assert back.metadata.format == FMT.B8G8R8X8_UNORM
    np.testing.assert_allclose(back.to_numpy()[..., :3],
                               tex.to_numpy()[..., :3], atol=1e-6)

    gray = rand_tex(4, 4, fmt=FMT.R8_UNORM)
    blob = save_to_tga_memory(gray)
    back = load_from_tga_memory(blob)
    assert back.metadata.format == FMT.R8_UNORM
    np.testing.assert_allclose(back.to_numpy()[..., 0],
                               gray.to_numpy()[..., 0], atol=1e-6)


def test_tga_rle_decode():
    # hand-built RLE file: 2x2 gray, runs
    header = struct.pack("<BBBHHBHHHHBB", 0, 0, 11, 0, 0, 0, 0, 0, 2, 2, 8, 0x20)
    # RLE: run of 2 pixels value 100, raw packet of 2 pixels 50, 200
    rle = bytes([0x81, 100, 0x01, 50, 200])
    tex = load_from_tga_memory(header + rle)
    out = tex.to_numpy()
    np.testing.assert_allclose(out[0, :, 0] * 255, [100, 100], atol=0.5)
    np.testing.assert_allclose(out[1, :, 0] * 255, [50, 200], atol=0.5)


def test_tga_bottom_up_origin():
    # descriptor bit5 clear -> bottom-up storage
    header = struct.pack("<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, 1, 2, 8, 0)
    data = bytes([10, 250])  # first stored row is bottom
    tex = load_from_tga_memory(header + data)
    out = tex.to_numpy()
    assert abs(out[0, 0, 0] * 255 - 250) < 0.5
    assert abs(out[1, 0, 0] * 255 - 10) < 0.5


def test_tga_all_zero_alpha_heuristic():
    arr = np.random.default_rng(0).random((4, 4, 4)).astype(np.float32)
    arr[..., 3] = 0.0
    tex = Texture.from_array((np.round(arr * 255) / 255).astype(np.float32))
    blob = save_to_tga_memory(tex)
    back = load_from_tga_memory(blob)
    assert np.all(back.to_numpy()[..., 3] == 1.0)
    kept = load_from_tga_memory(blob, TGA_FLAGS.ALLOW_ALL_ZERO_ALPHA)
    assert np.all(kept.to_numpy()[..., 3] == 0.0)


def test_tga20_footer_alpha_mode():
    tex = rand_tex(4, 4).replace_levels(
        rand_tex(4, 4).levels,
        rand_tex(4, 4).metadata.with_alpha_mode(TexAlphaMode.PREMULTIPLIED))
    blob = save_to_tga_memory(tex)
    meta = get_metadata_from_tga_memory(blob)
    assert meta.alpha_mode() == TexAlphaMode.PREMULTIPLIED


# ---------------------------------------------------------------------------
# HDR
# ---------------------------------------------------------------------------

def test_hdr_roundtrip():
    rng = np.random.default_rng(3)
    img = (rng.random((16, 32, 4)) * 8.0).astype(np.float32)
    img[..., 3] = 1.0
    tex = Texture.from_array(img, fmt=FMT.R32G32B32A32_FLOAT)
    blob = save_to_hdr_memory(tex)
    meta = get_metadata_from_hdr_memory(blob)
    assert (meta.width, meta.height) == (32, 16)
    back = load_from_hdr_memory(blob)
    # RGBE quantization error is absolute w.r.t. the shared-exponent scale
    # (max channel), so small channels see larger relative error: bound is
    # ~0.5/256 of the per-pixel max channel (max 8.0 here -> atol 0.04)
    np.testing.assert_allclose(back.to_numpy()[..., :3], img[..., :3],
                               rtol=0.01, atol=0.04)


def test_hdr_exposure_applied():
    img = np.full((4, 8, 4), 2.0, np.float32)
    blob = save_to_hdr_memory(Texture.from_array(img, fmt=FMT.R32G32B32A32_FLOAT))
    # inject EXPOSURE=2 into the header
    blob2 = blob.replace(b"FORMAT=32-bit_rle_rgbe\n",
                         b"FORMAT=32-bit_rle_rgbe\nEXPOSURE=2.0\n")
    back = load_from_hdr_memory(blob2)
    np.testing.assert_allclose(back.to_numpy()[..., 0], 1.0, rtol=0.01)


def test_hdr_rejects_bad():
    with pytest.raises(ValueError):
        load_from_hdr_memory(b"not an hdr file")
    with pytest.raises(ValueError):
        load_from_hdr_memory(b"#?RADIANCE\nFORMAT=weird\n\n-Y 1 +X 1\n\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        # +Y orientation unsupported
        load_from_hdr_memory(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n+Y 1 +X 1\n\x00\x00\x00\x00")


# ---------------------------------------------------------------------------
# DDS
# ---------------------------------------------------------------------------

def test_dds_roundtrip_legacy_rgba8():
    tex = rand_tex(8, 8)
    blob = save_to_dds_memory(tex)
    # R8G8B8A8_UNORM writes a legacy A8B8G8R8 header (no DX10 ext)
    assert len(blob) == 128 + 8 * 8 * 4
    meta = get_metadata_from_dds_memory(blob)
    assert meta.format == FMT.R8G8B8A8_UNORM
    back = load_from_dds_memory(blob)
    np.testing.assert_allclose(back.to_numpy(), tex.to_numpy(), atol=1e-6)


def test_dds_roundtrip_dx10():
    tex = rand_tex(8, 8, fmt=FMT.R8G8B8A8_UNORM_SRGB)
    blob = save_to_dds_memory(tex)
    assert blob[84:88] == b"DX10"
    meta = get_metadata_from_dds_memory(blob)
    assert meta.format == FMT.R8G8B8A8_UNORM_SRGB
    back = load_from_dds_memory(blob)
    np.testing.assert_allclose(back.to_numpy(), tex.to_numpy(), atol=1e-6)


def test_dds_roundtrip_mips_and_array():
    rng = np.random.default_rng(9)
    meta = TexMetadata(width=8, height=8, array_size=3, mip_levels=2,
                       format=FMT.R16G16B16A16_FLOAT)
    levels = [rng.standard_normal((3, 8, 8, 4)).astype(np.float16).astype(np.float32),
              rng.standard_normal((3, 4, 4, 4)).astype(np.float16).astype(np.float32)]
    tex = Texture(meta, [np.asarray(l) for l in levels])
    blob = save_to_dds_memory(tex)
    back = load_from_dds_memory(blob)
    assert back.metadata.array_size == 3 and back.mip_levels == 2
    for m in range(2):
        np.testing.assert_allclose(np.asarray(back.levels[m]), levels[m], atol=1e-6)


def test_dds_cubemap_legacy():
    tex = rand_tex(4, 4, n=6, is_cube=True)
    blob = save_to_dds_memory(tex)
    meta = get_metadata_from_dds_memory(blob)
    assert meta.is_cubemap() and meta.array_size == 6
    back = load_from_dds_memory(blob)
    np.testing.assert_allclose(np.asarray(back.levels[0]),
                               np.asarray(tex.levels[0]), atol=1e-6)


def test_dds_volume():
    rng = np.random.default_rng(5)
    data = (rng.integers(0, 256, (4, 4, 4, 4)) / 255.0).astype(np.float32)
    tex = Texture.from_array(data, dimension=TexDimension.TEXTURE3D)
    blob = save_to_dds_memory(tex)
    meta = get_metadata_from_dds_memory(blob)
    assert meta.dimension == TexDimension.TEXTURE3D and meta.depth == 4
    back = load_from_dds_memory(blob)
    np.testing.assert_allclose(np.asarray(back.levels[0]), data, atol=1e-6)


def test_dds_bc_passthrough():
    # BC1 data round-trips as raw blocks
    rng = np.random.default_rng(1)
    meta = TexMetadata(width=8, height=8, format=FMT.BC1_UNORM)
    blocks = rng.integers(0, 256, (1, 2 * 2 * 8), dtype=np.uint8)
    ctex = CompressedTexture(meta, [blocks])
    blob = save_to_dds_memory(ctex)
    assert blob[84:88] == b"DXT1"
    back = load_from_dds_memory(blob)
    assert isinstance(back, CompressedTexture)
    assert back.metadata.format == FMT.BC1_UNORM
    np.testing.assert_array_equal(back.level_bytes(0), blocks[0])


def test_dds_legacy_24bpp_expansion():
    # hand-build a legacy R8G8B8 24bpp DDS (BGR bytes on disk)
    w = h = 2
    pf = struct.pack("<8I", 32, 0x40, 0, 24, 0xFF0000, 0x00FF00, 0x0000FF, 0)
    header = struct.pack("<I7I", 0x20534444, 124, 0x1007, h, w, w * 3, 1, 1)
    header += b"\x00" * 44 + pf + struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    pixels = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  10, 20, 30])  # BGR
    tex = load_from_dds_memory(header + pixels)
    assert tex.metadata.format == FMT.R8G8B8A8_UNORM
    out = np.round(tex.to_numpy() * 255)
    np.testing.assert_array_equal(out[0, 0], [0, 0, 255, 255])   # blue
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0, 255])   # green
    np.testing.assert_array_equal(out[1, 0], [255, 0, 0, 255])   # red
    np.testing.assert_array_equal(out[1, 1], [30, 20, 10, 255])
    assert tex.metadata.alpha_mode() == TexAlphaMode.OPAQUE


def test_dds_legacy_dxt2_pmalpha():
    pf = struct.pack("<8I", 32, 0x4, struct.unpack("<I", b"DXT2")[0], 0, 0, 0, 0, 0)
    header = struct.pack("<I7I", 0x20534444, 124, 0x1007, 4, 4, 0, 1, 1)
    header += b"\x00" * 44 + pf + struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    blob = header + b"\x00" * 8
    meta = get_metadata_from_dds_memory(blob)
    assert meta.format == FMT.BC2_UNORM
    assert meta.alpha_mode() == TexAlphaMode.PREMULTIPLIED


def test_dds_force_rgb_swizzles_bgra():
    tex = rand_tex(2, 2, fmt=FMT.B8G8R8A8_UNORM)
    blob = save_to_dds_memory(tex)
    back = load_from_dds_memory(blob, DDS_FLAGS.FORCE_RGB)
    assert back.metadata.format == FMT.R8G8B8A8_UNORM
    np.testing.assert_allclose(back.to_numpy(), tex.to_numpy(), atol=1e-6)


def test_dds_rejects_garbage():
    with pytest.raises(ValueError):
        load_from_dds_memory(b"1234")
    with pytest.raises(ValueError):
        load_from_dds_memory(b"DDS " + b"\x00" * 200)
    # truncated pixel data
    tex = rand_tex(8, 8)
    blob = save_to_dds_memory(tex)
    with pytest.raises(ValueError):
        load_from_dds_memory(blob[:-10])


def test_dds_a2r10g10b10_swizzle_fixup():
    # legacy A2R10G10B10 header gets R/B swapped on load (D3DX issue)
    pf = struct.pack("<8I", 32, 0x41, 0, 32,
                     0x000003FF, 0x000FFC00, 0x3FF00000, 0xC0000000)
    header = struct.pack("<I7I", 0x20534444, 124, 0x1007, 1, 1, 4, 1, 1)
    header += b"\x00" * 44 + pf + struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    # one pixel: R=1023 in the file's R position (low bits mask 0x3FF)
    word = struct.pack("<I", 1023 | (3 << 30))
    tex = load_from_dds_memory(header + word)
    assert tex.metadata.format == FMT.R10G10B10A2_UNORM
    out = tex.to_numpy()[0, 0]
    # DirectXTex assumes the (buggy D3DX) header masks are backwards: the
    # file's low 10 bits are treated as BLUE after the swizzle fix-up
    np.testing.assert_allclose(out, [0.0, 0.0, 1.0, 1.0], atol=1e-6)
    # with NO_R10B10G10A2_FIXUP the data is taken at face value
    raw = load_from_dds_memory(header + word, DDS_FLAGS.NO_R10B10G10A2_FIXUP)
    np.testing.assert_allclose(raw.to_numpy()[0, 0], [1.0, 0.0, 0.0, 1.0],
                               atol=1e-6)


# ---------------------------------------------------------------------------
# WIC bridge
# ---------------------------------------------------------------------------

def test_png_roundtrip():
    tex = rand_tex(6, 6)
    blob = save_to_wic_memory(tex, WIC_CODEC.PNG)
    back = load_from_wic_memory(blob)
    assert back.metadata.format == FMT.R8G8B8A8_UNORM_SRGB
    np.testing.assert_allclose(back.to_numpy(), tex.to_numpy(), atol=1e-6)


def test_jpeg_lossy_close():
    rng = np.random.default_rng(0)
    smooth = np.zeros((16, 16, 4), np.float32)
    smooth[..., 0] = np.linspace(0, 1, 16)[None, :]
    smooth[..., 3] = 1.0
    tex = Texture.from_array(smooth)
    blob = save_to_wic_memory(tex, WIC_CODEC.JPEG, quality=95)
    back = load_from_wic_memory(blob)
    assert np.abs(back.to_numpy()[..., 0] - smooth[..., 0]).mean() < 0.05


def test_ppm_pfm_roundtrip(tmp_path):
    from directxtex_tpu.io import (load_from_pfm_memory, load_from_ppm_memory,
                                   save_to_pfm_memory, save_to_ppm_memory)
    tex = rand_tex(6, 4)
    blob = save_to_ppm_memory(tex)
    assert blob.startswith(b"P6")
    back = load_from_ppm_memory(blob)
    np.testing.assert_allclose(back.to_numpy()[..., :3],
                               tex.to_numpy()[..., :3], atol=1e-6)
    # ascii P3
    u8 = np.round(tex.to_numpy()[..., :3] * 255).astype(int)
    p3 = b"P3\n# comment\n4 6\n255\n" + " ".join(
        str(v) for v in u8.reshape(-1)).encode()
    back3 = load_from_ppm_memory(p3)
    np.testing.assert_allclose(back3.to_numpy()[..., :3],
                               tex.to_numpy()[..., :3], atol=1e-6)

    hdr = np.abs(np.random.default_rng(1).standard_normal((4, 4, 4))
                 ).astype(np.float32) * 10
    ht = Texture.from_array(hdr, fmt=FMT.R32G32B32A32_FLOAT)
    pf = save_to_pfm_memory(ht)
    backf = load_from_pfm_memory(pf)
    np.testing.assert_allclose(backf.to_numpy()[..., :3], hdr[..., :3],
                               rtol=1e-6)


def test_loaders_and_screengrab(tmp_path):
    from directxtex_tpu.io import (capture_texture, create_texture_from_dds,
                                   create_texture_from_image,
                                   save_dds_texture_to_file,
                                   save_image_texture_to_file)
    tex = rand_tex(16, 16)
    p = str(tmp_path / "t.dds")
    save_to_dds_memory  # noqa: B018 - dispatch sanity
    save_dds_texture_to_file(tex, p)
    loaded = create_texture_from_dds(p)
    np.testing.assert_allclose(loaded.to_numpy(), tex.to_numpy(), atol=1e-6)

    png = str(tmp_path / "t.png")
    save_image_texture_to_file(np.asarray(tex.levels[0][0]), png)
    wic = create_texture_from_image(png, max_size=8, gen_mips=True)
    assert wic.metadata.width == 8 and wic.mip_levels == 4

    cap = capture_texture(np.zeros((4, 4, 4), np.float32))
    assert cap.metadata.width == 4


def test_dds_3d_bc_round_trip(tmp_path):
    """Compressed volume textures write/read every depth slice
    (slice-major per mip, DirectXTexDDS.cpp save path)."""
    import jax.numpy as jnp
    from directxtex_tpu.io import load_texture, save_texture
    from directxtex_tpu.ops import compress, decompress
    from directxtex_tpu.texture import TexDimension, TexMetadata, Texture

    rng = np.random.default_rng(5)
    vol = rng.random((4, 8, 8, 4)).astype(np.float32)
    vol[..., 3] = 1.0
    meta = TexMetadata(width=8, height=8, depth=4, array_size=1,
                       mip_levels=1, misc_flags=0,
                       format=FMT.R8G8B8A8_UNORM,
                       dimension=TexDimension.TEXTURE3D)
    ct = compress(Texture(meta, [jnp.asarray(vol)]), FMT.BC1_UNORM)
    out = str(tmp_path / "vol.dds")
    save_texture(ct, out)
    back = load_texture(out)
    assert back.metadata.depth == 4
    np.testing.assert_array_equal(np.asarray(back.levels[0]),
                                  np.asarray(ct.levels[0]))
    dec = decompress(back)
    for z in range(4):
        # BC1 on noise: ~0.12 mean err is expected 4-color-palette loss;
        # the byte-exact level comparison above is the real gate
        err = np.abs(dec.to_numpy(0, z) - vol[z]).mean()
        assert err < 0.2, (z, err)


def test_phm_round_trip(tmp_path):
    """PHM (Portable Half Map) load/save
    (Texconv/PortablePixMap.cpp:447-481, half16 path)."""
    from directxtex_tpu.io import load_texture, save_texture
    from directxtex_tpu.texture import Texture
    rng = np.random.default_rng(9)
    img = (rng.random((6, 5, 4)).astype(np.float32) * 8.0)
    img[..., 3] = 1.0
    p = str(tmp_path / "x.phm")
    save_texture(Texture.from_array(img, fmt=FMT.R16G16B16A16_FLOAT), p)
    back = load_texture(p)
    assert back.metadata.format == FMT.R16G16B16A16_FLOAT
    np.testing.assert_allclose(back.to_numpy()[..., :3],
                               img[..., :3].astype(np.float16), atol=1e-3)


def test_wic_metadata_query(tmp_path):
    """getMQR analog (DirectXTexWIC.cpp:1213-1575): queryable container
    metadata incl. decoded EXIF tags."""
    import io as _io

    from PIL import Image

    from directxtex_tpu.io import wic

    img = Image.fromarray(
        (np.linspace(0, 255, 20 * 30 * 3) % 256).astype(np.uint8)
        .reshape(20, 30, 3))
    buf = _io.BytesIO()
    exif = Image.Exif()
    exif[0x010F] = "directxtex_tpu"  # Make
    img.save(buf, format="JPEG", exif=exif, dpi=(96, 96))
    md = wic.get_metadata_queries_from_wic_memory(buf.getvalue())
    assert md["codec"] == "jpeg"
    assert (md["width"], md["height"]) == (30, 20)
    assert md["exif"]["Make"] == "directxtex_tpu"
    assert md["dpi"][0] == 96


def test_heif_roundtrip(tmp_path):
    """HEIC/AVIF through the libheif bridge (WIC_CODEC_HEIF analog —
    the Windows HEIF codec fronts both; DirectXTexWIC.cpp scope note).
    Lossy: gate on close reconstruction, exact shape/metadata."""
    from directxtex_tpu.io import heif
    if not heif.is_available():
        pytest.skip("libheif unavailable")
    from directxtex_tpu.io import load_texture, save_texture
    h, w = 48, 64
    img = np.zeros((h, w, 4), np.float32)
    img[..., 0] = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    img[..., 1] = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    img[..., 2] = 0.5
    img[..., 3] = 1.0
    tex = Texture.from_array(img)
    for name in ("t.heic", "t.avif"):
        p = tmp_path / name
        save_texture(tex, p, quality=0.95)
        back = load_texture(p)
        assert (back.metadata.width, back.metadata.height) == (w, h)
        got = np.asarray(back.levels[0][0])
        assert np.abs(got - img).mean() < 0.02, name


def test_heif_metadata_query(tmp_path):
    from directxtex_tpu.io import heif, wic
    if not heif.is_available():
        pytest.skip("libheif unavailable")
    tex = Texture.from_array(np.full((16, 24, 4), 0.25, np.float32))
    blob = heif.save_to_heif_memory(tex, compression="hevc")
    md = wic.get_metadata_queries_from_wic_memory(blob)
    assert md["width"] == 24 and md["height"] == 16
    assert md["codec"] in ("heif", "avif")
