"""Format-core tests: values hand-derived from the DXGI spec and the
reference switches (DirectXTexUtil.cpp:594-1250)."""

import pytest

from directxtex_tpu.formats import (
    CP_FLAGS, FMT, bits_per_color, bits_per_pixel, bytes_per_block,
    calculate_mip_levels, calculate_mip_levels_3d, compute_pitch,
    compute_scanlines, format_from_name, has_alpha, is_bgr, is_compressed,
    is_depth_stencil, is_packed, is_palettized, is_planar, is_srgb,
    is_typeless, is_valid, is_video, make_linear, make_srgb, make_typeless,
    make_typeless_float, make_typeless_unorm,
)


def test_enum_values_match_windows_sdk():
    assert FMT.R8G8B8A8_UNORM == 28
    assert FMT.BC1_UNORM == 71
    assert FMT.BC7_UNORM_SRGB == 99
    assert FMT.B4G4R4A4_UNORM == 115
    assert FMT.P208 == 130
    assert FMT.A4B4G4R4_UNORM == 191


def test_format_from_name():
    assert format_from_name("BC7_UNORM") == FMT.BC7_UNORM
    assert format_from_name("DXGI_FORMAT_R8G8B8A8_UNORM_SRGB") == FMT.R8G8B8A8_UNORM_SRGB
    assert format_from_name("420_OPAQUE") == FMT.OPAQUE_420
    with pytest.raises(ValueError):
        format_from_name("NOT_A_FORMAT")


def test_bits_per_pixel():
    assert bits_per_pixel(FMT.R32G32B32A32_FLOAT) == 128
    assert bits_per_pixel(FMT.R32G32B32_FLOAT) == 96
    assert bits_per_pixel(FMT.R16G16B16A16_FLOAT) == 64
    assert bits_per_pixel(FMT.R8G8B8A8_UNORM) == 32
    assert bits_per_pixel(FMT.B5G6R5_UNORM) == 16
    assert bits_per_pixel(FMT.NV12) == 12
    assert bits_per_pixel(FMT.BC7_UNORM) == 8
    assert bits_per_pixel(FMT.BC1_UNORM) == 4
    assert bits_per_pixel(FMT.R1_UNORM) == 1
    assert bits_per_pixel(FMT.UNKNOWN) == 0


def test_bits_per_color():
    assert bits_per_color(FMT.R32_FLOAT) == 32
    assert bits_per_color(FMT.D24_UNORM_S8_UINT) == 24
    assert bits_per_color(FMT.BC6H_UF16) == 16
    assert bits_per_color(FMT.R9G9B9E5_SHAREDEXP) == 14
    assert bits_per_color(FMT.R11G11B10_FLOAT) == 11
    assert bits_per_color(FMT.R10G10B10A2_UNORM) == 10
    assert bits_per_color(FMT.BC7_UNORM) == 7
    assert bits_per_color(FMT.BC1_UNORM) == 6
    assert bits_per_color(FMT.B5G5R5A1_UNORM) == 5
    # palettized returns 0 by design
    assert bits_per_color(FMT.P8) == 0


def test_bytes_per_block():
    assert bytes_per_block(FMT.BC1_UNORM) == 8
    assert bytes_per_block(FMT.BC4_SNORM) == 8
    assert bytes_per_block(FMT.BC3_UNORM) == 16
    assert bytes_per_block(FMT.BC7_UNORM_SRGB) == 16
    assert bytes_per_block(FMT.R8G8B8A8_UNORM) == 0


def test_predicates():
    assert is_valid(FMT.R8G8B8A8_UNORM)
    assert not is_valid(FMT.UNKNOWN)
    assert is_compressed(FMT.BC6H_SF16)
    assert not is_compressed(FMT.R8G8B8A8_UNORM)
    assert is_packed(FMT.YUY2)
    assert not is_packed(FMT.NV12)
    assert is_video(FMT.NV12)
    assert is_planar(FMT.NV12)
    assert not is_planar(FMT.D24_UNORM_S8_UINT)
    assert is_planar(FMT.D24_UNORM_S8_UINT, isd3d12=True)
    assert is_palettized(FMT.AI44)
    assert is_depth_stencil(FMT.D32_FLOAT)
    assert is_srgb(FMT.BC7_UNORM_SRGB)
    assert not is_srgb(FMT.BC7_UNORM)
    assert is_bgr(FMT.B8G8R8A8_UNORM)
    assert is_typeless(FMT.BC7_TYPELESS)
    assert is_typeless(FMT.R24_UNORM_X8_TYPELESS)           # partial
    assert not is_typeless(FMT.R24_UNORM_X8_TYPELESS, False)
    assert has_alpha(FMT.BC1_UNORM)
    assert not has_alpha(FMT.BC5_UNORM)
    assert not has_alpha(FMT.BC6H_UF16)


def test_make_families():
    assert make_srgb(FMT.BC3_UNORM) == FMT.BC3_UNORM_SRGB
    assert make_srgb(FMT.BC4_UNORM) == FMT.BC4_UNORM  # no sRGB variant
    assert make_linear(FMT.B8G8R8X8_UNORM_SRGB) == FMT.B8G8R8X8_UNORM
    assert make_typeless(FMT.R8G8B8A8_UNORM_SRGB) == FMT.R8G8B8A8_TYPELESS
    assert make_typeless(FMT.D32_FLOAT) == FMT.R32_TYPELESS
    assert make_typeless(FMT.XBOX_R4G4_UNORM) == FMT.R8_TYPELESS
    assert make_typeless_unorm(FMT.BC7_TYPELESS) == FMT.BC7_UNORM
    assert make_typeless_float(FMT.R32_TYPELESS) == FMT.R32_FLOAT
    assert make_typeless_float(FMT.BC7_TYPELESS) == FMT.BC7_TYPELESS


def test_compute_pitch_uncompressed():
    # 256x256 RGBA8: 256*4 bytes per row
    assert compute_pitch(FMT.R8G8B8A8_UNORM, 256, 256) == (1024, 262144)
    # Odd width, 1bpp-ish rounding: 3 pixels at 32bpp
    assert compute_pitch(FMT.R8G8B8A8_UNORM, 3, 2) == (12, 24)
    # DWORD legacy alignment: 2 pixels * 24bpp override = 48 bits -> 8 bytes
    rp, sp = compute_pitch(FMT.R8G8B8A8_UNORM, 2, 1,
                           CP_FLAGS.LEGACY_DWORD | CP_FLAGS.BPP24)
    assert (rp, sp) == (8, 8)


def test_compute_pitch_bc():
    # 8x8 BC1 -> 2x2 blocks of 8 bytes
    assert compute_pitch(FMT.BC1_UNORM, 8, 8) == (16, 32)
    # 1x1 BC7 still occupies a full 16-byte block
    assert compute_pitch(FMT.BC7_UNORM, 1, 1) == (16, 16)
    # 10x6 BC1: 3x2 blocks
    assert compute_pitch(FMT.BC1_UNORM, 10, 6) == (24, 48)


def test_compute_pitch_video():
    # NV12 4x4: pitch 4, slice 4*(4+2)
    assert compute_pitch(FMT.NV12, 4, 4) == (4, 24)
    assert compute_pitch(FMT.YUY2, 5, 2) == (12, 24)
    with pytest.raises(ValueError):
        compute_pitch(FMT.NV12, 4, 3)


def test_compute_scanlines():
    assert compute_scanlines(FMT.R8G8B8A8_UNORM, 64) == 64
    assert compute_scanlines(FMT.BC1_UNORM, 64) == 16
    assert compute_scanlines(FMT.BC1_UNORM, 2) == 1
    assert compute_scanlines(FMT.NV12, 4) == 6


def test_mip_levels():
    assert calculate_mip_levels(1, 1) == 1
    assert calculate_mip_levels(64, 64) == 7
    assert calculate_mip_levels(64, 2) == 7
    assert calculate_mip_levels(100, 100) == 7  # 100,50,25,12,6,3,1
    assert calculate_mip_levels(64, 64, 3) == 3
    with pytest.raises(ValueError):
        calculate_mip_levels(4, 4, 9)
    assert calculate_mip_levels_3d(8, 8, 8) == 4
    assert calculate_mip_levels_3d(2, 2, 16) == 5
