"""Pack/unpack engine tests.

Decode expectations hand-derived from the reference LoadScanline
(DirectXTexConvert.cpp:779-1641); round-trips exercise StoreScanline
equivalents.
"""

import numpy as np
import pytest

from directxtex_tpu.formats import FMT
from directxtex_tpu.formats.packing import (
    is_packable, pack, pack_image, unpack, unpack_image,
)


def u8(*vals):
    return np.array(vals, np.uint8)


def le16(*words):
    return np.frombuffer(np.array(words, "<u2").tobytes(), np.uint8)


def le32(*words):
    return np.frombuffer(np.array(words, "<u4").tobytes(), np.uint8)


# ---------------------------------------------------------------------------
# exact decode values
# ---------------------------------------------------------------------------

def test_unpack_rgba8():
    out = np.asarray(unpack(FMT.R8G8B8A8_UNORM, u8(0, 128, 255, 64), 1))
    np.testing.assert_allclose(out[0], [0, 128 / 255, 1.0, 64 / 255], rtol=1e-6)


def test_unpack_bgra8_swizzle():
    out = np.asarray(unpack(FMT.B8G8R8A8_UNORM, u8(10, 20, 30, 40), 1))
    np.testing.assert_allclose(out[0], [30 / 255, 20 / 255, 10 / 255, 40 / 255], rtol=1e-6)


def test_unpack_bgrx_alpha_one():
    out = np.asarray(unpack(FMT.B8G8R8X8_UNORM, u8(10, 20, 30, 99), 1))
    assert out[0, 3] == 1.0
    np.testing.assert_allclose(out[0, :3], [30 / 255, 20 / 255, 10 / 255], rtol=1e-6)


def test_unpack_a8():
    out = np.asarray(unpack(FMT.A8_UNORM, u8(128), 1))
    np.testing.assert_allclose(out[0], [0, 0, 0, 128 / 255], rtol=1e-6)


def test_unpack_missing_channels_fill():
    out = np.asarray(unpack(FMT.R8_UNORM, u8(255), 1))
    np.testing.assert_allclose(out[0], [1, 0, 0, 1])
    out = np.asarray(unpack(FMT.R16G16_FLOAT, le16(0x3C00, 0xC000), 1))
    np.testing.assert_allclose(out[0], [1.0, -2.0, 0, 1])


def test_unpack_565():
    # word: r=31 (bits 11-15), g=32, b=0
    word = (31 << 11) | (32 << 5)
    out = np.asarray(unpack(FMT.B5G6R5_UNORM, le16(word), 1))
    np.testing.assert_allclose(out[0], [1.0, 32 / 63, 0.0, 1.0], rtol=1e-6)


def test_unpack_5551():
    word = (1 << 15) | (10 << 10) | (20 << 5) | 30
    out = np.asarray(unpack(FMT.B5G5R5A1_UNORM, le16(word), 1))
    np.testing.assert_allclose(out[0], [10 / 31, 20 / 31, 30 / 31, 1.0], rtol=1e-6)


def test_unpack_4444_variants():
    word = (0xA << 12) | (0xB << 8) | (0xC << 4) | 0xD
    out = np.asarray(unpack(FMT.B4G4R4A4_UNORM, le16(word), 1))
    np.testing.assert_allclose(out[0], [0xB / 15, 0xC / 15, 0xD / 15, 0xA / 15], rtol=1e-6)
    out = np.asarray(unpack(FMT.A4B4G4R4_UNORM, le16(word), 1))
    np.testing.assert_allclose(out[0], [0xA / 15, 0xB / 15, 0xC / 15, 0xD / 15], rtol=1e-6)


def test_unpack_snorm_most_negative_clamps():
    out = np.asarray(unpack(FMT.R8G8B8A8_SNORM, u8(0x80, 0x81, 0x7F, 0), 1))
    np.testing.assert_allclose(out[0], [-1.0, -1.0, 1.0, 0.0], rtol=1e-6)
    out = np.asarray(unpack(FMT.R16_SNORM, le16(0x8000), 1))
    assert out[0, 0] == -1.0


def test_unpack_r10g10b10a2():
    word = 1023 | (512 << 10) | (0 << 20) | (3 << 30)
    out = np.asarray(unpack(FMT.R10G10B10A2_UNORM, le32(word), 1))
    np.testing.assert_allclose(out[0], [1.0, 512 / 1023, 0.0, 1.0], rtol=1e-6)


def test_unpack_r11g11b10():
    # exponent 15, mantissa 0 -> 1.0 for each channel
    r = 15 << 6
    g = 15 << 6
    b = 15 << 5
    word = r | (g << 11) | (b << 22)
    out = np.asarray(unpack(FMT.R11G11B10_FLOAT, le32(word), 1))
    np.testing.assert_allclose(out[0], [1.0, 1.0, 1.0, 1.0])


def test_unpack_9995e():
    # m=(256,128,64), e=16 -> value = m * 2^(16-24)
    word = 256 | (128 << 9) | (64 << 18) | (16 << 27)
    out = np.asarray(unpack(FMT.R9G9B9E5_SHAREDEXP, le32(word), 1))
    np.testing.assert_allclose(out[0], [1.0, 0.5, 0.25, 1.0])


def test_unpack_xr_bias():
    # code 0x180 -> 0.0; code 0x180+510 -> 1.0
    word = 0x180 | ((0x180 + 510) << 10) | (0x180 << 20)
    out = np.asarray(unpack(FMT.R10G10B10_XR_BIAS_A2_UNORM, le32(word), 1))
    np.testing.assert_allclose(out[0], [0.0, 1.0, 0.0, 0.0], atol=1e-6)


def test_unpack_d24s8():
    word = 0xFFFFFF | (200 << 24)
    out = np.asarray(unpack(FMT.D24_UNORM_S8_UINT, le32(word), 1))
    np.testing.assert_allclose(out[0], [1.0, 200.0, 0.0, 1.0])


def test_unpack_d32s8():
    buf = np.frombuffer(np.array([0.5], "<f4").tobytes() + b"\x2a\x00\x00\x00", np.uint8)
    out = np.asarray(unpack(FMT.D32_FLOAT_S8X24_UINT, buf, 1))
    np.testing.assert_allclose(out[0], [0.5, 42.0, 0.0, 1.0])


def test_unpack_r1():
    out = np.asarray(unpack(FMT.R1_UNORM, u8(0b10100000), 3))
    np.testing.assert_allclose(out[:, 0], [1, 0, 1])


def test_unpack_rgbg_pairs():
    out = np.asarray(unpack(FMT.R8G8_B8G8_UNORM, u8(100, 10, 200, 20), 2))
    np.testing.assert_allclose(out[0], [100 / 255, 10 / 255, 200 / 255, 1], rtol=1e-6)
    np.testing.assert_allclose(out[1], [100 / 255, 20 / 255, 200 / 255, 1], rtol=1e-6)


def test_unpack_uint_sint():
    out = np.asarray(unpack(FMT.R8G8B8A8_UINT, u8(0, 100, 200, 255), 1))
    np.testing.assert_allclose(out[0], [0, 100, 200, 255])
    out = np.asarray(unpack(FMT.R8G8B8A8_SINT, u8(0x80, 0xFF, 0x7F, 1), 1))
    np.testing.assert_allclose(out[0], [-128, -1, 127, 1])


def test_unpack_ayuv_grey():
    # Y=180, U=V=128 is neutral grey: r=g=b=(298*(180-16)+128)>>8 = 191
    out = np.asarray(unpack(FMT.AYUV, u8(128, 128, 180, 255), 1))
    expected = ((298 * 164 + 128) >> 8) / 255.0
    np.testing.assert_allclose(out[0, :3], [expected] * 3, rtol=1e-6)
    assert out[0, 3] == 1.0


def test_unpack_y416_white():
    # neutral: u=v=32768, y=61440 -> full white-ish
    buf = le16(32768, 61440, 32768, 65535)
    out = np.asarray(unpack(FMT.Y416, buf, 1))
    expected = min((76607 * (61440 - 4096) + 32768) >> 16, 65535) / 65535.0
    np.testing.assert_allclose(out[0, :3], [expected] * 3, rtol=1e-5)


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------

ROUNDTRIP_EXACT = [
    FMT.R32G32B32A32_FLOAT, FMT.R32G32B32_FLOAT, FMT.R32G32_FLOAT,
    FMT.R32_FLOAT, FMT.D32_FLOAT,
    FMT.R16G16B16A16_FLOAT, FMT.R16G16_FLOAT, FMT.R16_FLOAT,
    FMT.R16G16B16A16_UNORM, FMT.R16G16_UNORM, FMT.R16_UNORM, FMT.D16_UNORM,
    FMT.R8G8B8A8_UNORM, FMT.R8G8B8A8_UNORM_SRGB, FMT.R8G8_UNORM, FMT.R8_UNORM,
    FMT.A8_UNORM, FMT.B8G8R8A8_UNORM, FMT.B8G8R8A8_UNORM_SRGB,
    FMT.B5G6R5_UNORM, FMT.B5G5R5A1_UNORM, FMT.B4G4R4A4_UNORM,
    FMT.A4B4G4R4_UNORM, FMT.R10G10B10A2_UNORM,
    FMT.R9G9B9E5_SHAREDEXP, FMT.R11G11B10_FLOAT,
    FMT.XBOX_R10G10B10_SNORM_A2_UNORM, FMT.XBOX_R4G4_UNORM,
    FMT.R8G8B8A8_SNORM, FMT.R16G16B16A16_SNORM,
    FMT.R10G10B10_XR_BIAS_A2_UNORM,
    FMT.D24_UNORM_S8_UINT,
]


@pytest.mark.parametrize("fmt", ROUNDTRIP_EXACT, ids=lambda f: f.name)
def test_roundtrip_code_stable(fmt):
    """pack(unpack(x)) == x for random wire bytes is too strict for lossy
    channels; instead check unpack(pack(unpack(x))) == unpack(x): decoded
    values must be a fixed point of the codec."""
    rng = np.random.default_rng(hash(fmt) % 2**32)
    from directxtex_tpu.formats import bits_per_pixel
    nbytes = bits_per_pixel(fmt) * 64 // 8
    raw = rng.integers(0, 256, nbytes, dtype=np.uint8)
    first = np.asarray(unpack(fmt, raw, 64))
    if not np.all(np.isfinite(first)):
        # random float bits can produce inf/nan; mask them out by re-rolling
        raw = np.where(np.isfinite(first).all(), raw, raw // 2).astype(np.uint8)
        first = np.asarray(unpack(fmt, raw, 64))
        if not np.all(np.isfinite(first)):
            pytest.skip("random bits hit non-finite floats")
    repacked = np.asarray(pack(fmt, first))
    second = np.asarray(unpack(fmt, repacked, 64))
    np.testing.assert_allclose(second, first, rtol=1e-5, atol=1e-6)


def test_pack_unorm_rounding():
    vals = np.array([[0.4999 / 255 * 255, 0, 0, 1]], np.float32)
    # 0.5/255 boundary: 127.4999.../255 -> 127, 127.5/255 -> 128
    rgba = np.array([[127.49 / 255, 127.51 / 255, 0, 1]], np.float32)
    out = np.asarray(pack(FMT.R8G8B8A8_UNORM, rgba))
    assert out[0] == 127 and out[1] == 128


def test_pack_5551_threshold():
    rgba = np.array([[0, 0, 0, 0.4], [0, 0, 0, 0.6]], np.float32)
    out = np.frombuffer(np.asarray(pack(FMT.B5G5R5A1_UNORM, rgba)).tobytes(), "<u2")
    assert (out[0] >> 15) == 0 and (out[1] >> 15) == 1


def test_image_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.random((8, 6, 4)).astype(np.float32)
    data = pack_image(FMT.R16G16B16A16_UNORM, img)
    back = np.asarray(unpack_image(FMT.R16G16B16A16_UNORM, data, 6, 8))
    np.testing.assert_allclose(back, img, atol=1.0 / 65535)


def test_yuy2_pair_roundtrip():
    # two identical pixels survive the 4:2:2 chroma subsample closely
    rgba = np.tile(np.array([[0.5, 0.25, 0.75, 1.0]], np.float32), (2, 1))
    data = pack(FMT.YUY2, rgba)
    back = np.asarray(unpack(FMT.YUY2, data, 2))
    np.testing.assert_allclose(back[:, :3], rgba[:, :3], atol=0.02)


def test_is_packable():
    assert is_packable(FMT.R8G8B8A8_UNORM)
    assert is_packable(FMT.Y216)
    assert not is_packable(FMT.BC7_UNORM)
    assert not is_packable(FMT.NV12)
    assert not is_packable(FMT.P8)
