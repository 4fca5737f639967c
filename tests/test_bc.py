"""BC1-BC5 codec tests.

Decode correctness is checked against an independent scalar numpy decoder
written from the D3D functional spec (acting as the second implementation
since the reference C++ can't be built here — no DirectXMath on the image).
Encode quality is gated by round-trip PSNR and exactness properties (solid
blocks, two-color blocks, boundary alphas).
"""

import numpy as np
import pytest

from directxtex_tpu.bc import bc123, bc45
from directxtex_tpu.bc.common import blocks_to_image, image_to_blocks


# ---------------------------------------------------------------------------
# independent scalar decoders (D3D spec)
# ---------------------------------------------------------------------------

def ref_decode_bc1_block(data: bytes, isbc1=True):
    c0 = data[0] | (data[1] << 8)
    c1 = data[2] | (data[3] << 8)
    bitmap = int.from_bytes(data[4:8], "little")

    def c565(w):
        return np.array([
            np.float32((w >> 11) & 31) * np.float32(1 / 31),
            np.float32((w >> 5) & 63) * np.float32(1 / 63),
            np.float32(w & 31) * np.float32(1 / 31), np.float32(1.0)],
            np.float32)

    p = np.zeros((4, 4), np.float32)
    p[0] = c565(c0)
    p[1] = c565(c1)
    if isbc1 and c0 <= c1:
        p[2] = p[0] + np.float32(0.5) * (p[1] - p[0])
        p[3] = 0.0
    else:
        p[2] = p[0] + np.float32(1 / 3) * (p[1] - p[0])
        p[3] = p[0] + np.float32(2 / 3) * (p[1] - p[0])
    out = np.zeros((16, 4), np.float32)
    for i in range(16):
        out[i] = p[(bitmap >> (2 * i)) & 3]
    return out


def ref_decode_bc4_block(data: bytes, signed=False):
    if signed:
        r0 = int.from_bytes(data[0:1], "little", signed=True)
        r1 = int.from_bytes(data[1:2], "little", signed=True)
        s0 = -127 if r0 == -128 else r0
        s1 = -127 if r1 == -128 else r1
        f0 = np.float32(s0) / np.float32(127)
        f1 = np.float32(s1) / np.float32(127)
        lo, hi = np.float32(-1), np.float32(1)
        eight = r0 > r1
    else:
        r0, r1 = data[0], data[1]
        f0 = np.float32(r0) / np.float32(255)
        f1 = np.float32(r1) / np.float32(255)
        lo, hi = np.float32(0), np.float32(1)
        eight = r0 > r1
    pal = np.zeros(8, np.float32)
    pal[0], pal[1] = f0, f1
    if eight:
        for i in range(1, 7):
            pal[i + 1] = (f0 * np.float32(7 - i) + f1 * np.float32(i)) / np.float32(7)
    else:
        for i in range(1, 5):
            pal[i + 1] = (f0 * np.float32(5 - i) + f1 * np.float32(i)) / np.float32(5)
        pal[6], pal[7] = lo, hi
    bits = int.from_bytes(data[2:8], "little")
    return np.array([pal[(bits >> (3 * i)) & 7] for i in range(16)], np.float32)


def rand_blocks(nb, seed=0, nbytes=8):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (nb, nbytes), dtype=np.uint8)


def rand_colors(nb, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((nb, 16, 4)).astype(np.float32)


def psnr(a, b, channels=3):
    mse = np.mean((a[..., :channels] - b[..., :channels]) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-30))


# ---------------------------------------------------------------------------
# block layout
# ---------------------------------------------------------------------------

def test_image_block_roundtrip():
    rng = np.random.default_rng(0)
    for h, w in [(8, 8), (4, 4), (10, 6), (1, 1), (5, 13)]:
        img = rng.random((h, w, 4)).astype(np.float32)
        blocks, nbh, nbw = image_to_blocks(img)
        assert blocks.shape == ((h + 3) // 4 * ((w + 3) // 4), 16, 4)
        back = np.asarray(blocks_to_image(blocks, h, w))
        np.testing.assert_array_equal(back, img)


def test_partial_block_edge_replication():
    img = np.arange(2 * 2 * 1, dtype=np.float32).reshape(2, 2, 1)
    blocks, _, _ = image_to_blocks(img)
    b = np.asarray(blocks).reshape(4, 4)
    # row 0: 0 1 1 1 (right edge replicated)
    np.testing.assert_array_equal(b[0], [0, 1, 1, 1])
    np.testing.assert_array_equal(b[3], [2, 3, 3, 3])  # bottom edge


# ---------------------------------------------------------------------------
# decode bit-exactness vs independent decoder
# ---------------------------------------------------------------------------

def test_decode_bc1_exact():
    blocks = rand_blocks(256, 1)
    # force some 3-color blocks (c0 <= c1)
    blocks[:64, 2:4] = 0xFF
    got = np.asarray(bc123.decode_bc1(blocks))
    for i in range(0, 256, 17):
        expect = ref_decode_bc1_block(blocks[i].tobytes())
        np.testing.assert_array_equal(got[i], expect)


def test_decode_bc2_exact():
    blocks = rand_blocks(64, 2, 16)
    got = np.asarray(bc123.decode_bc2(blocks))
    for i in range(0, 64, 7):
        rgb = ref_decode_bc1_block(blocks[i, 8:].tobytes(), isbc1=False)
        bits = int.from_bytes(blocks[i, :8].tobytes(), "little")
        for p in range(16):
            a = np.float32((bits >> (4 * p)) & 0xF) * np.float32(1 / 15)
            assert got[i, p, 3] == a
        np.testing.assert_array_equal(got[i, :, :3], rgb[:, :3])


def test_decode_bc3_exact():
    blocks = rand_blocks(64, 3, 16)
    got = np.asarray(bc123.decode_bc3(blocks))
    for i in range(0, 64, 5):
        a0, a1 = int(blocks[i, 0]), int(blocks[i, 1])
        f0 = np.float32(a0) * np.float32(1 / 255)
        f1 = np.float32(a1) * np.float32(1 / 255)
        pal = np.zeros(8, np.float32)
        pal[0], pal[1] = f0, f1
        if a0 > a1:
            for k in range(1, 7):
                pal[k + 1] = (f0 * np.float32(7 - k) + f1 * np.float32(k)) * np.float32(1 / 7)
        else:
            for k in range(1, 5):
                pal[k + 1] = (f0 * np.float32(5 - k) + f1 * np.float32(k)) * np.float32(1 / 5)
            pal[6], pal[7] = 0.0, 1.0
        bits = int.from_bytes(blocks[i, 2:8].tobytes(), "little")
        for p in range(16):
            assert got[i, p, 3] == pal[(bits >> (3 * p)) & 7], (i, p)


def test_decode_bc4_exact():
    blocks = rand_blocks(128, 4)
    gotu = np.asarray(bc45.decode_bc4u(blocks))
    gots = np.asarray(bc45.decode_bc4s(blocks))
    for i in range(0, 128, 11):
        np.testing.assert_array_equal(gotu[i, :, 0],
                                      ref_decode_bc4_block(blocks[i].tobytes()))
        np.testing.assert_array_equal(
            gots[i, :, 0], ref_decode_bc4_block(blocks[i].tobytes(), True))
    # snorm -128 clamp
    special = np.zeros((1, 8), np.uint8)
    special[0, 0] = 0x80
    out = np.asarray(bc45.decode_bc4s(special))
    assert out[0, 0, 0] == -1.0


def test_decode_bc5():
    blocks = rand_blocks(32, 5, 16)
    got = np.asarray(bc45.decode_bc5u(blocks))
    r = np.asarray(bc45.decode_bc4u(blocks[:, :8]))
    g = np.asarray(bc45.decode_bc4u(blocks[:, 8:]))
    np.testing.assert_array_equal(got[..., 0], r[..., 0])
    np.testing.assert_array_equal(got[..., 1], g[..., 0])
    assert np.all(got[..., 2] == 0) and np.all(got[..., 3] == 1)


# ---------------------------------------------------------------------------
# encode properties + round-trip quality
# ---------------------------------------------------------------------------

def test_encode_bc1_solid_color():
    c = np.tile(np.array([0.5, 0.25, 0.75, 1.0], np.float32), (4, 16, 1))
    enc = np.asarray(bc123.encode_bc1(c))
    dec = np.asarray(bc123.decode_bc1(enc))
    # solid block must round-trip within 565 quantization
    assert np.abs(dec[..., 0] - 0.5).max() <= 0.5 / 31 + 1e-5
    assert np.abs(dec[..., 1] - 0.25).max() <= 0.5 / 63 + 1e-5
    assert np.abs(dec[..., 2] - 0.75).max() <= 0.5 / 31 + 1e-5


def test_encode_bc1_two_color():
    c = np.zeros((1, 16, 4), np.float32)
    c[0, :8] = [1, 0, 0, 1]
    c[0, 8:] = [0, 0, 1, 1]
    dec = np.asarray(bc123.decode_bc1(np.asarray(bc123.encode_bc1(c))))
    np.testing.assert_allclose(dec[0, :8, 0], 1.0, atol=0.02)
    np.testing.assert_allclose(dec[0, 8:, 2], 1.0, atol=0.02)


def test_encode_bc1_transparent():
    c = rand_colors(4, 7)
    c[0, :, 3] = 0.0          # fully transparent block
    c[1, :8, 3] = 0.0         # half transparent
    c[1, 8:, 3] = 1.0
    c[2:, :, 3] = 1.0
    enc = np.asarray(bc123.encode_bc1(c, threshold=0.5))
    dec = np.asarray(bc123.decode_bc1(enc))
    assert np.all(dec[0, :, 3] == 0.0)
    assert np.all(dec[1, :8, 3] == 0.0)
    assert np.all(dec[1, 8:, 3] == 1.0)
    assert np.all(dec[2:, :, 3] == 1.0)


def test_encode_bc1_quality():
    # Random noise is pathological for BC1 (~12.8 dB is near the information-
    # theoretic limit); gate on closeness to the optimal index assignment for
    # the chosen endpoints instead of an absolute PSNR.
    c = rand_colors(512, 11)
    c[..., 3] = 1.0
    enc = np.asarray(bc123.encode_bc1(c))
    dec = np.asarray(bc123.decode_bc1(enc))
    q = psnr(dec, c)
    assert q > 12, q
    # optimal assignment given the encoder's endpoints
    w = enc.view("<u2")
    c0, c1 = w[:, 0].astype(int), w[:, 1].astype(int)
    def pal565(v):
        return np.stack([(v >> 11 & 31) / 31, (v >> 5 & 63) / 63,
                         (v & 31) / 31], -1).astype(np.float32)
    p0, p1 = pal565(c0), pal565(c1)
    pal = np.stack([p0, p1, p0 + (p1 - p0) / 3, p0 + 2 * (p1 - p0) / 3], 1)
    d = ((c[:, :, None, :3] - pal[:, None]) ** 2).sum(-1)
    optimal_mse = d.min(2).mean()
    achieved_mse = ((dec[..., :3] - c[..., :3]) ** 2).sum(-1).mean()
    assert achieved_mse < optimal_mse * 1.2, (achieved_mse, optimal_mse)


def test_encode_bc1_smooth_quality():
    # colinear gradient (colors on one line): BC1's ideal case
    x = np.linspace(0, 1, 64, dtype=np.float32)
    gx, _ = np.meshgrid(x, x)
    img = np.stack([gx, gx * 0.5, gx * 0.25 + 0.1], axis=-1)
    img = np.concatenate([img, np.ones((64, 64, 1), np.float32)], axis=-1)
    blocks, _, _ = image_to_blocks(img)
    dec = np.asarray(bc123.decode_bc1(np.asarray(bc123.encode_bc1(blocks))))
    q = psnr(dec, np.asarray(blocks))
    assert q > 40, q
    # planar (2-axis) gradients are inherently harder for a single color
    # line; the reference lands in the same mid-30s dB range
    gy = np.meshgrid(x, x)[1]
    img2 = np.stack([gx, gy, np.full((64, 64), 0.3, np.float32)], axis=-1)
    img2 = np.concatenate([img2, np.ones((64, 64, 1), np.float32)], axis=-1)
    blocks2, _, _ = image_to_blocks(img2)
    dec2 = np.asarray(bc123.decode_bc1(np.asarray(bc123.encode_bc1(blocks2))))
    assert psnr(dec2, np.asarray(blocks2)) > 33


def test_encode_bc1_uniform_flag():
    c = rand_colors(64, 3)
    c[..., 3] = 1.0
    d1 = np.asarray(bc123.decode_bc1(np.asarray(bc123.encode_bc1(c))))
    d2 = np.asarray(bc123.decode_bc1(np.asarray(
        bc123.encode_bc1(c, flags=bc123.BC_FLAGS_UNIFORM))))
    # both are sane encodings
    assert psnr(d1, c) > 12 and psnr(d2, c) > 12


def test_encode_bc2_alpha_exact_grid():
    c = rand_colors(32, 13)
    enc = np.asarray(bc123.encode_bc2(c))
    dec = np.asarray(bc123.decode_bc2(enc))
    # BC2 alpha is explicit 4-bit: max error half a step
    assert np.abs(dec[..., 3] - c[..., 3]).max() <= 0.5 / 15 + 1e-5
    assert psnr(dec, c) > 12


def test_encode_bc3_alpha():
    c = rand_colors(128, 17)
    # smooth alpha ramps compress well
    c[..., 3] = np.linspace(0.1, 0.9, 16)[None, :]
    dec = np.asarray(bc123.decode_bc3(np.asarray(bc123.encode_bc3(c))))
    err = np.abs(dec[..., 3] - c[..., 3]).max()
    assert err < 0.04, err


def test_encode_bc3_boundary_alpha_exact():
    c = rand_colors(8, 19)
    c[:, :4, 3] = 0.0
    c[:, 4:8, 3] = 1.0
    dec = np.asarray(bc123.decode_bc3(np.asarray(bc123.encode_bc3(c))))
    # 6-step codec guarantees exact 0 and 1 codes
    assert np.all(dec[:, :4, 3] == 0.0)
    assert np.all(dec[:, 4:8, 3] == 1.0)


def test_encode_bc3_opaque_block():
    c = rand_colors(4, 23)
    c[..., 3] = 1.0
    enc = np.asarray(bc123.encode_bc3(c))
    # all-opaque alpha block: alpha bytes 0xff, bitmap zero
    assert np.all(enc[:, 0] == 0xFF) and np.all(enc[:, 1] == 0xFF)
    assert np.all(enc[:, 2:8] == 0)


def test_encode_bc4_roundtrip():
    c = rand_colors(256, 29)
    dec = np.asarray(bc45.decode_bc4u(np.asarray(bc45.encode_bc4u(c))))
    err = np.abs(dec[..., 0] - c[..., 0])
    assert err.mean() < 0.03, err.mean()

    s = c * 2.0 - 1.0
    decs = np.asarray(bc45.decode_bc4s(np.asarray(bc45.encode_bc4s(s))))
    errs = np.abs(decs[..., 0] - s[..., 0])
    assert errs.mean() < 0.06, errs.mean()


def test_encode_bc5_roundtrip():
    c = rand_colors(128, 31)
    dec = np.asarray(bc45.decode_bc5u(np.asarray(bc45.encode_bc5u(c))))
    assert np.abs(dec[..., 0] - c[..., 0]).mean() < 0.03
    assert np.abs(dec[..., 1] - c[..., 1]).mean() < 0.03


def test_encode_bc1_dither_runs():
    # dithering helps (or at least doesn't wreck) smooth content
    x = np.linspace(0.2, 0.4, 64, dtype=np.float32)
    gx, _ = np.meshgrid(x, x)
    img = np.stack([gx, gx, gx, np.ones((64, 64), np.float32)], axis=-1)
    blocks = np.asarray(image_to_blocks(img)[0])
    d0 = np.asarray(bc123.decode_bc1(np.asarray(bc123.encode_bc1(blocks))))
    d1 = np.asarray(bc123.decode_bc1(np.asarray(
        bc123.encode_bc1(blocks, flags=bc123.BC_FLAGS_DITHER_RGB))))
    q0, q1 = psnr(d0, blocks), psnr(d1, blocks)
    assert q1 > q0 - 3, (q0, q1)
