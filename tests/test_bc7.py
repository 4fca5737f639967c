"""BC7 decode tests vs an independent scalar decoder.

The scalar decoder below is written directly from the Direct3D 11 functional
spec (section on BC7), independently of the vectorized implementation, and
serves as the second implementation for bit-exactness checks.
"""

import numpy as np
import pytest

from directxtex_tpu.bc import bc67
from directxtex_tpu.bc.bc67_tables import FIXUPS, PARTITIONS, WEIGHTS2, WEIGHTS3, WEIGHTS4

# (partitions, partition_bits, p_bits, rot_bits, im_bits, iprec, iprec2,
#  prec rgba, prec-with-p rgba)
SPEC_MODES = [
    (2, 4, 6, 0, 0, 3, 0, (4, 4, 4, 0), (5, 5, 5, 0)),
    (1, 6, 2, 0, 0, 3, 0, (6, 6, 6, 0), (7, 7, 7, 0)),
    (2, 6, 0, 0, 0, 2, 0, (5, 5, 5, 0), (5, 5, 5, 0)),
    (1, 6, 4, 0, 0, 2, 0, (7, 7, 7, 0), (8, 8, 8, 0)),
    (0, 0, 0, 2, 1, 2, 3, (5, 5, 5, 6), (5, 5, 5, 6)),
    (0, 0, 0, 2, 0, 2, 2, (7, 7, 7, 8), (7, 7, 7, 8)),
    (0, 0, 2, 0, 0, 4, 0, (7, 7, 7, 7), (8, 8, 8, 8)),
    (1, 6, 4, 0, 0, 2, 0, (5, 5, 5, 5), (6, 6, 6, 6)),
]

WTABLES = {2: WEIGHTS2, 3: WEIGHTS3, 4: WEIGHTS4}


class BitReader:
    def __init__(self, data: bytes):
        self.v = int.from_bytes(data, "little")
        self.pos = 0

    def get(self, n):
        out = (self.v >> self.pos) & ((1 << n) - 1)
        self.pos += n
        return out


def scalar_decode_bc7(data: bytes) -> np.ndarray:
    br = BitReader(data)
    mode = 0
    while mode < 8 and br.get(1) == 0:
        mode += 1
    if mode >= 8:
        return np.zeros((16, 4), np.float32)

    (parts, pbits_n, pb, rotb, imb, iprec, iprec2, prec, precp) = SPEC_MODES[mode]
    n_subsets = parts + 1
    n_ep = n_subsets * 2

    shape = br.get(pbits_n)
    rot = br.get(rotb)
    imode = br.get(imb)

    ep = np.zeros((n_ep, 4), np.int64)
    for ch in range(4):
        for e in range(n_ep):
            if prec[ch]:
                ep[e, ch] = br.get(prec[ch])
    P = [br.get(1) for _ in range(pb)]
    if pb:
        for e in range(n_ep):
            pi = e * pb // n_ep
            for ch in range(4):
                if prec[ch] != precp[ch]:
                    ep[e, ch] = (ep[e, ch] << 1) | P[pi]

    def unq(c, p):
        if p >= 8 or p == 0:
            return c
        c = (c << (8 - p)) & 0xFF
        return c | (c >> p)

    for ch in range(4):
        if precp[ch]:
            for e in range(n_ep):
                ep[e, ch] = unq(ep[e, ch], precp[ch])
        else:
            ep[:, ch] = 255

    anchors = {0}
    for s in range(1, n_subsets):
        anchors.add(int(FIXUPS[parts, shape, s]))

    w1 = []
    for i in range(16):
        nb = iprec - 1 if i in anchors else iprec
        w1.append(br.get(nb))
    w2 = []
    if iprec2:
        for i in range(16):
            nb = iprec2 - 1 if i == 0 else iprec2
            w2.append(br.get(nb))

    out = np.zeros((16, 4), np.int64)
    for i in range(16):
        region = int(PARTITIONS[parts, shape, i])
        e0, e1 = ep[region * 2], ep[region * 2 + 1]
        if not iprec2:
            wc = wa = int(WTABLES[iprec][w1[i]])
        elif imode == 0:
            wc = int(WTABLES[iprec][w1[i]])
            wa = int(WTABLES[iprec2][w2[i]])
        else:
            wc = int(WTABLES[iprec2][w2[i]])
            wa = int(WTABLES[iprec][w1[i]])
        px = [(( (64 - wc) * e0[c] + wc * e1[c] + 32) >> 6) for c in range(3)]
        pa = ((64 - wa) * e0[3] + wa * e1[3] + 32) >> 6
        px.append(pa)
        if rot == 1:
            px[0], px[3] = px[3], px[0]
        elif rot == 2:
            px[1], px[3] = px[3], px[1]
        elif rot == 3:
            px[2], px[3] = px[3], px[2]
        out[i] = px
    return (out.astype(np.float32) * np.float32(1.0 / 255.0))


def blocks_with_mode(mode: int, n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    # force mode bits: lowest set bit of byte0 at position `mode`
    keep_mask = np.uint8((~((1 << (mode + 1)) - 1)) & 0xFF)
    blocks[:, 0] = (blocks[:, 0] & keep_mask) | np.uint8(1 << mode)
    return blocks


@pytest.mark.parametrize("mode", range(8))
def test_decode_bc7_modes_exact(mode):
    blocks = blocks_with_mode(mode, 64, mode + 100)
    got = np.asarray(bc67.decode_bc7(blocks))
    for i in range(0, 64, 7):
        expect = scalar_decode_bc7(blocks[i].tobytes())
        np.testing.assert_array_equal(got[i], expect, err_msg=f"mode {mode} block {i}")


def test_decode_bc7_reserved_mode():
    blocks = np.zeros((2, 16), np.uint8)  # byte0 == 0 -> reserved
    out = np.asarray(bc67.decode_bc7(blocks))
    assert np.all(out == 0.0)


def test_decode_bc7_random_mixed():
    rng = np.random.default_rng(77)
    blocks = rng.integers(0, 256, (256, 16), dtype=np.uint8)
    got = np.asarray(bc67.decode_bc7(blocks))
    for i in range(0, 256, 31):
        expect = scalar_decode_bc7(blocks[i].tobytes())
        np.testing.assert_array_equal(got[i], expect, err_msg=f"block {i}")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def img_blocks(with_alpha=False, seed=1):
    from directxtex_tpu.bc.common import image_to_blocks
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, 32, dtype=np.float32)
    gx, gy = np.meshgrid(x, x)
    img = np.stack([np.sin(gx * 9) * 0.4 + 0.5, gy * 0.8, gx * gy,
                    np.clip(gy, 0, 1) if with_alpha else np.ones_like(gx)], -1)
    img += (rng.random(img.shape).astype(np.float32) - 0.5) * 0.04
    img = (np.round(np.clip(img, 0, 1) * 255) / 255).astype(np.float32)
    if not with_alpha:
        img[..., 3] = 1.0
    return np.asarray(image_to_blocks(img)[0])


def rgba_psnr(a, b):
    m = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(m, 1e-30))


def test_encode_bc7_quick_mode6():
    blocks = img_blocks()
    enc = np.asarray(bc67.encode_bc7(blocks, flags=0x100000))
    assert np.all(enc[:, 0] & 0x7F == 0x40)  # every block is mode 6
    dec = np.asarray(bc67.decode_bc7(enc))
    q = rgba_psnr(dec, blocks)
    assert q > 34, q
    # encoder output decodes identically in the scalar decoder
    for i in range(0, len(enc), 17):
        np.testing.assert_array_equal(dec[i], scalar_decode_bc7(enc[i].tobytes()))


def test_encode_bc7_full_beats_quick():
    blocks = img_blocks()
    q_quick = rgba_psnr(np.asarray(bc67.decode_bc7(
        np.asarray(bc67.encode_bc7(blocks, flags=0x100000)))), blocks)
    q_full = rgba_psnr(np.asarray(bc67.decode_bc7(
        np.asarray(bc67.encode_bc7(blocks)))), blocks)
    assert q_full >= q_quick - 1e-3, (q_full, q_quick)
    assert q_full > 36, q_full


def test_encode_bc7_maxquality_tier():
    """TEX_COMPRESS_BC7_MAXQUALITY (the OptimizeEndPoints-analog ladder,
    BC6HBC7.cpp:2926-3044) must not lose to the default search on either
    opaque or alpha content, and its bitstreams must stay valid."""
    for with_alpha in (False, True):
        blocks = img_blocks(with_alpha=with_alpha)
        base = rgba_psnr(np.asarray(bc67.decode_bc7(
            np.asarray(bc67.encode_bc7(blocks)))), blocks)
        enc = np.asarray(bc67.encode_bc7(blocks, flags=0x200000))
        dec = np.asarray(bc67.decode_bc7(enc))
        hq = rgba_psnr(dec, blocks)
        assert hq >= base - 1e-3, (with_alpha, hq, base)
        for i in range(0, len(enc), 29):
            np.testing.assert_array_equal(
                dec[i], scalar_decode_bc7(enc[i].tobytes()))


def test_encode_bc7_alpha_content():
    blocks = img_blocks(with_alpha=True)
    enc = np.asarray(bc67.encode_bc7(blocks))
    dec = np.asarray(bc67.decode_bc7(enc))
    q = rgba_psnr(dec, blocks)
    assert q > 34, q
    # scalar decoder agrees (validates emitted bitstreams incl. modes 4/5/7)
    for i in range(0, len(enc), 13):
        np.testing.assert_array_equal(dec[i], scalar_decode_bc7(enc[i].tobytes()))


def test_encode_bc7_solid_block_near_lossless():
    c = np.tile(np.array([0.3, 0.6, 0.9, 1.0], np.float32), (4, 16, 1))
    dec = np.asarray(bc67.decode_bc7(np.asarray(bc67.encode_bc7(c))))
    assert np.abs(dec - c).max() < 1.5 / 255, np.abs(dec - c).max()


def test_encode_bc7_transparent_block():
    c = np.zeros((2, 16, 4), np.float32)
    dec = np.asarray(bc67.decode_bc7(np.asarray(bc67.encode_bc7(c))))
    np.testing.assert_allclose(dec, 0.0, atol=1.5 / 255)


def test_encode_bc7_3subset_flag():
    blocks = img_blocks()
    enc = np.asarray(bc67.encode_bc7(blocks, flags=0x80000))
    dec = np.asarray(bc67.decode_bc7(enc))
    assert rgba_psnr(dec, blocks) > 36


def test_bc7_alpha_weight():
    """alpha_weight scales BC7 alpha error like CompressOptions.alphaWeight
    (DirectXTex.h:926, BC7Encode.hlsl:241): higher weight must not worsen
    decoded alpha MSE, and weight 1.0 is the default encoding."""
    import numpy as np
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc67

    rng = np.random.default_rng(23)
    nb = 120
    blocks = rng.random((nb, 16, 4)).astype(np.float32)  # noisy alpha

    enc1 = np.asarray(bc67.encode_bc7(jnp.asarray(blocks)))
    enc_d = np.asarray(bc67.encode_bc7(jnp.asarray(blocks),
                                       alpha_weight=1.0))
    np.testing.assert_array_equal(enc1, enc_d)

    enc_hi = np.asarray(bc67.encode_bc7(jnp.asarray(blocks),
                                        alpha_weight=16.0))
    dec1 = np.asarray(bc67.decode_bc7(enc1))
    dec_hi = np.asarray(bc67.decode_bc7(enc_hi))
    amse1 = float(((dec1[..., 3] - blocks[..., 3]) ** 2).mean())
    amse_hi = float(((dec_hi[..., 3] - blocks[..., 3]) ** 2).mean())
    assert amse_hi <= amse1 * 1.001, (amse1, amse_hi)
    # and it must actually change encoder decisions on noisy-alpha data
    assert (enc_hi != enc1).any()
