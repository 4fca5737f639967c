"""BC6H decode tests vs an independent scalar decoder (written from the D3D11
functional spec's BC6H section)."""

import numpy as np
import pytest

from directxtex_tpu.bc import bc67
from directxtex_tpu.bc.bc67_tables import (
    BC6H_DESC, BC6H_MODE_INFO, BC6H_MODE_TO_INFO, FIXUPS, PARTITIONS,
    WEIGHTS3, WEIGHTS4,
)


def scalar_decode_bc6h(data: bytes, signed: bool) -> np.ndarray:
    v = int.from_bytes(data, "little")

    def getbit(pos):
        return (v >> pos) & 1

    m2 = v & 0x3
    mode = m2 if m2 < 2 else (v & 0x1F)
    row = int(BC6H_MODE_TO_INFO[mode])
    if row < 0:
        out = np.zeros((16, 4), np.float32)
        out[:, 3] = 1.0
        return out

    _, parts, transformed, iprec, pW, pX, pY, pZ = BC6H_MODE_INFO[row]
    header_bits = 82 if parts else 65

    fields = {}
    for pos in range(header_bits):
        fid, fbit = int(BC6H_DESC[row, pos, 0]), int(BC6H_DESC[row, pos, 1])
        if fid < 2:
            continue
        fields[fid] = fields.get(fid, 0) | (getbit(pos) << fbit)

    shape = fields.get(2, 0)
    ep = np.zeros((2, 2, 3), np.int64)
    for ch, base in ((0, 3), (1, 7), (2, 11)):
        ep[0, 0, ch] = fields.get(base, 0)
        ep[0, 1, ch] = fields.get(base + 1, 0)
        ep[1, 0, ch] = fields.get(base + 2, 0)
        ep[1, 1, ch] = fields.get(base + 3, 0)

    def sext(x, bits):
        m = 1 << (bits - 1)
        return (x ^ m) - m

    precs = {(0, 0): pW, (0, 1): pX, (1, 0): pY, (1, 1): pZ}
    if signed:
        for ch in range(3):
            ep[0, 0, ch] = sext(ep[0, 0, ch], pW[ch])
    if signed or transformed:
        for ch in range(3):
            ep[0, 1, ch] = sext(ep[0, 1, ch], pX[ch])
            if parts:
                ep[1, 0, ch] = sext(ep[1, 0, ch], pY[ch])
                ep[1, 1, ch] = sext(ep[1, 1, ch], pZ[ch])
    if transformed:
        for ch in range(3):
            mask = (1 << pW[ch]) - 1
            for (r, ab) in ((0, 1), (1, 0), (1, 1)):
                val = (ep[r, ab, ch] + ep[0, 0, ch]) & mask
                if signed:
                    val = sext(val, pW[ch])
                ep[r, ab, ch] = val

    def unq(c, bits):
        if signed:
            if bits >= 16:
                return c
            s = c < 0
            c = abs(c)
            if c == 0:
                u = 0
            elif c >= (1 << (bits - 1)) - 1:
                u = 0x7FFF
            else:
                u = ((c << 15) + 0x4000) >> (bits - 1)
            return -u if s else u
        if bits >= 15:
            return c
        if c == 0:
            return 0
        if c == (1 << bits) - 1:
            return 0xFFFF
        return ((c << 16) + 0x8000) >> bits

    anchors = {0}
    if parts:
        anchors.add(int(FIXUPS[parts, shape, 1]))

    pos = header_bits
    weights = WEIGHTS3 if parts else WEIGHTS4
    out = np.zeros((16, 4), np.float32)
    out[:, 3] = 1.0
    for i in range(16):
        nb = iprec - 1 if i in anchors else iprec
        idx = (v >> pos) & ((1 << nb) - 1)
        pos += nb
        reg = int(PARTITIONS[parts, shape, i])
        w = int(weights[idx])
        for ch in range(3):
            a = unq(int(ep[reg, 0, ch]), pW[ch])
            b = unq(int(ep[reg, 1, ch]), pW[ch])
            comp = (a * (64 - w) + b * w + 32) >> 6
            if signed:
                comp = -(((-comp) * 31) >> 5) if comp < 0 else (comp * 31) >> 5
                bits16 = (0x8000 | abs(comp)) if comp < 0 else comp
            else:
                comp = (comp * 31) >> 6
                bits16 = comp
            out[i, ch] = np.frombuffer(
                np.uint16(bits16).tobytes(), np.float16)[0]
    return out


MODE_VALUES = [0x00, 0x01, 0x02, 0x06, 0x0A, 0x0E, 0x12, 0x16, 0x1A, 0x1E,
               0x03, 0x07, 0x0B, 0x0F]


def blocks_with_mode6h(mode_val: int, n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    if mode_val < 2:
        blocks[:, 0] = (blocks[:, 0] & np.uint8(0xFC)) | np.uint8(mode_val)
    else:
        blocks[:, 0] = (blocks[:, 0] & np.uint8(0xE0)) | np.uint8(mode_val)
    return blocks


@pytest.mark.parametrize("mode_val", MODE_VALUES)
@pytest.mark.parametrize("signed", [False, True])
def test_decode_bc6h_modes_exact(mode_val, signed):
    blocks = blocks_with_mode6h(mode_val, 32, mode_val + (1000 if signed else 0))
    got = np.asarray(bc67.decode_bc6h(blocks, signed=signed))
    for i in range(0, 32, 5):
        expect = scalar_decode_bc6h(blocks[i].tobytes(), signed)
        g = got[i]
        # NaN-safe exact comparison of bit patterns
        np.testing.assert_array_equal(
            g.astype(np.float16).view(np.uint16),
            expect.astype(np.float16).view(np.uint16),
            err_msg=f"mode {mode_val:#x} signed={signed} block {i}")


def test_decode_bc6h_reserved():
    blocks = np.zeros((2, 16), np.uint8)
    blocks[:, 0] = 0x13  # reserved mode
    out = np.asarray(bc67.decode_bc6h(blocks, signed=False))
    assert np.all(out[..., :3] == 0.0) and np.all(out[..., 3] == 1.0)


def test_decode_bc6h_mixed_random():
    rng = np.random.default_rng(5)
    blocks = rng.integers(0, 256, (128, 16), dtype=np.uint8)
    for signed in (False, True):
        got = np.asarray(bc67.decode_bc6h(blocks, signed=signed))
        for i in range(0, 128, 17):
            expect = scalar_decode_bc6h(blocks[i].tobytes(), signed)
            np.testing.assert_array_equal(
                got[i].astype(np.float16).view(np.uint16),
                expect.astype(np.float16).view(np.uint16),
                err_msg=f"block {i} signed={signed}")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def hdr_blocks(signed=False, seed=2):
    from directxtex_tpu.bc.common import image_to_blocks
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, 32, dtype=np.float32)
    gx, gy = np.meshgrid(x, x)
    img = np.stack([np.exp(3 * gx) * 0.1, np.exp(2 * gy) * 0.2,
                    (gx + gy) * 2 + 0.05], -1)
    img *= (1 + (rng.random(img.shape).astype(np.float32) - 0.5) * 0.05)
    if signed:
        img -= 1.0
    img = np.concatenate([img, np.ones((32, 32, 1), np.float32)], -1)
    return np.asarray(image_to_blocks(img.astype(np.float32))[0])


from directxtex_tpu.bc.common import image_to_blocks


def test_encode_bc6h_solid():
    c = np.tile(np.array([1.0, 0.5, 0.25, 1.0], np.float32), (2, 16, 1))
    dec = np.asarray(bc67.decode_bc6h(
        np.asarray(bc67.encode_bc6h(c, signed=False)), signed=False))
    np.testing.assert_allclose(dec[..., :3], c[..., :3], rtol=0.01)


def test_encode_bc6h_uf16_quality():
    blocks = hdr_blocks()
    enc = np.asarray(bc67.encode_bc6h(blocks, signed=False))
    dec = np.asarray(bc67.decode_bc6h(enc, signed=False))
    err = np.abs(dec[..., :3] - blocks[..., :3])
    rel = err / np.maximum(np.abs(blocks[..., :3]), 1e-2)
    assert rel.mean() < 0.04, rel.mean()
    # emitted bitstreams decode identically in the scalar decoder
    for i in range(0, len(enc), 29):
        np.testing.assert_array_equal(
            dec[i, :, :3].astype(np.float16).view(np.uint16),
            scalar_decode_bc6h(enc[i].tobytes(), False)[:, :3]
            .astype(np.float16).view(np.uint16))


def test_encode_bc6h_sf16_quality():
    blocks = hdr_blocks(signed=True)
    enc = np.asarray(bc67.encode_bc6h(blocks, signed=True))
    dec = np.asarray(bc67.decode_bc6h(enc, signed=True))
    err = np.abs(dec[..., :3] - blocks[..., :3])
    rel = err / np.maximum(np.abs(blocks[..., :3]), 1e-1)
    assert rel.mean() < 0.08, rel.mean()
    for i in range(0, len(enc), 31):
        np.testing.assert_array_equal(
            dec[i, :, :3].astype(np.float16).view(np.uint16),
            scalar_decode_bc6h(enc[i].tobytes(), True)[:, :3]
            .astype(np.float16).view(np.uint16))


def test_encode_bc6h_negative_clamps_unsigned():
    c = np.full((1, 16, 4), -2.0, np.float32)
    c[..., 3] = 1.0
    dec = np.asarray(bc67.decode_bc6h(
        np.asarray(bc67.encode_bc6h(c, signed=False)), signed=False))
    np.testing.assert_allclose(dec[..., :3], 0.0, atol=1e-5)
