"""EXR codec round-trip and robustness tests (Auxiliary/DirectXTexEXR.cpp
parity: half RGBA in/out, scanline files)."""

import struct

import numpy as np
import pytest

from directxtex_tpu.formats import FMT
from directxtex_tpu.io import exr
from directxtex_tpu.texture import Texture


def _tex(h=37, w=61, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w, 4)).astype(np.float32) * 4.0
    return Texture.from_array(img), img


@pytest.mark.parametrize("compression",
                         [exr._NONE, exr._RLE, exr._ZIPS, exr._ZIP,
                          exr._PIZ])
def test_roundtrip_compressions(compression):
    tex, img = _tex()
    data = exr.save_to_exr_memory(tex, compression=compression)
    out = exr.load_from_exr_memory(data)
    got = np.asarray(out.levels[0][0])
    # data passes through half precision
    np.testing.assert_array_equal(got, img.astype(np.float16)
                                  .astype(np.float32))


def test_metadata():
    tex, _ = _tex(h=20, w=50)
    data = exr.save_to_exr_memory(tex)
    md = exr.get_metadata_from_exr_memory(data)
    assert (md.width, md.height) == (50, 20)
    assert md.format == FMT.R16G16B16A16_FLOAT
    assert md.mip_levels == 1


def test_zip_chunking_tall_image():
    # > 16 scanlines exercises multiple ZIP chunks incl. a short last one
    tex, img = _tex(h=45, w=8, seed=1)
    data = exr.save_to_exr_memory(tex, compression=exr._ZIP)
    out = exr.load_from_exr_memory(data)
    np.testing.assert_array_equal(
        np.asarray(out.levels[0][0]),
        img.astype(np.float16).astype(np.float32))


def test_file_roundtrip(tmp_path):
    tex, img = _tex(seed=2)
    p = tmp_path / "t.exr"
    exr.save_to_exr_file(tex, p)
    out = exr.load_from_exr_file(p)
    np.testing.assert_array_equal(
        np.asarray(out.levels[0][0]),
        img.astype(np.float16).astype(np.float32))


def test_rgb_only_alpha_defaults_to_one():
    # hand-build an uncompressed EXR with only B, G, R channels
    h, w = 5, 7
    rng = np.random.default_rng(3)
    img = rng.random((h, w, 3)).astype("<f2")
    chlist = b""
    for n in (b"B", b"G", b"R"):
        chlist += n + b"\0" + struct.pack("<i", 1) + b"\0\0\0\0" \
            + struct.pack("<ii", 1, 1)
    chlist += b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    hdr = struct.pack("<II", exr._MAGIC, 2)
    hdr += exr._attr(b"channels", b"chlist", chlist)
    hdr += exr._attr(b"compression", b"compression", b"\0")
    hdr += exr._attr(b"dataWindow", b"box2i", box)
    hdr += exr._attr(b"displayWindow", b"box2i", box)
    hdr += exr._attr(b"lineOrder", b"lineOrder", b"\0")
    hdr += b"\0"
    chunks = []
    for y in range(h):
        row = img[y, :, 2].tobytes() + img[y, :, 1].tobytes() \
            + img[y, :, 0].tobytes()  # B, G, R channel order
        chunks.append(struct.pack("<ii", y, len(row)) + row)
    out = bytearray(hdr)
    off = len(hdr) + 8 * h
    for c in chunks:
        out += struct.pack("<Q", off)
        off += len(c)
    for c in chunks:
        out += c
    tex = exr.load_from_exr_memory(bytes(out))
    got = np.asarray(tex.levels[0][0])
    np.testing.assert_array_equal(got[..., :3], img.astype(np.float32))
    np.testing.assert_array_equal(got[..., 3], 1.0)


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        exr.load_from_exr_memory(b"\x00" * 64)


def test_tiled_rejected():
    tex, _ = _tex()
    data = bytearray(exr.save_to_exr_memory(tex))
    # set the tiled bit in the version field
    ver = struct.unpack_from("<I", data, 4)[0]
    struct.pack_into("<I", data, 4, ver | 0x200)
    with pytest.raises(ValueError, match="tiled"):
        exr.load_from_exr_memory(bytes(data))


def test_truncated():
    tex, _ = _tex()
    data = exr.save_to_exr_memory(tex)
    with pytest.raises(ValueError):
        exr.load_from_exr_memory(data[:len(data) // 2])


def test_unsupported_compression_rejected():
    tex, _ = _tex()
    data = bytearray(exr.save_to_exr_memory(tex, compression=exr._NONE))
    # find the compression attribute value and patch it to DWAA: the pure
    # reader refuses; if the OpenEXR adapter shim is present it rejects
    # the bogus chunk structure instead. ValueError either way.
    i = bytes(data).find(b"compression\0compression\0")
    assert i > 0
    off = i + len(b"compression\0compression\0") + 4
    data[off] = exr._DWAA
    with pytest.raises(ValueError):
        exr.load_from_exr_memory(bytes(data))


# ---------------------------------------------------------------------------
# PIZ codec internals (exr_piz is also the format oracle for native/piz.cpp)
# ---------------------------------------------------------------------------

def test_piz_huffman_roundtrip():
    from directxtex_tpu.io import exr_piz as P
    rng = np.random.default_rng(11)
    for n in (1, 17, 4096):
        raw = rng.integers(0, 500, n).astype(np.uint16)
        raw[n // 3:n // 2] = 7  # runs exercise the rlc path
        assert np.array_equal(P.huf_uncompress(P.huf_compress(raw), n), raw)
    wide = rng.integers(0, 1 << 16, 30000).astype(np.uint16)
    assert np.array_equal(
        P.huf_uncompress(P.huf_compress(wide), len(wide)), wide)


@pytest.mark.parametrize("mx", [(1 << 14) - 1, (1 << 16) - 1])
def test_piz_wavelet_roundtrip(mx):
    from directxtex_tpu.io import exr_piz as P
    rng = np.random.default_rng(12)
    for ny, nx in ((16, 16), (32, 48), (7, 5), (1, 9), (33, 17)):
        a = rng.integers(0, mx + 1, (ny, nx)).astype(np.uint16)
        buf = a.reshape(-1).copy()
        P.wav2_encode(buf, nx, 1, ny, nx, mx)
        if min(nx, ny) > 1:  # degenerate strips skip the transform
            assert not np.array_equal(buf.reshape(ny, nx), a)
        P.wav2_decode(buf, nx, 1, ny, nx, mx)
        assert np.array_equal(buf.reshape(ny, nx), a), (ny, nx, mx)


def test_piz_tall_image_multiple_chunks():
    # > 32 scanlines exercises several PIZ chunks incl. a short last one
    tex, img = _tex(h=71, w=13, seed=5)
    data = exr.save_to_exr_memory(tex, compression=exr._PIZ)
    out = exr.load_from_exr_memory(data)
    np.testing.assert_array_equal(
        np.asarray(out.levels[0][0]),
        img.astype(np.float16).astype(np.float32))


def test_piz_golden_fixture():
    """Frozen PIZ file decodes to frozen pixels (tests/golden/probe.piz.exr);
    catches silent drift of the wavelet/huffman implementation."""
    import pathlib
    golden = pathlib.Path(__file__).parent / "golden"
    raw = (golden / "containers/probe_piz.exr").read_bytes()
    want = np.load(golden / "containers.npz")["piz_pixels"]
    out = exr.load_from_exr_memory(raw)
    np.testing.assert_array_equal(np.asarray(out.levels[0][0]), want)


def test_pxr24_decode():
    """Hand-built PXR24 chunk (zlib over per-row delta byte planes)."""
    import zlib
    h, w = 5, 7
    rng = np.random.default_rng(6)
    img = rng.random((h, w, 3)).astype("<f2")
    chlist = b""
    for n in (b"B", b"G", b"R"):
        chlist += n + b"\0" + struct.pack("<i", 1) + b"\0\0\0\0" \
            + struct.pack("<ii", 1, 1)
    chlist += b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    hdr = struct.pack("<II", exr._MAGIC, 2)
    hdr += exr._attr(b"channels", b"chlist", chlist)
    hdr += exr._attr(b"compression", b"compression",
                     bytes([exr._PXR24]))
    hdr += exr._attr(b"dataWindow", b"box2i", box)
    hdr += exr._attr(b"displayWindow", b"box2i", box)
    hdr += exr._attr(b"lineOrder", b"lineOrder", b"\0")
    hdr += b"\0"
    # one chunk (h <= 16): per line, per channel: split u16 rows into
    # hi/lo byte planes of per-row deltas
    planes = bytearray()
    for y in range(h):
        for ch in (2, 1, 0):  # B, G, R
            row = img[y, :, ch].view(np.uint16).astype(np.int64)
            d = np.diff(row, prepend=0) & 0xFFFFFFFF
            planes += (d >> 8).astype(np.uint8).tobytes()
            planes += (d & 0xFF).astype(np.uint8).tobytes()
    packed = zlib.compress(bytes(planes))
    chunk = struct.pack("<ii", 0, len(packed)) + packed
    out = bytearray(hdr)
    out += struct.pack("<Q", len(hdr) + 8)
    out += chunk
    tex = exr.load_from_exr_memory(bytes(out))
    got = np.asarray(tex.levels[0][0])
    np.testing.assert_array_equal(got[..., :3], img.astype(np.float32))


# ---------------------------------------------------------------------------
# B44 / B44A codec (exr_b44; ImfB44Compressor wire format)
# ---------------------------------------------------------------------------

def _b44_ref_unpack14(b):
    """Scalar transliteration of ImfB44Compressor unpack14: independent
    oracle for the vectorized decoder's bit layout."""
    b = [int(v) for v in b]
    total = int.from_bytes(bytes(b), "big")  # 14 bytes = 112 bits
    s = [0] * 16
    s[0] = (b[0] << 8) | b[1]
    shift = b[2] >> 2
    bias = (0x20 << shift) & 0xFFFF
    chain = [(4, 0), (8, 4), (12, 8),
             (1, 0), (5, 4), (9, 8), (13, 12),
             (2, 1), (6, 5), (10, 9), (14, 13),
             (3, 2), (7, 6), (11, 10), (15, 14)]
    for i, (dst, src) in enumerate(chain):
        d = (total >> (84 - 6 * i)) & 0x3F
        s[dst] = (s[src] + ((d << shift) & 0xFFFF) - bias) & 0xFFFF
    # inverse monotonic transform
    return [(v & 0x7FFF) if v & 0x8000 else (~v & 0xFFFF) for v in s]


def test_b44_unpack_matches_scalar_oracle():
    from directxtex_tpu.io import exr_b44 as B
    rng = np.random.default_rng(21)
    blocks = rng.integers(0, 256, (64, 14)).astype(np.uint8)
    blocks[:, 2] = (rng.integers(0, 11, 64) << 2 | (blocks[:, 2] & 3)) \
        .astype(np.uint8)
    got = B.unpack_blocks(blocks)
    for i in range(64):
        assert list(got[i]) == _b44_ref_unpack14(blocks[i]), i


def test_b44_roundtrip_bounded_error():
    # B44 is lossy: reconstruction error < 2^shift in the monotonic u16
    # domain. Smooth content keeps shift small; assert high PSNR.
    h, w = 37, 61
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([np.sin(xx / 17) + 1, yy / h, xx / w,
                    np.ones((h, w))], -1).astype(np.float32)
    tex = Texture.from_array(img)
    ref = img.astype(np.float16).astype(np.float32)
    sizes = {}
    for comp in (exr._B44, exr._B44A):
        data = exr.save_to_exr_memory(tex, compression=comp)
        out = np.asarray(exr.load_from_exr_memory(data).levels[0][0])
        mse = np.mean((out - ref) ** 2)
        assert 10 * np.log10(4.0 / max(mse, 1e-12)) > 55.0
        sizes[comp] = len(data)
    assert sizes[exr._B44A] <= sizes[exr._B44]


def test_b44_block_constant_lossless():
    # per-4x4-block constant data packs with shift 0: exact round-trip;
    # B44A collapses the flat blocks to 3 bytes (strictly smaller file)
    rng = np.random.default_rng(22)
    img = np.repeat(np.repeat(rng.random((8, 8, 4)).astype(np.float32),
                              4, 0), 4, 1)
    tex = Texture.from_array(img)
    want = img.astype(np.float16).astype(np.float32)
    d44 = exr.save_to_exr_memory(tex, compression=exr._B44)
    d44a = exr.save_to_exr_memory(tex, compression=exr._B44A)
    for data in (d44, d44a):
        out = np.asarray(exr.load_from_exr_memory(data).levels[0][0])
        np.testing.assert_array_equal(out, want)
    assert len(d44a) < len(d44)


def test_b44_partial_blocks_and_chunks():
    # 71x13: width/height not multiples of 4, several 32-line chunks
    # including a short last one
    rng = np.random.default_rng(23)
    base = rng.random((1, 1, 4)).astype(np.float32)
    img = np.broadcast_to(base, (71, 13, 4)).copy()
    tex = Texture.from_array(img)
    data = exr.save_to_exr_memory(tex, compression=exr._B44A)
    out = np.asarray(exr.load_from_exr_memory(data).levels[0][0])
    np.testing.assert_array_equal(
        out, img.astype(np.float16).astype(np.float32))


def test_b44_truncated_chunk_rejected():
    tex, _ = _tex(h=16, w=16, seed=24)
    data = exr.save_to_exr_memory(tex, compression=exr._B44)
    with pytest.raises(ValueError):
        exr.load_from_exr_memory(data[:-40])


def test_piz_native_matches_oracle():
    """native/piz.cpp must produce byte-identical Huffman streams to the
    python oracle and decode them identically (skip without a compiler)."""
    from directxtex_tpu import native
    from directxtex_tpu.io import exr_piz as P
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(31)
    cases = [rng.integers(0, 500, 4096).astype(np.uint16),
             rng.integers(0, 1 << 16, 30000).astype(np.uint16),
             np.full(1000, 1234, np.uint16),
             np.zeros(300, np.uint16)]
    cases[0][1000:2000] = 7  # rlc path
    for raw in cases:
        enc_py = P._huf_compress_py(raw)
        assert native.piz_huf_compress(raw) == enc_py
        assert np.array_equal(native.piz_huf_uncompress(enc_py, len(raw)),
                              raw)
        assert np.array_equal(P._huf_uncompress_py(enc_py, len(raw)), raw)


def test_piz_native_rejects_corrupt():
    from directxtex_tpu import native
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(32)
    raw = rng.integers(0, 500, 1000).astype(np.uint16)
    enc = bytearray(native.piz_huf_compress(raw))
    with pytest.raises(ValueError):
        native.piz_huf_uncompress(bytes(enc[:10]), 1000)  # truncated header
    with pytest.raises(ValueError):
        native.piz_huf_uncompress(bytes(enc), 2000)  # wrong output size


def test_third_party_exr_fixture():
    """A real OpenEXR-library-written file (CPython test data, PSF
    license) must load: validates the container parser against an
    external writer, not just our own round-trips."""
    import pathlib
    golden = pathlib.Path(__file__).parent / "golden"
    data = (golden / "containers/cpython_testdata.exr").read_bytes()
    md = exr.get_metadata_from_exr_memory(data)
    assert (md.width, md.height) == (16, 16)
    img = np.asarray(exr.load_from_exr_memory(data).levels[0][0])
    np.testing.assert_allclose(img[8, 8], [1.0, 0.890137, 0.341064, 1.0],
                               atol=1e-6)
    np.testing.assert_allclose(img[3, 12], [0.0, 0.0, 0.0, 0.094116],
                               atol=1e-6)
    assert img[0, 0].sum() == 0.0 and img[15, 15].sum() == 0.0


# ---------------------------------------------------------------------------
# Official-library fixtures: files written by libOpenEXR itself
# (tests/golden/generate_exr_official.py), decode pinned to the library's
# own readback frozen in decoded.npz. This is the same ground truth the
# reference uses — its EXR adapter IS OpenEXR (Auxiliary/DirectXTexEXR.cpp).
# ---------------------------------------------------------------------------

def _exr_official():
    import pathlib
    d = pathlib.Path(__file__).parent / "golden" / "exr_official"
    return d, np.load(d / "decoded.npz")


_NATIVE_COMPS = ["none", "rle", "zips", "zip", "piz", "pxr24", "b44", "b44a"]


@pytest.mark.parametrize("name", _NATIVE_COMPS)
def test_official_fixture_pure_reader(name):
    """Pure-numpy reader vs the official library's decode, bit-exact,
    for every compression the reader implements natively."""
    d, gold = _exr_official()
    tex = exr.load_from_exr_memory((d / f"{name}.exr").read_bytes())
    got = np.asarray(tex.levels[0][0])
    want = gold[name].view("<f2").astype(np.float32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", ["dwaa", "dwab"])
def test_official_fixture_dwa(name):
    """DWAA/DWAB decode via the OpenEXR adapter shim matches the frozen
    official decode."""
    from directxtex_tpu import native
    if native.get_openexr_lib() is None:
        pytest.skip("OpenEXR adapter shim unavailable")
    d, gold = _exr_official()
    tex = exr.load_from_exr_memory((d / f"{name}.exr").read_bytes())
    got = np.asarray(tex.levels[0][0])
    want = gold[name].view("<f2").astype(np.float32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("compression",
                         [exr._NONE, exr._RLE, exr._ZIPS, exr._ZIP,
                          exr._PIZ, exr._B44, exr._B44A])
def test_our_writer_read_by_official_library(compression):
    """Every stream our writer emits must decode identically through the
    official library and through our reader (external conformance for
    the writer, not just self round-trip)."""
    from directxtex_tpu import native
    if native.get_openexr_lib() is None:
        pytest.skip("OpenEXR adapter shim unavailable")
    tex, _ = _tex(h=41, w=53, seed=7)
    data = exr.save_to_exr_memory(tex, compression=compression)
    official = native.openexr_read_half(data).view("<f2").astype(np.float32)
    ours = np.asarray(exr.load_from_exr_memory(data).levels[0][0])
    np.testing.assert_array_equal(official, ours)


def test_dwa_save_roundtrip():
    """DWAA/DWAB save (adapter) -> load: lossy but high-fidelity on LDR
    content (quantization error bounded by the default level-45 tables)."""
    from directxtex_tpu import native
    if native.get_openexr_lib() is None:
        pytest.skip("OpenEXR adapter shim unavailable")
    rng = np.random.default_rng(3)
    img = (rng.random((40, 48, 4)).astype(np.float32) * 0.2
           + np.linspace(0, 0.8, 48, dtype=np.float32)[None, :, None])
    tex = Texture.from_array(img)
    for comp in (exr._DWAA, exr._DWAB):
        data = exr.save_to_exr_memory(tex, compression=comp)
        out = np.asarray(exr.load_from_exr_memory(data).levels[0][0])
        assert np.abs(out - img).max() < 0.05
