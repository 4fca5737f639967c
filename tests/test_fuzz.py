"""Header-parser fuzzing (SURVEY.md §4: the reference fuzzes its DDS/TGA/HDR
loaders under libFuzzer; this is the hypothesis-free equivalent — random
byte mutations must produce ValueError or a valid texture, never crash)."""

from struct import error as struct_error

import numpy as np
import pytest

from directxtex_tpu.io import (
    load_from_dds_memory, load_from_hdr_memory, load_from_tga_memory,
    save_to_dds_memory, save_to_hdr_memory, save_to_tga_memory,
)
from directxtex_tpu.io.ppm import load_from_pfm_memory, load_from_ppm_memory
from directxtex_tpu.texture import Texture


def _valid_blobs():
    rng = np.random.default_rng(0)
    img = (rng.integers(0, 256, (8, 8, 4)) / 255).astype(np.float32)
    tex = Texture.from_array(img)
    return {
        "dds": save_to_dds_memory(tex),
        "tga": save_to_tga_memory(tex),
        "hdr": save_to_hdr_memory(tex),
    }


LOADERS = {
    "dds": load_from_dds_memory,
    "tga": load_from_tga_memory,
    "hdr": load_from_hdr_memory,
}


@pytest.mark.parametrize("kind", ["dds", "tga", "hdr"])
def test_fuzz_truncation(kind):
    blob = _valid_blobs()[kind]
    loader = LOADERS[kind]
    for cut in range(0, len(blob), max(1, len(blob) // 23)):
        try:
            loader(blob[:cut])
        except ValueError:
            pass  # rejected cleanly


@pytest.mark.parametrize("kind", ["dds", "tga", "hdr"])
def test_fuzz_bit_flips(kind):
    blob = bytearray(_valid_blobs()[kind])
    loader = LOADERS[kind]
    rng = np.random.default_rng(1)
    for trial in range(40):
        mutated = bytearray(blob)
        for _ in range(rng.integers(1, 8)):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= int(rng.integers(1, 256))
        try:
            loader(bytes(mutated))
        except (ValueError, OverflowError):
            pass


@pytest.mark.parametrize("kind", ["dds", "tga", "hdr"])
def test_fuzz_random_garbage(kind):
    loader = LOADERS[kind]
    rng = np.random.default_rng(2)
    for trial in range(30):
        junk = rng.integers(0, 256, int(rng.integers(0, 400)),
                            dtype=np.uint8).tobytes()
        try:
            loader(junk)
        except (ValueError, OverflowError):
            pass


def test_fuzz_ppm_pfm():
    rng = np.random.default_rng(3)
    for loader, magic in ((load_from_ppm_memory, b"P6"),
                          (load_from_pfm_memory, b"PF")):
        for trial in range(25):
            junk = magic + rng.integers(0, 256, int(rng.integers(0, 200)),
                                        dtype=np.uint8).tobytes()
            try:
                loader(junk)
            except (ValueError, OverflowError):
                pass


def test_fuzz_bc_decoders_never_crash():
    from directxtex_tpu.bc import bc123, bc45, bc67
    rng = np.random.default_rng(4)
    b8 = rng.integers(0, 256, (64, 8), dtype=np.uint8)
    b16 = rng.integers(0, 256, (64, 16), dtype=np.uint8)
    for fn, blocks in ((bc123.decode_bc1, b8), (bc123.decode_bc2, b16),
                       (bc123.decode_bc3, b16), (bc45.decode_bc4u, b8),
                       (bc45.decode_bc5s, b16), (bc67.decode_bc7, b16)):
        out = np.asarray(fn(blocks))
        assert out.shape == (64, 16, 4)
    for signed in (False, True):
        out = np.asarray(bc67.decode_bc6h(b16, signed=signed))
        assert out.shape == (64, 16, 4)


# ---------------------------------------------------------------------------
# EXR (python parsers + native/piz.cpp decoder must reject, never crash)
# ---------------------------------------------------------------------------

def _exr_blobs():
    from directxtex_tpu.io import exr
    rng = np.random.default_rng(4)
    img = (rng.integers(0, 256, (12, 9, 4)) / 255).astype(np.float32)
    tex = Texture.from_array(img)
    return {c: exr.save_to_exr_memory(tex, compression=c)
            for c in (exr._NONE, exr._ZIP, exr._RLE, exr._PIZ, exr._B44A)}


@pytest.mark.parametrize("comp", [0, 2, 1, 4, 8])
def test_fuzz_exr_truncation(comp):
    from directxtex_tpu.io import exr
    import zlib
    comp_id = {0: exr._NONE, 2: exr._ZIP, 1: exr._RLE,
               4: exr._PIZ, 8: exr._B44A}[comp]
    blob = _exr_blobs()[comp_id]
    for cut in range(0, len(blob), max(1, len(blob) // 23)):
        try:
            exr.load_from_exr_memory(blob[:cut])
        except (ValueError, zlib.error):
            pass


@pytest.mark.parametrize("comp", [4, 8])
def test_fuzz_exr_bit_flips(comp):
    from directxtex_tpu.io import exr
    import zlib
    comp_id = exr._PIZ if comp == 4 else exr._B44A
    blob = bytearray(_exr_blobs()[comp_id])
    rng = np.random.default_rng(5)
    for trial in range(40):
        mutated = bytearray(blob)
        for _ in range(rng.integers(1, 8)):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= int(rng.integers(1, 256))
        try:
            exr.load_from_exr_memory(bytes(mutated))
        except (ValueError, zlib.error, struct_error):
            pass


def test_fuzz_piz_native_random_streams():
    """The native Huffman decoder must return an error code (surfaced as
    ValueError), never read out of bounds, on arbitrary byte input."""
    from directxtex_tpu import native
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(6)
    for trial in range(60):
        data = rng.integers(0, 256, int(rng.integers(0, 400)),
                            dtype=np.int64).astype(np.uint8).tobytes()
        try:
            native.piz_huf_uncompress(data, int(rng.integers(1, 5000)))
        except ValueError:
            pass
    # mutated valid streams
    from directxtex_tpu.io import exr_piz as P
    raw = rng.integers(0, 3000, 4096).astype(np.uint16)
    enc = bytearray(P.huf_compress(raw))
    for trial in range(60):
        m = bytearray(enc)
        for _ in range(rng.integers(1, 6)):
            m[int(rng.integers(0, len(m)))] ^= int(rng.integers(1, 256))
        try:
            got = native.piz_huf_uncompress(bytes(m), 4096)
            # decoded without error: must still be exactly n_raw values
            assert len(got) == 4096
        except ValueError:
            pass
