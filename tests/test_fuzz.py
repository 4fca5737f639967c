"""Header-parser fuzzing (SURVEY.md §4: the reference fuzzes its DDS/TGA/HDR
loaders under libFuzzer; this is the hypothesis-free equivalent — random
byte mutations must produce ValueError or a valid texture, never crash)."""

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
