"""Golden-anchor tests (SURVEY.md §4(a)-(b)).

Everything here loads FROZEN artifacts from tests/golden/ (generated once by
tests/golden/generate.py and checked in; never regenerated at test time), so
a drift in either the vectorized decoders, the encoders, the mip generator,
or the container writers fails loudly even if the in-repo scalar spec
decoders were edited in the same commit.

- decode_vectors.npz pins BC1-BC7 decode bit-exactness (reference semantics
  BC.h:321-330, BC6HBC7.cpp:1658,2566).
- corpus.npz pins per-codec encode round-trip PSNR floors on deterministic
  albedo / two-region / normal / alpha-gradient / HDR content (ComputeMSE
  semantics, DirectXTexMisc.cpp:27-180).
- containers/ + containers.npz pin byte-exact DDS/TGA/HDR reader AND writer
  behavior.
"""

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"


@pytest.fixture(scope="module")
def vectors():
    return np.load(GOLDEN / "decode_vectors.npz")


@pytest.fixture(scope="module")
def corpus():
    return np.load(GOLDEN / "corpus.npz")


@pytest.fixture(scope="module")
def containers():
    return np.load(GOLDEN / "containers.npz")


# ---------------------------------------------------------------------------
# decode bit-exactness vs frozen vectors
# ---------------------------------------------------------------------------

def test_golden_decode_bc1(vectors):
    from directxtex_tpu.bc import bc123
    got = np.asarray(bc123.decode_bc1(vectors["bc1_blocks"]))
    np.testing.assert_array_equal(got, vectors["bc1_rgba"])


def test_golden_decode_bc2(vectors):
    from directxtex_tpu.bc import bc123
    got = np.asarray(bc123.decode_bc2(vectors["bc2_blocks"]))
    np.testing.assert_array_equal(got, vectors["bc2_rgba"])


def test_golden_decode_bc3(vectors):
    from directxtex_tpu.bc import bc123
    got = np.asarray(bc123.decode_bc3(vectors["bc3_blocks"]))
    np.testing.assert_array_equal(got, vectors["bc3_rgba"])


def test_golden_decode_bc4(vectors):
    from directxtex_tpu.bc import bc45
    gotu = np.asarray(bc45.decode_bc4u(vectors["bc4_blocks"]))
    gots = np.asarray(bc45.decode_bc4s(vectors["bc4_blocks"]))
    np.testing.assert_array_equal(gotu[..., 0], vectors["bc4u_r"])
    np.testing.assert_array_equal(gots[..., 0], vectors["bc4s_r"])


def test_golden_decode_bc5(vectors):
    from directxtex_tpu.bc import bc45
    gotu = np.asarray(bc45.decode_bc5u(vectors["bc5_blocks"]))
    gots = np.asarray(bc45.decode_bc5s(vectors["bc5_blocks"]))
    np.testing.assert_array_equal(gotu[..., 0], vectors["bc5u_r"])
    np.testing.assert_array_equal(gotu[..., 1], vectors["bc5u_g"])
    np.testing.assert_array_equal(gots[..., 0], vectors["bc5s_r"])
    np.testing.assert_array_equal(gots[..., 1], vectors["bc5s_g"])


@pytest.mark.parametrize("signed,key", [(False, "bc6h_uf_bits"),
                                        (True, "bc6h_sf_bits")])
def test_golden_decode_bc6h(vectors, signed, key):
    from directxtex_tpu.bc import bc67
    got = np.asarray(bc67.decode_bc6h(vectors["bc6h_blocks"], signed=signed))
    np.testing.assert_array_equal(
        got.astype(np.float16).view(np.uint16), vectors[key])


def test_golden_decode_bc7(vectors):
    from directxtex_tpu.bc import bc67
    got = np.asarray(bc67.decode_bc7(vectors["bc7_blocks"]))
    np.testing.assert_array_equal(got, vectors["bc7_rgba"])


# ---------------------------------------------------------------------------
# encode PSNR floors on the frozen corpus
# ---------------------------------------------------------------------------

# measured at generation time (see corpus.npz psnr_* keys); hardcoded here
# minus a 0.05 dB guard so neither the corpus nor the floors can silently
# move together.
PSNR_FLOORS = {
    # refreshed for the r5 default tier (off-axis ranking + shared fit
    # trajectories for modes 1/3 and 4/5 + MOMENT winner ladder +
    # mode-4 im0 cut); the quality bar vs the compiled reference is
    # test_refparity.py's ENCODERS table
    "bc1_albedo": 31.05,
    "bc7_albedo": 38.86,
    "bc1_tworegion": 38.77,
    "bc7_tworegion": 45.22,
    "bc2_alphagrad": 31.76,
    "bc3_alphagrad": 32.29,
    "bc7_alphagrad": 37.17,
    "bc4_normal": 44.97,
    "bc5_normal": 45.01,
    "bc7_normal": 43.21,
    "bc6h_hdr": 45.24,
    # real photographic content (128², sklearn sample images; r3)
    "bc1_photo_china": 29.29,
    "bc7_photo_china": 38.61,
    "bc1_photo_flower": 30.18,
    "bc7_photo_flower": 39.33,
    # r4 HDR contents (photographic radiance maps, sun-disk env,
    # real-content signed probe; log-PSNR for unsigned, peak-linear for
    # the signed probe — matches generate.py)
    "bc6h_hdr_china": 32.68,
    "bc6h_hdr_flower": 31.38,
    "bc6h_hdr_sun": 51.02,
    "bc6hs_hdr_signed": 29.75,
}


def _psnr(a, b, ch):
    m = float(np.mean((np.asarray(a)[..., :ch] - np.asarray(b)[..., :ch]) ** 2))
    return 10 * np.log10(1.0 / max(m, 1e-30))


def _log_psnr(a, b):
    a = np.maximum(np.asarray(a)[..., :3], 0) + 1e-4
    b = np.maximum(np.asarray(b)[..., :3], 0) + 1e-4
    m = float(np.mean((np.log2(a) - np.log2(b)) ** 2))
    return 10 * np.log10(36.0 / max(m, 1e-30))


def _roundtrip_psnr(corpus, name):
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc123, bc45, bc67
    from directxtex_tpu.bc.common import image_to_blocks

    codec, content = name.split("_", 1)
    blocks = jnp.asarray(image_to_blocks(corpus[content])[0])
    enc_dec = {
        "bc1": (bc123.encode_bc1, bc123.decode_bc1, 3),
        "bc2": (bc123.encode_bc2, bc123.decode_bc2, 4),
        "bc3": (bc123.encode_bc3, bc123.decode_bc3, 4),
        "bc4": (bc45.encode_bc4u, bc45.decode_bc4u, 1),
        "bc5": (bc45.encode_bc5u, bc45.decode_bc5u, 2),
        "bc7": (bc67.encode_bc7, bc67.decode_bc7, 4),
    }
    if codec == "bc6hs":
        # signed: peak-linear PSNR (log is meaningless on bipolar data)
        dec = np.asarray(bc67.decode_bc6h(
            np.asarray(bc67.encode_bc6h(blocks, signed=True)),
            signed=True))
        src = np.asarray(blocks)
        peak = float(np.abs(src[..., :3]).max())
        m = float(np.mean((dec[..., :3] - src[..., :3]) ** 2))
        return 10 * np.log10(peak * peak / max(m, 1e-30))
    if codec == "bc6h":
        dec = bc67.decode_bc6h(
            np.asarray(bc67.encode_bc6h(blocks, signed=False)), signed=False)
        return _log_psnr(dec, blocks)
    enc, dec_fn, ch = enc_dec[codec]
    return _psnr(dec_fn(np.asarray(enc(blocks))), blocks, ch)


@pytest.mark.parametrize("name", sorted(PSNR_FLOORS))
def test_golden_corpus_psnr_floor(corpus, name):
    got = _roundtrip_psnr(corpus, name)
    floor = PSNR_FLOORS[name]
    assert got >= floor, f"{name}: {got:.2f} dB < pinned floor {floor}"
    # the frozen measurement must also still hold (catches a regenerated
    # corpus paired with stale floors)
    frozen = float(corpus[f"psnr_{name}"])
    assert got >= frozen - 0.05, (got, frozen)


# ---------------------------------------------------------------------------
# container fixtures: byte-exact reader and writer
# ---------------------------------------------------------------------------

def test_golden_dds_rgba8_mips_load(containers):
    from directxtex_tpu.io import dds
    tex = dds.load_from_dds_memory((GOLDEN / "containers/rgba8_mips.dds").read_bytes())
    n = int(containers["rgba8_mips_nlevels"])
    assert len(tex.levels) == n
    for i in range(n):
        np.testing.assert_array_equal(
            np.asarray(tex.levels[i]), containers[f"rgba8_mips_l{i}"])


def test_golden_dds_rgba8_mips_writer_stable(containers):
    from directxtex_tpu import Texture
    from directxtex_tpu.io import dds
    from directxtex_tpu.ops.mipmaps import generate_mipmaps
    corpus = np.load(GOLDEN / "corpus.npz")
    tex = Texture.from_array(corpus["albedo"][:16, :16])
    got = dds.save_to_dds_memory(generate_mipmaps(tex))
    assert got == (GOLDEN / "containers/rgba8_mips.dds").read_bytes()


@pytest.mark.parametrize("fname,key,fmtname", [
    ("bc1.dds", "bc1_payload", "BC1_UNORM"),
    ("bc7_dx10.dds", "bc7_payload", "BC7_UNORM"),
])
def test_golden_dds_bc_payload(containers, fname, key, fmtname):
    from directxtex_tpu.formats import FMT
    from directxtex_tpu.io import dds
    tex = dds.load_from_dds_memory((GOLDEN / "containers" / fname).read_bytes())
    assert tex.metadata.format == getattr(FMT, fmtname)
    np.testing.assert_array_equal(np.asarray(tex.levels[0]), containers[key])


@pytest.mark.parametrize("fname,key,fmtname", [
    ("bc1.dds", "bc1_payload", "BC1_UNORM"),
    ("bc7_dx10.dds", "bc7_payload", "BC7_UNORM"),
])
def test_golden_dds_bc_encoder_stable(containers, fname, key, fmtname):
    """The BC encoders are deterministic: re-encoding the frozen source must
    reproduce the frozen payload bytes exactly."""
    from directxtex_tpu import Texture
    from directxtex_tpu.formats import FMT
    from directxtex_tpu.ops.compress import compress
    corpus = np.load(GOLDEN / "corpus.npz")
    tex = Texture.from_array(corpus["albedo"][:16, :16])
    ct = compress(tex, getattr(FMT, fmtname))
    np.testing.assert_array_equal(np.asarray(ct.levels[0]), containers[key])


def test_golden_tga_roundtrip(containers):
    from directxtex_tpu import Texture
    from directxtex_tpu.io import tga
    raw = (GOLDEN / "containers/albedo.tga").read_bytes()
    tex = tga.load_from_tga_memory(raw)
    np.testing.assert_array_equal(
        np.asarray(tex.levels[0][0]), containers["tga_pixels"])
    again = tga.save_to_tga_memory(
        Texture.from_array(containers["tga_pixels"]))
    assert again == raw


def test_golden_hdr_roundtrip(containers):
    from directxtex_tpu import Texture
    from directxtex_tpu.formats import FMT
    from directxtex_tpu.io import hdr
    raw = (GOLDEN / "containers/probe.hdr").read_bytes()
    tex = hdr.load_from_hdr_memory(raw)
    np.testing.assert_array_equal(
        np.asarray(tex.levels[0]), containers["hdr_pixels"])
    # RGBE encode of already-RGBE-quantized pixels is stable
    again = hdr.save_to_hdr_memory(
        Texture.from_array(containers["hdr_pixels"],
                           fmt=FMT.R32G32B32A32_FLOAT))
    assert again == raw


# ---------------------------------------------------------------------------
# frozen reference-codec parity (runs WITHOUT the reference tree:
# tests/golden/ref_encodes.npz pins the compiled reference's PSNRs;
# tests/test_refparity.py re-derives them live when the tree is present)
# ---------------------------------------------------------------------------

# minimum (ours - reference) dB on the frozen corpus; the r5 default
# tier (shared fit trajectories + MOMENT winner-ladder) beats the
# reference full search on every BC7 content (margins mirror
# tests/test_refparity.py's ENCODERS floors)
REF_PARITY_MARGINS = {
    "bc1_albedo": -0.03, "bc1_tworegion": -0.02,
    "bc2_alphagrad": -0.03, "bc3_alphagrad": -0.03,
    "bc4_normal": -0.02, "bc5_normal": -0.02,
    "bc7_albedo": 0.04, "bc7_tworegion": 0.28,
    "bc7_normal": 2.65, "bc7_alphagrad": 0.32,
}


@pytest.mark.parametrize("name", sorted(REF_PARITY_MARGINS))
def test_frozen_reference_parity(name, corpus):
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc123, bc45, bc67
    from directxtex_tpu.bc.common import image_to_blocks

    ref = np.load(GOLDEN / "ref_encodes.npz")
    codec, content = name.split("_", 1)
    blocks = jnp.asarray(image_to_blocks(corpus[content])[0])
    enc_dec = {
        "bc1": (lambda b: bc123.encode_bc1(b, 0.5, 0), bc123.decode_bc1, 3),
        "bc2": (lambda b: bc123.encode_bc2(b, 0), bc123.decode_bc2, 4),
        "bc3": (lambda b: bc123.encode_bc3(b, 0), bc123.decode_bc3, 4),
        "bc4": (bc45.encode_bc4u, bc45.decode_bc4u, 1),
        "bc5": (bc45.encode_bc5u, bc45.decode_bc5u, 2),
        "bc7": (bc67.encode_bc7, bc67.decode_bc7, 4),
    }
    enc, dec, ch = enc_dec[codec]
    # our decoder is bit-exact vs the reference decoder (refparity), so
    # decoding our blocks with it reproduces the reference error metric
    ours = _psnr(dec(np.asarray(enc(blocks))), blocks, ch)
    want = float(ref[f"{name}_psnr"]) + REF_PARITY_MARGINS[name]
    assert ours >= want, (
        f"{name}: ours {ours:.2f} dB < reference "
        f"{float(ref[f'{name}_psnr']):.2f} + margin")


def test_frozen_reference_parity_bc6h(corpus):
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc67
    from directxtex_tpu.bc.common import image_to_blocks

    ref = np.load(GOLDEN / "ref_encodes.npz")
    blocks = jnp.asarray(image_to_blocks(corpus["hdr"])[0])
    enc = np.asarray(bc67.encode_bc6h(blocks, signed=False))
    dec = bc67.decode_bc6h(enc, signed=False)
    peak = float(ref["bc6h_hdr_peak"])
    mse = float(np.mean((np.asarray(dec)[..., :3]
                         - np.asarray(blocks)[..., :3]) ** 2))
    ours = 10 * np.log10(peak * peak / max(mse, 1e-30))
    # the off-axis ranking puts us past the reference (BASELINE.md)
    assert ours >= float(ref["bc6h_hdr_psnr"]), (ours,
                                                 float(ref["bc6h_hdr_psnr"]))
