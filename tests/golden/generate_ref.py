"""Generate tests/golden/ref_encodes.npz: the COMPILED reference codec's
encoded blocks and PSNRs on the frozen corpus.

Freezing the reference's outputs makes the quality gate independent of
the reference tree's presence: test_golden_ref_parity compares our
encoders against these pinned numbers on every run, while
tests/test_refparity.py re-derives them live (and so also guards this
fixture against shim drift) whenever /root/reference and a compiler are
available.

Run from the repo root:  PYTHONPATH=. JAX_PLATFORMS=cpu \
    python tests/golden/generate_ref.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import refcodec  # noqa: E402

GOLDEN = os.path.dirname(os.path.abspath(__file__))


def _psnr(a, b, ch, peak=1.0):
    mse = np.mean((a[..., :ch].astype(np.float64)
                   - b[..., :ch].astype(np.float64)) ** 2)
    return 10 * np.log10(peak * peak / max(mse, 1e-12))


def main():
    assert refcodec.get_lib() is not None, "reference codec not buildable"
    import jax.numpy as jnp

    from directxtex_tpu.bc.common import image_to_blocks

    corpus = np.load(os.path.join(GOLDEN, "corpus.npz"))
    out = {}
    cases = [
        ("bc1_albedo", refcodec.BC1, "albedo", 3, 1.0),
        ("bc1_tworegion", refcodec.BC1, "tworegion", 3, 1.0),
        ("bc2_alphagrad", refcodec.BC2, "alphagrad", 4, 1.0),
        ("bc3_alphagrad", refcodec.BC3, "alphagrad", 4, 1.0),
        ("bc4_normal", refcodec.BC4U, "normal", 1, 1.0),
        ("bc5_normal", refcodec.BC5U, "normal", 2, 1.0),
        ("bc7_albedo", refcodec.BC7, "albedo", 4, 1.0),
        ("bc7_tworegion", refcodec.BC7, "tworegion", 4, 1.0),
        ("bc7_normal", refcodec.BC7, "normal", 4, 1.0),
        ("bc7_alphagrad", refcodec.BC7, "alphagrad", 4, 1.0),
    ]
    for content in ("photo_china", "photo_flower"):
        if content in corpus.files:
            cases.append((f"bc1_{content}", refcodec.BC1, content, 3, 1.0))
            cases.append((f"bc7_{content}", refcodec.BC7, content, 4, 1.0))
    for name, codec, content, ch, peak in cases:
        blocks = np.asarray(image_to_blocks(jnp.asarray(corpus[content]))[0])
        bc = refcodec.encode(codec, blocks)
        psnr = _psnr(refcodec.decode(codec, bc), blocks, ch, peak)
        out[f"{name}_bc"] = bc
        out[f"{name}_psnr"] = np.float32(psnr)
        print(f"{name:16s} ref {psnr:.3f} dB ({bc.shape[0]} blocks)")

    # BC6H with its content-scaled peak
    img = corpus["hdr"]
    blocks = np.asarray(image_to_blocks(jnp.asarray(img))[0])
    bc = refcodec.encode(refcodec.BC6HU, blocks)
    peak = float(np.abs(img[..., :3]).max())
    psnr = _psnr(refcodec.decode(refcodec.BC6HU, bc), blocks, 3, peak)
    out["bc6h_hdr_bc"] = bc
    out["bc6h_hdr_psnr"] = np.float32(psnr)
    out["bc6h_hdr_peak"] = np.float32(peak)
    print(f"{'bc6h_hdr':16s} ref {psnr:.3f} dB")

    path = os.path.join(GOLDEN, "ref_encodes.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
