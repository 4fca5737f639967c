"""One-time generator for the bench-scale BC7 quality gate fixture
(VERDICT r4 #7): a 512x512 real-content image plus the compiled
reference codec's BC7 full-search encode, frozen so the TPU default
tier's PSNR can be gated at bench-like scale (the 64²/128² corpus gates
can miss large-content regressions).

Content: the scikit-learn china.jpg sample photo (CC-BY 2.0, ships with
sklearn — the same licence-safe source as the 128² corpus photos),
center 427x512 crop reflect-padded to 512x512. Reference encode takes
~100 s single-core (BC7 2.7 Kt/s) — run once:

  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python generate_bench512.py
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))


def make_image() -> np.ndarray:
    from PIL import Image

    hits = glob.glob("/opt/venv/lib/python3*/site-packages/sklearn/"
                     "datasets/images/china.jpg") + glob.glob(
        "/usr/lib/python3*/site-packages/sklearn/datasets/images/china.jpg")
    if not hits:
        import sklearn.datasets
        hits = [os.path.join(os.path.dirname(sklearn.datasets.__file__),
                             "images", "china.jpg")]
    img = np.asarray(Image.open(hits[0]), np.float32) / 255.0  # [427,640,3]
    h, w = img.shape[:2]
    crop = img[:, (w - 512) // 2:(w - 512) // 2 + 512]
    pad = 512 - crop.shape[0]
    crop = np.pad(crop, ((0, pad), (0, 0), (0, 0)), mode="reflect")
    rgba = np.concatenate(
        [crop, np.ones((512, 512, 1), np.float32)], axis=-1)
    return rgba.astype(np.float32)


def main():
    import refcodec

    import jax.numpy as jnp

    from directxtex_tpu.bc.common import image_to_blocks

    img = make_image()
    blocks = np.asarray(image_to_blocks(jnp.asarray(img))[0])
    print(f"encoding {blocks.shape[0]} blocks with the reference codec "
          "(~100 s)...", flush=True)
    ref_bc = refcodec.encode(refcodec.BC7, blocks)
    dec = refcodec.decode(refcodec.BC7, ref_bc)
    mse = np.mean((dec.astype(np.float64) - blocks.astype(np.float64)) ** 2)
    ref_psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    print(f"reference full-search PSNR: {ref_psnr:.3f} dB")
    np.savez_compressed(os.path.join(HERE, "bench512.npz"),
                        img=img, ref_bc=ref_bc,
                        ref_psnr=np.float64(ref_psnr))
    print("bench512.npz written")


if __name__ == "__main__":
    main()
