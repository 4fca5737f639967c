"""BC6H shared-fit quality: encode PSNR (ours - compiled reference) with
BC6H_SHARED_FIT off (r2 per-group full eval) vs on (one precision-free
fit trajectory shared by all rows of a region family).

Contents: the frozen 64² HDR probe plus synthetic probes spanning the
failure modes the approximation could hit (coarse-precision rows win on
smooth low-range content; delta-transform fits bind on high-contrast
content). PSNR convention matches tests/test_refparity.py (both sides
decoded through the reference decoder, peak-scaled). CPU, deterministic.
Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python quality_bc6h_shared.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import refcodec  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from directxtex_tpu.bc import bc67  # noqa: E402
from directxtex_tpu.bc.common import image_to_blocks  # noqa: E402


def _psnr(a, b, peak):
    mse = np.mean((a[..., :3].astype(np.float64)
                   - b[..., :3].astype(np.float64)) ** 2)
    return 10 * np.log10(peak * peak / max(mse, 1e-12))


def _contents():
    corpus = np.load(os.path.join(REPO, "tests/golden/corpus.npz"))
    rng = np.random.default_rng(7)
    out = {"hdr(frozen)": corpus["hdr"]}

    # HDR-ified photograph: LDR chroma modulated by a wide-exposure field
    photo = corpus["photo_china"][..., :3]
    expo = np.exp(np.linspace(-4, 4, photo.shape[0]))[:, None, None]
    img = (photo + 0.05) * expo.astype(np.float32)
    out["photo_expose"] = img

    # sun/sky: smooth low blue with a hot disk (two-region, huge range)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    sky = np.stack([0.1 + 0.05 * yy, 0.15 + 0.1 * yy,
                    0.4 + 0.2 * yy], axis=-1)
    disk = ((yy - 0.3) ** 2 + (xx - 0.6) ** 2) < 0.04
    sky[disk] = [900.0, 850.0, 600.0]
    out["sun_sky"] = sky.astype(np.float32)

    # smooth low-range gradient (coarse-precision rows win here)
    out["dim_smooth"] = np.stack(
        [0.02 + 0.01 * yy + 0.005 * xx,
         0.03 + 0.008 * xx,
         0.025 + 0.012 * yy * xx], axis=-1).astype(np.float32)

    # noisy midrange
    out["noise_mid"] = (rng.random((64, 64, 3)).astype(np.float32)
                        * 4.0 + 0.5)
    return out


def main():
    results = {}
    for name, img in _contents().items():
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.ones(img.shape[:2] + (1,), np.float32)], axis=-1)
        blocks = np.asarray(image_to_blocks(jnp.asarray(img))[0])
        peak = float(np.abs(img[..., :3]).max())
        ref_bc = refcodec.encode(refcodec.BC6HU, blocks)
        ref_psnr = _psnr(refcodec.decode(refcodec.BC6HU, ref_bc), blocks,
                         peak)
        row = {}
        for mode in ("off", "on"):
            bc67.BC6H_SHARED_FIT = mode == "on"
            bc = np.asarray(bc67.encode_bc6h(
                jnp.asarray(blocks), signed=False)).reshape(-1, 16)
            row[mode] = _psnr(refcodec.decode(refcodec.BC6HU, bc), blocks,
                              peak) - ref_psnr
            print(f"{name:14s} shared={mode:3s} {row[mode]:+.3f}",
                  flush=True)
        results[name] = row
    worst = min(r["on"] for r in results.values())
    print(f"min delta (shared on): {worst:+.3f}", flush=True)


if __name__ == "__main__":
    main()
