"""Quality sensitivity of the BC7 off-axis shape ranking under the r3
winner-refine architecture: sweep _POWER_ITERS (and off_axis off) on the
golden corpus vs the compiled reference. The power iteration runs on
[64, T] planes and is the single biggest cost of the ranking (~19% of
the whole search dispatch), so fewer iterations are a direct perf lever.

  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python quality_offaxis_sweep.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import refcodec  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from directxtex_tpu.bc import bc67  # noqa: E402
from directxtex_tpu.bc.common import image_to_blocks  # noqa: E402

CONTENTS = ("albedo", "tworegion", "normal", "alphagrad",
            "photo_china", "photo_flower")


def _psnr(a, b, ch=4):
    mse = np.mean((a[..., :ch].astype(np.float64)
                   - b[..., :ch].astype(np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    corpus = np.load(os.path.join(REPO, "tests/golden/corpus.npz"))
    ref_psnr = {}
    blocks_by = {}
    for content in CONTENTS:
        blocks = np.asarray(image_to_blocks(jnp.asarray(corpus[content]))[0])
        blocks_by[content] = blocks
        ref_bc = refcodec.encode(refcodec.BC7, blocks)
        ref_psnr[content] = _psnr(refcodec.decode(refcodec.BC7, ref_bc),
                                  blocks)

    orig_est = bc67._shape_estimates_table

    def run(tag):
        for content in CONTENTS:
            jax.clear_caches()
            bc = np.asarray(
                bc67.encode_bc7(jnp.asarray(blocks_by[content]))).reshape(
                    -1, 16)
            d = _psnr(refcodec.decode(refcodec.BC7, bc),
                      blocks_by[content]) - ref_psnr[content]
            print(f"{tag:14s} {content:14s} {d:+.3f}", flush=True)

    for iters in (6, 3, 2, 1):
        bc67._POWER_ITERS = iters
        run(f"power={iters}")
    bc67._POWER_ITERS = 6

    def no_off(px_f, partitions, nch, n_shapes=None, off_axis=False,
               axis_w=None):
        return orig_est(px_f, partitions, nch, n_shapes=n_shapes,
                        off_axis=False)
    bc67._shape_estimates_table = no_off
    run("off_axis=OFF")
    bc67._shape_estimates_table = orig_est


if __name__ == "__main__":
    main()
