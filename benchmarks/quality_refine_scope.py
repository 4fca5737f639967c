"""Quality of the winner-refine architecture vs the in-search ladder.

Measures encode PSNR deltas (ours - compiled reference) on the golden
corpus for: base search (no ladder), winner-refine at several ladder
strengths, and the in-search cand-scope ladder (the r3-early state).
CPU, deterministic. Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python quality_refine_scope.py
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
    px_by = {}
    for content in CONTENTS:
        blocks = np.asarray(image_to_blocks(jnp.asarray(corpus[content]))[0])
        blocks_by[content] = blocks
        ref_bc = refcodec.encode(refcodec.BC7, blocks)
        ref_psnr[content] = _psnr(refcodec.decode(refcodec.BC7, ref_bc),
                                  blocks)
        px_by[content] = jnp.clip(
            jnp.transpose(jnp.asarray(blocks), (1, 2, 0)) * 255.0 + 0.01,
            0.0, 255.0).astype(jnp.int32)

    # base words: rounds=0 ladder is bit-identical to no ladder
    saved = bc67.LADDER_FULL
    bc67.LADDER_FULL = (0, ())
    base_words = {}
    for content in CONTENTS:
        bc = np.asarray(bc67.encode_bc7(jnp.asarray(blocks_by[content])))
        base_words[content] = jnp.asarray(
            np.ascontiguousarray(bc).view(np.uint32).reshape(-1, 4))
        d = _psnr(refcodec.decode(refcodec.BC7, bc.reshape(-1, 16)),
                  blocks_by[content]) - ref_psnr[content]
        print(f"base        {content:14s} {d:+.3f}", flush=True)
    bc67.LADDER_FULL = saved

    for lname, ladder in (("w-light", (1, (1,))),
                          ("w-1r21", (1, (2, 1))),
                          ("w-2r1", (2, (1,))),
                          ("w-full", (2, (2, 1))),
                          ("w-full3", (3, (2, 1)))):
        for content in CONTENTS:
            modes = (1, 3, 5, 6, 4) if content != "alphagrad" \
                else (1, 3, 5, 6, 7, 4)
            w = bc67.refine_bc7_words(px_by[content], base_words[content],
                                      ladder, modes=modes)
            bc = np.asarray(w).view(np.uint8).reshape(-1, 16)
            d = _psnr(refcodec.decode(refcodec.BC7, bc),
                      blocks_by[content]) - ref_psnr[content]
            print(f"{lname:11s} {content:14s} {d:+.3f}", flush=True)


if __name__ == "__main__":
    main()
