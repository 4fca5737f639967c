"""Quality cost of BC7 search-scope cuts, measured with the r3 default
tier (off-axis ranking + LIGHT winner-refine) on the golden corpus vs
the compiled reference full search (BC6HBC7.cpp:2783-2889).

Now that the winner-ladder recovers fixed-index error after the search,
search-scope cuts that were rejected in r2 (measured without a ladder)
may fit inside the current slack (albedo +0.118, flower +0.130 dB).
Cuts swept: shape candidates 4 -> 3/2, mode-4 index-mode 1 skip, and
modes-4/5 rotation scope. CPU, deterministic. Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python quality_search_cuts.py
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

# (name, shape candidates, mode-4 index modes, modes-4/5 rotations)
CONFIGS = (
    ("c4 (default)", 4, (0, 1), (0, 1, 2, 3)),
    ("c3", 3, (0, 1), (0, 1, 2, 3)),
    ("c2", 2, (0, 1), (0, 1, 2, 3)),
    ("c4-im0", 4, (0,), (0, 1, 2, 3)),
    ("c3-im0", 3, (0,), (0, 1, 2, 3)),
    ("c4-rot0", 4, (0, 1), (0,)),
    ("c3-im0-rot0", 3, (0,), (0,)),
)


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

    for name, n_cand, ims, rots in CONFIGS:
        bc67.BC7_SHAPE_CANDIDATES = n_cand
        bc67._MODE4_IMS = ims
        bc67._MODE45_ROTS = rots
        deltas = []
        for content in CONTENTS:
            bc = np.asarray(bc67.encode_bc7(jnp.asarray(blocks_by[content])))
            d = _psnr(refcodec.decode(refcodec.BC7, bc.reshape(-1, 16)),
                      blocks_by[content]) - ref_psnr[content]
            deltas.append(d)
            print(f"{name:14s} {content:14s} {d:+.3f}", flush=True)
        print(f"{name:14s} {'min':14s} {min(deltas):+.3f}", flush=True)


if __name__ == "__main__":
    main()
