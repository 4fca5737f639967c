"""Which modes does the LIGHT winner-ladder actually need?

The refine dispatch evaluates every mode family's unpack/score/ladder/
re-assign/emit for every lane and folds by the per-lane winner mode —
its cost is the SUM over refined mode families, so dropping families the
ladder doesn't help is a direct throughput lever (the fused-ladder
experiment measured the per-family compute, not dispatch overhead, as
the cost: benchmarks/profile_fused.py).

Reports encode PSNR deltas (ours - compiled reference full search) on
the golden corpus for the default tier with the refine scoped to mode
subsets. CPU, deterministic.
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python quality_refine_modes.py
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
    saved = bc67.LADDER_LIGHT
    bc67.LADDER_LIGHT = (0, ())
    base_words = {}
    for content in CONTENTS:
        bc = np.asarray(bc67.encode_bc7(jnp.asarray(blocks_by[content])))
        base_words[content] = jnp.asarray(
            np.ascontiguousarray(bc).view(np.uint32).reshape(-1, 4))
        d = _psnr(refcodec.decode(refcodec.BC7, bc.reshape(-1, 16)),
                  blocks_by[content]) - ref_psnr[content]
        print(f"base              {content:14s} {d:+.3f}", flush=True)
    bc67.LADDER_LIGHT = saved

    scopes = (
        ("all", None),
        ("no-6", (1, 3, 5, 7, 4)),
        ("no-45", (1, 3, 6, 7)),
        ("no-456", (1, 3, 7)),
        ("13-only", (1, 3)),
        ("subset-only", (1, 3, 7)),
        ("single-only", (5, 6, 4)),
    )
    for sname, scope in scopes:
        for content in CONTENTS:
            modes = (1, 3, 5, 6, 4) if content != "alphagrad" \
                else (1, 3, 5, 6, 7, 4)
            rmodes = modes if scope is None else tuple(
                m for m in modes if m in scope)
            if not rmodes:
                continue
            w = bc67.refine_bc7_words(px_by[content], base_words[content],
                                      bc67.LADDER_LIGHT, modes=rmodes)
            bc = np.asarray(w).view(np.uint8).reshape(-1, 16)
            d = _psnr(refcodec.decode(refcodec.BC7, bc),
                      blocks_by[content]) - ref_psnr[content]
            print(f"refine={sname:9s} {content:14s} {d:+.3f}", flush=True)


if __name__ == "__main__":
    main()
