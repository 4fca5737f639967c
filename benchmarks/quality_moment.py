"""Quality of the LADDER_MOMENT analytic ladder vs the exact probe
ladders, on the golden corpus vs the compiled reference (CPU,
deterministic).

Two tables (r4 measurements in parentheses):

1. default tier (search + one refine dispatch, refine scope no-6):
   moment matches or beats exact LIGHT on 5/6 contents
   (albedo +0.066 -> +0.081, normal +2.927 -> +2.990, photos +0.08 ->
   +0.089/+0.088; tworegion +0.375 -> +0.363).
2. maxq tier (full-scope search + two refine dispatches):
   moment+FULL beats FULL x2 on EVERY content (+0.140 -> +0.165
   albedo, +0.392 -> +0.417 tworegion, +2.988 -> +3.041 normal,
   +0.487 -> +0.512 alphagrad, +0.264 -> +0.280 china, +0.159 ->
   +0.184 flower): the joint (±1,±1) moment move escapes corners the
   sequential per-channel exact climb cannot reach, then FULL polishes.

  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python quality_moment.py
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


def _bases(corpus, maxq: bool):
    """Search-only words per content (ladders monkeypatched to 0)."""
    sl, sf = bc67.LADDER_LIGHT, bc67.LADDER_FULL
    bc67.LADDER_LIGHT = bc67.LADDER_FULL = (0, ())
    out = {}
    try:
        for content in CONTENTS:
            blocks = np.asarray(
                image_to_blocks(jnp.asarray(corpus[content]))[0])
            bc = np.asarray(bc67.encode_bc7(
                jnp.asarray(blocks), flags=0x200000 if maxq else 0))
            out[content] = jnp.asarray(
                np.ascontiguousarray(bc).view(np.uint32).reshape(-1, 4))
    finally:
        bc67.LADDER_LIGHT, bc67.LADDER_FULL = sl, sf
    return out


def main():
    corpus = np.load(os.path.join(REPO, "tests/golden/corpus.npz"))
    ref_psnr, blocks_by, px_by = {}, {}, {}
    for content in CONTENTS:
        blocks = np.asarray(
            image_to_blocks(jnp.asarray(corpus[content]))[0])
        blocks_by[content] = blocks
        ref_bc = refcodec.encode(refcodec.BC7, blocks)
        ref_psnr[content] = _psnr(
            refcodec.decode(refcodec.BC7, ref_bc), blocks)
        px_by[content] = jnp.clip(
            jnp.transpose(jnp.asarray(blocks), (1, 2, 0)) * 255.0 + 0.01,
            0.0, 255.0).astype(jnp.int32)

    base_d = _bases(corpus, maxq=False)
    for lname, ladder in (("light", bc67.LADDER_LIGHT),
                          ("moment", bc67.LADDER_MOMENT)):
        for content in CONTENTS:
            modes = (1, 3, 5, 4) if content != "alphagrad" \
                else (1, 3, 5, 7, 4)
            w = bc67.refine_bc7_words(px_by[content], base_d[content],
                                      ladder, modes=modes)
            bc = np.asarray(w).view(np.uint8).reshape(-1, 16)
            d = _psnr(refcodec.decode(refcodec.BC7, bc),
                      blocks_by[content]) - ref_psnr[content]
            print(f"default {lname:8s} {content:14s} {d:+.3f}",
                  flush=True)

    base_m = _bases(corpus, maxq=True)
    for lname, ladders in (("full x2", [bc67.LADDER_FULL] * 2),
                           ("moment x2", [bc67.LADDER_MOMENT] * 2),
                           ("mom+full", [bc67.LADDER_MOMENT,
                                         bc67.LADDER_FULL])):
        for content in CONTENTS:
            modes = (1, 3, 5, 6, 4) if content != "alphagrad" \
                else (1, 3, 5, 6, 7, 4)
            w = base_m[content]
            for lad in ladders:
                w = bc67.refine_bc7_words(px_by[content], w, lad,
                                          modes=modes)
            bc = np.asarray(w).view(np.uint8).reshape(-1, 16)
            d = _psnr(refcodec.decode(refcodec.BC7, bc),
                      blocks_by[content]) - ref_psnr[content]
            print(f"maxq    {lname:8s} {content:14s} {d:+.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
