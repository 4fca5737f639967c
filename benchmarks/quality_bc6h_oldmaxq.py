"""One-off: the OLD in-search BC6H maxq tier's quality delta vs the
compiled reference on quality_bc6h_refine.py's contents — the bar the
new search + remap winner-refine maxq must match. CPU, slow compile.
Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python quality_bc6h_oldmaxq.py
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
from quality_bc6h_refine import _contents, _psnr  # noqa: E402


def main():
    for name, img in _contents().items():
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.ones(img.shape[:2] + (1,), np.float32)], axis=-1)
        blocks = np.asarray(image_to_blocks(jnp.asarray(img))[0])
        peak = float(np.abs(img[..., :3]).max())
        ref_bc = refcodec.encode(refcodec.BC6HU, blocks)
        ref_psnr = _psnr(refcodec.decode(refcodec.BC6HU, ref_bc), blocks,
                         peak)
        words = bc67.encode_bc6h(jnp.asarray(blocks), signed=False,
                                 flags=0x200000)
        bc = np.asarray(words).reshape(-1, 16).astype(np.uint8)
        d = _psnr(refcodec.decode(refcodec.BC6HU, bc), blocks,
                  peak) - ref_psnr
        print(f"{name:14s} old-maxq      {d:+.3f}", flush=True)


if __name__ == "__main__":
    main()
