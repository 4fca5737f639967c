"""BC6H shared-fit keep-better guard A/B (r5, BC6H_SHARED_KEEPBETTER).

Encodes every HDR probe content from quality_bc6h_refine (plus the
signed zero-crossing probe) with the guard ON and OFF and reports the
encode-PSNR delta vs the compiled reference for the default tier and
the mid tier. Measured result (r5): the encoded words are BITWISE
IDENTICAL — the assign->refit alternation never loses at the float
level, so the guard's SSE planes are pure overhead (the per-group
quantized-domain rescore/refit is what handles quantization snap,
BC6HBC7.cpp:2081-2226 territory). CPU, deterministic.
Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python quality_bc6h_nokb.py
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

import quality_bc6h_refine as Q  # noqa: E402

MID = ((1, (4, 1)), True, False)  # the shipping mid tier (rm1-41)


def run(tag):
    words = {}
    for name, img in Q._contents().items():
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.ones(img.shape[:2] + (1,), np.float32)], axis=-1)
        blocks = np.asarray(image_to_blocks(jnp.asarray(img))[0])
        peak = float(np.abs(img[..., :3]).max())
        ref_bc = refcodec.encode(refcodec.BC6HU, blocks)
        ref_psnr = Q._psnr(refcodec.decode(refcodec.BC6HU, ref_bc),
                           blocks, peak)
        base = bc67.encode_bc6h(jnp.asarray(blocks), signed=False)
        px_int = bc67._f16_to_int(
            jnp.transpose(jnp.asarray(blocks, jnp.float32)[..., :3],
                          (1, 2, 0)), False)

        def score(words_u8):
            bc = np.asarray(words_u8).reshape(-1, 16).astype(np.uint8)
            return Q._psnr(refcodec.decode(refcodec.BC6HU, bc), blocks,
                           peak) - ref_psnr

        d = score(base)
        w32 = jnp.asarray(np.asarray(base).reshape(-1, 16)
                          .view(np.uint32))
        ladder, rm, x2 = MID
        refined = bc67.refine_bc6h_words(px_int, w32, ladder, False,
                                         remap=rm, cross2=x2)
        dm = score(np.asarray(refined).astype('<u4').view(np.uint8)
                   .reshape(-1, 16))
        print(f"{tag:6s} {name:14s} base {d:+.3f}  mid {dm:+.3f}",
              flush=True)
        words[name] = np.asarray(base).reshape(-1, 16).copy()

    # signed zero-crossing probe (test_refparity's shape)
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    img = np.stack([xx * 2 - 1, yy - 0.5, np.sin(xx * 6) * 0.8,
                    np.ones((32, 32))], -1).astype(np.float32)
    blocks = np.asarray(image_to_blocks(jnp.asarray(img))[0])
    peak = float(np.abs(img[..., :3]).max())
    ref_bc = refcodec.encode(refcodec.BC6HS, blocks)
    ref_psnr = Q._psnr(refcodec.decode(refcodec.BC6HS, ref_bc), blocks,
                       peak)
    base = bc67.encode_bc6h(jnp.asarray(blocks), signed=True)
    d = Q._psnr(refcodec.decode(
        refcodec.BC6HS, np.asarray(base).reshape(-1, 16)
        .astype(np.uint8)), blocks, peak) - ref_psnr
    print(f"{tag:6s} {'signed_zc':14s} base {d:+.3f}", flush=True)
    words["signed_zc"] = np.asarray(base).reshape(-1, 16).copy()
    return words


if __name__ == "__main__":
    prev = bc67.BC6H_SHARED_KEEPBETTER
    try:
        bc67.BC6H_SHARED_KEEPBETTER = True
        w_on = run("guard")
        bc67.BC6H_SHARED_KEEPBETTER = False
        w_off = run("nokb")
    finally:
        bc67.BC6H_SHARED_KEEPBETTER = prev
    for name in w_on:
        n = int(np.any(w_on[name] != w_off[name], axis=1).sum())
        print(f"words differ {name:14s} {n}/{w_on[name].shape[0]}",
              flush=True)
