"""Verify the whole-BC6H single-dispatch pallas kernel on a real TPU.

The CPU XLA backend needs >10 minutes to compile the mega kernel, so the
CI test (tests/test_pallas.py::test_bc6h_single_dispatch_matches_jnp) is
gated behind DXT_HEAVY_TESTS; this script is the TPU-side equivalent.

Step 1 (separate CPU process, writes /tmp/bc6h_verify/ref_{0,1}.npz):

    python benchmarks/verify_bc6h_tpu.py --make-ref

Step 2 (TPU process): encode the same blocks through bc6h_encode_pallas
and require near-total word agreement with the jnp path, with decoded-MSE
parity on any disagreeing blocks (float-associativity near-ties).

    python benchmarks/verify_bc6h_tpu.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

REF_DIR = "/tmp/bc6h_verify"


def _inputs(signed: bool):
    rng = np.random.default_rng(17)
    nb = 200
    scale = 8.0 if not signed else 4.0
    rgb = rng.random((nb, 16, 3)).astype(np.float32) * scale
    if signed:
        rgb -= scale / 2
        # sign-crossing bimodal content (the BC6H_LS_MAG_CAP pathology):
        # two-region structure with both signs at large magnitude
        rgb[:40, 8:, :] += scale
        rgb[:40, :8, :] -= scale
    return rgb


def make_ref():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc67

    os.makedirs(REF_DIR, exist_ok=True)
    for signed in (False, True):
        rgb = _inputs(signed)
        blocks = np.concatenate(
            [rgb, np.ones((rgb.shape[0], 16, 1), np.float32)], -1)
        ref = np.asarray(bc67.encode_bc6h(jnp.asarray(blocks), signed))
        ref_maxq = np.asarray(bc67.encode_bc6h(
            jnp.asarray(blocks), signed, flags=bc67._BC7_MAXQUALITY))
        np.savez(f"{REF_DIR}/ref_{int(signed)}.npz", ref=ref,
                 ref_maxq=ref_maxq, rgb=rgb)
        print(f"wrote ref_{int(signed)}.npz")


def verify():
    import jax
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc67
    from directxtex_tpu.bc.bc67 import _f16_to_int
    from directxtex_tpu.bc.pallas_kernels import (bc6h_encode_pallas,
                                                  bc6h_refine_pallas)

    assert jax.default_backend() == "tpu", "run this step on the TPU"
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    ok = True
    for signed in (False, True):
        ref_path = f"{REF_DIR}/ref_{int(signed)}.npz"
        if not os.path.exists(ref_path):
            print(f"missing {ref_path}; run --make-ref first", file=sys.stderr)
            return 1
        data = np.load(ref_path)
        ref, rgb = data["ref"], data["rgb"]
        nb = rgb.shape[0]
        px_int = _f16_to_int(jnp.asarray(np.transpose(rgb, (1, 2, 0))),
                             signed)
        _, words = bc6h_encode_pallas(px_int, signed)
        got = np.ascontiguousarray(np.asarray(words)).view(
            np.uint8).reshape(nb, 16)

        differ = np.any(got != ref, axis=1)
        print(f"signed={signed}: {differ.sum()}/{nb} blocks differ")
        if differ.sum() > max(2, nb // 25):
            ok = False
        if differ.any():
            dec_p = np.asarray(bc67.decode_bc6h(got[differ], signed))
            dec_r = np.asarray(bc67.decode_bc6h(ref[differ], signed))
            src = rgb[differ]
            mse_p = ((dec_p[..., :3] - src) ** 2).sum(axis=(1, 2))
            mse_r = ((dec_r[..., :3] - src) ** 2).sum(axis=(1, 2))
            worst = float(np.max(mse_p - mse_r))
            print(f"  worst MSE regression on disagreeing blocks: {worst:.5f}")
            # near-tie fold flips are fine; only a real quality loss fails
            if np.any(mse_p > mse_r * 1.05 + 1e-3):
                ok = False

        # maxq tier: the winner-ladder kernel (bc6h_refine_pallas) vs the
        # jnp twin on identical inputs, plus aggregate parity vs the CPU
        # maxq reference (mirrors verify_bc7_tpu's tier structure)
        if "ref_maxq" in data:
            rw = bc6h_refine_pallas(px_int, words, bc67.BC6H_LADDER_MAXQ,
                                    signed, remap=True, cross2=True)
            jw = bc67.refine_bc6h_words(px_int, words,
                                        bc67.BC6H_LADDER_MAXQ, signed,
                                        remap=True, cross2=True)
            gp = np.ascontiguousarray(np.asarray(rw)).view(
                np.uint8).reshape(nb, 16)
            gj = np.ascontiguousarray(np.asarray(jw)).view(
                np.uint8).reshape(nb, 16)
            kdiff = np.any(gp != gj, axis=1)
            print(f"signed={signed} maxq refine: {kdiff.sum()}/{nb} "
                  "blocks differ from jnp refine on identical inputs")
            if kdiff.sum() > max(2, nb // 25):
                ok = False
            rq = data["ref_maxq"]

            def _mse_all(w8):
                dec = np.asarray(bc67.decode_bc6h(w8, signed))
                return float(((dec[..., :3] - rgb) ** 2).sum())

            mq_p, mq_r = _mse_all(gp), _mse_all(rq)
            print(f"signed={signed} maxq e2e: total MSE {mq_p:.2f} vs "
                  f"ref {mq_r:.2f}")
            if mq_p > mq_r * 1.01 + 1e-3:
                ok = False
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--make-ref" in sys.argv:
        make_ref()
    else:
        sys.exit(verify())
