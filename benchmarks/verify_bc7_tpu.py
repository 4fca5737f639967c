"""Verify the whole-BC7 single-dispatch pallas kernel on a real TPU.

Sibling of verify_bc6h_tpu.py: the CPU XLA backend needs >10 minutes to
compile the mega kernel, so the CI equivalence test runs in interpret mode
only (tests/test_pallas.py); this script checks the Mosaic-compiled kernel
against the jnp reference path on the actual chip.

Step 1 (separate CPU process, writes /tmp/bc7_verify/ref.npz):

    python benchmarks/verify_bc7_tpu.py --make-ref

Step 2 (TPU process): encode the same blocks through bc7_encode_pallas and
require near-total word agreement with the jnp path, with decoded-MSE
parity on any disagreeing blocks (float-associativity near-ties). Also
checks the decode mega-kernels bit-exactly against the frozen golden
decode vectors.

    python benchmarks/verify_bc7_tpu.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

REF_DIR = "/tmp/bc7_verify"
GOLDEN = "/root/repo/tests/golden/decode_vectors.npz"


def _inputs():
    rng = np.random.default_rng(23)
    nb = 256
    blocks = rng.random((nb, 16, 4)).astype(np.float32)
    # mix in structured content: flat, two-region, gradient, opaque
    blocks[:64, :, :3] = np.repeat(rng.random((64, 1, 3)), 16, axis=1) \
        + rng.normal(0, 0.02, (64, 16, 3))
    blocks[64:128, :8, :3] = 0.1
    blocks[64:128, 8:, :3] = 0.9
    blocks[128:192, :, 3] = 1.0
    return np.clip(blocks, 0, 1).astype(np.float32)


def make_ref():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc67

    os.makedirs(REF_DIR, exist_ok=True)
    blocks = _inputs()
    ref = np.asarray(bc67.encode_bc7(jnp.asarray(blocks)))
    # max-quality tier (winner-refine ladder x2) reference
    ref_maxq = np.asarray(bc67.encode_bc7(jnp.asarray(blocks),
                                          flags=0x200000))
    # QUICK tier (mode-6-only, TEX_COMPRESS_BC7_QUICK) and the
    # alpha-weight scoring path (CompressOptions.alphaWeight)
    ref_quick = np.asarray(bc67.encode_bc7(jnp.asarray(blocks),
                                           flags=0x100000))
    ref_aw2 = np.asarray(bc67.encode_bc7(jnp.asarray(blocks),
                                         alpha_weight=2.0))
    np.savez(f"{REF_DIR}/ref.npz", ref=ref, ref_maxq=ref_maxq,
             ref_quick=ref_quick, ref_aw2=ref_aw2, blocks=blocks)
    print("wrote ref.npz")


def verify():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from directxtex_tpu.bc import bc67
    from directxtex_tpu.bc.pallas_kernels import (bc6h_decode_pallas,
                                                  bc7_decode_pallas,
                                                  bc7_encode_pallas,
                                                  bc7_refine_pallas)

    assert jax.default_backend() == "tpu", "run this step on the TPU"
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    ok = True
    ref_path = f"{REF_DIR}/ref.npz"
    if not os.path.exists(ref_path):
        print(f"missing {ref_path}; run --make-ref first", file=sys.stderr)
        return 1
    data = np.load(ref_path)
    ref, blocks = data["ref"], data["blocks"]
    nb = blocks.shape[0]

    px_f32 = jnp.asarray(blocks, jnp.float32)
    px_i = jnp.clip(jnp.transpose(px_f32, (1, 2, 0)) * 255.0 + 0.01,
                    0.0, 255.0).astype(jnp.int32)
    modes = (1, 3, 5, 6, 7, 4)  # encode_bc7 non-opaque mode order

    # tiers mirror bc67.encode_bc7 exactly: default = light ladder x1 +
    # the measured mode-4 index-mode cut + the no-mode-6 refine scope
    # (r4); maxq = full ladder x2 at full scope; aw2 = the alpha-weight
    # scoring kernels (CompressOptions.alphaWeight, BC7Encode.hlsl:241)
    def _scoped(ms):
        return tuple(m for m in ms if m != 6)

    # last tuple slot: share2sub — the r5 shared 2-subset fit serves the
    # default tier; maxq keeps the independent evaluation (bc67.encode_bc7)
    tiers = [("default", [bc67.LADDER_MOMENT], bc67._MODE4_IMS,
              _scoped(modes), 1.0, ref, bc67.BC7_SHARED2SUB)]
    if "ref_maxq" in data:
        tiers.append(("maxq", [bc67.LADDER_MOMENT, bc67.LADDER_FULL],
                      (0, 1), modes, 1.0, data["ref_maxq"], False))
    if "ref_aw2" in data:
        tiers.append(("aw2", [bc67.LADDER_MOMENT], bc67._MODE4_IMS,
                      _scoped(modes), 2.0, data["ref_aw2"],
                      bc67.BC7_SHARED2SUB))
    src_all = np.clip(blocks * 255.0 + 0.01, 0, 255).astype(
        np.int32).astype(np.float32)

    def _mse(words_u8, aw=1.0):
        dec = np.asarray(bc67.decode_bc7(words_u8)) * 255.0
        d2 = (dec - src_all) ** 2
        if aw != 1.0:
            d2 = d2.copy()
            d2[..., 3] *= aw   # compare tiers by the metric they optimize
        return d2.sum(axis=(1, 2))

    for tier, ladders, m4_ims, rmodes, aw, tier_ref, sh2 in tiers:
        _, base_words = bc7_encode_pallas(px_i, modes, m4_ims=m4_ims,
                                          aw=aw, share2sub=sh2)
        # (a) kernel equivalence: pallas refine vs the jnp twin on the
        # SAME input words (both on-device). Any ladder-path divergence
        # seeded by a near-tie search winner is excluded by construction,
        # so disagreements here must be genuine near-ties of the refine
        # step itself — per-block decoded-MSE parity required.
        words = base_words
        jwords = base_words
        for ladder in ladders:
            words = bc7_refine_pallas(px_i, words, ladder, modes=rmodes,
                                      aw=aw)
            jwords = bc67.refine_bc7_words(px_i, jwords, ladder,
                                           modes=rmodes, aw=aw)
        got = np.ascontiguousarray(
            np.asarray(lax.bitcast_convert_type(words, jnp.uint8).reshape(
                nb, 16)))
        got_j = np.ascontiguousarray(
            np.asarray(lax.bitcast_convert_type(jwords, jnp.uint8).reshape(
                nb, 16)))
        kdiff = np.any(got != got_j, axis=1)
        print(f"bc7 refine [{tier}]: {kdiff.sum()}/{nb} blocks differ "
              "from jnp refine on identical inputs")
        if kdiff.sum() > max(2, nb // 25):
            ok = False
        if kdiff.any():
            mse_p = _mse(got, aw)[kdiff]
            mse_j = _mse(got_j, aw)[kdiff]
            worst = float(np.max(mse_p - mse_j))
            print(f"  worst MSE regression vs jnp refine: {worst:.5f}")
            # near-tie fold flips are fine; only a real quality loss fails
            if np.any(mse_p > mse_j * 1.05 + 1e-3):
                ok = False

        # (b) end-to-end vs the CPU jnp encode: search near-ties seed
        # different ladder paths, so per-block divergence is expected;
        # the gate is aggregate quality parity over the whole set.
        differ = np.any(got != tier_ref, axis=1)
        mse_e2e_p = float(_mse(got, aw).sum())
        mse_e2e_r = float(_mse(tier_ref, aw).sum())
        print(f"bc7 encode [{tier}]: {differ.sum()}/{nb} blocks differ "
              f"from jnp ref; total MSE {mse_e2e_p:.1f} vs "
              f"ref {mse_e2e_r:.1f}")
        if differ.sum() > max(2, nb // 25):
            ok = False
        if mse_e2e_p > mse_e2e_r * 1.001 + 1e-3:
            ok = False

    # bench-scale quality gate (r5, VERDICT r4 #7): 512² real content
    # (frozen reference full-search encode, tests/golden/bench512.npz —
    # generate_bench512.py) — the TPU default tier must beat the
    # reference's PSNR at bench-like scale, so a throughput-motivated
    # kernel change can't silently trade large-content quality. Metric:
    # ComputeMSE semantics (DirectXTexMisc.cpp:27-180), both encodes
    # decoded through spec-exact decoders.
    b512_path = "/root/repo/tests/golden/bench512.npz"
    if os.path.exists(b512_path):
        from directxtex_tpu.bc.common import image_to_blocks
        b512 = np.load(b512_path)
        ref_psnr512 = float(b512["ref_psnr"])
        blocks512, _, _ = image_to_blocks(jnp.asarray(b512["img"]))
        bc512 = np.asarray(bc67.encode_bc7(blocks512, opaque=True))
        dec512 = np.asarray(bc67.decode_bc7(bc512)).astype(np.float64)
        src512 = np.asarray(blocks512).astype(np.float64)
        mse512 = np.mean((dec512 - src512) ** 2)
        got_psnr512 = 10 * np.log10(1.0 / max(mse512, 1e-12))
        d512 = got_psnr512 - ref_psnr512
        print(f"bc7 bench-scale 512² default tier: {got_psnr512:.3f} dB "
              f"vs reference {ref_psnr512:.3f} ({d512:+.3f})")
        if d512 < 0.0:
            ok = False
    else:
        print("bc7 bench-scale 512² gate SKIPPED (no bench512.npz)")

    # QUICK tier (TEX_COMPRESS_BC7_QUICK, mode 6 only, no refine): the
    # smallest production graph — byte-level agreement expected (single
    # deterministic mode; only axis-fit near-ties can differ)
    if "ref_quick" in data:
        _, qwords = bc7_encode_pallas(px_i, (6,))
        gotq = np.ascontiguousarray(
            np.asarray(lax.bitcast_convert_type(
                qwords, jnp.uint8).reshape(nb, 16)))
        qdiff = np.any(gotq != data["ref_quick"], axis=1)
        mq_p = float(_mse(gotq).sum())
        mq_r = float(_mse(data["ref_quick"]).sum())
        print(f"bc7 encode [quick]: {qdiff.sum()}/{nb} blocks differ; "
              f"total MSE {mq_p:.1f} vs ref {mq_r:.1f}")
        if qdiff.sum() > max(2, nb // 25) or mq_p > mq_r * 1.001 + 1e-3:
            ok = False

    # fused winner-ladder kernel variant (bc7_encode_pallas(ladder=...)):
    # not the production path (measured slower, profile_fused.py) but a
    # supported option — must be bit-identical to the two-dispatch chain
    _, ws = bc7_encode_pallas(px_i, modes, m4_ims=bc67._MODE4_IMS)
    wr = bc7_refine_pallas(px_i, ws, bc67.LADDER_LIGHT, modes=modes)
    _, wf = bc7_encode_pallas(px_i, modes, m4_ims=bc67._MODE4_IMS,
                              ladder=bc67.LADDER_LIGHT)
    fused_ok = bool(np.array_equal(np.asarray(wf), np.asarray(wr)))
    print(f"bc7 fused-ladder == two-dispatch: {fused_ok}")
    ok = ok and fused_ok

    # decode mega-kernels: bit-exact vs the frozen golden vectors
    v = np.load(GOLDEN)
    w7 = jnp.transpose(bc67._bytes_to_words(v["bc7_blocks"]))
    out = bc7_decode_pallas(w7)
    outf = jnp.clip(out, 0, 255).astype(jnp.float32) * jnp.float32(1 / 255)
    got7 = np.asarray(jnp.transpose(outf.reshape(16, 4, -1), (2, 0, 1)))
    exact7 = bool(np.array_equal(got7, v["bc7_rgba"]))
    print(f"bc7 decode kernel bit-exact: {exact7}")
    ok = ok and exact7

    w6 = jnp.transpose(bc67._bytes_to_words(v["bc6h_blocks"]))
    for signed, key in ((False, "bc6h_uf_bits"), (True, "bc6h_sf_bits")):
        bits = bc6h_decode_pallas(w6, signed)
        h = np.asarray(bits).astype(np.uint16).reshape(16, 3, -1)
        got6 = np.transpose(h, (2, 0, 1))
        # golden bits are [NB, 16, 4] u16 half patterns incl. alpha=1.0
        exact6 = bool(np.array_equal(got6, v[key][..., :3]))
        print(f"bc6h decode kernel signed={signed} bit-exact: {exact6}")
        ok = ok and exact6

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--make-ref" in sys.argv:
        make_ref()
    else:
        sys.exit(verify())
