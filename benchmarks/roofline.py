"""Roofline rows for the encode mega-kernels (VERDICT r3 #2/#8): useful
op/s achieved vs the micro-measured VPU peak.

XLA's cost model cannot see inside a pallas custom call, so the flop
counts come from compiling the bit-equivalent jnp TWINS on CPU at a
small block count (flops scale linearly in NB; the twin is the same
math by the test_pallas equivalence invariant) and the times from the
chained device-time harness on the real chip. Peak from
benchmarks/micro_intvsf32.py (f32 mul-add mix 2.9-5.0 Top/s on v5e).

  # step 1 (CPU process): write /tmp/roofline_flops.json
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python benchmarks/roofline.py --flops
  # step 2 (TPU process): print the roofline rows
  python benchmarks/roofline.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")

from profile_bc7 import _enable_compile_cache, chain_time  # noqa: E402

VPU_PEAK_GOPS = 3500.0  # mid-range of the micro-measured 2.9-5.0 Top/s
FLOPS_PATH = "/tmp/roofline_flops.json"
NB_SMALL = 4096          # flop-count tracing size (scales linearly)
NB_FULL = (2048 // 4) ** 2


def _twins(nb):
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc67

    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (16, 4, nb), dtype=np.int64).astype(np.int32)
    px[:, 3, :] = 255
    px_i = jnp.asarray(px)
    px6 = rng.integers(0, 0x7BFF, (16, 3, nb),
                       dtype=np.int64).astype(np.int32)
    px6_i = jnp.asarray(px6)
    blocks = jnp.transpose(px_i, (2, 0, 1)).astype(jnp.float32) / 255.0
    blocks6 = jnp.concatenate(
        [jnp.transpose(px6_i, (2, 0, 1)).astype(jnp.float32),
         jnp.ones((nb, 16, 1), jnp.float32)], -1)
    return px_i, px6_i, blocks, blocks6


_ARITH = {"add", "sub", "mul", "div", "max", "min", "neg", "abs",
          "floor", "round", "sign", "integer_pow", "pow", "rsqrt",
          "sqrt", "exp", "log", "and", "or", "xor", "not",
          "shift_left", "shift_right_logical", "shift_right_arithmetic",
          "rem", "select_n", "eq", "ne", "lt", "le", "gt", "ge",
          "nextafter", "clamp"}


def _jaxpr_ops(jaxpr) -> float:
    """Backend-independent elementwise-op count: one op per output
    element of every arithmetic primitive (the VPU-op notion the micro
    peaks measure). XLA-CPU cost_analysis() inflates (its counts imply
    >10 Top/s on a 3.5 Top/s VPU), so count the jaxpr instead."""
    total = 0.0
    for eqn in jaxpr.eqns:
        for sub in getattr(eqn, "params", {}).values():
            if hasattr(sub, "jaxpr"):
                total += _jaxpr_ops(sub.jaxpr)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        total += _jaxpr_ops(s.jaxpr)
        if eqn.primitive.name in _ARITH:
            for ov in eqn.outvars:
                total += float(np.prod(ov.aval.shape)) or 1.0
        elif eqn.primitive.name == "reduce_sum":
            total += float(np.prod(eqn.invars[0].aval.shape)) or 1.0
        elif eqn.primitive.name in ("reduce_max", "reduce_min"):
            total += float(np.prod(eqn.invars[0].aval.shape)) or 1.0
        elif eqn.primitive.name == "dot_general":
            (lc, _), _ = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval.shape
            k = 1
            for d in lc:
                k *= lhs[d]
            total += 2.0 * float(np.prod(eqn.outvars[0].aval.shape)) * k
    return total


def make_flops():
    """CPU: jaxpr op counts of the jnp twins per dispatch at NB_SMALL."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from directxtex_tpu.bc import bc67

    px_i, px6_i, blocks, blocks6 = _twins(NB_SMALL)
    modes = (1, 3, 5, 6, 4)
    rmodes = tuple(m for m in modes if m != 6)

    # search-only twin: stub out the winner-refine dispatch entirely.
    # (The r4 table zeroed LADDER_LIGHT instead, which stopped working
    # when the default ladder became LADDER_MOMENT — the old bc7_search
    # count INCLUDED the refine dispatch's ops, which is what pushed the
    # search row to an impossible 106% of peak.)
    rf = bc67.refine_bc7_words
    bc67.refine_bc7_words = lambda p, w, ladder, **kw: w
    try:
        j = jax.make_jaxpr(lambda b: bc67.encode_bc7(b, opaque=True))(
            blocks)
        f_search = _jaxpr_ops(j.jaxpr)
    finally:
        bc67.refine_bc7_words = rf

    words = jnp.zeros((NB_SMALL, 4), jnp.uint32)
    j = jax.make_jaxpr(lambda p, w: bc67.refine_bc7_words(
        p, w, bc67.LADDER_MOMENT, modes=rmodes))(px_i, words)
    f_refine = _jaxpr_ops(j.jaxpr)

    j = jax.make_jaxpr(lambda b: bc67.encode_bc6h(b, signed=False))(
        blocks6)
    f_bc6h = _jaxpr_ops(j.jaxpr)

    # BC6H maxq winner-refine ladder (remap + cross2, VERDICT r4 #8)
    j = jax.make_jaxpr(lambda p, w: bc67.refine_bc6h_words(
        p, w, bc67.BC6H_LADDER_MAXQ, False, remap=True, cross2=True))(
        px6_i, words)
    f_bc6h_maxq = _jaxpr_ops(j.jaxpr)

    # decode mega-kernel twins (words already transposed in the kernels;
    # count the jnp twins on byte blocks)
    bl7 = jnp.zeros((NB_SMALL, 16), jnp.uint8)
    j = jax.make_jaxpr(bc67.decode_bc7)(bl7)
    f_dec7 = _jaxpr_ops(j.jaxpr)
    j = jax.make_jaxpr(lambda b: bc67.decode_bc6h(b, signed=False))(bl7)
    f_dec6 = _jaxpr_ops(j.jaxpr)

    out = {"nb": NB_SMALL, "bc7_search": f_search,
           "bc7_refine": f_refine, "bc6h_search": f_bc6h,
           "bc6h_maxq_refine": f_bc6h_maxq,
           "bc7_decode": f_dec7, "bc6h_decode": f_dec6}
    with open(FLOPS_PATH, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


def rows():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from directxtex_tpu.bc import bc67
    from directxtex_tpu.bc.pallas_kernels import (bc6h_decode_pallas,
                                                  bc6h_encode_pallas,
                                                  bc6h_refine_pallas,
                                                  bc7_decode_pallas,
                                                  bc7_encode_pallas,
                                                  bc7_refine_pallas)

    with open(FLOPS_PATH) as f:
        fl = json.load(f)
    scale = NB_FULL / fl["nb"]

    px_i, px6_i, _, _ = _twins(NB_FULL)
    modes = (1, 3, 5, 6, 4)
    rmodes = tuple(m for m in modes if m != 6)
    _, base_words = jax.jit(lambda p: bc7_encode_pallas(p, modes))(px_i)
    base_words.block_until_ready()
    _, base6 = jax.jit(lambda p: bc6h_encode_pallas(p, False))(px6_i)
    base6.block_until_ready()
    # decode inputs as i32 (chain_time perturbs with an i32 zero; the
    # lambdas bitcast back to u32 words)
    rng = np.random.default_rng(5)
    w7i = jnp.asarray(rng.integers(0, 2**32, (4, NB_FULL),
                                   dtype=np.uint64).astype(np.uint32)
                      .view(np.int32))

    def _u32(w):
        return jax.lax.bitcast_convert_type(w, jnp.uint32)

    cases = [
        ("bc7 search", "bc7_search", px_i,
         lambda p: jnp.sum(bc7_encode_pallas(p, modes)[1]).astype(
             jnp.float32)),
        ("bc7 refine", "bc7_refine", px_i,
         lambda p: jnp.sum(bc7_refine_pallas(
             p, base_words, bc67.LADDER_MOMENT,
             modes=rmodes)).astype(jnp.float32)),
        ("bc6h search", "bc6h_search", px6_i,
         lambda p: jnp.sum(bc6h_encode_pallas(p, False)[1]).astype(
             jnp.float32)),
        ("bc6h maxq rf", "bc6h_maxq_refine", px6_i,
         lambda p: jnp.sum(bc6h_refine_pallas(
             p, base6, bc67.BC6H_LADDER_MAXQ, False, remap=True,
             cross2=True)).astype(jnp.float32)),
        ("bc7 decode", "bc7_decode", w7i,
         lambda w: jnp.sum(bc7_decode_pallas(_u32(w))).astype(
             jnp.float32)),
        ("bc6h decode", "bc6h_decode", w7i,
         lambda w: jnp.sum(bc6h_decode_pallas(_u32(w), False)).astype(
             jnp.float32)),
    ]
    for name, key, inp, fn in cases:
        flops = fl[key] * scale
        t = chain_time(fn, inp)
        gops = flops / t / 1e9
        print(f"{name:12s} {t*1e3:8.2f} ms  {flops/1e9:8.2f} Gflop "
              f"{gops:8.1f} Gop/s  {100*gops/VPU_PEAK_GOPS:5.1f}% of "
              "VPU peak", flush=True)


if __name__ == "__main__":
    if "--flops" in sys.argv:
        make_flops()
    else:
        rows()
