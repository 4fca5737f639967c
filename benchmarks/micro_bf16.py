"""Microbenchmark: bf16 vs f32 elementwise throughput inside a pallas TPU
kernel (VERDICT r1 suggestion (b)): if Mosaic packs bf16 2-per-lane on this
chip, the VPU-bound BC7 scoring planes could near-double. Measures a
mul-add chain, a where-select chain, and a palette-distance-shaped mix in
both dtypes at the same element count.

Op counts per iteration are consistent across kernels (muladd 2, select 4,
dist 3) so the printed Gop/s compare across kernels as well as across
dtypes. Timing uses best-of-3 chains with a best-of-3 RTT estimate, the
same policy as bench.py (the tunnel adds ~±2% run-to-run jitter).
"""

from __future__ import annotations

import time

import numpy as np

REPS = 256

# 1 + 2^-8 survives both f32 and bf16 rounding (8 mantissa bits)
_MULADD_C = 1.00390625
assert float(np.float32(_MULADD_C)) != 1.0
assert _MULADD_C - 1.0 >= 2.0 ** -8


def _muladd(dtype):
    def kern(x_ref, o_ref):
        import jax.numpy as jnp
        x = x_ref[...].astype(dtype)
        acc = jnp.zeros_like(x)
        # 1 + 2^-8: representable exactly in BOTH f32 and bf16 (8 mantissa
        # bits — checked at module load below), so neither dtype's multiply
        # can fold to identity
        c = dtype(_MULADD_C)
        for i in range(REPS):
            acc = acc * c + x
        o_ref[...] = acc.astype(jnp.float32)
    return kern


def _select(dtype):
    def kern(x_ref, o_ref):
        import jax.numpy as jnp
        x = x_ref[...].astype(dtype)
        acc = jnp.zeros_like(x)
        half = dtype(0.5)
        for i in range(REPS):
            acc = jnp.where(x > acc, acc + half, acc - half)
        o_ref[...] = acc.astype(jnp.float32)
    return kern


def _distshape(dtype):
    """Palette-distance-shaped: d = (x-p)^2 accumulate + running min."""
    def kern(x_ref, o_ref):
        import jax.numpy as jnp
        x = x_ref[...].astype(dtype)
        best = x * x
        for i in range(REPS // 2):
            p = dtype(i * (1.0 / REPS))
            d = x - p
            best = jnp.minimum(best, d * d)
        o_ref[...] = best.astype(jnp.float32)
    return kern


def run(kern, px, name, ops_per_iter, iters):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    TILE = 512
    nb = px.shape[1]

    @jax.jit
    def f(p, s):
        out = pl.pallas_call(
            kern,
            grid=(nb // TILE,),
            in_specs=[pl.BlockSpec((16, TILE), lambda i: (0, i))],
            out_specs=pl.BlockSpec((16, TILE), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((16, nb), jnp.float32),
        )(p + s * 1e-30)
        return jnp.sum(out, dtype=jnp.float32)

    float(f(px, jnp.float32(0.0)))          # compile
    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(jnp.float32(0.0)))
    # best-of-3 for both the RTT sample and the timed chain (bench.py's
    # policy: tunnel jitter would otherwise mask the small deltas here)
    rtt = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0.0)))
        rtt = min(rtt, time.perf_counter() - t0)
    n = 30
    dt = np.inf
    for _ in range(3):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = f(px, s)
        float(s)
        dt = min(dt, max(time.perf_counter() - t0 - rtt, 1e-9) / n)
    ops = 16 * nb * ops_per_iter * iters
    print(f"{name}: {dt*1e3:7.3f} ms  {ops/dt/1e9:8.1f} Gop/s", flush=True)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.random((16, 1 << 18)).astype(np.float32))
    # ops/iter: muladd = mul+add (2); select = compare+2 adds+select (4);
    # dist = sub+mul+min (3)
    for kern, name, opi, iters in [
        (_muladd(jnp.float32), "muladd f32 ", 2, REPS),
        (_muladd(jnp.bfloat16), "muladd bf16", 2, REPS),
        (_select(jnp.float32), "select f32 ", 4, REPS),
        (_select(jnp.bfloat16), "select bf16", 4, REPS),
        (_distshape(jnp.float32), "dist   f32 ", 3, REPS // 2),
        (_distshape(jnp.bfloat16), "dist   bf16", 3, REPS // 2),
    ]:
        try:
            run(kern, px, name, opi, iters)
        except Exception as e:
            # measured r3: Mosaic on v5e rejects bf16 vector compares
            # ("Target does not support this comparison") — the select
            # and dist (min) kernels cannot run in bf16 at all
            msg = str(e).splitlines()[0][:120]
            print(f"{name}: UNSUPPORTED ({msg})", flush=True)
