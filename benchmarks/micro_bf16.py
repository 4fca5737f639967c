"""Microbenchmark: bf16 vs f32 elementwise throughput inside a pallas TPU
kernel (VERDICT r1 suggestion (b)): if Mosaic packs bf16 2-per-lane on this
chip, the VPU-bound BC7 scoring planes could near-double. Measures a
mul-add chain, a where-select chain, and a palette-distance-shaped mix in
both dtypes at the same element count."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 256


def _muladd(dtype):
    def kern(x_ref, o_ref):
        import jax.numpy as jnp
        x = x_ref[...].astype(dtype)
        acc = jnp.zeros_like(x)
        c = dtype(1.0009765625)
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


def run(kern, px, name, reps):
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

    s = jnp.float32(0.0)
    float(f(px, s))
    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(s))
    t0 = time.perf_counter()
    float(trivial(s))
    rtt = time.perf_counter() - t0
    n = 30
    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(px, s)
    float(s)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n
    ops = 16 * nb * reps
    print(f"{name}: {dt*1e3:7.3f} ms  {ops/dt/1e9:8.1f} Gop/s", flush=True)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.random((16, 1 << 18)).astype(np.float32))
    run(_muladd(jnp.float32), px, "muladd f32 ", REPS)
    run(_muladd(jnp.bfloat16), px, "muladd bf16", REPS)
    run(_select(jnp.float32), px, "select f32 ", REPS)
    run(_select(jnp.bfloat16), px, "select bf16", REPS)
    run(_distshape(jnp.float32), px, "dist   f32 ", REPS // 2 * 3)
    run(_distshape(jnp.bfloat16), px, "dist   bf16", REPS // 2 * 3)
