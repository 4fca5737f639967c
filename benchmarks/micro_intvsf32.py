"""Microbenchmark: int32 vs f32 multiply throughput inside a pallas TPU
kernel, to decide whether the BC encode hot math should stay integer or
move to exact-in-f32 formulations."""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 256


def _kernel_i32(x_ref, o_ref):
    import jax.numpy as jnp
    x = x_ref[...]
    acc = jnp.zeros_like(x)
    for i in range(REPS):
        acc = acc + ((x + i) * (x - i)) >> 3
    o_ref[...] = acc


def _kernel_f32(x_ref, o_ref):
    import jax.numpy as jnp
    x = x_ref[...].astype(jnp.float32)
    acc = jnp.zeros_like(x)
    for i in range(REPS):
        acc = acc + jnp.floor((x + i) * (x - i) * 0.125)
    o_ref[...] = acc.astype(jnp.int32)


def _kernel_sel(x_ref, o_ref):
    import jax.numpy as jnp
    x = x_ref[...]
    acc = jnp.zeros_like(x)
    for i in range(REPS):
        acc = jnp.where((x & 1) == (i & 1), acc + x, acc - x)
    o_ref[...] = acc


def run(kern, px, name):
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
            out_shape=jax.ShapeDtypeStruct((16, nb), jnp.int32),
        )(p + (s * 1e-30).astype(jnp.int32))
        return jnp.sum(out, dtype=jnp.int32).astype(jnp.float32)

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
    ops = 16 * nb * REPS
    print(f"{name}: {dt*1e3:7.3f} ms  {ops/dt/1e9:8.1f} Gop/s", flush=True)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(0, 256, (16, 1 << 18)).astype(np.int32))
    run(_kernel_i32, px, "i32 mul ")
    run(_kernel_f32, px, "f32 mul ")
    run(_kernel_sel, px, "sel     ")
