"""Per-kernel timing for the BC7 encode path on the real chip.

Times each pallas mega-kernel separately at 2K-image scale (NB=262144
blocks) so optimization effort goes where the milliseconds are.

Device-time measurement on the axon tunnel: block_until_ready() returns
before remote execution finishes and host fetches pay a ~27ms round trip,
so each timing chains n dependent dispatches through a scalar checksum and
fetches once (same approach as bench.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def chain_time(make_step, px, n=20):
    """make_step(px_i) -> scalar f32; px [16, 4, NB] i32 base input."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(p, s):
        return make_step(p + (s * 1e-30).astype(jnp.int32))

    s = jnp.float32(0.0)
    float(chained(px, s))  # compile + warmup

    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(s))
    t0 = time.perf_counter()
    float(trivial(s))
    rtt = time.perf_counter() - t0

    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(n):
        s = chained(px, s)
    float(s)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


if __name__ == "__main__":
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp

    from directxtex_tpu.bc import bc67
    from directxtex_tpu.bc.pallas_kernels import (
        partition_mode_pallas, partition_shapes_pallas, single_modes_pallas)

    NB = (2048 // 4) ** 2
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (16, 4, NB), dtype=np.int64).astype(np.int32)
    px_i = jnp.asarray(px)
    texels = NB * 16 / 1e6

    def report(name, t):
        print(f"{name:18s} {t*1e3:8.2f} ms  {texels/t:8.1f} Mtex/s",
              flush=True)

    def s_shapes(p):
        sb = partition_shapes_pallas(p, 1, 64, 4, 4)
        return jnp.sum(sb).astype(jnp.float32)

    report("shapes(1,64,k=4)", chain_time(s_shapes, px_i))

    for mode in (1, 3, 7):
        def s_mode(p, m=mode):
            sb = partition_shapes_pallas(p, 1, 64, 4, 4)
            err, w = partition_mode_pallas(p, sb, m, 64)
            return jnp.sum(w).astype(jnp.float32)
        report(f"shapes+mode {mode}", chain_time(s_mode, px_i))

    def s_single(p):
        outs = single_modes_pallas(p)
        return sum(jnp.sum(w).astype(jnp.float32)
                   for _, w in outs.values())

    report("modes 4/5/6", chain_time(s_single, px_i))

    def s_total(p):
        blocks = jnp.transpose(p, (2, 0, 1)).astype(jnp.float32) / 255.0
        out = bc67.encode_bc7(blocks)
        return jnp.sum(out, dtype=jnp.uint32).astype(jnp.float32)

    report("encode_bc7 total", chain_time(s_total, px_i, n=10))


def profile_single_dispatch():
    import jax
    import jax.numpy as jnp
    from directxtex_tpu.bc.pallas_kernels import bc7_encode_pallas

    NB = (2048 // 4) ** 2
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (16, 4, NB), dtype=np.int64).astype(np.int32)
    px_i = jnp.asarray(px)
    texels = NB * 16 / 1e6

    for name, modes in (("1dispatch opaque", (1, 3, 5, 6, 4)),
                        ("1dispatch alpha", (1, 3, 5, 6, 7, 4))):
        def s(p, m=modes):
            err, w = bc7_encode_pallas(p, m)
            return jnp.sum(w).astype(jnp.float32)
        t = chain_time(s, px_i)
        print(f"{name:18s} {t*1e3:8.2f} ms  {texels/t:8.1f} Mtex/s",
              flush=True)
