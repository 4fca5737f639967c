"""Decode throughput at 2K scale for every BC codec (device time).

Random words decoded through the public decode entry points (the BC7/BC6H
paths dispatch the pallas decode mega-kernels on TPU). Chained dispatches
with one final fetch, minus one measured RTT (run_all.py:_timeit model).
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


if __name__ == "__main__":
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from directxtex_tpu.bc import bc123, bc45, bc67

    NB = (2048 // 4) ** 2
    texels = NB * 16 / 1e6
    rng = np.random.default_rng(0)

    cases = [
        ("bc1", 8, bc123.decode_bc1),
        ("bc2", 16, bc123.decode_bc2),
        ("bc3", 16, bc123.decode_bc3),
        ("bc4", 8, bc45.decode_bc4u),
        ("bc5", 16, bc45.decode_bc5u),
        ("bc6h", 16, lambda w: bc67.decode_bc6h(w, signed=False)),
        ("bc7", 16, bc67.decode_bc7),
    ]
    for name, nbytes, fn in cases:
        words = jnp.asarray(
            rng.integers(0, 256, (NB, nbytes), dtype=np.int64)
            .astype(np.uint8))

        @jax.jit
        def chained(s, f=fn, w=words):
            return jnp.sum(f(w)).astype(jnp.float32) * 1e-30 + s

        s = jnp.float32(0.0)
        float(chained(s))                    # compile + warmup
        trivial = jax.jit(lambda v: v + 1.0)
        float(trivial(s))
        t0 = time.perf_counter()
        float(trivial(s))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            s = chained(s)
        float(s)
        t = max(time.perf_counter() - t0 - rtt, 1e-9) / n
        print(f"{name:5s} decode {t*1e3:7.2f} ms  "
              f"{texels/t/1e3:6.2f} Gtexels/s", flush=True)
