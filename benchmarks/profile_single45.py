"""Time just the modes-4/5/6 kernel (A/B harness for mode45 tweaks)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from directxtex_tpu.bc.pallas_kernels import single_modes_pallas

    NB = (2048 // 4) ** 2
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (16, 4, NB), dtype=np.int64).astype(np.int32)
    px_i = jnp.asarray(px)
    texels = NB * 16 / 1e6

    @jax.jit
    def chained(p, s):
        outs = single_modes_pallas(p + (s * 1e-30).astype(jnp.int32))
        return sum(jnp.sum(w).astype(jnp.float32) for _, w in outs.values())

    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    float(chained(px_i, s))
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    trivial = jax.jit(lambda v: v + 1.0)
    float(trivial(s))
    t0 = time.perf_counter()
    float(trivial(s))
    rtt = time.perf_counter() - t0
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        s = chained(px_i, s)
    float(s)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n
    print(f"modes 4/5/6: {dt*1e3:.2f} ms  {texels/dt:.1f} Mtex/s")


if __name__ == "__main__":
    main()
