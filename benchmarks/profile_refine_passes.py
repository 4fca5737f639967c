"""Per-pass cost decomposition of the unified MOMENT winner-refine (r5).

Times bc7_refine_pallas at 2K with both family passes, the 2-subset
family (modes 1/3) alone, and the rotation family (modes 5/4) alone.
Measured r5: both 2.68 ms, 2-subset 1.51, rotation 1.42 — ~0.25 ms
shared dispatch overhead, ~1.2-1.3 ms marginal per pass over ALL lanes
regardless of each block's winning family. This sizes the next
op-removal lever (merge the two passes via per-lane pixel-mask +
channel-mask group rows; BASELINE.md "next sized op-removal lever").
Usage: python benchmarks/profile_refine_passes.py  (TPU)
"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/benchmarks")
from profile_bc7 import _enable_compile_cache, chain_time
_enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from directxtex_tpu.bc import bc67
from directxtex_tpu.bc.pallas_kernels import bc7_encode_pallas, bc7_refine_pallas

NB = (2048 // 4) ** 2
rng = np.random.default_rng(0)
px = rng.integers(0, 256, (16, 4, NB), dtype=np.int64).astype(np.int32)
px[:, 3, :] = 255
px_i = jnp.asarray(px)
_, w0 = jax.jit(lambda p: bc7_encode_pallas(p, (1, 3, 5, 6, 4), m4_ims=(0,)))(px_i)
w0 = jax.block_until_ready(w0)

for name, rmodes in (("both (shipping)", (1, 3, 5, 4)),
                     ("2-subset only  ", (1, 3)),
                     ("rotation only  ", (5, 4))):
    def f(p, rm=rmodes):
        w = bc7_refine_pallas(p, w0, bc67.LADDER_MOMENT, modes=rm)
        return jnp.sum(w).astype(jnp.float32)
    t = chain_time(f, px_i)
    print(f"refine {name} {t*1e3:8.2f} ms", flush=True)
