"""Per-mode cost split inside the single-dispatch BC7 mega kernel.

Times bc7_encode_pallas over growing mode subsets at 2K scale; successive
differences give each mode family's share of the dispatch. Each subset is
its own compile (minutes, cached in .jax_cache) — run once per kernel
change, read the split, aim effort at the biggest slice.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_bc7 import _enable_compile_cache, chain_time  # noqa: E402


if __name__ == "__main__":
    _enable_compile_cache()
    import jax.numpy as jnp

    from directxtex_tpu.bc.pallas_kernels import bc7_encode_pallas

    NB = (2048 // 4) ** 2
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (16, 4, NB), dtype=np.int64).astype(np.int32)
    px_i = jnp.asarray(px)
    texels = NB * 16 / 1e6

    subsets = [(6,), (5, 6), (5, 6, 4), (1, 6), (1, 3, 6),
               (1, 3, 5, 6, 4)]
    prev = {}
    for modes in subsets:
        def s(p, m=modes):
            err, w = bc7_encode_pallas(p, m)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"modes {str(modes):18s} {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)
        prev[modes] = t
    # derived per-family costs
    d = {
        "mode6": prev[(6,)],
        "mode5": prev[(5, 6)] - prev[(6,)],
        "mode4": prev[(5, 6, 4)] - prev[(5, 6)],
        "mode1(+topk)": prev[(1, 6)] - prev[(6,)],
        "mode3": prev[(1, 3, 6)] - prev[(1, 6)],
    }
    for k, v in d.items():
        print(f"{k:14s} {v*1e3:8.2f} ms", flush=True)
