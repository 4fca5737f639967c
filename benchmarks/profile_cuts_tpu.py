"""TPU cost of the BC7 search-scope cuts that survived the quality sweep
(benchmarks/quality_search_cuts.py): shape candidates 4 -> 3 and the
mode-4 index-mode-1 skip. Times the full default tier (search mega
kernel + LIGHT winner-refine) at 2K. Each config is its own multi-minute
compile, cached in .jax_cache.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_bc7 import _enable_compile_cache, chain_time  # noqa: E402


if __name__ == "__main__":
    _enable_compile_cache()
    import jax.numpy as jnp

    from directxtex_tpu.bc import bc67
    from directxtex_tpu.bc.pallas_kernels import (bc7_encode_pallas,
                                                  bc7_refine_pallas)

    NB = (2048 // 4) ** 2
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (16, 4, NB), dtype=np.int64).astype(np.int32)
    px[:, 3, :] = 255  # opaque headline content
    px_i = jnp.asarray(px)
    texels = NB * 16 / 1e6

    modes = (1, 3, 5, 6, 4)
    for name, n_cand, ims in (("c4", 4, (0, 1)),
                              ("c4-im0", 4, (0,)),
                              ("c3", 3, (0, 1)),
                              ("c3-im0", 3, (0,))):
        def s(p, n_cand=n_cand, ims=ims):
            err, w = bc7_encode_pallas(p, modes, n_cand, m4_ims=ims)
            w = bc7_refine_pallas(p, w, bc67.LADDER_LIGHT, modes=modes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"{name:8s} {t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s",
              flush=True)
