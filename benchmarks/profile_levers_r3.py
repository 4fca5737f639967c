"""Attribute the r3 BC7 quality-lever cost at 2K scale on the real chip.

Configs (each its own multi-minute compile, cached in .jax_cache):
  base          -> search mega kernel alone (off-axis ranking included)
  refine x1     -> the r3 default tier (base + one winner-refine dispatch)
  refine x2     -> the BC_FLAGS_MAX_QUALITY tier
Historical context (r3 session measurements, same scale):
  r2 kernel (variance proxy, no ladder)       375 Mt/s
  off-axis ranking only                       304 Mt/s   (-19%)
  in-search light ladder (per candidate)      117 Mt/s   (rejected)
  in-search full ladder                        50 Mt/s   (rejected)
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
    for name, iters in (("base", 0), ("refine-x1", 1), ("refine-x2", 2)):
        def s(p, iters=iters):
            err, w = bc7_encode_pallas(p, modes)
            for _ in range(iters):
                w = bc7_refine_pallas(p, w, bc67.LADDER_FULL, modes=modes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"{name:10s} {t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s",
              flush=True)
