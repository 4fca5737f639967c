"""Fused winner-ladder (r4): the LIGHT ladder in the search mega-kernel's
tail vs the r3 two-dispatch path (search + bc7_refine_pallas), at 2K.

The two-dispatch path carries ~2.7 ms/2K of fixed refine-dispatch
overhead (unpack/score/emit with zero ladder steps) plus a second HBM
read of the pixel planes (benchmarks/profile_refine.py). Fusing runs the
same math on the folded winner while the pixels are still in VMEM.

Each config is its own multi-minute compile, cached in .jax_cache.
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

    modes = (1, 3, 5, 6, 4)   # default-tier opaque mode set

    def two_dispatch(p):
        _, w = bc7_encode_pallas(p, modes)
        w = bc7_refine_pallas(p, w, bc67.LADDER_LIGHT, modes=modes)
        return jnp.sum(w).astype(jnp.float32)

    t = chain_time(two_dispatch, px_i)
    print(f"r3 two-dispatch (search + light refine)      "
          f"{t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s", flush=True)

    for tile in (256, 128, 512):
        def fused(p, tile=tile):
            _, w = bc7_encode_pallas(p, modes, tile=tile,
                                     ladder=bc67.LADDER_LIGHT)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(fused, px_i)
        print(f"r4 fused light ladder tile={tile:4d}            "
              f"{t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s", flush=True)
