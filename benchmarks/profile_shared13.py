"""r5 shared-fit trajectory for BC7 modes 1/3 (BC7_SHARED2SUB) vs the
independent per-mode evaluation: search-dispatch and e2e cost at 2K on
the real chip. Quality measured in quality_shared13.py (shared r1 k8:
min corpus slack +0.059 dB, still beats the reference everywhere).

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
    import jax
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

    modes = (1, 3, 5, 6, 4)          # default-tier opaque mode set
    rmodes = (1, 3, 5, 4)            # r4 refine scope (no mode 6)

    for sh in (False, True):
        def s(p, sh=sh):
            e, w = bc7_encode_pallas(p, modes, share2sub=sh)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"search shared={sh!s:5s}              {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)

    # tile sweep: the shared trajectory changes VMEM pressure
    for tile in (128, 512):
        def st(p, tile=tile):
            e, w = bc7_encode_pallas(p, modes, share2sub=True, tile=tile)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(st, px_i)
        print(f"search shared tile={tile:4d}          {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)

    for sh in (False, True):
        def e2e(p, sh=sh):
            _, w = bc7_encode_pallas(p, modes, share2sub=sh)
            w = bc7_refine_pallas(p, w, bc67.LADDER_MOMENT, modes=rmodes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(e2e, px_i)
        print(f"default e2e shared={sh!s:5s}          {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)

    # maxq: MOMENT then FULL dispatches, full search scope, opaque modes
    for sh in (False, True):
        def maxq(p, sh=sh):
            _, w = bc7_encode_pallas(p, modes, m4_ims=(0, 1), share2sub=sh)
            w = bc7_refine_pallas(p, w, bc67.LADDER_MOMENT, modes=modes)
            w = bc7_refine_pallas(p, w, bc67.LADDER_FULL, modes=modes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(maxq, px_i)
        print(f"bc7 maxq e2e shared={sh!s:5s}         {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)
