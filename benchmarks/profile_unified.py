"""Unified 2-subset refine (r4, _k_refine_2sub) vs the per-mode passes:
the modes-1/3/7 families differ only in field precision, so one pass
with per-lane precision rows should cut their tripled [16, T] plane
work. Both paths are bit-identical (tests/test_pallas.py); this
measures the cost at 2K on the real chip.

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

    _, base_words = jax.jit(lambda p: bc7_encode_pallas(p, modes))(px_i)
    base_words.block_until_ready()

    for uni in (False, True):
        def s(p, uni=uni):
            w = bc7_refine_pallas(p, base_words, bc67.LADDER_MOMENT,
                                  modes=rmodes, unified=uni)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"refine[no-6] moment unified={uni!s:5s} {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)

    # tile sweep for the unified refine: merged passes change VMEM
    # pressure, so the 256 optimum may move
    for tile in (128, 512):
        def st(p, tile=tile):
            w = bc7_refine_pallas(p, base_words, bc67.LADDER_MOMENT,
                                  modes=rmodes, unified=True, tile=tile)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(st, px_i)
        print(f"refine[no-6] moment uni tile={tile:4d} {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)

    for uni in (False, True):
        def e2e(p, uni=uni):
            _, w = bc7_encode_pallas(p, modes)
            w = bc7_refine_pallas(p, w, bc67.LADDER_MOMENT, modes=rmodes,
                                  unified=uni)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(e2e, px_i)
        print(f"default e2e moment unified={uni!s:5s}  {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)

    # maxq: one MOMENT dispatch then one FULL dispatch (the shipping
    # sequence), full-search scope (m4_ims both) but the OPAQUE mode
    # set — this is the config behind BASELINE.md's maxq headline. The
    # unified pass also serves the exact perturb ladder
    # (_k_perturb_subset_dyn).
    for uni in (False, True):
        def maxq(p, uni=uni):
            _, w = bc7_encode_pallas(p, modes, m4_ims=(0, 1))
            w = bc7_refine_pallas(p, w, bc67.LADDER_MOMENT, modes=modes,
                                  unified=uni)
            w = bc7_refine_pallas(p, w, bc67.LADDER_FULL, modes=modes,
                                  unified=uni)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(maxq, px_i)
        print(f"bc7 maxq e2e unified={uni!s:5s}        {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)
