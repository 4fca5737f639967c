"""Where the LIGHT refine dispatch's milliseconds go, by mode family.

Times bc7_refine_pallas at 2K scale with the refine scoped to mode
subsets (the kernel's cost is the sum over refined families — every
family's unpack/score/ladder/re-assign/emit runs for every lane).

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

    modes = (1, 3, 5, 6, 4)
    _, base_words = jax.jit(
        lambda p: bc7_encode_pallas(p, modes))(px_i)
    base_words.block_until_ready()

    for rmodes in ((1, 3, 5, 6, 4), (1, 3), (5, 4), (6,), (1, 3, 6)):
        def s(p, rmodes=rmodes):
            w = bc7_refine_pallas(p, base_words, bc67.LADDER_LIGHT,
                                  modes=rmodes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"refine modes={str(rmodes):18s} {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)
