"""Cost of the BC7 winner-refine dispatch (bc7_refine_pallas) alone at 2K
scale: ladder strength x lane tile. The refine kernel's VMEM working set
is far smaller than the search mega kernel's (one candidate, no shape
tables), so its optimal tile may differ from _BC7_ALL_TILE=256.

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

    modes = (1, 3, 5, 6, 4)
    import jax
    _, base_words = jax.jit(
        lambda p: bc7_encode_pallas(p, modes))(px_i)
    base_words.block_until_ready()

    # ladder=(0,()) runs unpack + initial scoring + re-assign + emit with
    # zero perturbation steps: its time is the refine dispatch's fixed
    # overhead; light/full minus it is the ladder cost proper.
    for lname, ladder in (("null", (0, ())),
                          ("full", bc67.LADDER_FULL),
                          ("light", bc67.LADDER_LIGHT)):
        for tile in ((256,) if lname == "null" else (256, 512, 1024)):
            def s(p, ladder=ladder, tile=tile):
                w = bc7_refine_pallas(p, base_words, ladder, modes=modes,
                                      tile=tile)
                return jnp.sum(w).astype(jnp.float32)

            t = chain_time(s, px_i)
            print(f"refine ladder={lname:6s} tile={tile:5d} "
                  f"{t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s", flush=True)
