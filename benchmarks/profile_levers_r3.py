"""Attribute the r3 BC7 quality-lever cost: off-axis shape ranking and
the in-kernel perturbation ladder each get a timed config at 2K scale.

Configs (each its own multi-minute compile, cached in .jax_cache):
  ladder=None        -> off-axis ranking only (r2 kernel + off-axis)
  ladder=LIGHT       -> the r3 default tier
  ladder=FULL        -> the BC_FLAGS_MAX_QUALITY tier
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
    from directxtex_tpu.bc.pallas_kernels import bc7_encode_pallas

    NB = (2048 // 4) ** 2
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (16, 4, NB), dtype=np.int64).astype(np.int32)
    px[:, 3, :] = 255  # opaque headline content
    px_i = jnp.asarray(px)
    texels = NB * 16 / 1e6

    modes = (1, 3, 5, 6, 4)
    for name, ladder in (("no-ladder", None),
                         ("light", bc67.LADDER_LIGHT),
                         ("full", bc67.LADDER_FULL)):
        def s(p, ld=ladder):
            err, w = bc7_encode_pallas(p, modes, ladder=ld)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"ladder={name:10s} {t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s",
              flush=True)
