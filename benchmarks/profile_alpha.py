"""Alpha-path (non-opaque BC7) lever check, VERDICT r2 #10.

r2 recorded 312 Mt/s for non-opaque content vs 375 opaque (-17%) with no
analysis. The r3 default tier changes both sides (off-axis ranking,
im0 cut, winner-ladder), so this re-measures the cliff and splits it
into its two ingredients at 2K:

  opaque      modes (1,3,5,6,4)   + LIGHT ladder
  +mode7      modes (1,3,5,6,7,4) + LIGHT ladder, alpha=255 content
              (mode-7 eval runs, its errors inf-masked in-kernel)
  alpha       modes (1,3,5,6,7,4) + LIGHT ladder, real varying alpha

The mode-7 row isolates "evaluating one more 2-subset mode family";
the alpha row adds the 4th-channel scoring everywhere else.
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
    px_op = px.copy()
    px_op[:, 3, :] = 255
    texels = NB * 16 / 1e6

    cases = (("opaque", (1, 3, 5, 6, 4), px_op),
             ("+mode7 (opaque content)", (1, 3, 5, 6, 7, 4), px_op),
             ("alpha", (1, 3, 5, 6, 7, 4), px))
    for name, modes, data in cases:
        px_i = jnp.asarray(data)

        def s(p, modes=modes):
            err, w = bc7_encode_pallas(p, modes, bc67.BC7_SHAPE_CANDIDATES,
                                       m4_ims=bc67._MODE4_IMS)
            w = bc7_refine_pallas(p, w, bc67.LADDER_LIGHT, modes=modes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"{name:26s} {t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s",
              flush=True)
