"""Alpha-path (non-opaque BC7) cost on the CURRENT kernels (VERDICT r4
#3 — the r4 unified refine folded mode 7 into the 2-subset refine pass
and r5 added the shared-fit search, so the r3 alpha numbers are stale).

Rows at 2K, both tiers:

  default opaque      modes (1,3,5,6,4)   search + MOMENT refine (no-6)
  default +mode7      modes (1,3,5,6,7,4) on alpha=255 content
                      (mode-7 eval runs, errors inf-masked in-kernel)
  default alpha       modes (1,3,5,6,7,4) on real varying alpha
  maxq opaque/alpha   full-scope search + MOMENT + FULL dispatches

The mode-7 row isolates "evaluating one more 2-subset mode family";
the alpha row adds the 4th-channel scoring everywhere else. Note mode 7
does NOT ride the shared 2-subset trajectory (it fits 4 channels at
5555+pbit; modes 1/3 fit RGB — BASELINE.md alpha-cliff note).
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
        rmodes = tuple(m for m in modes if m != 6)

        def s(p, modes=modes, rmodes=rmodes):
            # the default tier exactly as encode_bc7 dispatches it
            err, w = bc7_encode_pallas(p, modes, bc67.BC7_SHAPE_CANDIDATES,
                                       m4_ims=bc67._MODE4_IMS)
            w = bc7_refine_pallas(p, w, bc67.LADDER_MOMENT, modes=rmodes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"default {name:26s} {t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s",
              flush=True)

    for name, modes, data in (cases[0], cases[2]):
        px_i = jnp.asarray(data)

        def mq(p, modes=modes):
            _, w = bc7_encode_pallas(p, modes, bc67.BC7_SHAPE_CANDIDATES,
                                     m4_ims=(0, 1), share2sub=False,
                                     share45=False)
            w = bc7_refine_pallas(p, w, bc67.LADDER_MOMENT, modes=modes)
            w = bc7_refine_pallas(p, w, bc67.LADDER_FULL, modes=modes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(mq, px_i)
        print(f"maxq    {name:26s} {t*1e3:8.2f} ms {texels/t:8.1f} Mtex/s",
              flush=True)
