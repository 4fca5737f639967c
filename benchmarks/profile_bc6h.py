"""Per-row-group cost split inside the single-dispatch BC6H mega kernel
(the BC7 treatment, VERDICT r2 #3).

Times bc6h_encode_pallas over growing row subsets at 2K scale; successive
differences give each precision group's share of the dispatch. Groups
(rows sharing (precW, iprec), one shared subset evaluation each):
r1 = 1-region rows 10-13, then 2-region [0], [1], [2,3,4], [5], [6,7,8],
[9]. Each subset is its own compile (minutes, cached in .jax_cache).
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

    from directxtex_tpu.bc.bc67 import _f16_to_int
    from directxtex_tpu.bc.pallas_kernels import bc6h_encode_pallas

    NB = (2048 // 4) ** 2
    rng = np.random.default_rng(0)
    rgb = (rng.random((16, 3, NB)).astype(np.float32) * 8.0)
    px_int = _f16_to_int(jnp.asarray(rgb), False)
    texels = NB * 16 / 1e6

    subsets = [("r1",), ("r1", 0), ("r1", 0, 1), ("r1", 0, 1, 2, 3, 4),
               ("r1", 0, 1, 2, 3, 4, 5), ("r1", 0, 1, 2, 3, 4, 5, 6, 7, 8),
               None]
    prev = {}
    for sel in subsets:
        def s(p, sel=sel):
            err, w = bc6h_encode_pallas(p, False, rows_sel=sel)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_int)
        name = "all" if sel is None else str(sel)
        print(f"rows {name:36s} {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)
        prev[sel] = t
    d = {
        "1-region (4 rows)": prev[("r1",)],
        "group [0] (+topk)": prev[("r1", 0)] - prev[("r1",)],
        "group [1]": prev[("r1", 0, 1)] - prev[("r1", 0)],
        "group [2,3,4]": prev[("r1", 0, 1, 2, 3, 4)] - prev[("r1", 0, 1)],
        "group [5]": prev[("r1", 0, 1, 2, 3, 4, 5)]
        - prev[("r1", 0, 1, 2, 3, 4)],
        "group [6,7,8]": prev[("r1", 0, 1, 2, 3, 4, 5, 6, 7, 8)]
        - prev[("r1", 0, 1, 2, 3, 4, 5)],
        "group [9]": prev[None]
        - prev[("r1", 0, 1, 2, 3, 4, 5, 6, 7, 8)],
    }
    for k, v in d.items():
        print(f"{k:20s} {v*1e3:8.2f} ms", flush=True)
