"""TPU throughput of the BC6H shared-fit mega kernel (r3): one
precision-free fit trajectory per (shape candidate, region family) +
per-group quantize/rescore (+ one refit round below
BC6H_GROUP_REFIT_MINPREC bits), vs the r2 per-group full evaluation
(28.63 ms / 146.5 Mt/s at 2K, benchmarks/profile_bc6h.py).

Fresh multi-minute compile on first run, cached in .jax_cache.
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

    for tile in (256, 512):
        def s(p, tile=tile):
            err, w = bc6h_encode_pallas(p, False, tile=tile)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_int)
        print(f"bc6h shared-fit tile={tile:4d} {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)
