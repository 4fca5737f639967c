"""Cost of the LADDER_MOMENT refine dispatch vs exact LIGHT at 2K, plus
the full default pipeline (search + scoped refine) both ways, plus the
maxq tiers' end-to-end throughput (VERDICT r3 #4: record maxq as a
first-class number).

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

    for lname, ladder in (("light", bc67.LADDER_LIGHT),
                          ("moment", bc67.LADDER_MOMENT)):
        def s(p, ladder=ladder):
            w = bc7_refine_pallas(p, base_words, ladder, modes=rmodes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(s, px_i)
        print(f"refine[no-6] ladder={lname:7s} {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)

    for lname, ladder in (("light", bc67.LADDER_LIGHT),
                          ("moment", bc67.LADDER_MOMENT)):
        def e2e(p, ladder=ladder):
            _, w = bc7_encode_pallas(p, modes)
            w = bc7_refine_pallas(p, w, ladder, modes=rmodes)
            return jnp.sum(w).astype(jnp.float32)

        t = chain_time(e2e, px_i)
        print(f"default e2e ladder={lname:7s}  {t*1e3:8.2f} ms "
              f"{texels/t:8.1f} Mtex/s", flush=True)

    # maxq end-to-end (VERDICT r3 #4): full search scope + the SHIPPING
    # maxq ladder sequence (MOMENT then FULL, bc67.encode_bc7's ladders;
    # the earlier 31.71 ms figure here measured the retired FULL x2)
    def maxq(p):
        _, w = bc7_encode_pallas(p, modes, m4_ims=(0, 1))
        for ladder in (bc67.LADDER_MOMENT, bc67.LADDER_FULL):
            w = bc7_refine_pallas(p, w, ladder, modes=modes)
        return jnp.sum(w).astype(jnp.float32)

    t = chain_time(maxq, px_i)
    print(f"bc7 maxq e2e                 {t*1e3:8.2f} ms "
          f"{texels/t:8.1f} Mtex/s", flush=True)

    # BC6H maxq end-to-end (same VERDICT item)
    from directxtex_tpu.bc.pallas_kernels import (bc6h_encode_pallas,
                                                  bc6h_refine_pallas)
    px6 = rng.integers(0, 0x7BFF, (16, 3, NB),
                       dtype=np.int64).astype(np.int32)
    px6_i = jnp.asarray(px6)

    def bc6h_maxq(p):
        _, w = bc6h_encode_pallas(p, False)
        w = bc6h_refine_pallas(p, w, bc67.BC6H_LADDER_MAXQ, False,
                               remap=True, cross2=True)
        return jnp.sum(w).astype(jnp.float32)

    def chain6(fn):
        import time
        @jax.jit
        def chained(p, s):
            return fn(p + (s * 1e-30).astype(jnp.int32))
        s = jnp.float32(0.0)
        float(chained(px6_i, s))
        trivial = jax.jit(lambda v: v + 1.0)
        float(trivial(s))
        t0 = time.perf_counter()
        float(trivial(s))
        rtt = time.perf_counter() - t0
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(20):
            s = chained(px6_i, s)
        float(s)
        return max(time.perf_counter() - t0 - rtt, 1e-9) / 20

    t = chain6(bc6h_maxq)
    print(f"bc6h maxq e2e                {t*1e3:8.2f} ms "
          f"{texels/t:8.1f} Mtex/s", flush=True)

    def bc6h_default(p):
        _, w = bc6h_encode_pallas(p, False)
        return jnp.sum(w).astype(jnp.float32)

    t = chain6(bc6h_default)
    print(f"bc6h default e2e             {t*1e3:8.2f} ms "
          f"{texels/t:8.1f} Mtex/s", flush=True)
