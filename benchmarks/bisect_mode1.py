"""Bisect where time goes inside the BC7 partition-mode mega-kernel:
shape decode, subset evaluation, anchor swaps, emit (bit packing).
Builds stripped kernel variants from the production helpers and times each
on the chip."""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = 1
N_CAND = 4
N_SHAPES = 64


def make_variant(stage: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from directxtex_tpu.bc import pallas_kernels as pk

    def kern(px_ref, sb_ref, err_ref, w_ref):
        parts = pk._BC7_FULL_STATICS[MODE][0]
        iprec = pk._BC7_FULL_STATICS[MODE][5]
        n_sub = parts + 1
        msb, maxi = 1 << (iprec - 1), (1 << iprec) - 1
        pp_tab, pa_tab = pk._packed_tables(parts, N_SHAPES)
        xs = [px_ref[c * 16:(c + 1) * 16, :] for c in range(4)]
        xf = [x.astype(jnp.float32) for x in xs]

        acc_e = jnp.zeros_like(xf[0][0])
        acc_w = jnp.zeros((4, xf[0].shape[1]), jnp.uint32)
        for cand in range(N_CAND):
            s_blk = sb_ref[cand, :]
            pp = jnp.zeros_like(s_blk, dtype=jnp.uint32)
            pa = jnp.zeros_like(s_blk)
            for s in range(N_SHAPES):
                hit = s_blk == s
                pp = jnp.where(hit, jnp.uint32(pp_tab[s]), pp)
                pa = jnp.where(hit, pa_tab[s], pa)
            pm = jnp.stack([((pp >> (2 * i)) & 3).astype(jnp.int32)
                            for i in range(16)])
            if stage == "decode":
                acc_e = acc_e + jnp.sum(pm.astype(jnp.float32), axis=0) \
                    + pa.astype(jnp.float32)
                continue
            q0s, q1s, p0s, p1s, idx_full, errs = pk._k_eval_subsets(
                xs, xf, [pm == p for p in range(n_sub)], MODE)
            total_err = sum(errs)
            if stage == "eval":
                acc_e = acc_e + total_err + jnp.sum(
                    idx_full.astype(jnp.float32), axis=0) \
                    + sum(q0s[p][c].astype(jnp.float32)
                          for p in range(n_sub) for c in range(4))
                continue
            anch = [None, pa & 0xF][:n_sub + 1]
            for p in range(n_sub):
                if p == 0:
                    a_idx = idx_full[0]
                else:
                    a_idx = pk._k_anchor_index(idx_full, anch[p])
                swap = (a_idx & msb) != 0
                sw16 = swap[None, :]
                q0s[p], q1s[p] = (
                    [jnp.where(swap, q1s[p][c], q0s[p][c]) for c in range(4)],
                    [jnp.where(swap, q0s[p][c], q1s[p][c]) for c in range(4)])
                p0s[p], p1s[p] = (jnp.where(swap, p1s[p], p0s[p]),
                                  jnp.where(swap, p0s[p], p1s[p]))
                idx_full = jnp.where(sw16 & (pm == p), maxi - idx_full,
                                     idx_full)
            if stage == "swap":
                acc_e = acc_e + total_err + jnp.sum(
                    idx_full.astype(jnp.float32), axis=0) \
                    + sum(q0s[p][c].astype(jnp.float32)
                          for p in range(n_sub) for c in range(4))
                continue
            words = pk._k_emit(MODE, total_err, s_blk.astype(jnp.uint32),
                               0, 0, q0s, q1s, p0s, p1s, idx_full, None,
                               anch[1], None)
            acc_e = acc_e + total_err
            acc_w = acc_w ^ words
        err_ref[...] = jnp.broadcast_to(acc_e[None, :], err_ref.shape)
        w_ref[...] = acc_w

    TILE = pk._TILE

    @jax.jit
    def run(px_cm, sb, s):
        nbp = px_cm.shape[1]
        err8, words = pl.pallas_call(
            kern,
            grid=(nbp // TILE,),
            in_specs=[pl.BlockSpec((64, TILE), lambda i: (0, i)),
                      pl.BlockSpec((N_CAND, TILE), lambda i: (0, i))],
            out_specs=[pl.BlockSpec((8, TILE), lambda i: (0, i)),
                       pl.BlockSpec((4, TILE), lambda i: (0, i))],
            out_shape=[jax.ShapeDtypeStruct((8, nbp), jnp.float32),
                       jax.ShapeDtypeStruct((4, nbp), jnp.uint32)],
        )(px_cm + (s * 1e-30).astype(jnp.int32), sb)
        return (jnp.sum(err8[0]) + jnp.sum(words).astype(jnp.float32))

    return run


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    NB = (2048 // 4) ** 2
    rng = np.random.default_rng(0)
    px_cm = jnp.asarray(
        rng.integers(0, 256, (64, NB), dtype=np.int64).astype(np.int32))
    sb = jnp.asarray(
        rng.integers(0, N_SHAPES, (N_CAND, NB)).astype(np.int32))
    texels = NB * 16 / 1e6

    trivial = jax.jit(lambda v: v + 1.0)

    for stage in ("decode", "eval", "swap", "full"):
        run = make_variant(stage)
        s = jnp.float32(0.0)
        float(run(px_cm, sb, s))
        float(trivial(s))
        t0 = time.perf_counter()
        float(trivial(s))
        rtt = time.perf_counter() - t0
        n = 20
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = run(px_cm, sb, s)
        float(s)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n
        print(f"{stage:7s} {dt*1e3:7.2f} ms  {texels/dt:8.1f} Mtex/s",
              flush=True)
