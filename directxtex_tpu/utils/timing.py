"""Timing and profiling helpers (SURVEY.md §5).

The reference exposes only texconv's -timing wall clock; the TPU build adds a
`timed` context that blocks on device completion for honest numbers, and
`profile_trace` wrapping the JAX profiler (XPlane traces viewable in
TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def timed(label: str = "", sync: bool = True, log=print):
    """Wall-clock a block; blocks on all device work when sync=True."""
    t0 = time.perf_counter()
    result = {}
    try:
        yield result
    finally:
        if sync:
            try:
                import jax
                jax.block_until_ready(
                    jax.device_put(0.0))  # barrier on the default device
            except Exception:
                pass
        dt = time.perf_counter() - t0
        result["seconds"] = dt
        if label:
            log(f"[timing] {label}: {dt:.4f}s")


@contextlib.contextmanager
def profile_trace(logdir: str):
    """JAX profiler trace (XPlane) around a block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
