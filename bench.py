"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "Mtexels/s", "vs_baseline": N}

Headline metric (BASELINE.md): BC encode throughput at 2K on one chip.
Uses BC7 once available; currently BC1 (round-1 slice). vs_baseline is the
fraction of the 500 Mtexels/s/chip BC7 north-star target (the reference
publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np



def _enable_compile_cache():
    """The axon TPU tunnel remote-compiles (~9 min for the BC1 graph); the
    persistent cache makes reruns instant."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

def _refresh_verify_artifact(max_age_hours: float = 12.0) -> dict:
    """Regenerate VERIFY_TPU.json (Mosaic-compiled kernel equivalence on
    the real chip, benchmarks/verify_tpu.py) whenever the recorded artifact
    is stale, so every bench/round run leaves a fresh-dated artifact
    instead of relying on a manual step. Returns {"ok":..., "date":...}
    summarizing the (possibly pre-existing) artifact."""
    import datetime
    import os
    import subprocess

    path = "/root/repo/VERIFY_TPU.json"
    now = datetime.datetime.now(datetime.timezone.utc)
    try:
        with open(path) as f:
            cur = json.load(f)
        stamp = datetime.datetime.fromisoformat(cur["date"])
        age = now - stamp
        # Stale if older than max_age_hours OR older than any codec
        # source (a kernel edit after the last verify run must re-verify).
        src_dir = "/root/repo/directxtex_tpu/bc"
        src_mtime = max(os.path.getmtime(os.path.join(src_dir, f))
                        for f in os.listdir(src_dir) if f.endswith(".py"))
        fresh = (cur.get("ok")
                 and age.total_seconds() < max_age_hours * 3600
                 and stamp.timestamp() >= src_mtime)
        if fresh:
            return {"ok": cur["ok"], "date": cur["date"]}
    except Exception:
        pass
    print("[bench] VERIFY_TPU.json stale; regenerating...", file=sys.stderr)
    try:
        # 5400s: a cold .jax_cache after a kernel edit needs fresh remote
        # compiles of the BC6H verify variants (~45-70 min total); warm
        # cache runs finish in ~10 min
        subprocess.run([sys.executable, "benchmarks/verify_tpu.py"],
                       cwd="/root/repo", env=dict(os.environ),
                       stdout=sys.stderr, stderr=sys.stderr, timeout=5400)
        with open(path) as f:
            cur = json.load(f)
        return {"ok": cur["ok"], "date": cur["date"]}
    except Exception as e:
        return {"ok": False, "date": None,
                "error": f"{type(e).__name__}: {str(e)[:200]}"}


def main():
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp

    from directxtex_tpu.bc import bc123, bc67
    from directxtex_tpu.bc.common import image_to_blocks

    try:
        bc67.encode_bc7(jnp.zeros((1, 16, 4), jnp.float32))
        codec = "bc7"
    except NotImplementedError:
        codec = "bc1"
    except Exception:
        codec = "bc7"

    size = 2048
    rng = np.random.default_rng(0)
    # realistic content: smooth gradients + structure, not pure noise
    x = np.linspace(0, 1, size, dtype=np.float32)
    gx, gy = np.meshgrid(x, x)
    img = np.stack([
        gx, (gx * gy), np.abs(np.sin(gx * 37) * 0.5 + 0.3),
        np.ones_like(gx)], axis=-1).astype(np.float32)
    img += (rng.random(img.shape).astype(np.float32) - 0.5) * 0.05
    img = np.clip(img, 0, 1)
    img[..., 3] = 1.0  # albedo bench content is fully opaque

    # the bench image is fully opaque; the compress() driver derives the
    # same hint from IsAlphaAllOpaque before dispatch
    opaque = bool(np.all(img[..., 3] >= 1.0))

    x_dev = jnp.asarray(img)

    def step(im):
        blocks, _, _ = image_to_blocks(im)
        if codec == "bc7":
            return bc67.encode_bc7(blocks, opaque=opaque)
        return bc123.encode_bc1(blocks, 0.5, 0)

    # Device-time measurement on the axon tunnel: block_until_ready() returns
    # before remote execution finishes, and every host fetch pays a ~27ms
    # network round trip. So we chain n_iter dependent dispatches (each step's
    # checksum feeds the next step's input) and fetch once, then subtract one
    # measured round trip. The image is captured, not passed per call: the
    # tunnel marshals jit arguments per dispatch (~7ms for a 67MB array),
    # which would measure the harness, not the chip — real pipelines keep
    # images device-resident (SURVEY.md §7 architecture stance).
    @jax.jit
    def chained(s):
        out = step(x_dev + s * 1e-30)
        return jnp.sum(out, dtype=jnp.uint32).astype(jnp.float32)

    float(chained(jnp.float32(0.0)))  # warmup / compile

    trivial = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0.0)
    float(trivial(s))
    t0 = time.perf_counter()
    float(trivial(s))
    rtt = time.perf_counter() - t0

    # best-of-3 chains: the tunnel adds run-to-run jitter (~±2%) on top of
    # device time; the minimum is the repeatable sustained-throughput figure
    n_iter = 20
    dt = float("inf")
    for _ in range(3):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            s = chained(s)
        float(s)
        dt = min(dt, max(time.perf_counter() - t0 - rtt, 1e-9) / n_iter)

    mtexels = size * size / dt / 1e6
    result = {
        "metric": f"{codec}_encode_2k_mtexels_per_sec_per_chip",
        "value": round(mtexels, 2),
        "unit": "Mtexels/s",
        "vs_baseline": round(mtexels / 500.0, 4),
        "verify_tpu": _refresh_verify_artifact(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    last = None
    for attempt in range(3):
        try:
            main()
            sys.exit(0)
        except Exception as e:  # the axon tunnel occasionally drops a
            # remote-compile response mid-read; a retry hits the
            # persistent cache and succeeds
            last = e
            print(f"[bench] attempt {attempt + 1} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            time.sleep(20)
    # tunnel down / backend init failure: emit a parseable diagnostic
    # line instead of a traceback
    print(json.dumps({
        "metric": "bc7_encode_2k_mtexels_per_sec_per_chip",
        "value": 0.0, "unit": "Mtexels/s", "vs_baseline": 0.0,
        "error": f"{type(last).__name__}: {str(last)[:300]}",
    }))
    sys.exit(1)
