"""Run every real-TPU equivalence check and record VERIFY_TPU.json.

The interpret-mode equivalence tests in tests/test_pallas.py validate the
kernel *algorithms* on CPU; this runner validates the Mosaic-*compiled*
kernels on the actual chip (a Mosaic-vs-interpret divergence would
otherwise ship silently) and leaves a reviewable artifact:

    python benchmarks/verify_tpu.py          # writes /root/repo/VERIFY_TPU.json

Each check runs in its own subprocess so a reference build (CPU) and the
TPU verify step never share one JAX runtime, per the CLAUDE.md env rules.
"""

from __future__ import annotations

import datetime
import json
import subprocess
import sys

STEPS = [
    # (name, argv, env overrides)
    ("bc7_make_ref", [sys.executable, "benchmarks/verify_bc7_tpu.py",
                      "--make-ref"],
     {"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu"}),
    ("bc7_tpu", [sys.executable, "benchmarks/verify_bc7_tpu.py"], {}),
    ("bc6h_make_ref", [sys.executable, "benchmarks/verify_bc6h_tpu.py",
                       "--make-ref"],
     {"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu"}),
    ("bc6h_tpu", [sys.executable, "benchmarks/verify_bc6h_tpu.py"], {}),
]


def main() -> int:
    import os
    results = {}
    ok = True
    for name, argv, env_over in STEPS:
        # inherited PYTHONPATH (/root/.axon_site) is what registers the
        # axon TPU plugin — only the CPU steps override it (which also
        # deliberately de-registers axon, per the CLAUDE.md recipe)
        env = dict(os.environ)
        env.update(env_over)
        proc = subprocess.run(argv, cwd="/root/repo", env=env,
                              capture_output=True, text=True, timeout=7200)
        tail = (proc.stdout.strip().splitlines() or [""])[-6:]
        results[name] = {"rc": proc.returncode, "tail": tail}
        if proc.returncode != 0:
            results[name]["stderr_tail"] = \
                (proc.stderr.strip().splitlines() or [""])[-8:]
        print(f"[{name}] rc={proc.returncode}")
        for line in tail:
            print(f"    {line}")
        if proc.returncode != 0:
            ok = False
    out = {
        "ok": ok,
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "steps": results,
    }
    with open("/root/repo/VERIFY_TPU.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
