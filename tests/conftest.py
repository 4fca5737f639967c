"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding paths are exercised
without TPU hardware (SURVEY.md §4).

NOTE: this container boots an `axon` TPU-tunnel PJRT plugin from
sitecustomize.py and pins jax_platforms to it (remote compiles take minutes).
Plain env vars are overridden by that registration, so we must update the jax
config *after* import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
