"""Repo-root conftest: make the package importable and configure JAX for tests.

Tests run on a virtual 8-device CPU mesh (multi-chip shardings are validated
without TPU hardware) with float64 enabled for MATLAB-parity tolerances.

Note: the environment's sitecustomize imports jax at interpreter startup to
register the TPU backend, so env vars alone are too late — we switch platform
via jax.config.update, which works as long as no computation has run yet.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
