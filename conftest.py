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

# EPI_TEST_TPU=1 keeps the environment's real TPU backend so the
# hardware-only tests (tests/test_tpu_hardware.py) can run:
#   EPI_TEST_TPU=1 python -m pytest tests/test_tpu_hardware.py -q
# Everything else runs on the virtual 8-device CPU mesh with float64.
if os.environ.get("EPI_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-dominated (fused
# interpret-mode kernels, multi-device pjit), so warm-cache reruns are much
# faster. The directory is keyed by a CPU fingerprint because container
# migration across hosts made stale XLA:CPU AOT entries segfault on load
# (utils/jax_cache.py). Safe to delete .jax_cache-*/ at any time.
from epidemicmodeling_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache(jax, os.path.dirname(__file__))
