"""Force the CPU platform with N virtual devices, in-process.

The environment's sitecustomize can register and PIN an accelerator
platform at interpreter startup, so env vars (JAX_PLATFORMS / XLA_FLAGS)
set later — or even in a child process's environment — are not sufficient;
only jax.config updates made before any computation take effect. This
helper is the single implementation used by the driver contract
(__graft_entry__.dryrun_multichip), the CLI's --cpu-devices flag and the
test conftest.
"""

from __future__ import annotations

import os


def force_cpu_devices(n_devices: int) -> bool:
    """Switch jax to the CPU platform with >= n_devices virtual devices.
    Returns True on success; False if the backend is already committed to
    another platform (callers can then re-exec in a fresh process)."""
    import jax

    prev = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in prev:
        os.environ["XLA_FLAGS"] = (
            prev + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    try:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_num_cpu_devices", n_devices)
        except Exception:
            pass  # older jax: XLA_FLAGS above covers it
        devs = jax.devices()
        return devs[0].platform == "cpu" and len(devs) >= n_devices
    except Exception:
        return False
