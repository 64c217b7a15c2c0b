"""Machine-keyed persistent XLA compilation cache.

The container can migrate between hosts with different CPU feature sets;
XLA:CPU AOT executables cached on one host can SIGILL/segfault when loaded
on another (observed: jax compilation_cache get_executable_and_time
segfaulting the whole test run after a host change). Keying the cache
directory by a CPU-capability fingerprint makes stale entries unreachable
instead of fatal.
"""

import hashlib
import os


def machine_cache_dir(base_dir: str) -> str:
    """Machine-fingerprint-keyed XLA cache dir: stale cross-host XLA:CPU
    AOT entries segfault on load after container host migrations, so each
    host class gets its own directory."""
    try:
        with open("/proc/cpuinfo") as f:
            sig = "".join(line for line in f
                          if line.startswith(("flags", "model name")))
    except OSError:
        import platform
        sig = platform.processor() + platform.machine()
    tag = hashlib.sha1(sig.encode()).hexdigest()[:10]
    return os.path.join(base_dir, f".jax_cache-{tag}")


def enable_persistent_cache(jax, base_dir: str) -> str:
    """Point JAX's persistent compilation cache at ``machine_cache_dir``;
    returns the path. Makes post-first-process cold starts compile-free."""
    path = machine_cache_dir(base_dir)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
