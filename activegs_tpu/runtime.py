"""Runtime setup helpers: persistent compile cache, device selection.

The Mosaic kernels take minutes to compile on TPU; the persistent JAX
compilation cache makes that a one-time cost per machine. Call
`setup_cache()` at every entry point (apps, bench, tests on TPU).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = os.environ.get(
    "ACTIVEGS_JAX_CACHE", os.path.expanduser("~/.cache/activegs_jax")
)


def setup_cache(path: str | None = None) -> None:
    path = path or _DEFAULT_CACHE
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def force_cpu(host_devices: int = 8) -> None:
    """Force the CPU backend with virtual devices (tests / dry runs)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={host_devices}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
