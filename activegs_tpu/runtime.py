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


def init_distributed() -> bool:
    """Initialize `jax.distributed` for multi-host TPU slices.

    Opt-in (SURVEY §2.2 / BASELINE multi-host north star): set
    ACTIVEGS_DISTRIBUTED=1 on every host of a pod slice (or export
    JAX_COORDINATOR_ADDRESS / let Cloud TPU metadata auto-detect). After
    initialization `jax.devices()` spans all hosts, so the existing view
    mesh (parallel.make_view_mesh / make_hybrid_view_mesh) and its psum
    collectives transparently cover the multi-host case — XLA routes
    reductions over ICI within a host and DCN across hosts. A no-op on
    single-host setups (this machine's axon tunnel exposes one chip).
    Returns True when distributed mode was initialized."""
    if not (
        os.environ.get("ACTIVEGS_DISTRIBUTED")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        return False
    # explicit coordinator env vars (a localhost multi-process run, e.g.
    # tests/mp_child.py) take precedence over cloud auto-detection — but
    # only when ALL THREE are present; a partial set falls through to
    # jax.distributed's own auto-detection instead of crashing
    kwargs = {}
    if all(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
    ):
        kwargs = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    return True


def force_cpu(host_devices: int = 8) -> None:
    """Force the CPU backend with virtual devices (tests / dry runs)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={host_devices}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
