"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the survey's multi-host test recipe (SURVEY.md §4): all cross-device
traffic is plain JAX collectives, so CPU device virtualization exercises the
sharded paths without TPU hardware. Pallas kernels run in interpret mode on
CPU (selected automatically by the renderer).

Note: this machine preloads a TPU platform plugin that ignores the
JAX_PLATFORMS env var, so we must force CPU through jax.config.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables when a test module finishes.

    The full suite in ONE process accumulates hundreds of XLA:CPU
    executables; past a threshold the process segfaults inside a later
    jit dispatch (observed r4: deterministic SIGSEGV in
    test_render.py::TestBf16 at suite position ~95%, while every partial
    batch — either half of the suite plus that exact test — passes).
    Per-module teardown keeps the high-water mark at single-module scale;
    cross-module sharing was near zero anyway (fixtures are module-scoped).
    """
    yield
    jax.clear_caches()
