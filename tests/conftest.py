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
