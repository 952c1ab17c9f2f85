"""2-process `jax.distributed` CPU run (VERDICT r2 #8 / SURVEY §2.2).

Spawns two localhost processes (tests/mp_child.py) that initialize the
distributed runtime, build the DCN-aware hybrid view mesh, and run one
sharded train step with a process-spanning gradient psum — the only way to
exercise `runtime.init_distributed` / `make_hybrid_view_mesh` on a
single-host machine. Each child asserts parity with the single-device path
itself; this test checks both reach MP_OK and agree on the loss.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "mp_child.py")
    env = {
        k: v
        for k, v in os.environ.items()
        # a clean slate: the parent's virtual-device XLA_FLAGS (conftest)
        # and any ambient coordinator vars must not leak into the children
        if k not in ("XLA_FLAGS", "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                     "JAX_PROCESS_ID", "ACTIVEGS_DISTRIBUTED")
    }
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=280)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out[-4000:]}"
        assert "MP_OK" in out, f"child {pid} no MP_OK:\n{out[-4000:]}"
    losses = {
        line.split("loss=")[1]
        for out in outs
        for line in out.splitlines()
        if line.startswith("MP_OK")
    }
    assert len(losses) == 1, f"processes disagree on the psum loss: {losses}"
