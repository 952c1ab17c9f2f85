"""Child process for the 2-process `jax.distributed` test (VERDICT r2 #8).

Run by tests/test_multiprocess.py as
`python tests/mp_child.py <coordinator_port> <process_id>`. Each process
exposes 2 virtual CPU devices (4 global over 2 processes), initializes the
distributed runtime through `runtime.init_distributed` (the same entry the
mission apps use, apps/common.py), builds the DCN-aware hybrid view mesh,
and runs ONE sharded train step whose gradient psum spans the process
boundary. The result is checked against the locally computed single-device
loss/gradients — the BASELINE.md multi-host north star ("1 chip -> 1 host
-> N >= 2 hosts") exercised end-to-end at CPU scale.
"""

import os
import sys


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["ACTIVEGS_DISTRIBUTED"] = "1"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from activegs_tpu import runtime

    assert runtime.init_distributed(), "distributed init refused the env"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    assert jax.local_device_count() == 2

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from activegs_tpu.mapping import gaussians as gm
    from activegs_tpu.mapping import trainer
    from activegs_tpu.parallel.sharded import (
        VIEW_AXIS,
        make_hybrid_view_mesh,
        sharded_train_step,
    )
    from activegs_tpu.render.types import RasterConfig
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_hybrid_view_mesh()
    assert mesh.devices.size == 4
    # DCN-aware ordering: consecutive view shards sit on the same process,
    # so the psum tree reduces over "ICI" before crossing the process
    # boundary (parallel/sharded.py:38-51)
    procs = [d.process_index for d in mesh.devices.reshape(-1)]
    assert procs == sorted(procs), f"hybrid mesh not process-major: {procs}"

    # deterministic tiny problem, identical on both processes
    rng = np.random.default_rng(0)
    v, res, n = 4, 16, 32
    cfg = gm.MapConfig(capacity=64)
    raster = RasterConfig(interpret=True)
    state = gm.init_state(cfg)
    state = dataclasses.replace(
        state,
        means=state.means.at[:n].set(
            jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
            + jnp.asarray([0.0, 0.0, 2.0])
        ),
        opacities_raw=state.opacities_raw.at[:n].set(0.5),
        colors=state.colors.at[:n].set(
            jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        ),
        count=jnp.int32(n),
    )
    from activegs_tpu.core import geometry as geo

    rgb = rng.uniform(0, 1, (v, 3, res, res)).astype(np.float32)
    depth = rng.uniform(1, 3, (v, 1, res, res)).astype(np.float32)
    exts = np.tile(np.eye(4, dtype=np.float32)[None], (v, 1, 1))
    intrs = np.tile(
        np.asarray(geo.intrinsics_from_fov(60.0, 60.0))[None], (v, 1, 1)
    )
    params = trainer._params_of(state)

    # single-device reference (local jit, no mesh)
    loss_ref, _ = trainer.batch_loss(params, state, (rgb, depth, exts, intrs), cfg, raster)
    g_ref = jax.grad(
        lambda p: trainer.batch_loss(p, state, (rgb, depth, exts, intrs), cfg, raster)[0]
    )(params)
    loss_ref = float(loss_ref)

    # global view-sharded batch: each process contributes its local shard
    view_sh = NamedSharding(mesh, P(VIEW_AXIS))
    local = slice(2 * pid, 2 * pid + 2)  # process-major mesh order
    batch = tuple(
        jax.make_array_from_process_local_data(view_sh, x[local])
        for x in (rgb, depth, exts, intrs)
    )
    repl = NamedSharding(mesh, P())
    params_g = jax.device_put(params, repl)
    state_g = jax.device_put(state, repl)

    loss_sh, g_sh, per_frame = sharded_train_step(
        params_g, state_g, batch, mesh, cfg, raster
    )
    loss_sh = float(loss_sh)
    assert abs(loss_sh - loss_ref) <= 1e-5 * max(1.0, abs(loss_ref)), (
        loss_sh,
        loss_ref,
    )
    for k in params:
        a = np.asarray(jax.device_get(g_sh[k]))
        b = np.asarray(g_ref[k])
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5, err_msg=k)
    assert per_frame.shape == (v,)

    print(f"MP_OK loss={loss_sh:.6f}", flush=True)


if __name__ == "__main__":
    main()
