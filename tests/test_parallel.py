"""Multi-device tests on the virtual 8-device CPU mesh: sharded training
parity with the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from activegs_tpu.mapping import gaussians as gm
from activegs_tpu.mapping import trainer
from activegs_tpu.parallel import make_view_mesh, sharded_train_step
from activegs_tpu.render.types import RasterConfig
from tests.test_render import make_attrs


def tiny_setup(v=8, res=32):
    rng = np.random.default_rng(0)
    cfg = gm.MapConfig(capacity=256)
    raster = RasterConfig(interpret=True)
    attrs = make_attrs(64, seed=2)
    state = gm.init_state(cfg)
    import dataclasses

    n = attrs.num
    state = dataclasses.replace(
        state,
        means=state.means.at[:n].set(attrs.means),
        rotations_raw=state.rotations_raw.at[:n].set(attrs.rotations),
        colors=state.colors.at[:n].set(attrs.colors),
        opacities_raw=state.opacities_raw.at[:n].set(0.5),
        count=jnp.int32(n),
    )
    from activegs_tpu.core import geometry as geo

    rgb = jnp.asarray(rng.uniform(0, 1, (v, 3, res, res)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 3, (v, 1, res, res)).astype(np.float32))
    exts = jnp.tile(jnp.eye(4)[None], (v, 1, 1))
    intrs = jnp.tile(geo.intrinsics_from_fov(60.0, 60.0)[None], (v, 1, 1))
    return cfg, raster, state, (rgb, depth, exts, intrs)


class TestShardedTraining:
    def test_devices_available(self):
        assert len(jax.devices()) >= 8

    def test_grads_match_single_device(self):
        cfg, raster, state, batch = tiny_setup()
        params = trainer._params_of(state)

        loss_ref, _ = trainer.batch_loss(params, state, batch, cfg, raster)
        g_ref = jax.grad(
            lambda p: trainer.batch_loss(p, state, batch, cfg, raster)[0]
        )(params)

        mesh = make_view_mesh(8)
        loss_sh, g_sh, per_frame = sharded_train_step(
            params, state, batch, mesh, cfg, raster
        )
        assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)
        for k in params:
            a = np.asarray(g_sh[k])
            b = np.asarray(g_ref[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-5, err_msg=k)
        assert per_frame.shape == (8,)

    def test_four_device_subset_mesh(self):
        cfg, raster, state, batch = tiny_setup(v=4)
        params = trainer._params_of(state)
        mesh = make_view_mesh(4)
        loss_sh, g_sh, _ = sharded_train_step(params, state, batch, mesh, cfg, raster)
        loss_ref, _ = trainer.batch_loss(params, state, batch, cfg, raster)
        assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-5)


class TestShardedMission:
    """The mission-facing sharded paths (VERDICT r1 #3): identical numbers
    to the single-device programs the mapper/planner otherwise run."""

    def _keyframe_setup(self, v=8, res=32):
        import dataclasses

        from activegs_tpu.core import geometry as geo
        from activegs_tpu.mapping import keyframes as kf

        rng = np.random.default_rng(3)
        cfg = gm.MapConfig(capacity=256, batch_size=4, optimization_steps=2)
        raster = RasterConfig(interpret=True)
        attrs = make_attrs(64, seed=2)
        state = gm.init_state(cfg)
        n = attrs.num
        state = dataclasses.replace(
            state,
            means=state.means.at[:n].set(attrs.means),
            rotations_raw=state.rotations_raw.at[:n].set(attrs.rotations),
            colors=state.colors.at[:n].set(attrs.colors),
            opacities_raw=state.opacities_raw.at[:n].set(0.5),
            count=jnp.int32(n),
        )
        buf = kf.init_buffer(v, res, res)
        intr = geo.intrinsics_from_fov(60.0, 60.0)
        for i in range(v):
            frame = {
                "rgb": jnp.asarray(rng.uniform(0, 1, (3, res, res)).astype(np.float32)),
                "depth": jnp.asarray(
                    rng.uniform(1, 3, (1, res, res)).astype(np.float32)
                ),
                "extrinsic": jnp.eye(4),
                "intrinsic": intr,
                "depth_range": jnp.asarray([0.0, 5.0]),
            }
            buf = kf.add_frame(buf, frame)
        return cfg, raster, state, buf

    def test_train_keyframe_sharded_matches_single(self):
        cfg, raster, state, buf = self._keyframe_setup()
        key = jax.random.PRNGKey(7)
        mesh = make_view_mesh(4)  # batch_size=4
        s_ref, buf_ref, loss_ref, aux_ref = trainer.train_keyframe(state, buf, key, cfg, raster)
        s_sh, buf_sh, loss_sh, aux_sh = trainer.train_keyframe(
            state, buf, key, cfg, raster, mesh=mesh
        )
        assert float(loss_sh) == pytest.approx(float(loss_ref), rel=1e-4)
        for f in ("means", "scales_raw", "colors"):
            a, b = np.asarray(getattr(s_sh, f)), np.asarray(getattr(s_ref, f))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-4, err_msg=f)
        np.testing.assert_allclose(
            np.asarray(buf_sh.performance), np.asarray(buf_ref.performance), atol=1e-5
        )

    def test_sharded_candidate_utility_matches_batch(self):
        from activegs_tpu.mapping import voxel_map as vm
        from activegs_tpu.parallel.sharded import sharded_candidate_utility
        from activegs_tpu.planning.confidence import _confidence_utility_batch

        cfg, raster, state, _ = self._keyframe_setup()
        vcfg = vm.VoxelConfig(map_resolution=(0.5, 0.5, 0.5))
        grid = vm.VoxelGrid.create(
            (np.array([-2.0, -2.0, -1.0]), np.array([2.0, 2.0, 3.0])), vcfg
        )
        vstate = vm.init_state(grid)
        rng = np.random.default_rng(0)
        v, res = 8, 16
        cands = np.tile(np.eye(4, dtype=np.float32)[None], (v, 1, 1))
        cands[:, :3, 3] = rng.uniform(-0.3, 0.3, (v, 3)).astype(np.float32)
        from activegs_tpu.core import geometry as geo

        intr = geo.intrinsics_from_fov(60.0, 60.0)
        masks = jnp.asarray(rng.uniform(size=(v, res, res)) > 0.2)
        depth_range = jnp.asarray([0.0, 5.0], jnp.float32)
        args = (
            state,
            vstate.unexplored,
            jnp.asarray(cands),
            intr,
            masks,
            depth_range,
        )
        e_ref, x_ref = _confidence_utility_batch(
            *args, grid, (res, res), cfg, raster
        )
        mesh = make_view_mesh(8)
        e_sh, x_sh = sharded_candidate_utility(
            *args, mesh, grid, (res, res), cfg, raster
        )
        np.testing.assert_allclose(np.asarray(e_sh), np.asarray(e_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), atol=1e-6)

        # exploration parity (explore_only kernel): explore must match the
        # confidence run exactly, exploit is statically zero on both paths
        e_xo, x_xo = _confidence_utility_batch(
            *args, grid, (res, res), cfg, raster, explore_only=True
        )
        e_xo_sh, x_xo_sh = sharded_candidate_utility(
            *args, mesh, grid, (res, res), cfg, raster, explore_only=True
        )
        np.testing.assert_allclose(np.asarray(e_xo), np.asarray(e_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(e_xo_sh), np.asarray(e_ref), atol=1e-6)
        assert float(np.abs(x_xo).max()) == 0.0
        assert float(np.abs(x_xo_sh).max()) == 0.0

        # per-candidate in-view compaction (VERDICT r2 #5) is EXACT:
        # out-of-view gaussians contribute nothing to a candidate render
        e_c, x_c = _confidence_utility_batch(
            *args, grid, (res, res), cfg, raster, subset_bucket=64
        )
        e_c_sh, x_c_sh = sharded_candidate_utility(
            *args, mesh, grid, (res, res), cfg, raster, subset_bucket=64
        )
        np.testing.assert_allclose(np.asarray(e_c), np.asarray(e_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(x_c), np.asarray(x_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(e_c_sh), np.asarray(e_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(x_c_sh), np.asarray(x_ref), atol=1e-6)

    def test_scaling_bench_harness(self):
        """The scaling-efficiency harness (bench.py --scaling) runs on the
        virtual mesh and reports one entry per power-of-two mesh size with
        finite efficiencies (absolute numbers are meaningless on CPU)."""
        import bench

        results = bench.run_scaling(res=16, n_gauss=128, steps=1)
        assert [r["mesh_devices"] for r in results] == [1, 2, 4, 8]
        for r in results:
            assert r["value"] > 0 and np.isfinite(r["efficiency_vs_1dev"])
        assert results[0]["efficiency_vs_1dev"] == pytest.approx(1.0)

    def test_mapper_builds_mesh_on_multidevice(self):
        from activegs_tpu.mapping.mapper import IncrementalMapper

        m = IncrementalMapper(gm.MapConfig(capacity=256, batch_size=8))
        assert m.mesh is not None
        assert m.mesh.devices.size == 8


class TestConfig:
    def test_load_defaults(self):
        from activegs_tpu.config import load_config

        cfg = load_config("main")
        assert cfg.planner.type == "confidence"
        assert cfg.mapper.gaussian_map.optimization_steps == 10
        assert cfg.experiment.budget == 300

    def test_group_and_dotted_overrides(self):
        from activegs_tpu.config import load_config

        cfg = load_config(
            "main",
            ["planner=exploration", "experiment.budget=120", "mapper.gaussian_map.capacity=1024"],
        )
        assert cfg.planner.type == "exploration"
        assert cfg.experiment.budget == 120
        assert cfg.mapper.gaussian_map.capacity == 1024

    def test_build_components(self):
        from activegs_tpu.config import build_components, load_config

        cfg = load_config("main", ["planner=confidence_wo_roi"])
        comp = build_components(cfg)
        assert comp["planner_cfg"].max_roi_sample_num == 0
        assert comp["planner_cfg"].use_confidence is False
        assert comp["map_cfg"].optimization_steps == 10
        assert comp["voxel_cfg"].safety_margin == 0.3

    def test_ablation_config(self):
        from activegs_tpu.config import build_components, load_config

        cfg = load_config("main", ["mapper=incremental_ablation"])
        comp = build_components(cfg)
        assert comp["map_cfg"].use_view_distribution is False


class TestViewer:
    def test_channel_panel_and_voxel_view(self, tmp_path):
        from activegs_tpu.core import geometry as geo
        from activegs_tpu.mapping import voxel_map as vm
        from activegs_tpu.render.types import Camera
        from activegs_tpu.viz.viewer import render_channel_panel, voxel_top_view

        cfg, raster, state, _ = tiny_setup()
        cam = Camera(extrinsic=jnp.eye(4), intrinsic=geo.intrinsics_from_fov(60, 60))
        panel = render_channel_panel(state, cfg, cam, (32, 32), raster)
        assert panel.shape == (64, 96, 3) and panel.dtype == np.uint8
        assert panel.max() > 0

        vcfg = vm.VoxelConfig()
        grid = vm.VoxelGrid.create(
            (np.zeros(3), np.array([2.0, 2.0, 1.0])), vcfg
        )
        top = voxel_top_view(vm.init_state(grid), grid, vcfg)
        assert top.shape[2] == 3
