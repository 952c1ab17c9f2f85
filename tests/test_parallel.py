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
