"""Evaluation subsystem tests: metrics, TSDF fusion + marching tetrahedra,
PLY IO, mesh generation, and the full evaluation tool."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from activegs_tpu.eval import metrics, tsdf
from activegs_tpu.io import ply


class TestMetrics:
    def test_psnr_ssim_identity(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
        assert metrics.cal_psnr(img, img) > 75
        assert metrics.cal_ssim(img, img) == pytest.approx(1.0, abs=1e-5)

    def test_psnr_known_value(self):
        a = jnp.zeros((3, 16, 16))
        b = jnp.full((3, 16, 16), 0.1)
        assert metrics.cal_psnr(a, b) == pytest.approx(20.0, abs=1e-3)

    def test_surface_sampling_on_unit_square(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        pts = metrics.sample_surface(verts, faces, 5000)
        assert pts.shape == (5000, 3)
        assert (pts[:, 2] == 0).all()
        assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1
        # roughly uniform: quadrant counts balanced
        q = (pts[:, 0] > 0.5).mean()
        assert 0.45 < q < 0.55

    def test_mesh_metrics_identical_meshes(self):
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        acc, comp, ratio, chamfer = metrics.calc_3d_mesh_metric(
            (verts, faces), (verts, faces), dist_thres=0.02, n_samples=20000
        )
        assert acc < 2.0 and comp < 2.0  # cm
        assert ratio > 95.0
        assert chamfer < 0.02

    def test_mesh_metrics_offset(self):
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        verts2 = verts + [0, 0, 0.1]
        acc, comp, ratio, chamfer = metrics.calc_3d_mesh_metric(
            (verts2, faces), (verts, faces), dist_thres=0.02, n_samples=20000
        )
        assert acc == pytest.approx(10.0, rel=0.05)  # 10 cm
        assert ratio < 5.0


class TestTSDF:
    def test_sphere_reconstruction(self):
        # fill the TSDF analytically with a sphere SDF, extract, check radius
        grid = tsdf.TSDFGrid.create(
            (np.array([-1.0, -1, -1]), np.array([1.0, 1, 1])), voxel=0.05, trunc=0.2
        )
        pts = np.asarray(tsdf._grid_points(grid))
        sdf = np.linalg.norm(pts, axis=1) - 0.6
        state = tsdf.TSDFState(
            tsdf=jnp.asarray(np.clip(sdf / grid.trunc, -1, 1)),
            weight=jnp.ones(grid.num),
            color=jnp.zeros((grid.num, 3)),
        )
        verts, faces, _ = tsdf.extract_mesh(state, grid)
        assert len(faces) > 100
        r = np.linalg.norm(verts, axis=1)
        assert np.abs(r - 0.6).max() < 0.05
        assert np.abs(r - 0.6).mean() < 0.01

    def test_integration_of_synthetic_views(self):
        # fuse depth views of a fronto-parallel wall at z = 2
        from activegs_tpu.core import geometry as geo

        k = geo.intrinsics_from_fov(60.0, 60.0)
        grid = tsdf.TSDFGrid.create(
            (np.array([-1.5, -1.5, 1.0]), np.array([1.5, 1.5, 2.5])), voxel=0.05
        )
        state = tsdf.init_state(grid)
        h = w = 64
        depth = jnp.full((h, w), 2.0)
        rgb = jnp.full((3, h, w), 0.5)
        for dx in (-0.2, 0.0, 0.2):
            e = jnp.asarray(np.eye(4, dtype=np.float32)).at[0, 3].set(dx)
            state = tsdf.integrate(state, grid, rgb, depth, e, k)
        verts, faces, colors = tsdf.extract_mesh(state, grid)
        assert len(verts) > 50
        assert np.abs(verts[:, 2] - 2.0).max() < 0.06
        assert np.abs(colors - 0.5).max() < 1e-5

    def test_filter_isolated(self):
        # two clusters: a big grid patch and a single lonely triangle
        xs, ys = np.meshgrid(np.arange(6), np.arange(6))
        verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(36)], 1).astype(np.float32)
        faces = []
        for y in range(5):
            for x in range(5):
                i = y * 6 + x
                faces.append([i, i + 1, i + 6])
                faces.append([i + 1, i + 7, i + 6])
        big = np.asarray(faces, np.int32)
        lonely_verts = verts + [100, 0, 0]
        all_verts = np.concatenate([verts, lonely_verts[:3]])
        all_faces = np.concatenate([big, [[36, 37, 38]]]).astype(np.int32)
        v, f, _ = tsdf.filter_isolated(all_verts, all_faces, min_tris=5)
        assert len(f) == len(big)


class TestPly:
    def test_roundtrip_binary(self, tmp_path):
        verts = np.random.default_rng(0).uniform(size=(20, 3)).astype(np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
        colors = np.random.default_rng(1).uniform(size=(20, 3)).astype(np.float32)
        p = os.path.join(str(tmp_path), "m.ply")
        ply.save_ply(p, verts, faces, colors)
        v2, f2 = ply.load_ply(p)
        np.testing.assert_allclose(v2, verts, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)


class TestEndToEndEval:
    def test_mesh_generation_and_eval(self):
        """Build a tiny map on the synthetic room, fuse a mesh, and score it
        against the GT room mesh."""
        from activegs_tpu.mapping import gaussians as gm
        from activegs_tpu.mapping import keyframes as kf
        from activegs_tpu.mapping import trainer
        from activegs_tpu.eval.evaluation import EvaluationTool, generate_mesh
        from activegs_tpu.render.types import RasterConfig
        from activegs_tpu.sim.synthetic import BoxRoomSimulator
        from test_mapping import look_at_pose

        res = 64
        raster = RasterConfig(interpret=True)
        cfg = gm.MapConfig(capacity=8192, bilateral_radius=2)
        sim = BoxRoomSimulator(resolution=(res, res), seed=5, depth_noise_co=0.0)
        poses = [
            look_at_pose((3.0, 2.5, 1.5), (5.5, 2.5, 1.2)),
            look_at_pose((3.0, 2.5, 1.5), (5.5, 3.5, 1.2)),
        ]
        state = gm.init_state(cfg)
        buf = kf.init_buffer(8, res, res)
        frames = []
        for p in poses:
            f = sim.simulate(p)
            frames.append(f)
            state, _, _ = gm.spawn(state, f, cfg, raster)
            buf = kf.add_frame(buf, f)
        import jax

        state, buf, _, _aux = trainer.train_keyframe(
            state, buf, jax.random.PRNGKey(0), cfg, raster, steps=10
        )

        cams = [(f["extrinsic"], f["intrinsic"]) for f in frames]
        verts, faces, colors = generate_mesh(
            state, cfg, cams, resolution=res, raster_cfg=raster, voxel=0.08,
            trunc=0.3, min_cluster_tris=10,
        )
        assert len(faces) > 50
        # reconstructed surface points stay inside the room
        assert (verts >= sim.bbox[0] - 0.3).all()
        assert (verts <= sim.bbox[1] + 0.3).all()

        gt_mesh = (sim.mesh_vertices, sim.mesh_faces)
        tool = EvaluationTool(
            maps=[(state, cfg)],
            meshes=[(verts, faces)],
            test_poses=np.stack(poses)[:1],
            gt_provider=sim,
            mesh_gt=gt_mesh,
            raster_cfg=raster,
        )
        out = tool.eval(mode="complete", mesh_dist_thres=0.1, mesh_samples=20000)
        assert out["mean_psnr"][0] > 10
        assert 0 < out["mean_ssim"][0] <= 1
        assert out["mean_depth_mse"][0] < 2.0
        # sanity only: 10 training steps on 2 views of a full room produce a
        # crude mesh; the detailed quality gates live in the render tests
        assert out["mesh_accuracy"][0] < 100
        assert out["mesh_completion"][0] is not None


class TestPerceptualMetric:
    def test_identity_zero_and_sensitivity(self):
        """Offline LPIPS stand-in: zero on identical images, monotone-ish in
        corruption strength, permutation-sensitive (unlike plain MSE on
        shuffled pixels it responds to structure at conv scales)."""
        from activegs_tpu.eval import metrics

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
        assert metrics.cal_perceptual(img, img) == pytest.approx(0.0, abs=1e-10)
        d_small = metrics.cal_perceptual(img, img + 0.05)
        d_big = metrics.cal_perceptual(img, np.roll(img, 8, axis=1))
        assert 0 < d_small < d_big
        # deterministic across calls (fixed PRNG weights)
        assert metrics.cal_perceptual(img, img + 0.05) == pytest.approx(d_small)
