"""App-level tests: replay simulator roundtrip, plotting, config apps."""

import json
import os

import numpy as np

from activegs_tpu.sim.replay import ReplaySimulator
from activegs_tpu.sim.synthetic import BoxRoomSimulator


class TestReplaySimulator:
    def test_record_and_replay(self, tmp_path):
        src = BoxRoomSimulator(resolution=(32, 32), seed=0)
        poses = []
        for ang in np.linspace(0, 2 * np.pi, 4, endpoint=False):
            from activegs_tpu.planning.paths import rotation_from_z

            e = np.eye(4, dtype=np.float32)
            e[:3, :3] = rotation_from_z(np.array([np.cos(ang), np.sin(ang), 0.0]))[0]
            e[:3, 3] = [3.0, 2.5, 1.5]
            poses.append(e)
        ReplaySimulator.record(str(tmp_path), src, poses)

        replay = ReplaySimulator(str(tmp_path), depth_noise_co=0.0)
        assert replay.scene_name == src.scene_name
        np.testing.assert_allclose(replay.bbox, src.bbox)

        f_src = src.simulate(poses[1], require_gt=True)
        f_rep = replay.simulate(poses[1], require_gt=True)
        np.testing.assert_allclose(
            np.asarray(f_rep["extrinsic"]), poses[1], atol=1e-6
        )
        # rgb within quantization of the uint8 recording
        np.testing.assert_allclose(
            np.asarray(f_rep["rgb"]), np.asarray(f_src["rgb"]), atol=1 / 255 + 1e-6
        )
        np.testing.assert_allclose(
            np.asarray(f_rep["depth"]), np.asarray(f_src["depth"]), atol=1e-5
        )

    def test_replay_nearest_pose(self, tmp_path):
        src = BoxRoomSimulator(resolution=(32, 32), seed=0)
        from activegs_tpu.planning.paths import rotation_from_z

        poses = []
        for x in (1.0, 3.0, 5.0):
            e = np.eye(4, dtype=np.float32)
            e[:3, :3] = rotation_from_z(np.array([0.0, 1.0, 0.0]))[0]
            e[:3, 3] = [x, 2.5, 1.5]
            poses.append(e)
        ReplaySimulator.record(str(tmp_path), src, poses)
        replay = ReplaySimulator(str(tmp_path))
        q = poses[2].copy()
        q[0, 3] = 4.8  # closest to x=5
        f = replay.simulate(q)
        assert float(f["extrinsic"][0, 3]) == 5.0

    def test_valid_mask_only(self, tmp_path):
        src = BoxRoomSimulator(resolution=(16, 16), seed=0)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [3, 2.5, 1.5]
        ReplaySimulator.record(str(tmp_path), src, [pose])
        replay = ReplaySimulator(str(tmp_path))
        m = replay.simulate(pose, valid_mask_only=True)
        assert m.dtype == bool and m.shape == (16, 16)


class TestPlotApp:
    def test_collect_and_plot(self, tmp_path):
        from activegs_tpu.apps import plot as plot_app

        root = os.path.join(str(tmp_path), "scene")
        for planner in ("confidence", "random"):
            for run in range(2):
                d = os.path.join(root, planner, str(run))
                os.makedirs(d)
                json.dump(
                    {
                        "time": [60, 120, 180],
                        "mean_psnr": [20 + run, 22 + run, 24 + run],
                        "mean_ssim": [0.7, 0.8, 0.85],
                        "mean_depth_mse": [0.1, 0.05, 0.03],
                    },
                    open(os.path.join(d, "final_result.json"), "w"),
                )
        out = os.path.join(str(tmp_path), "plots")
        written = plot_app.plot(root, out)
        assert len(written) >= 3
        for p in written:
            assert os.path.getsize(p) > 1000


class TestDataGeneration:
    def test_sample_test_views(self):
        from activegs_tpu.apps.data_generation import sample_test_views_from_sim

        sim = BoxRoomSimulator(resolution=(32, 32), seed=0)
        views = sample_test_views_from_sim(sim, 25, seed=1)
        assert views.shape == (25, 4, 4)
        pos = views[:, :3, 3]
        assert (pos >= sim.bbox[0] - 0.5).all() and (pos <= sim.bbox[1] + 0.5).all()
        # rotations orthonormal
        r = views[:, :3, :3]
        rr = np.einsum("nij,nik->njk", r, r)
        np.testing.assert_allclose(rr, np.broadcast_to(np.eye(3), rr.shape), atol=1e-5)
