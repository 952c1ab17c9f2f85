"""Mapping-layer tests: spawn, voxel map, training convergence on synthetic
RGB-D frames from the ray-traced room."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from activegs_tpu.core import geometry as geo
from activegs_tpu.mapping import gaussians as gm
from activegs_tpu.mapping import keyframes as kf
from activegs_tpu.mapping import trainer
from activegs_tpu.mapping import voxel_map as vm
from activegs_tpu.render.types import RasterConfig
from activegs_tpu.sim.synthetic import BoxRoomSimulator

RES = 64
RASTER = RasterConfig(entry_budget_mult=4.0, interpret=True)
MAPCFG = gm.MapConfig(capacity=4096, bilateral_radius=2)


@pytest.fixture(scope="module")
def sim():
    return BoxRoomSimulator(resolution=(RES, RES), seed=3, depth_noise_co=0.002)


def look_at_pose(pos, target):
    from activegs_tpu.core import quaternions as quat

    z = jnp.asarray(target, jnp.float32) - jnp.asarray(pos, jnp.float32)
    rot = quat.rotation_from_z(z[None])[0]
    e = np.eye(4, dtype=np.float32)
    e[:3, :3] = np.asarray(rot)
    e[:3, 3] = pos
    return e


@pytest.fixture(scope="module")
def frames(sim):
    poses = [
        look_at_pose((3.0, 2.5, 1.5), (5.5, 2.5, 1.2)),
        look_at_pose((3.0, 2.5, 1.5), (5.0, 4.0, 1.0)),
        look_at_pose((3.2, 2.3, 1.5), (5.5, 2.0, 1.5)),
    ]
    return [sim.simulate(p) for p in poses]


class TestSimulator:
    def test_dataframe_contract(self, sim):
        f = sim.simulate(look_at_pose((3, 2.5, 1.5), (5.5, 2.5, 1.2)))
        assert f["rgb"].shape == (3, RES, RES)
        assert f["depth"].shape == (1, RES, RES)
        d = np.asarray(f["depth"][0])
        assert (d > 0).mean() > 0.8  # mostly valid
        assert float(f["depth_range"][1]) == 5.0

    def test_gt_mode_noise_free(self, sim):
        pose = look_at_pose((3, 2.5, 1.5), (5.5, 2.5, 1.2))
        f1 = sim.simulate(pose, require_gt=True)
        f2 = sim.simulate(pose, require_gt=True)
        np.testing.assert_array_equal(np.asarray(f1["depth"]), np.asarray(f2["depth"]))

    def test_depth_consistent_with_backprojection(self, sim):
        # back-projected points must lie inside the room bbox
        pose = look_at_pose((3, 2.5, 1.5), (1.0, 1.0, 1.0))
        f = sim.simulate(pose, require_gt=True)
        pts = np.asarray(
            geo.backproject_depth(f["depth"][0], f["extrinsic"], f["intrinsic"])
        ).reshape(-1, 3)
        valid = np.asarray(f["depth"][0]).reshape(-1) > 0
        assert (pts[valid] >= sim.bbox[0] - 0.01).all()
        assert (pts[valid] <= sim.bbox[1] + 0.01).all()

    def test_valid_mask_only(self, sim):
        mask = sim.simulate(
            look_at_pose((3, 2.5, 1.5), (5.5, 2.5, 1.2)), valid_mask_only=True
        )
        assert mask.dtype == bool and mask.shape == (RES, RES)


class TestSpawn:
    def test_spawn_fills_prefix(self, frames):
        state = gm.init_state(MAPCFG)
        state, n_new, _ = gm.spawn(state, frames[0], MAPCFG, RASTER)
        n_new = int(n_new)
        assert n_new > 100
        assert int(state.count) == n_new
        # spawned means near the observed surface
        pts = np.asarray(state.means[:n_new])
        assert (pts >= -0.1).all() and (pts <= 6.1).all()
        # opacities at sigmoid(0) = 0.5
        assert float(jax.nn.sigmoid(state.opacities_raw[0])) == pytest.approx(0.5)
        # flat third scale
        scales = np.asarray(gm.activate_scales(state.scales_raw[:n_new], MAPCFG))
        assert scales[:, 2].max() < 1e-8
        assert scales[:, 0].max() == pytest.approx(0.01, abs=1e-6)

    def test_spawn_dedup_reduces_count(self, frames):
        state = gm.init_state(MAPCFG)
        state, n1, _ = gm.spawn(state, frames[0], MAPCFG, RASTER)
        # spawning the same frame again: most pixels already covered by
        # low-error gaussians? (map untrained, so error mask may still fire;
        # at minimum capacity monotonicity and prefix invariant hold)
        state2, n2, _ = gm.spawn(state, frames[0], MAPCFG, RASTER)
        assert int(state2.count) == int(state.count) + int(n2)

    def test_spawn_on_bucketed_render_matches_full(self, frames):
        """spawn(render_bucket=b) with b >= count is EXACT: the error-mask
        render composites the same live prefix, so every state leaf matches
        the full-capacity render path (VERDICT r2 weak #5)."""
        cfg = dataclasses.replace(MAPCFG, capacity=16384)
        state = gm.init_state(cfg)
        state, _, _ = gm.spawn(state, frames[0], cfg, RASTER)
        bucket = gm.bucket_capacity(int(state.count), cfg.capacity, min_cap=1024)
        assert bucket < cfg.capacity  # the slice must actually slice
        full, n_full, _ = gm.spawn(state, frames[1], cfg, RASTER)
        bucketed, n_b, _ = gm.spawn(
            state, frames[1], cfg, RASTER, render_bucket=bucket
        )
        assert int(n_full) == int(n_b)
        for leaf_full, leaf_b in zip(
            jax.tree.leaves(full), jax.tree.leaves(bucketed)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_full), np.asarray(leaf_b), atol=1e-6
            )

    def test_normals_face_camera(self, frames):
        state = gm.init_state(MAPCFG)
        state, n_new, _ = gm.spawn(state, frames[0], MAPCFG, RASTER)
        n = int(n_new)
        normals = np.asarray(gm.normals_of(state))[:n]
        cam_pos = np.asarray(frames[0]["extrinsic"][:3, 3])
        to_cam = cam_pos - np.asarray(state.means[:n])
        cos = (normals * to_cam).sum(1) / np.linalg.norm(to_cam, axis=1)
        assert (cos > 0).mean() > 0.95


class TestTraining:
    def test_psnr_improves(self, frames):
        state = gm.init_state(MAPCFG)
        buf = kf.init_buffer(8, RES, RES)
        for f in frames[:2]:
            state, _, _ = gm.spawn(state, f, MAPCFG, RASTER)
            buf = kf.add_frame(buf, f)

        from activegs_tpu.render.renderer import render_view
        from activegs_tpu.render.types import Camera

        def psnr_of(state, f):
            out, _ = render_view(
                gm.attrs_of(state, MAPCFG),
                Camera(extrinsic=f["extrinsic"], intrinsic=f["intrinsic"]),
                (RES, RES),
                RASTER,
            )
            mse = float(jnp.mean((out.rgb - f["rgb"]) ** 2))
            return -10 * np.log10(mse + 1e-8)

        p0 = psnr_of(state, frames[0])
        state, buf, loss, _aux = trainer.train_keyframe(
            state, buf, jax.random.PRNGKey(0), MAPCFG, RASTER, steps=30
        )
        p1 = psnr_of(state, frames[0])
        assert p1 > p0 + 1.5, (p0, p1)
        assert np.isfinite(float(loss))

    def test_tv_loss_matches_stacked_form(self):
        """The fused-per-axis normal_tv_loss must equal the naive stacked
        formulation (depth_mask * exp(-cd/2s^2) * cd * mask, cd =
        central_diff_sq) it replaced for performance."""
        from activegs_tpu.core.image_ops import central_diff_sq
        from activegs_tpu.mapping import losses

        rng = np.random.default_rng(0)
        normals = jnp.asarray(rng.normal(size=(2, 3, 9, 11)).astype(np.float32))
        depths = jnp.asarray(
            rng.uniform(1, 2, (2, 1, 9, 11)).astype(np.float32)
        )
        # make some regions flat so the depth gate passes there
        depths = depths.at[:, :, 2:5, 3:8].set(1.5)
        mask = jnp.asarray(rng.uniform(0, 1, (2, 1, 9, 11)) > 0.3).astype(
            jnp.float32
        )
        sigma = 0.3
        nd = central_diff_sq(normals)
        dd = central_diff_sq(depths)
        ref = jnp.mean(
            (dd <= 1e-4) * jnp.exp(-nd / (2 * sigma**2)) * nd * mask
        )
        got = losses.normal_tv_loss(normals, depths, mask, sigma)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    def test_view_loss_matches_unfused_terms(self, frames):
        """trainer._view_loss folds rgb/depth/consistency into two weighted
        reductions (VERDICT r4 ask #5); it must equal the unfused 4-term
        reference assembly (`gaussian_map.py:106-124`,
        losses.total_from_view_terms) on a real render."""
        from activegs_tpu.core.image_ops import depth_to_normal
        from activegs_tpu.mapping import losses
        from activegs_tpu.render.renderer import render_view
        from activegs_tpu.render.types import Camera

        state = gm.init_state(MAPCFG)
        f = frames[0]
        state, _, _ = gm.spawn(state, f, MAPCFG, RASTER)
        out, _ = render_view(
            gm.attrs_of(state, MAPCFG),
            Camera(extrinsic=f["extrinsic"], intrinsic=f["intrinsic"]),
            (RES, RES),
            RASTER,
        )
        loss_v, err_v = trainer._view_loss(out, f["rgb"], f["depth"], f["intrinsic"])

        # unfused reference form
        mask_vis = out.opacity > 1e-3
        mask_depth = f["depth"] > 0.0
        rgb_l1 = jnp.mean(losses.l1_masked(out.rgb, f["rgb"], mask_vis))
        depth_l1 = jnp.mean(losses.l1_masked(out.depth, f["depth"], mask_depth))
        d2n = depth_to_normal(
            out.depth[0], mask_vis[0], f["intrinsic"]
        ).transpose(2, 0, 1)
        cons = jnp.mean(
            losses.consistency_loss(out.normal[None], d2n[None])[0] * mask_vis[0]
        )
        tv = losses.normal_tv_loss(
            out.normal[None], out.depth[None], mask_depth[None]
        )
        ref_total = losses.total_from_view_terms(
            rgb_l1[None], depth_l1[None], cons[None], tv[None]
        )
        np.testing.assert_allclose(float(loss_v), float(ref_total), rtol=1e-5)
        np.testing.assert_allclose(
            float(err_v), float(rgb_l1 + depth_l1), rtol=1e-5
        )

    def test_post_process_confidence_and_prune(self, frames):
        state = gm.init_state(MAPCFG)
        buf = kf.init_buffer(8, RES, RES)
        state, _, _ = gm.spawn(state, frames[0], MAPCFG, RASTER)
        buf = kf.add_frame(buf, frames[0])
        far = frames[0]["depth_range"][1]
        state2, _ = trainer.post_process(
            state, buf, far, MAPCFG, RASTER, require_prune=False
        )
        sup = np.asarray(state2.view_supports[: int(state2.count)])
        assert sup.max() == 1.0 and sup.mean() > 0.5
        conf = np.asarray(gm.confidences_of(state2, MAPCFG))[: int(state2.count)]
        assert (conf >= 0).all() and (conf <= 1).all() and conf.max() > 0.1

        # prune with artificial low opacity on half the gaussians
        n = int(state2.count)
        opac = state2.opacities_raw.at[: n // 2].set(-5.0)  # sigmoid ~ 0.007
        state3 = dataclasses.replace(state2, opacities_raw=opac)
        state4, n_pruned = trainer.post_process(
            state3, buf, far, MAPCFG, RASTER, require_prune=True
        )
        assert int(n_pruned) >= n // 2
        assert int(state4.count) == n - int(n_pruned)


class TestVoxelMap:
    def test_update_carves_free_space(self, sim, frames):
        cfg = vm.VoxelConfig()
        grid = vm.VoxelGrid.create(sim.bbox, cfg)
        state = vm.init_state(grid)
        assert bool(state.unexplored.all())
        state = vm.update(state, grid, frames[0])
        free = np.asarray(vm.free_mask(state, cfg))
        occ = np.asarray(vm.occ_mask(state, cfg))
        une = np.asarray(state.unexplored)
        assert free.sum() > 10
        assert occ.sum() > 0
        assert une.sum() < len(une)
        # free voxels lie between camera and surfaces: all within 5 m
        cam = np.asarray(frames[0]["extrinsic"][:3, 3])
        centers = np.asarray(grid.centers)
        d = np.linalg.norm(centers[free] - cam, axis=1)
        assert d.max() < 5.5

    def test_masks_disjoint_and_margin(self, sim, frames):
        cfg = vm.VoxelConfig()
        grid = vm.VoxelGrid.create(sim.bbox, cfg)
        state = vm.init_state(grid)
        for f in frames:
            state = vm.update(state, grid, f)
        free = np.asarray(vm.free_mask(state, cfg))
        occ = np.asarray(vm.occ_mask(state, cfg))
        unk = np.asarray(vm.unknown_mask(state, cfg))
        assert not (free & occ).any()
        assert ((free | occ | unk).sum()) == len(free)
        fm = np.asarray(vm.free_mask_w_margin(state, grid, cfg))
        assert fm.sum() <= free.sum()
        frontier = np.asarray(vm.frontier_mask(state, grid, cfg))
        assert (frontier & ~free).sum() == 0

    def test_dilate_matches_scipy(self, sim):
        from scipy.ndimage import binary_dilation

        cfg = vm.VoxelConfig()
        grid = vm.VoxelGrid.create(sim.bbox, cfg)
        rng = np.random.default_rng(0)
        mask = rng.uniform(size=grid.num_voxels) > 0.9
        offs = vm.sphere_offsets(1.5)
        got = np.asarray(vm.dilate(jnp.asarray(mask), grid, offs))
        elem = np.zeros((3, 3, 3), bool)
        for o in offs:
            elem[o[0] + 1, o[1] + 1, o[2] + 1] = True
        want = binary_dilation(mask.reshape(grid.dim), structure=elem).reshape(-1)
        np.testing.assert_array_equal(got, want)

    def test_update_utility_roi(self, sim, frames):
        cfg = vm.VoxelConfig(min_gaussian_per_voxel=2)
        grid = vm.VoxelGrid.create(sim.bbox, cfg)
        vstate = vm.init_state(grid)
        for f in frames:
            vstate = vm.update(vstate, grid, f)
        state = gm.init_state(MAPCFG)
        state, _, _ = gm.spawn(state, frames[0], MAPCFG, RASTER)
        n = state.capacity
        vstate = vm.update_utility(
            vstate,
            grid,
            cfg,
            state.means,
            gm.normals_of(state),
            jnp.zeros(n),  # all low confidence
            jnp.full(n, 0.9),  # high opacity
            state.alive,
        )
        roi = np.asarray(vstate.roi_mask)
        assert roi.sum() > 0
        norms = np.linalg.norm(np.asarray(vstate.voxel_normal), axis=1)
        assert ((norms > 0.99) | (norms < 1e-6)).all()

    def test_visibility(self, sim, frames):
        cfg = vm.VoxelConfig()
        grid = vm.VoxelGrid.create(sim.bbox, cfg)
        f = frames[0]
        vis = np.asarray(
            vm.visible_mask(
                vm.init_state(grid), grid, f["extrinsic"], f["intrinsic"],
                jnp.where(f["depth"][0] == -1.0, f["depth_range"][1], f["depth"][0]),
            )
        )
        assert 0 < vis.sum() < grid.num_voxels


class TestKeyframeEviction:
    def test_capacity_evicts_lowest_performance(self):
        """Past capacity, add_frame evicts the best-learned (lowest
        performance) keyframe, keeps chronology, and appends the new frame
        (VERDICT r1 weak #5: the old clamp silently overwrote slot -1)."""
        import jax.numpy as jnp

        from activegs_tpu.mapping import keyframes as kf

        cap, res = 4, 8
        buf = kf.init_buffer(cap, res, res)
        frames = []
        for i in range(cap):
            f = {
                "rgb": jnp.full((3, res, res), i / 10.0, jnp.float32),
                "depth": jnp.full((1, res, res), 1.0 + i, jnp.float32),
                "extrinsic": jnp.eye(4) * 1.0 + i,
                "intrinsic": jnp.eye(3),
                "depth_range": jnp.asarray([0.0, 5.0]),
            }
            frames.append(f)
            buf = kf.add_frame(buf, f)
        assert int(buf.count) == cap
        # give slot 1 the lowest performance -> it must be evicted
        buf = kf.update_performance(
            buf, jnp.arange(cap), jnp.asarray([5.0, 0.1, 7.0, 3.0])
        )
        new = {
            "rgb": jnp.full((3, res, res), 0.9, jnp.float32),
            "depth": jnp.full((1, res, res), 9.0, jnp.float32),
            "extrinsic": jnp.eye(4) * 42.0,
            "intrinsic": jnp.eye(3),
            "depth_range": jnp.asarray([0.0, 5.0]),
        }
        buf2 = kf.add_frame(buf, new)
        assert int(buf2.count) == cap
        # chronology preserved: slots are old frames 0, 2, 3, then the new one
        np.testing.assert_allclose(np.asarray(buf2.extrinsics[0]), np.eye(4) + 0.0)
        np.testing.assert_allclose(np.asarray(buf2.extrinsics[1]), np.eye(4) + 2.0)
        np.testing.assert_allclose(np.asarray(buf2.extrinsics[2]), np.eye(4) + 3.0)
        np.testing.assert_allclose(np.asarray(buf2.extrinsics[3]), np.eye(4) * 42.0)
        # evicted slot's performance replaced; new frame starts at 10
        np.testing.assert_allclose(
            np.asarray(buf2.performance), [5.0, 7.0, 3.0, 10.0]
        )
        # image payload follows the rank indirection (decode_frames is the
        # read contract; the physical slot was recycled without any
        # image-buffer copy — VERDICT r2 weak #6)
        rgb, d, _, _ = kf.decode_frames(buf2, jnp.asarray([1, 3]))
        assert float(d[0, 0, 0, 0]) == pytest.approx(3.0)
        assert float(d[1, 0, 0, 0]) == pytest.approx(9.0)
        assert float(rgb[0, 0, 0, 0]) == pytest.approx(0.2, abs=1 / 255)
        assert float(rgb[1, 0, 0, 0]) == pytest.approx(0.9, abs=1 / 255)
        # order stays a permutation of the physical slots
        assert sorted(np.asarray(buf2.order).tolist()) == list(range(cap))

    def test_below_capacity_appends(self):
        import jax.numpy as jnp

        from activegs_tpu.mapping import keyframes as kf

        buf = kf.init_buffer(4, 8, 8)
        f = {
            "rgb": jnp.zeros((3, 8, 8), jnp.float32),
            "depth": jnp.ones((1, 8, 8), jnp.float32),
            "extrinsic": jnp.eye(4),
            "intrinsic": jnp.eye(3),
            "depth_range": jnp.asarray([0.0, 5.0]),
        }
        buf = kf.add_frame(buf, f)
        assert int(buf.count) == 1
        assert float(buf.performance[0]) == 10.0


class TestSamplers:
    """Distribution tests for both keyframe samplers (VERDICT r3 weak #2:
    `sample_uniform` collapsed out-of-range permutation values to frame 0,
    over-sampling it ~7x). Reference: `mapping/utils.py:190-261`."""

    def _filled_buf(self, kf, n_frames, cap=16, res=4):
        import jax.numpy as jnp

        buf = kf.init_buffer(cap, res, res)
        for i in range(n_frames):
            buf = kf.add_frame(
                buf,
                {
                    "rgb": jnp.zeros((3, res, res), jnp.float32),
                    "depth": jnp.ones((1, res, res), jnp.float32),
                    "extrinsic": jnp.eye(4),
                    "intrinsic": jnp.eye(3),
                    "depth_range": jnp.asarray([0.0, 5.0]),
                },
            )
        return buf

    def _rest_histogram(self, sample_fn, buf, batch, active, draws=300):
        import jax

        f = int(buf.count)
        n_active = min(active, f)
        counts = np.zeros(f, np.int64)
        sample = jax.jit(lambda k: sample_fn(buf, k, batch, active))
        for d in range(draws):
            ids = np.asarray(sample(jax.random.PRNGKey(d)))
            # the last n_active positions of the batch are the rest draws
            counts += np.bincount(ids[n_active:], minlength=f)
        return counts

    def test_uniform_rest_draws_are_flat(self):
        import jax

        from activegs_tpu.mapping import keyframes as kf

        batch, active, draws = 8, 3, 300
        buf = self._filled_buf(kf, n_frames=12)
        counts = self._rest_histogram(kf.sample_uniform, buf, batch, active, draws)
        # rest pool = frames [0, 9); 5 draws without replacement per call
        n_rest, per_call = 9, batch - active
        assert counts[n_rest:].sum() == 0  # never samples the active window
        expected = draws * per_call / n_rest
        rest = counts[:n_rest]
        assert rest.min() > 0.5 * expected
        assert rest.max() < 2.0 * expected  # old bug: frame 0 at ~7.6x
        # without replacement within one call
        ids = np.asarray(kf.sample_uniform(buf, jax.random.PRNGKey(7), batch, active))
        assert len(set(ids[active:].tolist())) == per_call

    def test_uniform_rest_exhausted_falls_back_to_latest(self):
        import jax

        from activegs_tpu.mapping import keyframes as kf

        # 4 frames, active 3 -> only 1 rest frame for 5 rest positions:
        # position 4 draws frame 0, the rest fall back to the latest frame
        buf = self._filled_buf(kf, n_frames=4)
        ids = np.asarray(kf.sample_uniform(buf, jax.random.PRNGKey(0), 8, 3))
        assert ids[:3].tolist() == [3, 2, 1]
        assert ids[3] == 0
        assert all(i == 3 for i in ids[4:])

    def test_weighted_rest_draws_follow_performance(self):
        import jax.numpy as jnp

        from activegs_tpu.mapping import keyframes as kf

        batch, active, draws = 8, 3, 300
        buf = self._filled_buf(kf, n_frames=12)
        # frame 2 carries 10x the error weight of the other rest frames
        perf = np.ones(16, np.float32)
        perf[2] = 10.0
        buf = kf.update_performance(buf, jnp.arange(16), jnp.asarray(perf))
        counts = self._rest_histogram(kf.sample_weighted, buf, batch, active, draws)
        n_rest = 9
        assert counts[n_rest:].sum() == 0
        others = np.delete(counts[:n_rest], 2)
        # weighted-without-replacement damps the 10x weight (frame 2 can
        # appear at most once per call) but it must clearly dominate
        assert counts[2] > 1.8 * others.mean()
        assert others.min() > 0


class TestSubsetTraining:
    """Per-view in-view compaction must be EXACT vs the full path (frozen
    bins contract): same loss trajectory, same parameter updates."""

    def _setup(self, v=4, res=32):
        from tests.test_render import make_attrs

        rng = np.random.default_rng(5)
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
            buf = kf.add_frame(
                buf,
                {
                    "rgb": jnp.asarray(
                        rng.uniform(0, 1, (3, res, res)).astype(np.float32)
                    ),
                    "depth": jnp.asarray(
                        rng.uniform(1, 3, (1, res, res)).astype(np.float32)
                    ),
                    "extrinsic": jnp.eye(4),
                    "intrinsic": intr,
                    "depth_range": jnp.asarray([0.0, 5.0]),
                },
            )
        return cfg, raster, state, buf

    def test_compact_in_view_roundtrip(self):
        from activegs_tpu.render.renderer import compact_in_view

        rng = np.random.default_rng(0)
        iv = jnp.asarray(rng.uniform(size=100) > 0.6)
        sel, selv, inv, count = compact_in_view(iv, 64)
        iv_n = np.asarray(iv)
        assert int(count) == iv_n.sum()
        sel_n, selv_n, inv_n = map(np.asarray, (sel, selv, inv))
        # selected = exactly the in-view indices, ascending
        got = sel_n[selv_n]
        np.testing.assert_array_equal(got, np.nonzero(iv_n)[0])
        # inverse maps every in-view gaussian to its slot
        for g in np.nonzero(iv_n)[0]:
            assert sel_n[inv_n[g]] == g
        assert (inv_n[~iv_n] == -1).all()

    def test_train_subset_matches_full(self):
        cfg, raster, state, buf = self._setup()
        key = jax.random.PRNGKey(11)
        s_full, _, loss_full, _ = trainer.train_keyframe(state, buf, key, cfg, raster)
        s_sub, _, loss_sub, _ = trainer.train_keyframe(
            state, buf, key, cfg, raster, subset_bucket=128
        )
        assert float(loss_sub) == pytest.approx(float(loss_full), rel=1e-5)
        for f in ("means", "scales_raw", "colors", "opacities_raw"):
            a, b = np.asarray(getattr(s_sub, f)), np.asarray(getattr(s_full, f))
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-5, err_msg=f)

    def test_train_unrolled_matches_map(self):
        """cfg.unroll_views (the production default via the config loader)
        must reproduce the lax.map trajectory."""
        cfg, raster, state, buf = self._setup()
        key = jax.random.PRNGKey(11)
        s_map, _, loss_map, _ = trainer.train_keyframe(
            state, buf, key, cfg, raster, subset_bucket=128
        )
        cfg_u = dataclasses.replace(cfg, unroll_views=True)
        s_unr, _, loss_unr, _ = trainer.train_keyframe(
            state, buf, key, cfg_u, raster, subset_bucket=128
        )
        assert float(loss_unr) == pytest.approx(float(loss_map), rel=1e-5)
        a, b = np.asarray(s_unr.means), np.asarray(s_map.means)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)

    def test_train_fused_view_kernel_matches_unrolled(self):
        """MapConfig.fused_view_kernel (all views through one V*T-grid
        compositor dispatch, renderer.render_views_batched) must reproduce
        the per-view-dispatch trajectory — same per-tile programs and chunk
        boundaries, so only XLA regrouping differs. (Measured slower on the
        v5e bench, kept as a tested option; see the MapConfig field note.)"""
        cfg, raster, state, buf = self._setup()
        key = jax.random.PRNGKey(11)
        cfg_u = dataclasses.replace(cfg, unroll_views=True)
        s_unr, _, loss_unr, _ = trainer.train_keyframe(
            state, buf, key, cfg_u, raster, subset_bucket=128
        )
        cfg_f = dataclasses.replace(cfg_u, fused_view_kernel=True)
        s_fus, _, loss_fus, _ = trainer.train_keyframe(
            state, buf, key, cfg_f, raster, subset_bucket=128
        )
        assert float(loss_fus) == pytest.approx(float(loss_unr), rel=1e-5)
        a, b = np.asarray(s_fus.means), np.asarray(s_unr.means)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)

    def test_train_subset_sharded_matches_full(self):
        cfg, raster, state, buf = self._setup()
        from activegs_tpu.parallel import make_view_mesh

        key = jax.random.PRNGKey(11)
        mesh = make_view_mesh(4)
        s_full, _, loss_full, _ = trainer.train_keyframe(state, buf, key, cfg, raster)
        s_sub, _, loss_sub, _ = trainer.train_keyframe(
            state, buf, key, cfg, raster, mesh=mesh, subset_bucket=128
        )
        assert float(loss_sub) == pytest.approx(float(loss_full), rel=1e-4)
        a, b = np.asarray(s_sub.means), np.asarray(s_full.means)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)

    def test_keyframe_view_stats_and_bucket(self):
        cfg, raster, state, buf = self._setup()
        mx, max_entries = (
            int(x)
            for x in trainer.keyframe_view_stats(
                state, buf, jax.random.PRNGKey(11), cfg, raster
            )
        )
        assert 0 < mx <= 64
        assert max_entries >= mx  # every in-view gaussian bins >= 1 entry
        assert trainer.pick_subset_bucket(mx, 256, min_bucket=32) in (
            32, 48, 64, 96, 128, None,
        )
        assert trainer.pick_subset_bucket(100, 8192, min_bucket=32) == 128
        assert trainer.pick_subset_bucket(6000, 8192, min_bucket=32) is None
        assert trainer.pick_entry_bucket(100, min_bucket=32) == 128
        assert trainer.pick_entry_bucket(10, min_bucket=32) == 32
        # half-step ladder rungs cap padding waste at 25%
        assert trainer.pick_entry_bucket(40_000) == 49_152
        assert trainer.pick_entry_bucket(49_152) == 49_152
        assert trainer.pick_entry_bucket(50_000) == 65_536
        assert trainer.pick_entry_bucket(70_000) == 98_304
        assert trainer.pick_entry_bucket(70_000) % 128 == 0
        assert trainer.pick_subset_bucket(30_000, 1 << 18) == 32_768
        assert trainer.pick_subset_bucket(40_000, 1 << 18) == 49_152
