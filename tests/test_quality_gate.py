"""Mission-quality regression gate (VERDICT r2 #6).

A fixed-seed, fixed-iteration fit on the noise-free synthetic room must
reproduce a COMMITTED PSNR / depth-MSE on a held-out view to a pinned
tolerance — so a perf rewrite that quietly costs > 0.5 dB fails CI. This is
the bf16 gate pattern (test_render.py TestBf16) applied to the mission
pipeline; north star: BASELINE.md "PSNR @ fixed iters"
(reference training loop `mapping/gaussian_map.py:62-140`).

The pinned numbers were measured on the CPU backend (interpret-mode
Pallas, tests/conftest.py). They are properties of the MATH — spawn
masks, binning, compositing, loss, Adam — not of the backend: any change
that moves held-out PSNR by >0.5 dB is a real behavior change and should
update the constants deliberately (with a NOTES entry), never silently.
"""

import jax
import numpy as np

from activegs_tpu.eval import metrics
from activegs_tpu.mapping import gaussians as gm
from activegs_tpu.mapping import keyframes as kf
from activegs_tpu.mapping import trainer
from activegs_tpu.render.renderer import render_view
from activegs_tpu.render.types import Camera, RasterConfig
from activegs_tpu.sim.synthetic import BoxRoomSimulator
from test_mapping import look_at_pose

RES = 64
RASTER = RasterConfig(entry_budget_mult=4.0, interpret=True)
MAPCFG = gm.MapConfig(capacity=8192, bilateral_radius=2)

# committed quality at this exact recipe (seed 11, 3 keyframes x 15 steps,
# noise-free frames); update ONLY deliberately, with a NOTES_ROUNDS entry
PINNED_PSNR = 16.62
PINNED_DEPTH_MSE = 0.387


def _fit_and_score():
    sim = BoxRoomSimulator(resolution=(RES, RES), seed=11, depth_noise_co=0.0)
    train_poses = [
        look_at_pose((3.0, 2.5, 1.5), (5.5, 2.5, 1.2)),
        look_at_pose((3.0, 2.5, 1.5), (5.0, 4.0, 1.0)),
        look_at_pose((3.2, 2.3, 1.5), (5.5, 2.0, 1.5)),
    ]
    # held-out pose between the training views
    test_pose = look_at_pose((3.1, 2.6, 1.4), (5.4, 3.0, 1.2))

    state = gm.init_state(MAPCFG)
    buf = kf.init_buffer(8, RES, RES)
    key = jax.random.PRNGKey(11)
    for p in train_poses:
        f = sim.simulate(p, require_gt=True)
        state, _, _ = gm.spawn(
            state,
            f,
            MAPCFG,
            RASTER,
            render_bucket=gm.bucket_capacity(
                int(state.count), MAPCFG.capacity, min_cap=1024
            ),
        )
        buf = kf.add_frame(buf, f)
        key, sub = jax.random.split(key)
        state, buf, loss, _ = trainer.train_keyframe(
            state, buf, sub, MAPCFG, RASTER, steps=15
        )
    assert np.isfinite(float(loss))

    gt = sim.simulate(test_pose, require_gt=True)
    out, _ = render_view(
        gm.attrs_of(state, MAPCFG),
        Camera(extrinsic=gt["extrinsic"], intrinsic=gt["intrinsic"]),
        (RES, RES),
        RASTER,
    )
    psnr = float(metrics.cal_psnr(np.asarray(out.rgb), np.asarray(gt["rgb"])))
    d = np.asarray(out.depth[0])
    d_gt = np.asarray(gt["depth"][0])
    mask = d_gt > 0
    depth_mse = float(np.mean((d - d_gt)[mask] ** 2))
    return psnr, depth_mse


def test_mission_quality_pinned():
    psnr, depth_mse = _fit_and_score()
    print(f"\nquality gate: psnr={psnr:.3f} dB, depth_mse={depth_mse:.5f}")
    # one-sided: improvements pass, a silent >0.5 dB regression fails
    assert psnr > PINNED_PSNR - 0.5, f"PSNR regressed: {psnr:.2f} dB"
    assert depth_mse < PINNED_DEPTH_MSE * 1.5, f"depth MSE regressed: {depth_mse:.5f}"


# ---- planner-in-loop gate (VERDICT r3 #5) -------------------------------

# committed quality of a fixed-seed 6-step CONFIDENCE-PLANNER mission
# (64^2, voxel map on, prune fires at step 5): held-out PSNR averaged over
# 4 poses sweeping the room + explored voxel fraction. A utility-function
# regression (sign flip, ROI starvation, visibility bug) moves the flown
# trajectory and fails one of these (measured: a utility SIGN FLIP scores
# 4.87 dB / 0.391 explored — far past both margins). Update only
# deliberately (NOTES entry).
PINNED_MISSION_PSNR = 7.26
PINNED_EXPLORED_FRAC = 0.81


def _fly_mission_and_score():
    from activegs_tpu.mapping import voxel_map as vm
    from activegs_tpu.mapping.mapper import IncrementalMapper
    from activegs_tpu.planning.confidence import ConfidencePlanner
    from activegs_tpu.planning.planner import PlannerConfig

    sim = BoxRoomSimulator(resolution=(RES, RES), seed=3, depth_noise_co=0.0)
    voxcfg = vm.VoxelConfig(map_resolution=(0.4, 0.4, 0.4))
    mapcfg = gm.MapConfig(capacity=32768, optimization_steps=5, bilateral_radius=2)
    init_pose = (
        (0.0, 0.0, 1.0, 1.0),
        (-1.0, 0.0, 0.0, 2.5),
        (0.0, -1.0, 0.0, 1.5),
        (0.0, 0.0, 0.0, 1.0),
    )
    planner = ConfidencePlanner(
        PlannerConfig(
            sample_num=12, max_roi_sample_num=4, radius=1.5, init_pose=init_pose
        ),
        mapcfg,
        voxcfg,
        RASTER,
        seed=0,
    )
    mapper = IncrementalMapper(mapcfg, voxcfg, RASTER, keyframe_capacity=16)
    mapper.load_simulator(sim)
    mapper.load_planner(planner)
    mapper.init_map()
    for _ in range(6):
        stats = mapper.step()
    assert np.isfinite(stats["loss"])

    # held-out views: from the room center toward each wall
    center, z = (3.0, 2.5, 1.5), 1.3
    test_poses = [
        look_at_pose(center, (5.5, 2.5, z)),
        look_at_pose(center, (0.5, 2.5, z)),
        look_at_pose(center, (3.0, 4.5, z)),
        look_at_pose(center, (3.0, 0.5, z)),
    ]
    attrs = gm.attrs_of(mapper.gm_state, mapcfg)
    psnrs = []
    for pose in test_poses:
        gt = sim.simulate(pose, require_gt=True)
        out, _ = render_view(
            attrs,
            Camera(extrinsic=gt["extrinsic"], intrinsic=gt["intrinsic"]),
            (RES, RES),
            RASTER,
        )
        psnrs.append(
            float(metrics.cal_psnr(np.asarray(out.rgb), np.asarray(gt["rgb"])))
        )
    explored = 1.0 - float(np.asarray(mapper.vm_state.unexplored).mean())
    return float(np.mean(psnrs)), explored


def test_mission_quality_planner_in_loop():
    psnr, explored = _fly_mission_and_score()
    print(f"\nplanner-in-loop gate: psnr={psnr:.3f} dB, explored={explored:.3f}")
    assert psnr > PINNED_MISSION_PSNR - 0.5, f"mission PSNR regressed: {psnr:.2f}"
    assert explored > PINNED_EXPLORED_FRAC - 0.05, (
        f"exploration regressed: {explored:.3f}"
    )
