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
        state, _ = gm.spawn(
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
