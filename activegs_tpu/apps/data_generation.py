"""Test-view generation — the analog of the reference's `data_generation.py`.

Explores the scene with the random planner until the voxel map converges
(no unexplored-state changes for `converged_step` iterations), samples
`num_views` random poses inside free voxels, and saves traj.txt /
intrinsic.txt (+ RGB-D pngs unless save_pose_only).
"""

from __future__ import annotations

import os

import numpy as np

from ..mapping import voxel_map as vm
from ..planning import PlannerConfig, RandomPlanner
from ..planning.paths import random_rotation
from .common import build_components, parse_cli
from ..sim import get_simulator


def generate_test_views(vstate, grid, voxel_cfg, num_views: int, rng):
    """Random poses in free voxels (`generate_test_views`,
    `data_generation.py:124-153`)."""
    centers = np.asarray(grid.centers)
    size = np.asarray(grid.size)
    free = np.asarray(vm.free_mask(vstate, voxel_cfg))
    free_centers = centers[free]
    if len(free_centers) == 0:
        free_centers = centers
    picks = free_centers[rng.integers(0, len(free_centers), num_views)]
    jitter = rng.uniform(-0.5, 0.5, picks.shape) * size
    points = picks + jitter
    ts = np.tile(np.eye(4), (num_views, 1, 1)).astype(np.float32)
    ts[:, :3, 3] = points
    ts[:, :3, :3] = random_rotation(num_views, pitch_angle=None, rng=rng)
    return ts


def explore_until_converged(
    simulator, planner, grid, voxel_cfg, max_iter=100, converged_step=5
):
    """Random-walk exploration of free space (`data_generation.py:59-84`)."""
    vstate = vm.init_state(grid)
    converged = 0
    it = 0
    while it < max_iter and converged < converged_step:
        path = planner.plan(None, vstate, grid, simulator, None)
        frame = simulator.simulate(np.asarray(path[-1]), require_gt=True)
        old = np.asarray(vstate.unexplored)
        vstate = vm.update(vstate, grid, frame)
        new = np.asarray(vstate.unexplored)
        converged = converged + 1 if (old == new).all() else 0
        it += 1
    return vstate


def sample_test_views_from_sim(simulator, num_views: int, seed: int = 0):
    """Convenience used by eval when no recorded test set exists."""
    voxel_cfg = vm.VoxelConfig(map_resolution=(0.4, 0.4, 0.4))
    grid = vm.VoxelGrid.create(simulator.bbox, voxel_cfg)
    center = 0.5 * (simulator.bbox[0] + simulator.bbox[1])
    init_pose = np.eye(4, dtype=np.float32)
    init_pose[:3, 3] = center
    planner = RandomPlanner(
        PlannerConfig(
            type="random",
            sample_num=8,
            max_roi_sample_num=0,
            radius=2.0,
            init_pose=tuple(tuple(r) for r in init_pose),
        ),
        None,
        voxel_cfg,
        seed=seed,
    )
    vstate = explore_until_converged(
        simulator, planner, grid, voxel_cfg, max_iter=20, converged_step=3
    )
    return generate_test_views(
        vstate, grid, voxel_cfg, num_views, np.random.default_rng(seed)
    )


def main():
    cfg = parse_cli("data_generation")
    simulator = get_simulator(cfg)
    comp = build_components(cfg)
    voxel_cfg = comp["voxel_cfg"]
    grid = vm.VoxelGrid.create(simulator.bbox, voxel_cfg)
    planner = RandomPlanner(
        comp["planner_cfg"], comp["map_cfg"], voxel_cfg, comp["raster_cfg"]
    )
    vstate = explore_until_converged(
        simulator,
        planner,
        grid,
        voxel_cfg,
        max_iter=cfg.get("max_iter", 100),
        converged_step=cfg.get("converged_step", 5),
    )
    rng = np.random.default_rng(cfg.get("seed", 0))
    views = generate_test_views(vstate, grid, voxel_cfg, cfg.num_views, rng)

    out = os.path.join(cfg.dataset_path, simulator.scene_name + "_test")
    os.makedirs(out, exist_ok=True)
    np.savetxt(os.path.join(out, "traj.txt"), views.reshape(len(views), -1))
    np.savetxt(
        os.path.join(out, "intrinsic.txt"),
        np.asarray(simulator.intrinsic).reshape(-1),
    )
    if not cfg.get("save_pose_only", False):
        from PIL import Image

        os.makedirs(os.path.join(out, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(out, "depth"), exist_ok=True)
        for i, pose in enumerate(views):
            frame = simulator.simulate(pose, require_gt=True)
            rgb = np.asarray(frame["rgb"]).transpose(1, 2, 0)
            Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(out, "rgb", f"{i:05d}.png")
            )
            np.save(
                os.path.join(out, "depth", f"{i:05d}.npy"),
                np.asarray(frame["depth"][0]),
            )
    print(f"saved {len(views)} test views to {out}")


if __name__ == "__main__":
    main()
