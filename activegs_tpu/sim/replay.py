"""Dataset-replay simulator: serves pre-recorded posed RGB-D frames.

The dataframe dict is the seam (`habitat_simulator.py:128-134`), so any
recorded mission / dataset can stand in for the live simulator — this is the
TPU build's path to running on real Replica captures without habitat
(SURVEY §2.1 C21 replacement strategy). Frames are matched to the requested
pose by nearest recorded pose (position + orientation metric).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from .base import SimulatorBase


class ReplaySimulator(SimulatorBase):
    def __init__(self, dataset_dir: str, depth_noise_co: float = 0.01, seed: int = 0):
        self.dataset_dir = dataset_dir
        meta = json.load(open(os.path.join(dataset_dir, "meta.json")))
        self.scene_name = meta["scene_name"]
        self.resolution = np.asarray(meta["resolution"])
        self.intrinsic = np.asarray(meta["intrinsic"], np.float32).reshape(3, 3)
        self.depth_range = tuple(meta["depth_range"])
        self.bbox = np.asarray(meta["bbox"], np.float32)
        self.has_missing_surface = meta.get("has_missing_surface", False)
        self.depth_noise_co = depth_noise_co
        self.rng = np.random.default_rng(seed)
        data = np.load(os.path.join(dataset_dir, "frames.npz"))
        self.poses = data["extrinsics"]  # (F, 4, 4)
        self.rgbs = data["rgbs"]  # (F, 3, H, W) uint8
        self.depths = data["depths"]  # (F, H, W) float32, 0 = missing

    @classmethod
    def from_config(cls, cfg):
        return cls(cfg.simulator.dataset_dir)

    @staticmethod
    def record(path, simulator, poses):
        """Record a dataset from another simulator at the given poses."""
        os.makedirs(path, exist_ok=True)
        rgbs, depths = [], []
        for pose in poses:
            rgb, depth, hit = simulator.render_clean(np.asarray(pose))
            rgbs.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
            depths.append(np.where(hit, depth, 0.0).astype(np.float32))
        np.savez_compressed(
            os.path.join(path, "frames.npz"),
            extrinsics=np.asarray(poses, np.float32),
            rgbs=np.stack(rgbs),
            depths=np.stack(depths),
        )
        json.dump(
            {
                "scene_name": simulator.scene_name,
                "resolution": simulator.resolution.tolist(),
                "intrinsic": np.asarray(simulator.intrinsic).reshape(-1).tolist(),
                "depth_range": list(simulator.depth_range),
                "bbox": np.asarray(simulator.bbox).tolist(),
                "has_missing_surface": simulator.has_missing_surface,
            },
            open(os.path.join(path, "meta.json"), "w"),
        )

    def _nearest(self, c2w: np.ndarray) -> int:
        dp = np.linalg.norm(self.poses[:, :3, 3] - c2w[:3, 3], axis=1)
        dr = np.linalg.norm(
            self.poses[:, :3, :3] - c2w[:3, :3], axis=(1, 2)
        )
        return int(np.argmin(dp + 0.5 * dr))

    def simulate(self, c2w, valid_mask_only: bool = False, require_gt: bool = False):
        c2w = np.asarray(c2w, np.float32)
        i = self._nearest(c2w)
        depth = self.depths[i].astype(np.float32)
        hit = depth > 0
        if valid_mask_only:
            return hit
        rgb = self.rgbs[i].astype(np.float32) / 255.0
        if require_gt:
            out_depth = depth.copy()
            out_depth[~hit] = -2.0
        else:
            out_depth, _ = self.apply_sensor_model(depth, self.rng)
        return {
            "extrinsic": jnp.asarray(self.poses[i]),
            "intrinsic": jnp.asarray(self.intrinsic),
            "rgb": jnp.asarray(rgb),
            "depth": jnp.asarray(out_depth[None]),
            "depth_range": jnp.asarray(self.depth_range, jnp.float32),
        }
