"""Simulator seam: the dataframe contract of the habitat adapter.

The whole mapper/planner stack consumes only this dict
(`simulator/habitat_simulator.py:128-134`):
  {extrinsic (4,4) OpenCV c2w, intrinsic (3,3) normalized, rgb (3,H,W),
   depth (1,H,W) with sentinels, depth_range (2,)}
with depth semantics: -1 = out of sensor range, -2 = missing surface, and
(for mapping frames) proportional gaussian noise sigma = depth_noise_co * d
(`habitat_simulator.py:110-126`).
"""

from __future__ import annotations

import numpy as np


class SimulatorBase:
    scene_name: str = "unknown"
    has_missing_surface: bool = False
    resolution: np.ndarray  # (2,) H, W
    intrinsic: np.ndarray  # (3, 3) normalized
    depth_range: tuple[float, float]
    bbox: np.ndarray  # (2, 3) scene bounds
    depth_noise_co: float = 0.01

    def simulate(self, c2w, valid_mask_only: bool = False, require_gt: bool = False):
        raise NotImplementedError

    def apply_sensor_model(self, depth: np.ndarray, rng: np.random.Generator):
        """Noise + range sentinels (`habitat_simulator.py:110-126`)."""
        valid = depth > 0  # missing surface rendered as depth <= 0
        lo, hi = self.depth_range
        in_range = (depth > lo) & (depth < hi)
        noisy = depth + rng.normal(scale=np.abs(depth) * self.depth_noise_co)
        noisy[~in_range] = -1.0
        noisy[~valid] = -2.0
        return noisy, valid
