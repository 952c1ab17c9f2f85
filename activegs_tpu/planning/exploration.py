"""Exploration planner: visible-unexplored-voxel utility only
(`planning/exploration.py`)."""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from .confidence import _confidence_utility_batch
from .planner import PlanBase


class ExplorationPlanner(PlanBase):
    def cal_utility(self, gm_state, vstate, grid, candidates, simulator):
        h, w = (
            int(round(self.cfg.render_ratio * r)) for r in simulator.resolution
        )
        valid_masks, _ = self._candidate_valid_masks(candidates, simulator, (h, w))
        t0 = time.time()
        explore, _ = _confidence_utility_batch(
            gm_state,
            vstate.unexplored,
            jnp.asarray(candidates),
            jnp.asarray(simulator.intrinsic),
            jnp.asarray(valid_masks),
            jnp.asarray(simulator.depth_range, jnp.float32),
            grid,
            (h, w),
            self.map_cfg,
            self.utility_raster_cfg,
        )
        return np.asarray(explore), time.time() - t0
