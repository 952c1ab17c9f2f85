"""Random planner baseline (`planning/random.py`): uniform utilities."""

from __future__ import annotations

import numpy as np

from .planner import PlanBase


class RandomPlanner(PlanBase):
    def cal_utility(self, gm_state, vstate, grid, candidates, simulator):
        return self.rng.uniform(size=len(candidates)), 0.0
