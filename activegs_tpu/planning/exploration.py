"""Exploration planner: visible-unexplored-voxel utility only
(`planning/exploration.py:12-91`)."""

from __future__ import annotations

from .confidence import candidate_utilities
from .planner import PlanBase


class ExplorationPlanner(PlanBase):
    def cal_utility(self, gm_state, vstate, grid, candidates, simulator):
        # shares the confidence planner's machinery (measured entry budget,
        # mesh-sharded candidate renders) with the exploitation term
        # statically skipped — exploration missions pay the same optimized
        # cost profile
        explore, _, t = candidate_utilities(
            self, gm_state, vstate, grid, candidates, simulator, explore_only=True
        )
        return explore, t
