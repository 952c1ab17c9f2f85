"""Confidence planner: exploration + distance-aware uncertainty utility.

`planning/confidence.py` re-designed TPU-first: all candidate views render
in ONE jitted batched program (`lax.map` over candidates at quarter
resolution) fused with the voxel-visibility projection, instead of the
reference's per-candidate Python loop (100 CUDA launches + per-view host
sync, `confidence.py:39-103`).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..mapping import gaussians as gm
from ..mapping import voxel_map as vm
from ..render.renderer import render_view
from ..render.types import Camera
from .planner import PlanBase


@functools.partial(
    jax.jit, static_argnames=("shape", "map_cfg", "raster_cfg")
)
def _candidate_entry_stats(
    gm_state, candidates, intrinsic, shape, map_cfg, raster_cfg
):
    """Max binned entry count over the candidate views (preprocess + span
    sums, no sort) — read on the host to pick the static utility-render
    entry budget so the 100-candidate batch never bins at the
    `entry_budget_mult * capacity` default."""
    from ..render import binning as rb
    from ..render import preprocess as rp

    attrs = gm.attrs_of(gm_state, map_cfg)
    h, w = shape

    def one(ext):
        p2d, _, _, iv = rp.preprocess(
            attrs, Camera(extrinsic=ext, intrinsic=intrinsic), (h, w), raster_cfg
        )
        return rb.entry_count(p2d, iv, (h, w), raster_cfg)

    return jnp.max(jax.lax.map(one, candidates))


@functools.partial(
    jax.jit,
    static_argnames=("grid", "shape", "map_cfg", "raster_cfg", "entry_budget"),
)
def _confidence_utility_batch(
    gm_state,
    unexplored,
    candidates,
    intrinsic,
    valid_masks,
    depth_range,
    grid,
    shape,
    map_cfg,
    raster_cfg,
    entry_budget=None,
):
    """Per-candidate (explore, exploit) utilities (`confidence.py:44-103`)."""
    attrs = gm.attrs_of(gm_state, map_cfg)
    h, w = shape
    num_voxels = grid.num_voxels

    def one(args):
        extrinsic, valid = args
        out, _ = render_view(
            attrs,
            Camera(extrinsic=extrinsic, intrinsic=intrinsic),
            shape,
            raster_cfg,
            entry_budget=entry_budget,
        )
        depth = out.depth[0]
        conf = out.confidence[0]

        # exploration: visible-and-unexplored voxel fraction
        depth_voxel = jnp.where(depth < 0.001, 1e4, depth)
        depth_voxel = jnp.clip(depth_voxel, depth_range[0], depth_range[1])
        depth_voxel = jnp.where(valid, depth_voxel, -1.0)
        visible = vm.visible_mask(None, grid, extrinsic, intrinsic, depth_voxel)
        explore = jnp.sum(visible & unexplored) / num_voxels

        # exploitation: distance-aware uncertainty
        conf = jnp.where(depth > depth_range[1], 1.0, conf)
        conf = jnp.where(valid, conf, 1.0)
        uncertainty = 1.0 - conf
        depth_surface = jnp.where(depth < 0.001, depth_range[1] * 0.5, depth)
        exploit = jnp.mean(uncertainty * depth_surface / depth_range[1])
        return explore, exploit

    explore, exploit = jax.lax.map(one, (candidates, valid_masks))
    explore = jnp.where(jnp.isnan(explore), 0.0, explore)
    exploit = jnp.where(jnp.isnan(exploit), 0.0, exploit)
    return explore, exploit


class ConfidencePlanner(PlanBase):
    """utility = explore_weight * explore + exploit (`confidence.py:105-108`)."""

    def cal_utility(self, gm_state, vstate, grid, candidates, simulator):
        h, w = (
            int(round(self.cfg.render_ratio * r)) for r in simulator.resolution
        )
        valid_masks, t_sim = self._candidate_valid_masks(
            candidates, simulator, (h, w)
        )
        t0 = time.time()
        from ..mapping.trainer import pick_entry_bucket

        max_ents = int(
            _candidate_entry_stats(
                gm_state,
                jnp.asarray(candidates),
                jnp.asarray(simulator.intrinsic),
                (h, w),
                self.map_cfg,
                self.utility_raster_cfg,
            )
        )
        entry_budget = pick_entry_bucket(max_ents)
        if self.mesh is not None:
            from ..parallel.sharded import sharded_candidate_utility

            n = len(candidates)
            n_dev = self.mesh.devices.size
            pad = (-n) % n_dev  # pad to a full shard (repeat last candidate)
            cands = np.concatenate([candidates, np.repeat(candidates[-1:], pad, 0)])
            masks = np.concatenate([valid_masks, np.repeat(valid_masks[-1:], pad, 0)])
            explore, exploit = sharded_candidate_utility(
                gm_state,
                vstate.unexplored,
                jnp.asarray(cands),
                jnp.asarray(simulator.intrinsic),
                jnp.asarray(masks),
                jnp.asarray(simulator.depth_range, jnp.float32),
                self.mesh,
                grid,
                (h, w),
                self.map_cfg,
                self.utility_raster_cfg,
                entry_budget=entry_budget,
            )
            explore, exploit = explore[:n], exploit[:n]
        else:
            explore, exploit = _confidence_utility_batch(
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
                entry_budget=entry_budget,
            )
        utility = self.cfg.explore_weight * np.asarray(explore) + np.asarray(exploit)
        return utility, time.time() - t0
