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
    """(max binned entry count, max in-view count) over the candidate views
    (preprocess + span sums, no sort) — read on the host to pick the static
    utility-render entry budget and subset bucket, so the 100-candidate
    batch never bins at the `entry_budget_mult * capacity` default and each
    candidate render compacts to what it sees."""
    from ..render import binning as rb
    from ..render import preprocess as rp

    attrs = gm.attrs_of(gm_state, map_cfg)
    h, w = shape

    def one(ext):
        p2d, _, _, iv = rp.preprocess(
            attrs, Camera(extrinsic=ext, intrinsic=intrinsic), (h, w), raster_cfg
        )
        return (
            rb.entry_count(p2d, iv, (h, w), raster_cfg),
            jnp.sum(iv.astype(jnp.int32)),
        )

    ents, ivs = jax.lax.map(one, candidates)
    return jnp.max(ents), jnp.max(ivs)


def candidate_view_stats(
    attrs,
    extrinsic,
    intrinsic,
    valid,
    unexplored,
    depth_range,
    grid,
    shape,
    raster_cfg,
    entry_budget,
    explore_only: bool,
    subset_bucket: int | None = None,
    packed=None,
):
    """(explore, exploit) statistics for ONE candidate view — the
    visible-and-unexplored voxel fraction (`confidence.py:44-103`,
    `exploration.py:12-91`) and the distance-aware uncertainty. Shared by
    the batched and the mesh-sharded paths so they can never diverge;
    `explore_only` (ExplorationPlanner) skips the exploitation term.

    `subset_bucket` (static, measured via `_candidate_entry_stats`)
    compacts the render to the candidate's in-view set (exact — out-of-view
    gaussians contribute nothing): per-index binning/gather costs then
    scale with what the candidate SEES instead of the capacity bucket,
    measured 8.55 -> 1.83 ms/candidate at mission scale
    (scripts/profile_planner.py). `packed` carries pack_attrs(attrs)
    hoisted out of the candidate loop."""
    cam = Camera(extrinsic=extrinsic, intrinsic=intrinsic)
    if subset_bucket is not None:
        from ..render import preprocess as rp
        from ..render.renderer import compact_in_view, subset_view

        _, _, _, iv = rp.preprocess(attrs, cam, shape, raster_cfg)
        sel, selv, inv, _n = compact_in_view(iv, subset_bucket)
        attrs = subset_view(packed, (sel, selv, inv))
    out, _ = render_view(
        attrs,
        cam,
        shape,
        raster_cfg,
        entry_budget=entry_budget,
    )
    depth = out.depth[0]

    # exploration: visible-and-unexplored voxel fraction
    depth_voxel = jnp.where(depth < 0.001, 1e4, depth)
    depth_voxel = jnp.clip(depth_voxel, depth_range[0], depth_range[1])
    depth_voxel = jnp.where(valid, depth_voxel, -1.0)
    visible = vm.visible_mask(None, grid, extrinsic, intrinsic, depth_voxel)
    explore = jnp.sum(visible & unexplored) / grid.num_voxels
    if explore_only:
        return explore, jnp.zeros_like(explore)

    # exploitation: distance-aware uncertainty
    conf = out.confidence[0]
    conf = jnp.where(depth > depth_range[1], 1.0, conf)
    conf = jnp.where(valid, conf, 1.0)
    uncertainty = 1.0 - conf
    depth_surface = jnp.where(depth < 0.001, depth_range[1] * 0.5, depth)
    exploit = jnp.mean(uncertainty * depth_surface / depth_range[1])
    return explore, exploit


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid",
        "shape",
        "map_cfg",
        "raster_cfg",
        "entry_budget",
        "explore_only",
        "subset_bucket",
    ),
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
    explore_only=False,
    subset_bucket=None,
):
    """Per-candidate (explore, exploit) utilities (`confidence.py:44-103`)."""
    from ..render.renderer import pack_attrs

    attrs = gm.attrs_of(gm_state, map_cfg)
    packed = pack_attrs(attrs) if subset_bucket is not None else None

    def one(args):
        extrinsic, valid = args
        return candidate_view_stats(
            attrs,
            extrinsic,
            intrinsic,
            valid,
            unexplored,
            depth_range,
            grid,
            shape,
            raster_cfg,
            entry_budget,
            explore_only,
            subset_bucket,
            packed,
        )

    explore, exploit = jax.lax.map(one, (candidates, valid_masks))
    explore = jnp.where(jnp.isnan(explore), 0.0, explore)
    exploit = jnp.where(jnp.isnan(exploit), 0.0, exploit)
    return explore, exploit


def candidate_utilities(
    planner: PlanBase, gm_state, vstate, grid, candidates, simulator, explore_only
):
    """Candidate (explore, exploit) utilities with the measured entry
    budget and the mesh-sharded path when a device mesh is available —
    shared by ConfidencePlanner and ExplorationPlanner so both pay the
    optimized cost profile. Returns (explore, exploit, seconds)."""
    h, w = (
        int(round(planner.cfg.render_ratio * r)) for r in simulator.resolution
    )
    valid_masks, _t_sim = planner._candidate_valid_masks(
        candidates, simulator, (h, w)
    )
    t0 = time.time()
    from ..mapping.trainer import pick_entry_bucket, pick_subset_bucket

    max_ents, max_iv = (
        int(x)
        for x in _candidate_entry_stats(
            gm_state,
            jnp.asarray(candidates),
            jnp.asarray(simulator.intrinsic),
            (h, w),
            planner.map_cfg,
            planner.utility_raster_cfg,
        )
    )
    entry_budget = pick_entry_bucket(max_ents)
    subset_bucket = pick_subset_bucket(max_iv, gm_state.capacity)
    t_stats = time.time() - t0
    if planner.mesh is not None:
        from ..parallel.sharded import sharded_candidate_utility

        n = len(candidates)
        n_dev = planner.mesh.devices.size
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
            planner.mesh,
            grid,
            (h, w),
            planner.map_cfg,
            planner.utility_raster_cfg,
            entry_budget=entry_budget,
            explore_only=explore_only,
            subset_bucket=subset_bucket,
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
            planner.map_cfg,
            planner.utility_raster_cfg,
            entry_budget=entry_budget,
            explore_only=explore_only,
            subset_bucket=subset_bucket,
        )
    explore, exploit = np.asarray(explore), np.asarray(exploit)
    t = time.time() - t0
    # sub-phase telemetry (merged into step_stats plan_times by plan())
    planner.last_utility_times = {
        "stats": round(t_stats, 3),
        "batch": round(t - t_stats, 3),
    }
    return explore, exploit, t


class ConfidencePlanner(PlanBase):
    """utility = explore_weight * explore + exploit (`confidence.py:105-108`)."""

    def cal_utility(self, gm_state, vstate, grid, candidates, simulator):
        explore, exploit, t = candidate_utilities(
            self, gm_state, vstate, grid, candidates, simulator, explore_only=False
        )
        utility = self.cfg.explore_weight * explore + exploit
        return utility, t
