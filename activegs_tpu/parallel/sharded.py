"""Multi-device execution: shard the view axis over a device mesh.

The reference is single-GPU with a serial per-view render loop (SURVEY
§2.2); the TPU-native scaling axis is views (8 training views, ~100 planner
candidate views): each device renders its view shard with the full
replicated gaussian state, and per-parameter gradients / per-view utilities
are combined with `psum`/all-gather over ICI. Implemented with
`jax.shard_map` so the same code runs on a virtual CPU mesh in tests
(SURVEY §4) and on real pods.

Wiring: `IncrementalMapper` passes a mesh to `trainer.train_keyframe`
(training-view data parallelism) and `PlanBase.mesh` routes
`ConfidencePlanner.cal_utility` through `sharded_candidate_utility`
whenever more than one device is visible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..mapping import gaussians as gm
from ..mapping.trainer import batch_loss
from ..render.types import Camera, RasterConfig

VIEW_AXIS = "view"


def make_view_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (VIEW_AXIS,))


def make_hybrid_view_mesh() -> Mesh:
    """View mesh spanning every host of a multi-host slice (after
    runtime.init_distributed), ordered ICI-major within DCN groups via
    `mesh_utils.create_hybrid_device_mesh` so neighbouring view shards sit
    on the same host and the psum tree reduces over ICI before touching
    DCN. Falls back to the flat single-host mesh."""
    if jax.process_count() > 1:
        try:
            from jax.experimental import mesh_utils

            dm = mesh_utils.create_hybrid_device_mesh(
                (jax.local_device_count(),), (jax.process_count(),)
            )
            return Mesh(dm.reshape(-1), (VIEW_AXIS,))
        except ValueError:
            # platforms whose devices carry no slice topology (multi-process
            # CPU runs, tests/test_multiprocess.py): for a 1-D view mesh the
            # DCN-aware layout IS process-major order — consecutive view
            # shards share a host, so the psum tree reduces intra-host first
            import numpy as np

            devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
            return Mesh(np.array(devs), (VIEW_AXIS,))
    return make_view_mesh()


def sharded_train_step(
    params: dict,
    state: gm.GaussianMapState,
    batch: tuple,
    mesh: Mesh,
    cfg: gm.MapConfig,
    raster_cfg: RasterConfig,
    bins=None,
    subsets=None,
):
    """One data-parallel loss+grad evaluation: the view batch is sharded
    over the mesh, gaussian parameters are replicated, and gradients are
    psum-reduced over ICI (overlapping with backward under XLA latency
    hiding). `bins` optionally carries per-view frozen BinResults and
    `subsets` per-view compaction indices (renderer.compact_in_view),
    stacked over the view axis (both sharded alongside the batch).
    Returns (loss, grads, per_frame_errors)."""
    view_spec = lambda x: P() if x is None else jax.tree.map(
        lambda _: P(VIEW_AXIS), x
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(),
            (P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS)),
            view_spec(bins),
            view_spec(subsets),
        ),
        out_specs=(P(), P(), P(VIEW_AXIS)),
        check_vma=False,  # binning's scatter loops carry device-invariant inits
    )
    def step(params, state, batch, bins, subsets):
        n_total = batch[0].shape[0] * jax.lax.psum(1, VIEW_AXIS)
        n_local = batch[0].shape[0]

        def local_loss(p):
            loss, per_frame = batch_loss(
                p, state, batch, cfg, raster_cfg, bins, subsets
            )
            # batch_loss averages over local views; rescale so the psum of
            # local losses equals the global mean
            return loss * (n_local / n_total), per_frame

        (loss, per_frame), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params
        )
        loss = jax.lax.psum(loss, VIEW_AXIS)
        grads = jax.lax.psum(grads, VIEW_AXIS)
        return loss, grads, per_frame

    return step(params, state, batch, bins, subsets)


def sharded_view_bins(
    attrs,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    mesh: Mesh,
    shape: tuple[int, int],
    raster_cfg: RasterConfig,
):
    """Per-view frozen tile binning, sharded over the view axis. Returns a
    BinResult pytree with a leading (V,) axis (sharded)."""
    from ..render.renderer import prepare_view_bins

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(VIEW_AXIS), P(VIEW_AXIS)),
        out_specs=P(VIEW_AXIS),
        check_vma=False,
    )
    def run(attrs, exts, intrs):
        return jax.lax.map(
            lambda c: prepare_view_bins(
                attrs, Camera(extrinsic=c[0], intrinsic=c[1]), shape, raster_cfg
            ),
            (exts, intrs),
        )

    return run(attrs, extrinsics, intrinsics)


def sharded_candidate_utility(
    gm_state: gm.GaussianMapState,
    unexplored: jnp.ndarray,
    candidates: jnp.ndarray,  # (V, 4, 4), V divisible by mesh size
    intrinsic: jnp.ndarray,
    valid_masks: jnp.ndarray,  # (V, h, w) bool
    depth_range: jnp.ndarray,
    mesh: Mesh,
    grid,
    shape: tuple[int, int],
    map_cfg: gm.MapConfig,
    raster_cfg: RasterConfig,
    entry_budget: int | None = None,
    explore_only: bool = False,
    subset_bucket: int | None = None,
):
    """Planner candidate utilities sharded over devices: the per-view
    statistics are `planning.confidence.candidate_view_stats` (the SAME
    function the single-device batch uses, so the paths can never diverge)
    with candidates split over the mesh. Returns (explore (V,),
    exploit (V,))."""
    # lazy import: planning.confidence imports this module inside methods,
    # so a module-level import here would be a cycle
    from ..planning.confidence import candidate_view_stats
    from ..render.renderer import pack_attrs

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(VIEW_AXIS), P(), P(VIEW_AXIS), P()),
        out_specs=(P(VIEW_AXIS), P(VIEW_AXIS)),
        check_vma=False,
    )
    def run(gm_state, unexplored, cands, intrinsic, valid_masks, depth_range):
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

        explore, exploit = jax.lax.map(one, (cands, valid_masks))
        explore = jnp.where(jnp.isnan(explore), 0.0, explore)
        exploit = jnp.where(jnp.isnan(exploit), 0.0, exploit)
        return explore, exploit

    return run(gm_state, unexplored, candidates, intrinsic, valid_masks, depth_range)
