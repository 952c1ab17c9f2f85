"""Jitted training + post-processing for the Gaussian-surfel map.

The analog of `GaussianMap.train`/`post_processing`
(`mapping/gaussian_map.py:66-246`), restructured TPU-first: one jitted
`train_keyframe` runs the whole per-keyframe optimization (sampler draws,
batched renders, 4-term loss, per-group-LR Adam) as a `fori_loop`, and the
optimizer is re-created fresh every keyframe — deliberately, matching the
reference's re-init semantics (`gaussian_map.py:259-292`; moment reset per
keyframe is part of the algorithm, SURVEY §5).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from ..core.image_ops import depth_to_normal
from ..render.renderer import render_stats
from ..render.types import Camera, RasterConfig
from . import gaussians as gm
from . import keyframes as kf
from . import losses

PARAM_FIELDS = ("means", "scales_raw", "rotations_raw", "opacities_raw", "colors")


def _params_of(state: gm.GaussianMapState) -> dict:
    return {k: getattr(state, k) for k in PARAM_FIELDS}


def _with_params(state: gm.GaussianMapState, params: dict) -> gm.GaussianMapState:
    return dataclasses.replace(state, **params)


def make_optimizer(cfg: gm.MapConfig) -> optax.GradientTransformation:
    """Adam(eps=1e-15) with the reference's per-group learning rates
    (`gaussian_map.py:259-292`, `config/mapper/incremental.yaml:27-32`)."""
    lrs = {
        "means": cfg.mean_lr,
        "scales_raw": cfg.scale_lr,
        "rotations_raw": cfg.rotation_lr,
        "opacities_raw": cfg.opacity_lr,
        "colors": cfg.harmonic_lr,
    }

    def scale_by_group(updates, opt_state, params=None):
        del params
        return jax.tree.map_with_path(
            lambda path, u: u * lrs[path[0].key], updates
        ), opt_state

    group_lr = optax.GradientTransformation(lambda params: (), scale_by_group)
    return optax.chain(optax.scale_by_adam(eps=1e-15), group_lr, optax.scale(-1.0))


def _view_loss(o, rgb_gt, depth_gt, intrinsic):
    """Scalar loss terms for ONE view (the per-view decomposition of the
    4-term total, `gaussian_map.py:106-124`): every term of the batched loss
    is a mean over equally-sized views, so computing per-view means inside
    the render map and averaging them afterwards is numerically the same
    reduction — and the (V, 9, H, W) image stack (plus its backward
    dynamic-slice/update ops, ~4 ms/step on the bench trace) never
    materializes.

    The rgb/depth/consistency pixel maps are folded into TWO weighted
    (H, W) reductions (loss contribution + sampler error) instead of three
    separate means — same math (the weights of `gaussian_map.py:119-124`
    distribute over the sums), fewer reduce ops and backward broadcasts in
    the per-step tail (VERDICT r4 ask #5). Returns (loss_v, err_v) scalars:
    loss_v = rgb + 0.8 depth + 0.1 cons + 0.1 tv, err_v = rgb + depth."""
    h, w = rgb_gt.shape[-2:]
    mask_vis = jax.lax.stop_gradient(o.opacity) > 1e-3
    mask_depth = depth_gt > 0.0
    # per-pixel term maps, each already carrying its channel-mean factor
    rgb_px = jnp.sum(losses.l1_masked(o.rgb, rgb_gt, mask_vis), axis=0) / 3.0
    depth_px = losses.l1_masked(o.depth, depth_gt, mask_depth)[0]
    d2n = depth_to_normal(o.depth[0], mask_vis[0], intrinsic).transpose(2, 0, 1)
    cons_px = losses.consistency_loss(o.normal[None], d2n[None])[0] * mask_vis[0]
    tv = losses.normal_tv_loss(
        o.normal[None], jax.lax.stop_gradient(o.depth)[None], mask_depth[None]
    )
    inv_px = 1.0 / (h * w)
    loss_v = (
        jnp.sum(rgb_px + losses.W_DEPTH * depth_px + losses.W_CONS * cons_px)
        * inv_px
        + losses.W_TV * tv
    )
    err_v = jnp.sum(rgb_px + depth_px) * inv_px
    return loss_v, err_v


def batch_loss(
    params: dict,
    state: gm.GaussianMapState,
    batch: tuple,
    cfg: gm.MapConfig,
    raster_cfg: RasterConfig,
    bins=None,
    subsets=None,
):
    """4-term mapping loss over a view batch (`gaussian_map.py:106-124`).

    Returns (loss, per_frame_error) where per_frame_error drives the
    weighted sampler (`track_performance`, `gaussian_map.py:132-139`).

    `subsets` = (sels, sel_valids, invs) stacked over views (from
    renderer.compact_in_view against the frozen keyframe state): each view
    renders its compacted in-view gaussian bucket — exact under frozen bins
    and much cheaper in per-index work (entry gather / VJP / binning all
    scale with the bucket instead of the capacity).

    The loss is evaluated PER VIEW inside the render map (`_view_loss`) so
    only four scalars per view leave the loop.
    """
    rgb_gt, depth_gt, extrinsics, intrinsics = batch
    v, _, h, w = rgb_gt.shape
    if cfg.fused_view_kernel and not (subsets is not None and len(subsets) == 4):
        # the single-dispatch form needs the batched-subset layout (equal
        # per-view entry budgets from one combine plan); every other branch
        # silently fell back before — make the unsupported combination loud
        import warnings

        warnings.warn(
            "fused_view_kernel=True is only honored on the batched-subset "
            "path (subset_bucket set, single-device); falling back to "
            "per-view dispatch",
            stacklevel=2,
        )
    state = _with_params(state, params)
    attrs = gm.attrs_of(state, cfg)
    from ..render.renderer import (
        pack_attrs,
        render_view,
        subset_packed_batch,
        subset_view,
        unpack_attrs,
    )

    background = jnp.asarray(cfg.background)

    def view_map(fn, xs):
        """Map `fn` over the leading view axis. Unrolled as a Python loop
        (cfg.unroll_views): each view's backward residuals (entry streams,
        tile outputs) stay separate buffers instead of being stacked with
        per-view dynamic_update_slice ops (~3 ms/step on the bench trace).
        `lax.map` remains available for compile-time-sensitive paths."""
        if not cfg.unroll_views:
            return jax.lax.map(fn, xs)
        outs = [fn(jax.tree.map(lambda x: x[i], xs)) for i in range(v)]
        return jax.tree.map(lambda *ys: jnp.stack(ys), *outs)

    if subsets is not None and len(subsets) == 4:
        # batched subset: ONE gather for all views' compact buckets, and the
        # VJP combines all views' cotangents with the per-keyframe sort plan
        # (V*B + N gather indices per step instead of V*N — see
        # renderer.subset_packed_batch)
        sels, selvs, _invs, plan = subsets
        stacked = subset_packed_batch(pack_attrs(attrs), sels, selvs, plan)

        if cfg.fused_view_kernel:
            # all V views through ONE fwd + ONE bwd kernel dispatch
            # (renderer.render_views_batched). Measured SLOWER than the
            # unrolled per-view launches on the v5e bench (49.2 vs 56.2
            # Mrays/s, see MapConfig.fused_view_kernel); kept as an option
            from ..render.renderer import render_views_batched

            out, _aux = render_views_batched(
                [unpack_attrs(stacked[i]) for i in range(v)],
                [
                    Camera(extrinsic=extrinsics[i], intrinsic=intrinsics[i])
                    for i in range(v)
                ],
                (h, w),
                raster_cfg,
                background=background,
                bin_results=[jax.tree.map(lambda x: x[i], bins) for i in range(v)],
            )
            outs = [
                _view_loss(
                    jax.tree.map(lambda x: x[i], out),
                    rgb_gt[i],
                    depth_gt[i],
                    intrinsics[i],
                )
                for i in range(v)
            ]
            terms = jax.tree.map(lambda *ys: jnp.stack(ys), *outs)
        else:

            def one(args):
                ext, intr, b, rows, rgb_v, depth_v = args
                o, _aux = render_view(
                    unpack_attrs(rows),
                    Camera(extrinsic=ext, intrinsic=intr),
                    (h, w),
                    raster_cfg,
                    background=background,
                    bin_result=b,
                )
                return _view_loss(o, rgb_v, depth_v, intr)

            terms = view_map(
                one, (extrinsics, intrinsics, bins, stacked, rgb_gt, depth_gt)
            )
    elif subsets is not None:
        packed = pack_attrs(attrs)
        sels, selvs, invs = subsets

        def one(args):
            ext, intr, b, sel, selv, inv, rgb_v, depth_v = args
            attrs_v = subset_view(packed, (sel, selv, inv))
            o, _aux = render_view(
                attrs_v,
                Camera(extrinsic=ext, intrinsic=intr),
                (h, w),
                raster_cfg,
                background=background,
                bin_result=b,
            )
            return _view_loss(o, rgb_v, depth_v, intr)

        terms = view_map(
            one,
            (extrinsics, intrinsics, bins, sels, selvs, invs, rgb_gt, depth_gt),
        )
    else:

        def one_full(args):
            ext, intr, b, rgb_v, depth_v = args
            o, _aux = render_view(
                attrs,
                Camera(extrinsic=ext, intrinsic=intr),
                (h, w),
                raster_cfg,
                background=background,
                bin_result=b,
            )
            return _view_loss(o, rgb_v, depth_v, intr)

        def one_full_nobin(args):
            ext, intr, rgb_v, depth_v = args
            o, _aux = render_view(
                attrs,
                Camera(extrinsic=ext, intrinsic=intr),
                (h, w),
                raster_cfg,
                background=background,
            )
            return _view_loss(o, rgb_v, depth_v, intr)

        if bins is None:
            terms = view_map(
                one_full_nobin, (extrinsics, intrinsics, rgb_gt, depth_gt)
            )
        else:
            terms = view_map(
                one_full, (extrinsics, intrinsics, bins, rgb_gt, depth_gt)
            )

    loss_t, err_t = terms
    # view-mean of per-view weighted totals == the stacked-batch 4-term
    # total (equal view sizes; `losses.total_from_view_terms` is the
    # unfused reference form, pinned equal by tests/test_mapping.py)
    total = jnp.mean(loss_t)
    return total, jax.lax.stop_gradient(err_t)


@functools.partial(
    jax.jit, static_argnames=("cfg", "raster_cfg", "sampler")
)
def keyframe_view_stats(
    state: gm.GaussianMapState,
    buf: kf.KeyframeBuffer,
    key: jnp.ndarray,
    cfg: gm.MapConfig,
    raster_cfg: RasterConfig,
    sampler: str = "weighted",
):
    """(max in-view gaussian count, max binned entry count) over the batch
    that `train_keyframe` will sample with the SAME key — the mapper reads
    these on the host to pick the static per-view subset bucket and the
    static entry budget, so every per-index cost in the train step scales
    with what the views actually see/bin."""
    from ..render import binning as rb
    from ..render import preprocess as rp

    sample = kf.sample_weighted if sampler == "weighted" else kf.sample_uniform
    key, k1 = jax.random.split(key)
    ids = sample(buf, k1, cfg.batch_size, cfg.active_size)
    batch = kf.decode_frames(buf, ids)
    h, w = batch[0].shape[-2:]
    attrs0 = gm.attrs_of(state, cfg)

    def one(c):
        p2d, _, _, iv = rp.preprocess(
            attrs0, Camera(extrinsic=c[0], intrinsic=c[1]), (h, w), raster_cfg
        )
        n_entries = rb.entry_count(p2d, iv, (h, w), raster_cfg)
        return jnp.sum(iv.astype(jnp.int32)), n_entries

    ivs, ents = jax.lax.map(one, (batch[2], batch[3]))
    return jnp.max(ivs), jnp.max(ents)


def _half_step_bucket(need: int, min_bucket: int) -> int:
    """Smallest bucket >= need on the {p2, 1.5*p2} ladder (16384, 24576,
    32768, 49152, ...). Per-index costs (entry/subset gathers, their VJP
    combines, zero-fill DMA) scale with the BUCKET, not the live count; the
    half steps cap padding waste at 25% instead of 50% while keeping the
    number of distinct compiled programs logarithmic. Every rung is a
    multiple of 128 for power-of-two min_bucket >= 256 (Mosaic lane-aligned
    DMA slices; a non-power-of-two min_bucket would break this — e.g. 320
    yields rung 480)."""
    assert min_bucket & (min_bucket - 1) == 0, "min_bucket must be a power of two"
    b = min_bucket
    while b < need:
        if b + b // 2 >= need:
            return b + b // 2
        b *= 2
    return b


def pick_subset_bucket(
    max_count: int, capacity: int, min_bucket: int = 8192
) -> int | None:
    """Per-view subset bucket on the half-step ladder, or None when
    compaction would not shrink the problem (bucket ~ capacity)."""
    b = _half_step_bucket(max_count, min_bucket)
    return None if b * 2 > capacity else b


def pick_entry_bucket(max_entries: int, min_bucket: int = 16384) -> int:
    """Entry budget covering the measured per-view binned entry count (zero
    budget drops by construction), on the half-step bucket ladder."""
    return _half_step_bucket(max_entries, min_bucket)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "raster_cfg",
        "steps",
        "sampler",
        "mesh",
        "subset_bucket",
        "entry_budget",
    ),
)
def train_keyframe(
    state: gm.GaussianMapState,
    buf: kf.KeyframeBuffer,
    key: jnp.ndarray,
    cfg: gm.MapConfig,
    raster_cfg: RasterConfig,
    steps: int | None = None,
    sampler: str = "weighted",
    mesh=None,
    subset_bucket: int | None = None,
    entry_budget: int | None = None,
):
    """Run the per-keyframe optimization (`GaussianMap.train`,
    `gaussian_map.py:66-130`): fresh Adam, `steps` iterations of
    render-batch -> loss -> update.

    TPU-first deviation: the view batch is sampled ONCE per keyframe and
    its tile binning is frozen across the steps (binning carries no
    gradient and screen positions move negligibly within a keyframe),
    instead of the reference's per-step resampling + per-launch re-sort.
    Set cfg.resample_per_step=True for reference-faithful behavior.

    With `mesh` (a jax.sharding.Mesh over the "view" axis), the view batch
    and its frozen bins are sharded over devices and gradients psum-reduce
    over ICI (parallel/sharded.py); results are numerically identical to
    the single-device path. Returns (state, buf, loss, aux) with aux["num_dropped"]
    summing binning drop counters over the frozen view batch."""
    steps = cfg.optimization_steps if steps is None else steps
    opt = make_optimizer(cfg)
    params = _params_of(state)
    opt_state = opt.init(params)
    sample = kf.sample_weighted if sampler == "weighted" else kf.sample_uniform

    if not cfg.resample_per_step:
        key, k1 = jax.random.split(key)
        ids = sample(buf, k1, cfg.batch_size, cfg.active_size)
        batch = kf.decode_frames(buf, ids)
        h, w = batch[0].shape[-2:]
        attrs0 = gm.attrs_of(state, cfg)

        from ..render import preprocess as rp
        from ..render.renderer import (
            compact_in_view,
            pack_attrs,
            prepare_view_bins,
            subset_view,
        )
        from ..render.types import Camera

        if subset_bucket is not None:
            packed0 = pack_attrs(attrs0)

            def prep_one(c):
                cam = Camera(extrinsic=c[0], intrinsic=c[1])
                _, _, _, iv = rp.preprocess(attrs0, cam, (h, w), raster_cfg)
                sel, selv, inv, _n = compact_in_view(iv, subset_bucket)
                attrs_v = subset_view(packed0, (sel, selv, inv))
                bins_v = prepare_view_bins(
                    attrs_v, cam, (h, w), raster_cfg, entry_budget=entry_budget
                )
                return sel, selv, inv, bins_v

            def prep_views(exts, intrs):
                return jax.lax.map(prep_one, (exts, intrs))

            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                from ..parallel.sharded import VIEW_AXIS

                prep_views = jax.shard_map(
                    prep_views,
                    mesh=mesh,
                    in_specs=(P(VIEW_AXIS), P(VIEW_AXIS)),
                    out_specs=P(VIEW_AXIS),
                    check_vma=False,
                )
            sels, selvs, invs, bins = prep_views(batch[2], batch[3])
            if mesh is None:
                from ..render.renderer import build_combine_plan

                plan = build_combine_plan(sels, selvs, invs, attrs0.num)
                subsets = (sels, selvs, invs, plan)
            else:
                # the sharded path keeps per-view expansion: each device owns
                # its local views and grads psum over the mesh
                subsets = (sels, selvs, invs)
        else:
            subsets = None
            if mesh is not None:
                from ..parallel import sharded

                bins = sharded.sharded_view_bins(
                    attrs0, batch[2], batch[3], mesh, (h, w), raster_cfg
                )
            else:
                bins = jax.lax.map(
                    lambda c: prepare_view_bins(
                        attrs0,
                        Camera(extrinsic=c[0], intrinsic=c[1]),
                        (h, w),
                        raster_cfg,
                        entry_budget=entry_budget,
                    ),
                    (batch[2], batch[3]),
                )

        # loop-carry ONLY the (F,) performance array, not the whole buffer:
        # the frame tensors are read-only inside the loop (batch is decoded
        # above) and a (F, 3, H, W) carry invites XLA to keep ~1 GB of
        # mission-scale buffer state live through every unrolled step
        if mesh is not None:
            from ..parallel import sharded

            def body(i, carry):
                params, opt_state, perf, _ = carry
                loss, grads, per_frame = sharded.sharded_train_step(
                    params, state, batch, mesh, cfg, raster_cfg, bins, subsets
                )
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                perf = perf.at[ids].set(per_frame)
                return params, opt_state, perf, loss

        else:

            def body(i, carry):
                params, opt_state, perf, _ = carry
                (loss, per_frame), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(params, state, batch, cfg, raster_cfg, bins, subsets)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                perf = perf.at[ids].set(per_frame)
                return params, opt_state, perf, loss

        params, opt_state, perf, last_loss = jax.lax.fori_loop(
            0, steps, body, (params, opt_state, buf.performance, jnp.float32(0.0))
        )
        buf = dataclasses.replace(buf, performance=perf)
        aux = {
            "num_dropped": jnp.sum(bins.num_dropped),
            # real (unpadded) entries actually binned across the view batch —
            # the denominator for the truncation-fraction telemetry
            "num_entries": jnp.sum(bins.tile_len),
        }
        return _with_params(state, params), buf, last_loss, aux

    def body(i, carry):
        params, opt_state, perf, key, _ = carry
        key, k1 = jax.random.split(key)
        buf_i = dataclasses.replace(buf, performance=perf)
        ids = sample(buf_i, k1, cfg.batch_size, cfg.active_size)
        batch = kf.decode_frames(buf, ids)
        (loss, per_frame), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            params, state, batch, cfg, raster_cfg
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        perf = perf.at[ids].set(per_frame)
        return params, opt_state, perf, key, loss

    params, opt_state, perf, key, last_loss = jax.lax.fori_loop(
        0, steps, body, (params, opt_state, buf.performance, key, jnp.float32(0.0))
    )
    buf = dataclasses.replace(buf, performance=perf)
    # per-step re-binning: drop counter not tracked on this path
    aux = {"num_dropped": jnp.int32(-1), "num_entries": jnp.int32(-1)}
    return _with_params(state, params), buf, last_loss, aux


@functools.partial(
    jax.jit, static_argnames=("cfg", "raster_cfg", "require_prune")
)
def stats_view_budgets(
    state: gm.GaussianMapState,
    buf: kf.KeyframeBuffer,
    cfg: gm.MapConfig,
    raster_cfg: RasterConfig,
    require_prune: bool,
):
    """(max front-facing in-view count, max binned entry count) over the
    keyframes `post_process` will stats-render (the latest one, or ALL of
    them on prune keyframes) — read on the host to pick the static stats
    subset bucket / entry budget. Cheap: preprocess + span sums, no sort."""
    from ..render import binning as rb
    from ..render import preprocess as rp

    h, w = buf.rgb.shape[-2:]
    attrs0 = gm.attrs_of(state, cfg)

    def one(i):
        _, _, ext, intr = kf.decode_frames(buf, i[None])
        p2d, _, _, iv = rp.preprocess(
            attrs0,
            Camera(extrinsic=ext[0], intrinsic=intr[0]),
            (h, w),
            raster_cfg,
            front_only=True,
        )
        return jnp.sum(iv.astype(jnp.int32)), rb.entry_count(
            p2d, iv, (h, w), raster_cfg
        )

    if not require_prune:
        return one(jnp.maximum(buf.count - 1, 0))

    def body(i, carry):
        mx_iv, mx_e = carry
        iv, e = one(i)
        return jnp.maximum(mx_iv, iv), jnp.maximum(mx_e, e)

    return jax.lax.fori_loop(0, buf.count, body, (jnp.int32(0), jnp.int32(0)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "raster_cfg",
        "require_prune",
        "stats_bucket",
        "stats_entry_budget",
    ),
)
def post_process(
    state: gm.GaussianMapState,
    buf: kf.KeyframeBuffer,
    depth_far: jnp.ndarray,
    cfg: gm.MapConfig,
    raster_cfg: RasterConfig,
    require_prune: bool,
    stats_bucket: int | None = None,
    stats_entry_budget: int | None = None,
):
    """Confidence statistics + periodic pruning (`post_processing`,
    `gaussian_map.py:141-246`): stats-render the latest keyframe
    (front-only, render_mask = depth>0) to find visible gaussians, update
    Welford view statistics; every `prune_interval` keyframes, accumulate
    visibility over ALL keyframes and prune never-visible or transparent
    gaussians. Returns (state, n_pruned).

    `stats_bucket`/`stats_entry_budget` (static, from `stats_view_budgets`)
    compact each stats render to its in-view subset and bound its entry
    stream — exact, and the per-index/zero-fill costs scale with what the
    keyframes see instead of the capacity bucket."""
    attrs = gm.attrs_of(state, cfg)
    latest = jnp.maximum(buf.count - 1, 0)
    h, w = buf.rgb.shape[-2:]

    def stats_for(i):
        _, depth, ext, intr = kf.decode_frames(buf, i[None])
        cam = Camera(extrinsic=ext[0], intrinsic=intr[0])
        mask = (depth[0, 0] > 0.0).astype(jnp.float32)
        return render_stats(
            attrs,
            cam,
            (h, w),
            raster_cfg,
            render_mask=mask,
            front_only=True,
            subset_bucket=stats_bucket,
            entry_budget=stats_entry_budget,
        )

    _, cnt_latest = stats_for(latest)
    cam_pos = buf.extrinsics[latest][:3, 3]
    state = gm.update_confidence(state, cfg, cam_pos, depth_far, cnt_latest)

    n_pruned = jnp.int32(0)
    if require_prune:
        def body(i, vis_any):
            _, cnt = stats_for(i)
            return vis_any | (cnt >= 1)

        vis_any = jax.lax.fori_loop(
            0, buf.count, body, jnp.zeros((state.capacity,), bool)
        )
        state, n_pruned = gm.prune(state, cfg, vis_any)
    return state, n_pruned
