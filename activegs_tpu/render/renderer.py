"""Public rendering API: the TPU analog of `GaussianRenderer`
(`utils/operations.py:723-904`).

`render_view` renders one posed view with the full channel set; callers
batch over views by mapping or unrolling it (`trainer.batch_loss`) — each
view's render saturates the chip and keeps the entry buffers single-view
sized — instead of the reference's Python loop over CUDA launches
(`utils/operations.py:853-892`). Multi-device sharding over the view axis
lives in parallel/ and simply shards the mapped axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import binning, composite_pallas as cp, preprocess as pp
from .types import (
    Camera,
    GaussianAttrs,
    RasterConfig,
    RenderOutput,
)


# NOTE (measured, do not retry blindly): padding entry rows to a 128-lane
# row-major (E, 128) seam to skip the (E, 24) -> (24, E) relayouts was
# SLOWER end-to-end (37.6 -> 33.9 Mrays/s): DMA/VMEM inflation + in-kernel
# 128-lane register pressure outweigh the transposes.


def _tile_grid(image_shape, cfg: RasterConfig):
    """Kernel PROGRAM grid (one program per tile_h x tile_w region)."""
    h, w = image_shape
    ntx = -(-w // cfg.tile_w)
    nty = -(-h // cfg.tile_h)
    return ntx, nty


def _kernel_static(image_shape, cfg: RasterConfig):
    """(num_programs, kernel_ntx): the compositor grid size and width."""
    ntx, nty = _tile_grid(image_shape, cfg)
    return ntx * nty, ntx


def _tiles_to_image(out_tiles: jnp.ndarray, image_shape, cfg: RasterConfig):
    """(T, C, P) tile-major output -> (C, h, w) image."""
    h, w = image_shape
    th, tw, ntx, nty = binning.bin_tile_dims(image_shape, cfg)
    c = out_tiles.shape[1]
    img = out_tiles.reshape(nty, ntx, c, th, tw)
    img = img.transpose(2, 0, 3, 1, 4).reshape(c, nty * th, ntx * tw)
    return img[:, :h, :w]


def _image_to_tiles(img: jnp.ndarray, image_shape, cfg: RasterConfig, rows: int):
    """(h, w) mask -> (T, rows, P) tile-major layout (row 0 real, rest
    pad)."""
    h, w = image_shape
    th, tw, ntx, nty = binning.bin_tile_dims(image_shape, cfg)
    pad_h = nty * th - h
    pad_w = ntx * tw - w
    m = jnp.pad(img.astype(jnp.float32), ((0, pad_h), (0, pad_w)))
    m = m.reshape(nty, th, ntx, tw).transpose(0, 2, 1, 3)
    m = m.reshape(nty * ntx, 1, th * tw)
    return jnp.concatenate([m, jnp.zeros_like(m).repeat(rows - 1, 1)], axis=1)


def prepare_view_bins(
    attrs: GaussianAttrs,
    camera: Camera,
    image_shape: tuple[int, int],
    cfg: RasterConfig = RasterConfig(),
    front_only: bool = False,
    with_inverse: bool = True,
    entry_budget: int | None = None,
) -> binning.BinResult:
    """Compute the per-tile entry lists for a view (non-differentiable).

    Binning only needs screen positions/radii/depth order, which move
    negligibly within one keyframe's optimization steps — the trainer bins
    each sampled view ONCE per keyframe and re-renders with frozen bins
    (the CUDA reference re-sorts every launch; the indices carry no
    gradient either way, `operations.py:853-892`)."""
    params2d, radius, depth_z, in_view = pp.preprocess(
        attrs, camera, image_shape, cfg, front_only=front_only
    )
    sg = jax.lax.stop_gradient
    return binning.bin_entries(
        sg(params2d),
        sg(depth_z),
        in_view,
        image_shape,
        cfg,
        with_inverse=with_inverse,
        entry_budget=entry_budget,
    )


# XLA TPU's gather fast path falls off a cliff by source ROW COUNT per
# dtype: f32 sources measured 0.38 ms at (200000, 16) but 2.56 ms at
# (245760, 16) for the same 262k indices; uint16 rows of the same bytes
# stay on the fast path to 2x the rows (0.66 ms at 262144 but 3.15 ms at
# 524288), and uint8 to 4x (1.60 ms at 524288). Below each cliff the
# narrower detour only adds bitcast relayout cost (plain f32 is 0.05 ms
# at (130560, 24) where u16 is 0.42), so pick the widest element type
# whose cliff the source clears.
_U16_GATHER_MIN_ROWS = 200_001
_U8_GATHER_MIN_ROWS = 2 * _U16_GATHER_MIN_ROWS


def fast_gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather `x[idx, :]`, routed through a uint16/uint8 bitcast when
    the source is past the per-dtype fast-path row cliffs (see above) —
    the bitcasts are exact reinterpretations, so results are bitwise
    identical either way. NOT differentiable through XLA autodiff (bitcast
    has a zero tangent): use only inside custom_vjp forwards/backwards."""
    n, c = x.shape
    if x.dtype.itemsize != 4 or n < _U16_GATHER_MIN_ROWS:
        return x[idx, :]
    if n < _U8_GATHER_MIN_ROWS:
        xb = jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(n, 2 * c)
        g = xb[idx, :]
        return jax.lax.bitcast_convert_type(g.reshape(idx.shape[0], c, 2), x.dtype)
    xb = jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(n, 4 * c)
    g = xb[idx, :]
    return jax.lax.bitcast_convert_type(g.reshape(idx.shape[0], c, 4), x.dtype)


@jax.custom_vjp
def _gather_entries_inv(params2d, gid_clipped, mask, inv_pos):
    # row gather from (N, PARAM_DIM) — XLA's fast layout for per-index row
    # copies — then one cheap relayout to the kernels' (PARAM_DIM, E)
    # column-major contract (Mosaic requires 128-aligned lane slices, so the
    # kernels cannot take (K, 24) HBM blocks directly)
    return jnp.where(mask, fast_gather_rows(params2d, gid_clipped), 0.0).T


def _gather_entries_inv_fwd(params2d, gid_clipped, mask, inv_pos):
    return _gather_entries_inv(params2d, gid_clipped, mask, inv_pos), (
        gid_clipped,
        mask,
        inv_pos,
    )


def _gather_entries_inv_bwd(res, g):
    """Adjoint of the entry gather via the precomputed inverse positions:
    ONE combined gather of (N*max_dup) indices + a reshape-sum, instead of a
    scatter-add over E (XLA TPU sorts scatter indices, ~24 ms measured).
    Best in the linear gather regime; binning switches to the sort plan
    (below) past INV_LINEAR_MAX dense candidates."""
    gid_clipped, mask, inv_pos = res
    n, max_dup = inv_pos.shape
    gt = g.T  # (E, PARAM_DIM)
    idx = inv_pos.T.reshape(-1)  # (max_dup*N,)
    gj = jnp.where((idx >= 0)[:, None], fast_gather_rows(gt, jnp.clip(idx, 0)), 0.0)
    d = jnp.sum(gj.reshape(max_dup, n, gt.shape[1]), axis=0)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return d, f0(gid_clipped), f0(mask), f0(inv_pos)


_gather_entries_inv.defvjp(_gather_entries_inv_fwd, _gather_entries_inv_bwd)


@jax.custom_vjp
def _gather_entries_plan(params2d, gid_clipped, mask, plan):
    return jnp.where(mask, fast_gather_rows(params2d, gid_clipped), 0.0).T


def _gather_entries_plan_fwd(params2d, gid_clipped, mask, plan):
    return _gather_entries_plan(params2d, gid_clipped, mask, plan), (
        gid_clipped,
        mask,
        plan,
    )


def _gather_entries_plan_bwd(res, g):
    """Adjoint of the entry gather via the precomputed sort plan
    (binning.BinResult.plan): gather the (E, PARAM_DIM) cotangent into
    sorted-by-gaussian order, sum each gaussian's run with masked shifted
    adds (run length <= max_dup), and read run heads — E + N gather indices
    instead of N*max_dup, keeping the full-capacity path out of the
    superlinear gather regime."""
    gid_clipped, mask, plan = res
    perm, masks, head = plan
    gt = g.T  # (E, PARAM_DIM)
    s = fast_gather_rows(gt, perm)
    jump = 1
    for m in masks:
        sh = jnp.concatenate([s[jump:], jnp.zeros((jump, s.shape[1]), s.dtype)], 0)
        s = s + jnp.where(m[:, None], sh, 0.0)
        jump *= 2
    d = jnp.where((head >= 0)[:, None], fast_gather_rows(s, jnp.clip(head, 0)), 0.0)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return d, f0(gid_clipped), f0(mask), jax.tree.map(f0, plan)


_gather_entries_plan.defvjp(_gather_entries_plan_fwd, _gather_entries_plan_bwd)


def _prepare_entries(
    attrs, camera, image_shape, cfg, front_only, bin_result=None, entry_budget=None
):
    params2d, radius, depth_z, in_view = pp.preprocess(
        attrs, camera, image_shape, cfg, front_only=front_only
    )
    if bin_result is None:
        sg = jax.lax.stop_gradient
        b = binning.bin_entries(
            sg(params2d),
            sg(depth_z),
            in_view,
            image_shape,
            cfg,
            entry_budget=entry_budget,
        )
    else:
        b = bin_result
    gidc = jnp.clip(b.gid, 0)
    mask = (b.gid >= 0)[:, None]
    if b.inv_pos is not None:
        entries = _gather_entries_inv(params2d, gidc, mask, b.inv_pos)
    elif b.plan is not None:
        entries = _gather_entries_plan(params2d, gidc, mask, b.plan)
    else:
        # jnp.where (not multiply) so the VJP never touches garbage slots
        # plain differentiable gather (NOT fast_gather_rows: its uint16
        # bitcast has a zero tangent, and this fallback path relies on XLA
        # autodiff to transpose the gather into a scatter-add)
        entries = jnp.where(mask, params2d[gidc, :], 0.0).T
    return entries, b, params2d, radius, in_view


# ---------------------------------------------------------------------------
# per-view in-view compaction
# ---------------------------------------------------------------------------
#
# Per-view render cost on TPU is dominated by per-INDEX machinery (the entry
# gather, its inverse-position VJP gather, and the binning sort), all sized
# by the gaussian-capacity bucket N even though a single view typically sees
# a fraction of the map. Compacting each view to its frozen in-view subset
# (a power-of-two bucket) shrinks every one of those index counts; under the
# frozen-bins contract the result is EXACT: gaussians outside the frozen
# in-view set contribute nothing to that view either way.

PACK_DIM = 16  # means3 scales3 rot4 opac1 col3 conf1 valid1 = 16


def pack_attrs(attrs: GaussianAttrs) -> jnp.ndarray:
    """(N, 16) row-major packing so a per-view subset is ONE row gather
    (XLA TPU gathers cost per index; row vs column layout is second-order,
    but row packing means the batched subset/VJP below never transposes)."""
    cols = [
        attrs.means,
        attrs.scales,
        attrs.rotations,
        attrs.opacities[:, None],
        attrs.colors,
        attrs.confidences[:, None],
        attrs.valid.astype(jnp.float32)[:, None],
    ]
    return jnp.concatenate(cols, axis=1)


def unpack_attrs(packed: jnp.ndarray) -> GaussianAttrs:
    return GaussianAttrs(
        means=packed[:, 0:3],
        scales=packed[:, 3:6],
        rotations=packed[:, 6:10],
        opacities=packed[:, 10],
        colors=packed[:, 11:14],
        confidences=packed[:, 14],
        valid=packed[:, 15] > 0.5,
    )


@jax.custom_vjp
def subset_packed(packed, sel_clip, sel_valid, inv_sel):
    """Row-gather packed attrs to a compact bucket; the VJP maps cotangents
    back with the precomputed inverse positions (a gather, never a
    scatter-add — XLA TPU scatter sorts its indices)."""
    return jnp.where(sel_valid[:, None], fast_gather_rows(packed, sel_clip), 0.0)


def _subset_packed_fwd(packed, sel_clip, sel_valid, inv_sel):
    return subset_packed(packed, sel_clip, sel_valid, inv_sel), (
        sel_clip,
        sel_valid,
        inv_sel,
    )


def _subset_packed_bwd(res, g):
    sel_clip, sel_valid, inv_sel = res
    d = jnp.where((inv_sel >= 0)[:, None], fast_gather_rows(g, jnp.clip(inv_sel, 0)), 0.0)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return d, f0(sel_clip), f0(sel_valid), f0(inv_sel)


subset_packed.defvjp(_subset_packed_fwd, _subset_packed_bwd)


# --------------------------------------------------------------------------
# batched multi-view subset with a sort-based gradient combine
# --------------------------------------------------------------------------
#
# The per-view subset VJP expands each view's compact cotangent back to the
# full N with an N-index gather — V views cost V*N gather indices per train
# step even though only ~V*B slots carry gradient. The batched form gathers
# every view's subset in ONE call and, on the way back, combines all views'
# compact cotangents with a per-keyframe sort plan: references sorted by
# gaussian id, a 3-pass masked segment-suffix sum (a gaussian appears at
# most once per view, so run length <= V), and one head-of-run gather. Total
# per-step index traffic: V*B (sort perm) + N (head), instead of V*N.


def build_combine_plan(sels, selvs, invs, n: int):
    """Per-keyframe plan for `subset_packed_batch`'s VJP. sels/selvs (V, B),
    invs (V, N) from per-view `compact_in_view`. Built entirely from sorts
    and gathers (no scatter). Returns (perm, masks, head):
      perm  (V*B,) — flat reference order sorted (stably) by gaussian id,
      masks tuple of (V*B,) bools — same-run neighbor at distance 1, 2, 4...,
      head  (N,) — sorted position of each gaussian's first reference, -1
            when the gaussian is in no view's subset."""
    v, b = sels.shape
    vb = v * b
    ids = jnp.where(selvs.reshape(-1), sels.reshape(-1), n).astype(jnp.int32)
    iota = jnp.arange(vb, dtype=jnp.int32)
    sorted_ids, perm = jax.lax.sort((ids, iota), num_keys=1, is_stable=True)
    _, pos = jax.lax.sort((perm, iota), num_keys=1)
    masks = []
    k = 1
    while k < max(v, 2):
        same = jnp.concatenate(
            [
                (sorted_ids[k:] == sorted_ids[:-k]) & (sorted_ids[:-k] < n),
                jnp.zeros((k,), bool),
            ]
        )
        masks.append(same)
        k *= 2
    # first reference of gaussian g in flat order = min over views of the
    # flat slot index; stable sort keeps it first within its run
    varange = jnp.arange(v, dtype=jnp.int32)[:, None]
    flatpos = jnp.where(invs >= 0, varange * b + invs, vb)
    first_flat = jnp.min(flatpos, axis=0)  # (N,)
    head = jnp.where(
        first_flat < vb, pos[jnp.clip(first_flat, 0, vb - 1)], -1
    ).astype(jnp.int32)
    return perm, tuple(masks), head


@jax.custom_vjp
def subset_packed_batch(packed, sels, selvs, plan):
    """Gather every view's compact attr bucket in one call: (N, 16) ->
    (V, B, 16). The VJP combines all views' cotangents back to (N, 16) with
    the precomputed sort plan (see build_combine_plan)."""
    v, b = sels.shape
    rows = jnp.where(
        selvs.reshape(-1)[:, None],
        fast_gather_rows(packed, jnp.clip(sels.reshape(-1), 0)),
        0.0,
    )
    return rows.reshape(v, b, packed.shape[1])


def _spb_fwd(packed, sels, selvs, plan):
    return subset_packed_batch(packed, sels, selvs, plan), (sels, selvs, plan)


def _spb_bwd(res, g):
    sels, selvs, plan = res
    perm, masks, head = plan
    v, b = sels.shape
    flat = g.reshape(v * b, g.shape[-1])
    s = fast_gather_rows(flat, perm)
    jump = 1
    for m in masks:
        sh = jnp.concatenate(
            [s[jump:], jnp.zeros((jump, s.shape[1]), s.dtype)], axis=0
        )
        s = s + jnp.where(m[:, None], sh, 0.0)
        jump *= 2
    d = jnp.where((head >= 0)[:, None], fast_gather_rows(s, jnp.clip(head, 0)), 0.0)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return d, f0(sels), f0(selvs), jax.tree.map(f0, plan)


subset_packed_batch.defvjp(_spb_fwd, _spb_bwd)


def compact_in_view(in_view: jnp.ndarray, bucket: int):
    """Compact indices of the in-view gaussians into a static bucket.

    Returns (sel (B,) int32 clipped, sel_valid (B,) bool, inv (N,) int32
    with -1 for absent, count). Built from two sorts (no scatter): a stable
    sort by ~in_view yields the selection; sorting that permutation back
    yields every gaussian's position."""
    n = in_view.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    key = (~in_view).astype(jnp.int32)
    _, sel_full = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
    _, pos = jax.lax.sort((sel_full, iota), num_keys=1)
    count = jnp.sum(in_view.astype(jnp.int32))
    sel = sel_full[:bucket]
    sel_valid = jnp.arange(bucket, dtype=jnp.int32) < count
    sel = jnp.where(sel_valid, sel, 0)
    inv = jnp.where(in_view & (pos < bucket), pos, -1)
    return sel, sel_valid, inv, count


def subset_view(packed: jnp.ndarray, subset) -> GaussianAttrs:
    """Differentiable compact attrs for one view. subset = (sel, sel_valid,
    inv) from compact_in_view."""
    sel, sel_valid, inv = subset
    return unpack_attrs(subset_packed(packed, sel, sel_valid, inv))


def render_view(
    attrs: GaussianAttrs,
    camera: Camera,
    image_shape: tuple[int, int],
    cfg: RasterConfig = RasterConfig(),
    front_only: bool = False,
    background: Optional[jnp.ndarray] = None,
    bin_result: Optional[binning.BinResult] = None,
    entry_budget: int | None = None,
):
    """Render one view. Returns (RenderOutput, aux dict).

    aux carries `in_view` (the `radii > 0` frustum mask,
    `utils/operations.py:815`), `radius`, `transmittance` and the binning
    drop counter. Pass `bin_result` (from prepare_view_bins) to reuse
    frozen tile lists across optimization steps; `entry_budget` (static)
    sizes the binned entry stream when binning inline.
    """
    h, w = image_shape
    num_programs, kntx = _kernel_static(image_shape, cfg)
    entries, b, _, radius, in_view = _prepare_entries(
        attrs, camera, image_shape, cfg, front_only, bin_result, entry_budget
    )
    static = (num_programs, kntx, cfg)
    out_tiles = cp.composite_tiled(entries, b.tile_start, b.tile_len, static)
    # only rows 0..8 carry image channels (9 = stop counter, 10..15 sublane
    # padding): slicing them off BEFORE the tile->image relayout cuts its
    # cost by ~7/16 in both directions (the relayout chain measured
    # ~4.1 ms/step at 512^2 x 8 views; the VJP re-pads with zeros, which
    # fuses)
    img = _tiles_to_image(out_tiles[:, : cp.ROW_TRANS + 1], image_shape, cfg)

    trans = img[cp.ROW_TRANS : cp.ROW_TRANS + 1]
    rgb = img[0:3]
    if background is not None:
        rgb = rgb + trans * background[:, None, None]
    opacity = 1.0 - trans
    vis = jax.lax.stop_gradient(opacity) > 1e-2
    normal = img[3:6]
    # rsqrt(max(.)) normalization: NaN-free gradient at zero-normal pixels
    n2 = jnp.sum(normal * normal, axis=0, keepdims=True)
    normal = normal * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    normal = normal * vis  # normalize + visibility mask (operations.py:714-715)

    output = RenderOutput(
        rgb=rgb,
        depth=img[cp.ROW_DEPTH : cp.ROW_DEPTH + 1],
        normal=normal,
        opacity=opacity,
        confidence=img[cp.ROW_CONF : cp.ROW_CONF + 1],
    )
    aux = {
        "in_view": in_view,
        "radius": radius,
        "transmittance": trans,
        "num_dropped": b.num_dropped,
    }
    return output, aux


def _tiles_to_image_batched(out_tiles: jnp.ndarray, v: int, image_shape, cfg):
    """(V*T, C, P) concatenated tile-major output -> (V, C, h, w) images in
    ONE relayout (the per-view form would issue V separate transposes)."""
    h, w = image_shape
    th, tw, ntx, nty = binning.bin_tile_dims(image_shape, cfg)
    c = out_tiles.shape[1]
    img = out_tiles.reshape(v, nty, ntx, c, th, tw)
    img = img.transpose(0, 3, 1, 4, 2, 5).reshape(v, c, nty * th, ntx * tw)
    return img[:, :, :h, :w]


def render_views_batched(
    attrs_per_view: list,
    cameras: list,
    image_shape: tuple[int, int],
    cfg: RasterConfig = RasterConfig(),
    background: Optional[jnp.ndarray] = None,
    bin_results: Optional[list] = None,
    entry_budget: int | None = None,
):
    """Render V posed views through ONE compositor dispatch (fwd and bwd).

    Per-view preprocessing/binning/entry gathers stay per-view XLA ops; the
    per-view tile tables and entry streams are concatenated so the Pallas
    fwd+bwd kernels launch once over a V*T grid instead of V times. Entry
    offsets stay 128-aligned because every entry budget is a multiple of
    128 (trainer bucket ladder).

    MEASURED SLOWER than unrolled per-view launches on the v5e train bench
    (49.2 vs 56.2 Mrays/s, r4 trace diff): the entry concat, the per-view
    dentries slices in backward, and the batched 6D assembly transpose add
    ~+1.6 ms transpose, +0.8 ms reshape, +0.4 ms pad per step while device
    IDLE only drops 2.65 -> 2.33 ms — per-view dispatch gaps were never the
    IDLE source. Kept as a tested option (MapConfig.fused_view_kernel);
    candidate batches with no backward may still profit — measure first.

    Per-view RenderOutput images are identical to `render_view` (same
    per-tile programs, same chunk boundaries); only dispatch structure and
    the tile->image relayout (now one op) change. REDUCED aux contract:
    only `num_dropped` (stacked over views) — `in_view`, `radius` and
    `transmittance` are not carried, so this is NOT a drop-in replacement
    for callers that read those (use render_view per view instead)."""
    v = len(attrs_per_view)
    h, w = image_shape
    num_tiles, kntx = _kernel_static(image_shape, cfg)
    entries_l, bins_l = [], []
    for i in range(v):
        entries, b, _, _, _ = _prepare_entries(
            attrs_per_view[i],
            cameras[i],
            image_shape,
            cfg,
            False,
            bin_results[i] if bin_results is not None else None,
            entry_budget,
        )
        entries_l.append(entries)
        bins_l.append(b)
    e_size = entries_l[0].shape[1]
    assert all(e.shape[1] == e_size for e in entries_l), "equal budgets required"
    entries_all = jnp.concatenate(entries_l, axis=1)
    starts = jnp.concatenate(
        [b.tile_start + jnp.int32(i * e_size) for i, b in enumerate(bins_l)]
    )
    lens = jnp.concatenate([b.tile_len for b in bins_l])
    static = (v * num_tiles, kntx, cfg, num_tiles)
    out_all = cp.composite_tiled(entries_all, starts, lens, static)
    img = _tiles_to_image_batched(
        out_all[:, : cp.ROW_TRANS + 1], v, image_shape, cfg
    )  # (V, 9, h, w)

    trans = img[:, cp.ROW_TRANS : cp.ROW_TRANS + 1]
    rgb = img[:, 0:3]
    if background is not None:
        rgb = rgb + trans * background[None, :, None, None]
    opacity = 1.0 - trans
    vis = jax.lax.stop_gradient(opacity) > 1e-2
    normal = img[:, 3:6]
    n2 = jnp.sum(normal * normal, axis=1, keepdims=True)
    normal = normal * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    normal = normal * vis

    output = RenderOutput(
        rgb=rgb,
        depth=img[:, cp.ROW_DEPTH : cp.ROW_DEPTH + 1],
        normal=normal,
        opacity=opacity,
        confidence=img[:, cp.ROW_CONF : cp.ROW_CONF + 1],
    )
    aux = {"num_dropped": jnp.stack([b.num_dropped for b in bins_l])}
    return output, aux


def render_stats(
    attrs: GaussianAttrs,
    camera: Camera,
    image_shape: tuple[int, int],
    cfg: RasterConfig = RasterConfig(),
    render_mask: Optional[jnp.ndarray] = None,
    weight_thres: float = 0.03,
    front_only: bool = True,
    subset_bucket: int | None = None,
    entry_budget: int | None = None,
):
    """Per-gaussian visibility stats for one view: (importance (N,),
    count (N,)). The analog of the rasterizer's `importance`/`count` outputs
    consumed by confidence update and pruning (`gaussian_map.py:171-232`);
    `render_mask` plays the role of the `render_mask=depth_gt>0` setting
    (`gaussian_map.py:191`).

    `subset_bucket` (static) compacts the view's in-view gaussians before
    binning — EXACT (out-of-view gaussians have zero importance/count either
    way, and compaction preserves the depth tie-break order) and every
    per-index cost then scales with the bucket; `entry_budget` (static,
    measured per call site via `trainer.stats_view_budgets`) bounds the
    binned entry stream, which also bounds the stats kernel's zero-fill."""
    if subset_bucket is not None and subset_bucket < attrs.num:
        _, _, _, iv = pp.preprocess(
            attrs, camera, image_shape, cfg, front_only=front_only
        )
        sel, selv, inv, _n = compact_in_view(iv, subset_bucket)
        attrs_s = unpack_attrs(
            jnp.where(selv[:, None], fast_gather_rows(pack_attrs(attrs), sel), 0.0)
        )
        imp_s, cnt_s = render_stats(
            attrs_s,
            camera,
            image_shape,
            cfg,
            render_mask=render_mask,
            weight_thres=weight_thres,
            front_only=front_only,
            entry_budget=entry_budget,
        )
        present = inv >= 0
        inv_c = jnp.clip(inv, 0)
        imp = jnp.where(present, imp_s[inv_c], 0.0)
        cnt = jnp.where(present, cnt_s[inv_c], 0)
        return imp, cnt
    h, w = image_shape
    num_programs, kntx = _kernel_static(image_shape, cfg)
    entries, b, _, _, _ = _prepare_entries(
        attrs, camera, image_shape, cfg, front_only, entry_budget=entry_budget
    )
    entries = jax.lax.stop_gradient(entries)
    if render_mask is None:
        render_mask = jnp.ones((h, w), jnp.float32)
    mask_tiles = _image_to_tiles(render_mask.reshape(h, w), image_shape, cfg, rows=8)
    imp_e, cnt_e = cp.composite_stats(
        entries,
        b.tile_start,
        b.tile_len,
        mask_tiles,
        num_programs,
        kntx,
        cfg,
        weight_thres,
    )
    n = attrs.num
    gid_safe = jnp.where(b.gid >= 0, b.gid, n)
    imp = jax.ops.segment_sum(imp_e[0], gid_safe, num_segments=n + 1)[:n]
    cnt = jax.ops.segment_sum(cnt_e[0], gid_safe, num_segments=n + 1)[:n]
    return imp, cnt.astype(jnp.int32)
