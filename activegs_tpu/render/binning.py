"""Tile binning: expand gaussians into depth-ordered per-tile entry lists.

TPU-native replacement for the CUDA rasterizer's duplicate-and-radix-sort
stage (`/root/reference/utils/operations.py:645-720` pins the contract): one
multi-key XLA sort per view over (tile, depth, enum) produces the final
K-aligned layout DIRECTLY — per-tile alignment dummies are injected *before*
the sort (each sorts to the end of its tile's segment via depth=+inf), so
every tile segment is K-aligned in place and the old re-pad scatter, the
depth argsort, the rank scatter, and the searchsorted segment probe are all
gone (each was an XLA-TPU pathology: scatter = hidden sort, argsort = extra
sort, searchsorted = slow).

Two further scatter-free constructions measured on the axon TPU:
  * the per-tile histogram is a separable rectangle count — an
    (nty, N) @ (N, ntx) indicator matmul on the MXU (~0.2 ms) instead of a
    one-hot reduce (~3.7 ms) or bincount (hidden sort),
  * the inverse position map is ONE extra 1-key sort: every dense candidate
    slot appears in the sorted payload exactly once (sentinel candidates
    keep their payload and sort past all live tiles), so sorting
    (payload, position) by payload yields every slot's position, replacing
    a ~24 ms scatter with a ~5 ms sort.

Everything here is non-differentiable index bookkeeping; callers
stop-gradient the inputs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .types import (
    P_CONIC_A,
    P_CONIC_B,
    P_CONIC_C,
    P_EXT_X,
    P_EXT_Y,
    P_OPACITY,
    RasterConfig,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinResult:
    gid: jnp.ndarray  # (E_budget,) int32, gaussian index per entry (-1 = pad)
    tile_start: jnp.ndarray  # (T,) int32, K-aligned segment starts
    tile_len: jnp.ndarray  # (T,) int32, real (unpadded) segment lengths
    num_dropped: jnp.ndarray  # () int32, entries lost to span/budget caps
    # with_inverse=True builds exactly ONE of the two adjoint aids below
    # (chosen statically by N*max_dup; renderer._prepare_entries dispatches):
    #
    # inv_pos (N, max_dup) int32, -1 = absent: entry slot of dense candidate
    # (i, j) — the VJP is one (N*max_dup)-index gather + reshape-sum.
    # Cheapest in the linear gather regime (measured ~4.2 ns/index), but XLA
    # TPU gathers turn superlinear past ~0.5M indices.
    inv_pos: jnp.ndarray | None = None
    # plan (perm, masks, head): entry slots stably sorted by gaussian id
    # (perm, (E,)), same-run neighbor masks at jumps 1, 2, ... (< max_dup,
    # each (E,)), and each gaussian's first-entry position in that order
    # (head, (N,), -1 = no entries). The VJP is one E-index gather + a
    # masked segment-suffix sum + one N-index gather — E + N indices
    # instead of N*max_dup, which keeps the full-capacity mission path out
    # of the superlinear regime (2.1M indices at N=512k, max_dup=4).
    plan: tuple | None = None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bin_tile_dims(image_shape: tuple[int, int], cfg: RasterConfig):
    """(tile_h, tile_w, ntx, nty) of the tile grid."""
    h, w = image_shape
    nty = -(-h // cfg.tile_h)
    return cfg.tile_h, cfg.tile_w, -(-w // cfg.tile_w), nty


# adjoint-aid crossover: below this dense candidate count the one-gather
# inverse map wins (linear regime, measured ~4.2 ns/index); above it the
# sort-plan combine wins (XLA TPU gathers are superlinear past ~0.5M
# indices — 8.5 ms at 1.05M vs 2.5 ms at 0.56M on the bench chip)
# (Re-measured after the half-step bucket ladder: forcing the plan path at
# the bench shapes — dense 131k, E 49152 — benches 53.2 vs 55.8 Mrays/s;
# the plan's extra per-keyframe sorts + masked shifted adds cost more than
# the 131k-vs-82k index savings. The crossover stays at the superlinear
# gather knee.)
INV_LINEAR_MAX = 1 << 19


def tile_spans(mean_x, mean_y, ext_x, ext_y, in_view, image_shape, cfg):
    """Clamped per-gaussian tile span, capped at max_dup tiles (centered
    shrink). Returns (tx0, ty0, span_w, span_h, n_truncated) — shared by
    binning and by the per-keyframe entry-count measurement
    (trainer.keyframe_view_stats) so the two can never disagree."""
    th, tw, ntx, nty = bin_tile_dims(image_shape, cfg)
    max_dup = cfg.max_dup
    tx0 = jnp.clip(jnp.floor((mean_x - ext_x) / tw), 0, ntx - 1).astype(
        jnp.int32
    )
    tx1 = jnp.clip(jnp.floor((mean_x + ext_x) / tw), 0, ntx - 1).astype(
        jnp.int32
    )
    ty0 = jnp.clip(jnp.floor((mean_y - ext_y) / th), 0, nty - 1).astype(
        jnp.int32
    )
    ty1 = jnp.clip(jnp.floor((mean_y + ext_y) / th), 0, nty - 1).astype(
        jnp.int32
    )
    sw = tx1 - tx0 + 1
    sh = ty1 - ty0 + 1
    area = sw * sh
    shrink = jnp.sqrt(max_dup / jnp.maximum(area, 1).astype(jnp.float32))
    sw_c = jnp.where(area > max_dup, jnp.floor(sw * shrink), sw).astype(jnp.int32)
    sw_c = jnp.clip(sw_c, 1, sw)
    sh_c = jnp.minimum(max_dup // sw_c, sh)
    # recenter the capped span on the projected mean
    ctx = jnp.clip((mean_x / tw).astype(jnp.int32), tx0, tx1)
    cty = jnp.clip((mean_y / th).astype(jnp.int32), ty0, ty1)
    tx0c = jnp.clip(ctx - (sw_c - 1) // 2, tx0, tx1 - sw_c + 1)
    ty0c = jnp.clip(cty - (sh_c - 1) // 2, ty0, ty1 - sh_c + 1)
    n_trunc = jnp.sum(jnp.where(in_view, sw * sh - sw_c * sh_c, 0))
    return tx0c, ty0c, sw_c, sh_c, n_trunc


def candidate_tiles(
    params2d: jnp.ndarray,
    in_view: jnp.ndarray,
    image_shape: tuple[int, int],
    cfg: RasterConfig,
):
    """Per-gaussian candidate tile list: the capped AABB span from
    `tile_spans`, exactly culled per (gaussian, tile) and front-compacted.

    The cull is EXACT w.r.t. the compositor: a candidate is dropped only
    when the minimum of the conic quadratic Q(d) = d^T conic d over the
    tile's pixel-center rectangle exceeds Q* = 2*ln(opacity/alpha_cut) —
    at every pixel the entry could have touched, alpha = op*exp(-Q/2) <
    alpha_cut, which `preprocess._cut` zeroes, so the composited output is
    unchanged (only float regrouping where chunk boundaries shift). Q is
    convex, so its box-constrained minimum is either the center (inside
    the rect) or on one of the four edges, each a 1-D clamped quadratic.
    A +0.05 margin on Q* absorbs f32 rounding of the closed form (and the
    bf16 alpha rounding under cfg.bf16_pairs).

    Returns (tile (N, max_dup) int32 compacted ascending, kept (N, max_dup)
    bool, kept_n (N,) int32, n_trunc ()). Shared by `bin_entries` and the
    per-keyframe entry budget measurement (`entry_count`) so the two can
    never disagree."""
    th, tw, ntx, nty = bin_tile_dims(image_shape, cfg)
    max_dup = cfg.max_dup
    mean_x = params2d[:, 0]
    mean_y = params2d[:, 1]
    tx0c, ty0c, sw_c, sh_c, n_trunc = tile_spans(
        mean_x,
        mean_y,
        params2d[:, P_EXT_X],
        params2d[:, P_EXT_Y],
        in_view,
        image_shape,
        cfg,
    )
    dup = jnp.where(in_view, sw_c * sh_c, 0)
    j = jnp.arange(max_dup, dtype=jnp.int32)[None, :]
    sel = j < dup[:, None]  # (N, max_dup)
    r = j // sw_c[:, None]
    c = j % sw_c[:, None]
    cx = tx0c[:, None] + c
    cy = ty0c[:, None] + r
    tile = cy * ntx + cx

    if not cfg.tile_cull:
        return tile, sel, dup, n_trunc

    ca = params2d[:, P_CONIC_A][:, None]
    cb = params2d[:, P_CONIC_B][:, None]
    cc = params2d[:, P_CONIC_C][:, None]
    fw = jnp.float32(tw)
    fh = jnp.float32(th)
    x0 = cx.astype(jnp.float32) * fw + 0.5 - mean_x[:, None]
    x1 = x0 + (fw - 1.0)
    y0 = cy.astype(jnp.float32) * fh + 0.5 - mean_y[:, None]
    y1 = y0 + (fh - 1.0)

    def edge_x(xv):
        ys_ = jnp.clip(-cb * xv / jnp.maximum(cc, 1e-12), y0, y1)
        return ca * xv * xv + 2.0 * cb * xv * ys_ + cc * ys_ * ys_

    def edge_y(yv):
        xs_ = jnp.clip(-cb * yv / jnp.maximum(ca, 1e-12), x0, x1)
        return ca * xs_ * xs_ + 2.0 * cb * xs_ * yv + cc * yv * yv

    q = jnp.minimum(
        jnp.minimum(edge_x(x0), edge_x(x1)), jnp.minimum(edge_y(y0), edge_y(y1))
    )
    inside = (x0 <= 0.0) & (x1 >= 0.0) & (y0 <= 0.0) & (y1 >= 0.0)
    q = jnp.where(inside, 0.0, q)
    op = params2d[:, P_OPACITY]
    qstar = 2.0 * jnp.log(
        jnp.maximum(op, cfg.alpha_cut) * (1.0 / cfg.alpha_cut)
    )
    keep = sel & (q <= qstar[:, None] + 0.05)

    # front-compact kept candidates (ascending-tile order preserved, so the
    # "candidate j=0 = smallest entry slot" invariant of the sort-plan VJP
    # still holds); max_dup is tiny, so the max_dup^2 select-sums are cheap
    tgt = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    kept_n = jnp.sum(keep, axis=1).astype(jnp.int32)
    cols = []
    for m in range(max_dup):
        hit = keep & (tgt == m)  # at most one true per row
        cols.append(jnp.sum(jnp.where(hit, tile, 0), axis=1))
    tile_c = jnp.stack(cols, axis=1).astype(jnp.int32)
    kept = j < kept_n[:, None]
    return tile_c, kept, kept_n, n_trunc


def _tile_histogram(tile, sel, ntx: int, nty: int, max_dup: int):
    """Per-tile entry counts as one-tile-per-candidate indicator matmuls on
    the MXU, one (nty, N) x (N, ntx) pair per candidate column (~0.2 ms vs
    ~3.7 ms for a one-hot reduce; bincount hides a sort). 0/1 operands are
    exact in bf16 passes, accumulation is f32. Returns (T,) int32."""
    xs = jnp.arange(ntx, dtype=jnp.int32)[None, :]
    ys = jnp.arange(nty, dtype=jnp.int32)[:, None]
    seg_len = jnp.zeros((nty, ntx), jnp.float32)
    for m in range(max_dup):
        cxm = tile[:, m] % ntx
        cym = tile[:, m] // ntx
        ind_x = ((xs == cxm[:, None]) & sel[:, m][:, None]).astype(
            jnp.float32
        )  # (N, ntx)
        ind_y = (ys == cym[None, :]).astype(jnp.float32)  # (nty, N)
        seg_len = seg_len + jax.lax.dot_general(
            ind_y,
            ind_x,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return seg_len.reshape(-1).astype(jnp.int32)  # (T,)


def entry_count(
    params2d: jnp.ndarray,
    in_view: jnp.ndarray,
    image_shape: tuple[int, int],
    cfg: RasterConfig,
) -> jnp.ndarray:
    """Entry-stream size `bin_entries` will need for this view — the
    per-keyframe budget measurement (trainer.keyframe_view_stats) and the
    binning itself share `candidate_tiles` so the two can never disagree.
    This is the raw kept-candidate count (binning adds at most chunk-1
    alignment slots per tile, which the budget formula covers)."""
    _, _, kept_n, _ = candidate_tiles(params2d, in_view, image_shape, cfg)
    return jnp.sum(kept_n)


def bin_entries(
    params2d: jnp.ndarray,
    depth_z: jnp.ndarray,
    in_view: jnp.ndarray,
    image_shape: tuple[int, int],
    cfg: RasterConfig,
    with_inverse: bool = False,
    entry_budget: int | None = None,
) -> BinResult:
    """Build the K-aligned per-tile entry layout with ONE sort.

    `params2d` is the preprocess output (rows: means, conic, opacity,
    per-axis sigma_extent extents P_EXT_X/P_EXT_Y); candidate tiles come
    from `candidate_tiles` (capped AABB span + exact opacity-aware
    ellipse/tile cull).

    The dense (N, max_dup) candidate grid is enumerated gaussian-major and
    its enumeration index doubles as a third sort key, so the
    (tile, depth, enum) lexicographic order reproduces the oracle's exactly
    (depth ties break by gaussian index, matching the stable `argsort` in
    render/dense.py)."""
    th, tw, ntx, nty = bin_tile_dims(image_shape, cfg)
    num_tiles = ntx * nty
    n = params2d.shape[0]
    kchunk = cfg.chunk
    max_dup = cfg.max_dup
    align = kchunk  # per-tile segment alignment

    tile, sel, dup, n_trunc = candidate_tiles(params2d, in_view, image_shape, cfg)
    num_dropped = n_trunc  # span truncation (dense layout never overflows)

    seg_len = _tile_histogram(tile, sel, ntx, nty, max_dup)  # (T,)
    pad_len = -(-seg_len // align) * align
    pad_cnt = pad_len - seg_len  # in [0, align)

    # --- dense (N, max_dup) candidate grid, gaussian-major for tie order ---
    j = jnp.arange(max_dup, dtype=jnp.int32)[None, :]
    tile_e = jnp.where(sel, tile, num_tiles).reshape(-1)  # sentinel sorts last
    inf = jnp.float32(jnp.inf)
    depth_e = jnp.where(sel, depth_z[:, None], inf).reshape(-1)
    # payload = enumeration index i*max_dup+j — kept even for sentinel
    # candidates so the inverse construction sees every dense slot once
    payload_e = (
        jnp.arange(n, dtype=jnp.int32)[:, None] * max_dup + j
    ).reshape(-1)

    # --- alignment dummies: pad_cnt[t] entries of (tile=t, depth=inf) ---
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    dj = jnp.arange(align, dtype=jnp.int32)[None, :]
    dsel = dj < pad_cnt[:, None]  # (T, align)
    tile_d = jnp.where(dsel, tids[:, None], num_tiles).reshape(-1)
    depth_d = jnp.full((num_tiles * align,), inf, jnp.float32)
    payload_d = jnp.full((num_tiles * align,), -1, jnp.int32)

    e_raw = n * max_dup + num_tiles * align
    e_alloc = _round_up(e_raw, kchunk)
    tile_all = jnp.concatenate([tile_e, tile_d])
    depth_all = jnp.concatenate([depth_e, depth_d])
    payload_all = jnp.concatenate([payload_e, payload_d])
    if e_alloc > e_raw:
        pad = e_alloc - e_raw
        tile_all = jnp.concatenate([tile_all, jnp.full((pad,), num_tiles, jnp.int32)])
        depth_all = jnp.concatenate([depth_all, jnp.full((pad,), inf, jnp.float32)])
        payload_all = jnp.concatenate([payload_all, jnp.full((pad,), -1, jnp.int32)])

    # 3-key unstable == 2-key stable here: the payload key is unique and
    # ascending in enumeration order, so it IS the stability tie-break
    tile_s, _, payload_sorted = jax.lax.sort(
        (tile_all, depth_all, payload_all), num_keys=3, is_stable=False
    )

    # `entry_budget` (static, per keyframe from the measured entry count —
    # trainer.keyframe_view_stats) sizes every downstream entry stream by
    # what the views actually bin, instead of entry_budget_mult * capacity
    base = int(n * cfg.entry_budget_mult) if entry_budget is None else entry_budget
    e_budget = base + num_tiles * (kchunk - 1)
    e_budget = min(_round_up(e_budget, kchunk), e_alloc)
    # --- segment starts/lengths + compact budget truncation ---
    start = jnp.cumsum(pad_len) - pad_len  # K-aligned by construction
    start_c = jnp.minimum(start, e_budget).astype(jnp.int32)
    pad_len_c = jnp.minimum(pad_len, e_budget - start_c)
    len_c = jnp.minimum(seg_len, pad_len_c)
    num_dropped = num_dropped + jnp.sum(seg_len - len_c)

    payload_b = payload_sorted[:e_budget]
    live = (tile_s[:e_budget] < num_tiles) & (payload_b >= 0)
    gid = jnp.where(live, payload_b // max_dup, -1)
    payload_fin = payload_sorted
    e_alloc_fin = e_alloc

    inv = None
    plan = None
    if with_inverse:
        dense = max_dup * n
        # every dense slot appears in payload_fin exactly once (dummies
        # are -1 and sort first); sorting (payload, position) by payload
        # puts slot d's position at index (e_alloc_fin - dense + d)
        _, pos = jax.lax.sort(
            (payload_fin, jnp.arange(e_alloc_fin, dtype=jnp.int32)), num_keys=1
        )
        posm = pos[e_alloc_fin - dense :].reshape(n, max_dup)
        if dense <= INV_LINEAR_MAX:
            inv = jnp.where(sel & (posm < e_budget), posm, -1)
        else:
            iota_e = jnp.arange(e_budget, dtype=jnp.int32)
            keys = jnp.where(gid >= 0, gid, n)
            sorted_gids, perm = jax.lax.sort(
                (keys, iota_e), num_keys=1, is_stable=True
            )
            _, spos = jax.lax.sort((perm, iota_e), num_keys=1)
            masks = []
            k2 = 1
            while k2 < max(max_dup, 2):
                same = jnp.concatenate(
                    [
                        (sorted_gids[k2:] == sorted_gids[:-k2])
                        & (sorted_gids[:-k2] < n),
                        jnp.zeros((k2,), bool),
                    ]
                )
                masks.append(same)
                k2 *= 2
            # first entry slot of each gaussian = min position over its
            # candidates (pure elementwise on the dense grid, no layout
            # assumption); the stable gid sort keeps the smallest slot
            # first within its run, so head = sorted position of that slot
            minpos = jnp.min(
                jnp.where(sel & (posm < e_budget), posm, e_budget), axis=1
            )
            head = jnp.where(
                minpos < e_budget, spos[jnp.clip(minpos, 0, e_budget - 1)], -1
            ).astype(jnp.int32)
            plan = (perm, tuple(masks), head)

    return BinResult(
        gid=gid,
        tile_start=start_c,
        tile_len=len_c,
        num_dropped=num_dropped,
        inv_pos=inv,
        plan=plan,
    )
