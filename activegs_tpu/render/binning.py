"""Tile binning: expand gaussians into depth-ordered per-tile entry lists.

TPU-native replacement for the CUDA rasterizer's duplicate-and-radix-sort
stage: one uint32 key sort per view (key = tile_id << 20 | depth_rank) using
XLA's sorter, then a re-pad pass that K-aligns every tile segment so the
Pallas compositor can stream fixed-size chunks with no cross-tile overlap.

Everything here is non-differentiable index bookkeeping; callers
stop-gradient the inputs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .types import RasterConfig

RANK_BITS = 20  # max 2^20 gaussians per view
MAX_TILES = (1 << 12) - 1  # tile ids above this collide with the sentinel


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinResult:
    gid: jnp.ndarray  # (E_budget,) int32, gaussian index per entry (-1 = pad)
    tile_start: jnp.ndarray  # (T,) int32, K-aligned segment starts
    tile_len: jnp.ndarray  # (T,) int32, real (unpadded) segment lengths
    num_dropped: jnp.ndarray  # () int32, entries lost to span/budget caps
    # optional (with_inverse=True): entry slot of each dense (dup j, gaussian
    # i) candidate, (max_dup, N) int32, -1 = absent — lets the gather's VJP
    # be max_dup gathers instead of a scatter-add (which XLA TPU sorts)
    inv_pos: jnp.ndarray | None = None


def bin_entries(
    mean_x: jnp.ndarray,
    mean_y: jnp.ndarray,
    radius: jnp.ndarray,
    depth_z: jnp.ndarray,
    in_view: jnp.ndarray,
    image_shape: tuple[int, int],
    cfg: RasterConfig,
    with_inverse: bool = False,
) -> BinResult:
    """Scatter-free expansion: XLA TPU lowers every scattered `.at[].set`
    through an internal index sort, so the entry list is built DENSE — a
    (max_dup, N) key grid with sentinels — and compacted by the one real
    sort. The only scatter left is the K-alignment re-pad."""
    h, w = image_shape
    ntx = -(-w // cfg.tile_w)
    nty = -(-h // cfg.tile_h)
    num_tiles = ntx * nty
    assert num_tiles <= MAX_TILES, "image too large for 12-bit tile ids"
    n = mean_x.shape[0]
    assert n < (1 << RANK_BITS) - 1, "too many gaussians for 20-bit depth ranks"
    kchunk = cfg.chunk
    max_dup = cfg.max_dup
    e_alloc = max_dup * n + num_tiles * (kchunk - 1)
    e_alloc = -(-e_alloc // kchunk) * kchunk

    # --- clamped tile span, capped at max_dup tiles (centered shrink) ---
    tx0 = jnp.clip(jnp.floor((mean_x - radius) / cfg.tile_w), 0, ntx - 1).astype(
        jnp.int32
    )
    tx1 = jnp.clip(jnp.floor((mean_x + radius) / cfg.tile_w), 0, ntx - 1).astype(
        jnp.int32
    )
    ty0 = jnp.clip(jnp.floor((mean_y - radius) / cfg.tile_h), 0, nty - 1).astype(
        jnp.int32
    )
    ty1 = jnp.clip(jnp.floor((mean_y + radius) / cfg.tile_h), 0, nty - 1).astype(
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
    ctx = jnp.clip((mean_x / cfg.tile_w).astype(jnp.int32), tx0, tx1)
    cty = jnp.clip((mean_y / cfg.tile_h).astype(jnp.int32), ty0, ty1)
    tx0c = jnp.clip(ctx - (sw_c - 1) // 2, tx0, tx1 - sw_c + 1)
    ty0c = jnp.clip(cty - (sh_c - 1) // 2, ty0, ty1 - sh_c + 1)

    dup = jnp.where(in_view, sw_c * sh_c, 0)
    num_dropped = jnp.sum(
        jnp.where(in_view, sw * sh - sw_c * sh_c, 0)
    )  # span truncation, not budget overflow (dense layout never overflows)

    # depth rank: dense ordering of camera z among in-view gaussians
    order = jnp.argsort(jnp.where(in_view, depth_z, jnp.inf))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    # dense (max_dup, N) key grid
    j = jnp.arange(max_dup, dtype=jnp.int32)[:, None]
    sel = j < dup[None, :]
    r = j // sw_c[None, :]
    c = j % sw_c[None, :]
    tile = (ty0c[None, :] + r) * ntx + (tx0c[None, :] + c)
    key = (tile.astype(jnp.uint32) << RANK_BITS) | rank[None, :].astype(jnp.uint32)
    sentinel = jnp.uint32(0xFFFFFFFF)
    keys = jnp.where(sel, key, sentinel).reshape(-1)
    # payload = dense index j*N + i; gid = payload % N
    payload = (
        j * n + jnp.arange(n, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    pad = e_alloc - keys.shape[0]
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), sentinel, jnp.uint32)])
        payload = jnp.concatenate([payload, jnp.full((pad,), -1, jnp.int32)])

    keys_sorted, payload_sorted = jax.lax.sort((keys, payload), num_keys=1)
    gid_sorted = jnp.where(payload_sorted >= 0, payload_sorted % n, -1)

    # --- per-tile segments + K-aligned re-pad (one monotone scatter) ---
    tile_keys = (jnp.arange(num_tiles + 1, dtype=jnp.uint32)) << RANK_BITS
    starts = jnp.searchsorted(keys_sorted, tile_keys, side="left").astype(jnp.int32)
    seg_len = starts[1:] - starts[:-1]  # (T,)
    pad_len = -(-seg_len // kchunk) * kchunk
    pad_start = jnp.cumsum(pad_len) - pad_len

    # compact output budget: downstream work scales with this, not with the
    # dense sort size
    e_budget = int(n * cfg.entry_budget_mult) + num_tiles * (kchunk - 1)
    e_budget = min(-(-e_budget // kchunk) * kchunk, e_alloc)
    start_c = jnp.minimum(pad_start, e_budget)
    pad_len_c = jnp.minimum(pad_len, e_budget - start_c)
    seg_len_c = jnp.minimum(seg_len, pad_len_c)
    num_dropped = num_dropped + jnp.sum(seg_len - seg_len_c)

    pos = jnp.arange(e_alloc, dtype=jnp.int32)
    tile_of = (keys_sorted >> RANK_BITS).astype(jnp.int32)
    valid = tile_of < num_tiles
    tile_idx = jnp.clip(tile_of, 0, num_tiles - 1)
    new_pos = pad_start[tile_idx] + (pos - starts[:-1][tile_idx])
    new_pos = jnp.where(valid, new_pos, e_budget)
    gid_padded = jnp.full((e_budget,), -1, jnp.int32).at[new_pos].set(
        gid_sorted, mode="drop"
    )

    inv_pos = None
    if with_inverse:
        payload_padded = jnp.full((e_budget,), -1, jnp.int32).at[new_pos].set(
            payload_sorted, mode="drop"
        )
        dense = max_dup * n
        target = jnp.where(payload_padded >= 0, payload_padded, dense)
        inv_pos = (
            jnp.full((dense + 1,), -1, jnp.int32)
            .at[target]
            .set(jnp.arange(e_budget, dtype=jnp.int32), mode="drop")[:dense]
            .reshape(max_dup, n)
        )

    return BinResult(
        gid=gid_padded,
        tile_start=start_c,
        tile_len=seg_len_c,
        num_dropped=num_dropped,
        inv_pos=inv_pos,
    )
