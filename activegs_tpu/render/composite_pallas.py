"""Pallas tile compositor: front-to-back surfel alpha blending on TPU.

The performance core of the framework — the TPU-native replacement for the
CUDA tile rasterizer's render/backward stages (external package
`diff-gaussian-rasterization_2d`; call surface `utils/operations.py:645-720`).

Design (one grid program per 32x32-pixel tile):
  * entry parameters live in HBM as a (PARAM_DIM, E) array whose per-tile
    segments are K-aligned (binning.py); chunks of K entries are streamed
    into VMEM with double-buffered DMA. (A row-major (E, 128-padded) seam
    that eliminated the XLA-side transposes was MEASURED SLOWER — 37.6 ->
    33.9 Mrays/s on the bench — the 5.3x DMA/VMEM inflation and 128-lane
    register pressure cost more than the relayouts they removed.)
  * per chunk, alphas for all (K entries x P pixels) are evaluated on the
    VPU, transmittance is a Hillis-Steele prefix product along the entry
    axis, and the 7 feature channels accumulate via a (7, K) @ (K, P) MXU
    matmul; per-pixel surfel-plane depth composites with an elementwise
    reduce,
  * tiles terminate early once every pixel's transmittance is saturated,
  * the hand-written backward kernel replays chunks in reverse, carrying
    per-pixel suffix state, and emits per-entry parameter gradients with
    chunk-granular DMA writes (disjoint across tiles by construction).

Forward output layout per tile: (T, 16, P) with rows
[r, g, b, nx, ny, nz, depth, conf, transmittance, chunks_done, 0...].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import preprocess as pp
from .types import PARAM_DIM, RasterConfig

OUT_ROWS = 16  # padded to a sublane multiple; rows 10..15 unused
ROW_DEPTH = 6
ROW_CONF = 7
ROW_TRANS = 8
ROW_STOP = 9

# feature rows of the entry layout composited through the MXU matmul,
# in output-channel order [r, g, b, nx, ny, nz, conf]
FEAT_SLICE = (6, 13)  # entry rows 6..12 == colors(3), normals(3), conf... see below


def _use_interpret(cfg: RasterConfig) -> bool:
    if cfg.interpret is not None:
        return cfg.interpret
    return jax.default_backend() != "tpu"


def _cumprod_k(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive prefix product along the entry axis (-2; length k, power of
    two or not) via a Hillis-Steele doubling scan — Mosaic has no native
    cumprod."""
    s = 1
    while s < k:
        pad = jnp.ones((*x.shape[:-2], s, x.shape[-1]), x.dtype)
        x = x * jnp.concatenate([pad, x[..., :-s, :]], axis=-2)
        s *= 2
    return x


def _cumsum_k(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive prefix sum along the entry axis (-2; doubling scan)."""
    s = 1
    while s < k:
        pad = jnp.zeros((*x.shape[:-2], s, x.shape[-1]), x.dtype)
        x = x + jnp.concatenate([pad, x[..., :-s, :]], axis=-2)
        s *= 2
    return x


def _tri_strict(k: int, upper: bool) -> jnp.ndarray:
    """(K, K) strictly-triangular 0/1 f32 mask from iotas (no host constant
    to stage). The 0/1 values are exactly bf16-representable, so the MXU's
    reduced-precision passes lose nothing on this operand."""
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return ((r < c) if upper else (r > c)).astype(jnp.float32)


def _tri_dot(tri: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(K, K) @ (K, P) triangular matmul at HIGHEST precision (~f32: the
    mask splits exactly, the data operand 3-way; Mosaic supports only
    DEFAULT and HIGHEST). Output f32."""
    return jax.lax.dot_general(
        tri,
        x.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _excl_cumprod_total(one_m: jnp.ndarray, k: int):
    """(exclusive prefix product along the entry axis -2, total product)
    via the Hillis-Steele doubling scan. A log-space triangular-MXU form
    (exp(tril_strict @ log(one_m))) was MEASURED SLOWER on the v5e bench
    (51.5 -> 48.4 Mrays/s): the log/exp transcendentals plus the HIGHEST
    (x6-pass) matmul cost more than the ~14 cheap sublane-rotate passes
    of the scan. The cumsum in the backward kernel has no transcendental
    seam, and there the matmul DOES win — see cfg.mxu_scan."""
    cum = _cumprod_k(one_m, k)
    return (
        jnp.concatenate(
            [jnp.ones_like(cum[..., :1, :]), cum[..., :-1, :]], axis=-2
        ),
        cum[..., -1:, :].astype(jnp.float32),
    )


def _tile_pixel_coords(t, ntx: int, cfg: RasterConfig, tpv=None):
    """Pixel-center coordinates (1, P) of program t's tile_h x tile_w tile
    (ntx = tile grid width). tpv = tiles per view when several views share
    one grid (renderer.render_views_batched concatenates per-view tile
    tables, so program t renders view t//tpv's tile t%tpv); None = a
    single-view grid — the traced program is then IDENTICAL to the
    pre-batched form, preserving existing compile-cache entries."""
    p = cfg.tile_pixels
    if tpv is not None:
        t = t % tpv
    tx = t % ntx
    ty = t // ntx
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tx * cfg.tile_w + pix % cfg.tile_w).astype(jnp.float32) + 0.5
    py = (ty * cfg.tile_h + pix // cfg.tile_w).astype(jnp.float32) + 0.5
    return px, py


def _feats_of(e: jnp.ndarray) -> jnp.ndarray:
    """(7, K) matmul features from an entry block (PARAM_DIM, K): colors,
    world normals, confidence (entry rows 6..11 and 16)."""
    return jnp.concatenate([e[6:12, :], e[16:17, :]], axis=0)


def _chunk_cols(e: jnp.ndarray, cfg: RasterConfig) -> dict:
    """Per-entry parameter columns from a DMA'd chunk (PARAM_DIM, K)."""
    return pp.entry_cols(e.T)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())), preferred_element_type=jnp.float32)


def _feat_dot(feats, wgt):
    """Channel accumulation feats (7, K) x wgt (K, P) -> (7, P) per pixel."""
    return _dot(feats, wgt, ((1,), (0,)))


def _featT_dot(feats, g_feat):
    """q-side contraction feats^T (K, 7) x g_feat (7, P) -> (K, P)."""
    return _dot(feats, g_feat, ((0,), (0,)))


def _grad_feat_dot(wgt, g_feat):
    """Feature gradients wgt (K, P) x g_feat^T (P, 7) -> (K, 7)."""
    return _dot(wgt, g_feat, ((1,), (1,)))


def _entry_dma(entries_ref, buf, sem, start, chunk, slot, kchunk):
    off = pl.multiple_of(start + chunk * kchunk, kchunk)
    return pltpu.make_async_copy(
        entries_ref.at[:, pl.ds(off, kchunk)], buf.at[slot], sem.at[slot]
    )


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    start_ref,
    len_ref,
    entries_ref,
    out_ref,
    buf,
    sem,
    *,
    ntx,
    cfg,
    approx=False,
    tpv=None,
):
    kchunk = cfg.chunk
    p = cfg.tile_pixels
    t = pl.program_id(0)
    start = start_ref[t]
    ln = len_ref[t]
    nch = pl.cdiv(ln, kchunk)
    px, py = _tile_pixel_coords(t, ntx, cfg, tpv)
    xtp = cfg.cross_tile_prefetch

    if xtp:
        # chunk 0 arrives in the dedicated slot 2, started by the PREVIOUS
        # grid program (scratch persists across the sequential TPU grid);
        # only program 0 starts its own
        @pl.when((t == 0) & (nch > 0))
        def _():
            _entry_dma(entries_ref, buf, sem, start, 0, 2, kchunk).start()

    else:

        @pl.when(nch > 0)
        def _():
            _entry_dma(entries_ref, buf, sem, start, 0, 0, kchunk).start()

    def slot_of(i):
        # chunk 0 lives in slot 2 under cross-tile prefetch; chunks >= 1
        # keep the usual parity slots (chunk 1 -> slot 1, so no clash)
        return jnp.where(i == 0, 2, i % 2) if xtp else i % 2

    def cond(c):
        i, trans, _ = c
        return (i < nch) & (jnp.max(trans) > cfg.term_eps)

    def body(c):
        i, trans, acc = c
        rslot = slot_of(i)
        _entry_dma(entries_ref, buf, sem, start, i, rslot, kchunk).wait()

        @pl.when(i + 1 < nch)
        def _():
            _entry_dma(entries_ref, buf, sem, start, i + 1, (i + 1) % 2, kchunk).start()

        e = buf[rslot]  # (PARAM_DIM, K)
        cols = _chunk_cols(e, cfg)  # one small relayout per chunk
        # no tail mask needed: K-alignment dummy entries (gid = -1) are
        # gathered as exact zero rows, which evaluate to alpha = 0 through
        # opacity * exp(0) = 0 and the alpha_cut zeroing
        alpha, tdep = pp.eval_alpha_depth_cols(cols, px, py, cfg, approx)  # (K, P)

        one_m = 1.0 - alpha  # pair dtype (bf16 under cfg.bf16_pairs)
        excl, total = _excl_cumprod_total(one_m, kchunk)
        wgt = alpha * excl * trans.astype(alpha.dtype)  # (K, P)

        feats = _feats_of(e).astype(alpha.dtype)  # (7, K)
        ch = _feat_dot(feats, wgt)  # (7, P)
        # depth accumulates in f32 (bf16 depth would quantize ~2 cm at 5 m)
        dsum = jnp.sum(wgt * tdep, axis=-2, keepdims=True)  # (1, P) f32
        acc = acc + jnp.concatenate([ch, dsum], axis=-2)
        trans = trans * total
        return (i + 1, trans, acc)

    init = (
        jnp.int32(0),
        jnp.ones((1, p), jnp.float32),
        jnp.zeros((8, p), jnp.float32),
    )
    i_end, trans, acc = jax.lax.while_loop(cond, body, init)

    @pl.when(i_end < nch)  # drain the prefetched-but-unconsumed DMA
    def _():
        _entry_dma(entries_ref, buf, sem, start, i_end, slot_of(i_end), kchunk).wait()

    if xtp:
        # start the NEXT tile's chunk-0 DMA into slot 2 (free: this tile's
        # slot-2 DMA, if any, was waited at i == 0 — i_end >= 1 whenever
        # nch > 0 since transmittance starts at 1 > term_eps)
        @pl.when(t + 1 < pl.num_programs(0))
        def _():
            ns = start_ref[t + 1]

            @pl.when(len_ref[t + 1] > 0)
            def _():
                _entry_dma(entries_ref, buf, sem, ns, 0, 2, kchunk).start()

    zeros = jnp.zeros((OUT_ROWS - 10, trans.shape[-1]), jnp.float32)
    stop_row = jnp.ones_like(trans) * i_end.astype(jnp.float32)
    # rows: rgb(0:3) nrm(3:6) from acc[0:6]; depth=acc[7]; conf=acc[6]
    out = jnp.concatenate(
        [
            acc[0:6, :],
            acc[7:8, :],
            acc[6:7, :],
            trans,
            stop_row,
            zeros,
        ],
        axis=-2,
    )
    out_ref[0, :, :] = out


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    start_ref,
    len_ref,
    stop_ref,
    entries_ref,
    out_fwd_ref,
    gout_ref,
    dentries_ref,
    rbuf,
    rsem,
    wbuf,
    wsem,
    *,
    ntx,
    cfg,
    approx=False,
    tpv=None,
):
    kchunk = cfg.chunk
    t = pl.program_id(0)
    start = start_ref[t]
    ln = len_ref[t]
    nch = pl.cdiv(ln, kchunk)
    stop = stop_ref[t]
    px, py = _tile_pixel_coords(t, ntx, cfg, tpv)
    triu_s = _tri_strict(kchunk, upper=True) if cfg.mxu_scan else None

    g = gout_ref[0]  # (OUT_ROWS, P)
    # feature-channel grads in feats order [r g b nx ny nz conf]
    g_feat = jnp.concatenate(
        [g[0:6, :], g[ROW_CONF : ROW_CONF + 1, :]], axis=-2
    )
    g_depth = g[ROW_DEPTH : ROW_DEPTH + 1, :]
    g_trans = g[ROW_TRANS : ROW_TRANS + 1, :]
    t_final = out_fwd_ref[0, ROW_TRANS : ROW_TRANS + 1, :]  # (1, P)
    dt = jnp.bfloat16 if cfg.bf16_pairs else jnp.float32
    g_feat_d = g_feat.astype(dt)  # matmul operand in pair dtype (MXU-native)
    gtf = (g_trans * t_final).astype(dt)  # (1, P), hoisted out of the loop

    def wdma(slot, chunk):
        off = pl.multiple_of(start + chunk * kchunk, kchunk)
        return pltpu.make_async_copy(
            wbuf.at[slot], dentries_ref.at[:, pl.ds(off, kchunk)], wsem.at[slot]
        )

    # ---- zero-fill chunks the forward pass never reached ----
    # both write slots hold zeros; DMAs alternate slots/semaphores with up
    # to two in flight (the old loop start();wait()ed each chunk serially)
    @pl.when(stop < nch)
    def _():
        wbuf[0] = jnp.zeros((PARAM_DIM, kchunk), jnp.float32)
        wbuf[1] = jnp.zeros((PARAM_DIM, kchunk), jnp.float32)

    def zero_body(i, _):
        @pl.when(i - 2 >= stop)
        def _():
            wdma((i - 2) % 2, i - 2).wait()

        wdma(i % 2, i).start()
        return 0

    jax.lax.fori_loop(stop, nch, zero_body, 0)

    @pl.when(nch - 2 >= stop)
    def _():
        wdma((nch - 2) % 2, nch - 2).wait()

    @pl.when(nch - 1 >= stop)
    def _():
        wdma((nch - 1) % 2, nch - 1).wait()

    @pl.when(stop > 0)
    def _():
        _entry_dma(entries_ref, rbuf, rsem, start, stop - 1, (stop - 1) % 2, kchunk).start()

    def body(c):
        i, t_after, s_q = c
        _entry_dma(entries_ref, rbuf, rsem, start, i, i % 2, kchunk).wait()

        @pl.when(i - 1 >= 0)
        def _():
            _entry_dma(entries_ref, rbuf, rsem, start, i - 1, (i - 1) % 2, kchunk).start()

        e = rbuf[i % 2]
        cols = _chunk_cols(e, cfg)
        terms = pp.eval_pair_terms_bwd(cols, px, py, cfg, approx)
        tdep = terms["t"]
        # dummy entries are zero rows -> alpha 0, inside False: every grad
        # chain below already zeroes them, no tail mask needed
        alpha = terms["alpha"]

        one_m = 1.0 - alpha  # pair dtype (bf16 under cfg.bf16_pairs)
        excl, total = _excl_cumprod_total(one_m, kchunk)
        t_before = t_after / jnp.maximum(total, 1e-30)
        t_k = t_before.astype(dt) * excl
        wgt = alpha * t_k  # (K, P) pair dtype

        feats = _feats_of(e).astype(dt)  # (7, K)
        # q_k(p) = sum_c feat_c[k] g_c(p) + t_k(p) g_depth(p)
        q = _featT_dot(feats, g_feat_d) + tdep * g_depth  # (K, P) f32
        q_d = q.astype(dt)
        wq = wgt * q_d
        if cfg.mxu_scan:
            # suffix over entries strictly after k: one strictly-upper
            # triangular MXU matmul instead of the 14-pass doubling scan
            sfx = _tri_dot(triu_s, wq).astype(dt)
            tot_wq = jnp.sum(wq, axis=-2, keepdims=True, dtype=jnp.float32)
        else:
            incl = _cumsum_k(wq, kchunk)
            sfx = incl[..., -1:, :] - incl
            tot_wq = incl[..., -1:, :].astype(jnp.float32)
        suffix = s_q.astype(dt) + sfx  # entries strictly after k
        dalpha = t_k * q_d - (suffix + gtf) * pp.recip(jnp.maximum(one_m, 0.01), approx)
        # Mosaic v5e has no bf16 vector compare: the active mask runs on an
        # f32 upcast, against the alpha_max value as rounded by the forward
        # clamp in the pair dtype (else clamped entries leak gradient)
        af = alpha.astype(jnp.float32)
        active = (af > 0.0) & (af < pp.effective_alpha_max(cfg))
        dalpha = jnp.where(active, dalpha, 0.0)

        # ---- chain into entry parameters ----
        # per-entry constants (ca/cb/cc) are pulled OUT of the per-pair
        # reductions: the five mean/conic grads reduce to five moment sums
        # of dpow against {dx, dy, dx^2, dxdy, dy^2} (t1/t2 shared), ~10
        # fewer VPU ops per pair than the direct integrand forms.
        # Reductions accumulate in f32 regardless of the pair dtype.
        f32 = jnp.float32
        dx = terms["dx"]
        dy = terms["dy"]
        dpow = dalpha * alpha  # d/d(power) premultiplier
        t1 = dpow * dx
        t2 = dpow * dy
        s_x = jnp.sum(t1, -1, keepdims=True, dtype=f32)
        s_y = jnp.sum(t2, -1, keepdims=True, dtype=f32)
        s_xx = jnp.sum(t1 * dx, -1, keepdims=True, dtype=f32)
        s_xy = jnp.sum(t1 * dy, -1, keepdims=True, dtype=f32)
        s_yy = jnp.sum(t2 * dy, -1, keepdims=True, dtype=f32)
        dmean_x = cols["ca"] * s_x + cols["cb"] * s_y
        dmean_y = cols["cb"] * s_x + cols["cc"] * s_y
        dca = -0.5 * s_xx
        dcb = -s_xy
        dcc = -0.5 * s_yy
        # d(alpha)/d(op) = exp(power) wherever alpha is not clamped — `active`
        # already zeroed dalpha at the alpha_max clamp and the cutoff, so the
        # per-pair divide alpha/op reduces to the exp already computed
        dop = jnp.sum(dalpha * terms["ex"], -1, keepdims=True, dtype=f32)

        # feature grads: (K, 7) = wgt (K,P) @ g_feat^T (P,7)
        dfeat = _grad_feat_dot(wgt, g_feat_d)  # (K, 7)

        # depth-plane grads (inv_denom / t_raw / clamp masks shared with the
        # alpha-depth evaluation above — one divide per pair, not three);
        # stays f32 end-to-end
        wgd = wgt.astype(f32) * g_depth
        t_raw = terms["t_raw"]
        inside = terms["inside"]
        com = jnp.where(inside, wgd * terms["inv_denom"], 0.0)
        u = com * t_raw  # shared by dpa/dpb/dpc
        dpd = jnp.sum(com, -1, keepdims=True)
        dpa = -jnp.sum(u * px, -1, keepdims=True)
        dpb = -jnp.sum(u * py, -1, keepdims=True)
        dpc = -jnp.sum(u, -1, keepdims=True)
        # dz grad: in every NON-inside branch (lo/hi clamp, invalid plane)
        # the composited depth is t = c * dz with c in {depth_lo, depth_hi,
        # 1}, so dt/ddz = t / dz there — one masked product-sum instead of
        # the three branch-mask selects (saves ~3 VPU ops/pair; t carries
        # c*dz to 1 ulp, well inside the 2e-5 gradient tolerances)
        ddz = jnp.sum(
            jnp.where(inside, 0.0, wgd * terms["t"]), -1, keepdims=True
        ) / jnp.maximum(cols["dz"], 1e-30)

        zcol = jnp.zeros_like(dpd)
        dcols = jnp.concatenate(
            [
                dmean_x,
                dmean_y,
                dca,
                dcb,
                dcc,
                dop,
                dfeat[..., 0:6],  # colors + normals
                dpa,
                dpb,
                dpc,
                dpd,
                dfeat[..., 6:7],  # confidence
                ddz,
            ]
            + [zcol] * (PARAM_DIM - 18),
            axis=-1,
        )  # (..., K, PARAM_DIM)

        # reuse of a write slot two iterations later must wait its DMA
        @pl.when(i + 2 <= stop - 1)
        def _():
            wdma(i % 2, i + 2).wait()

        wbuf[i % 2] = dcols.reshape(kchunk, PARAM_DIM).T
        wdma(i % 2, i).start()

        return (i - 1, t_before, s_q + tot_wq)

    p = cfg.tile_pixels
    init = (
        stop - 1,
        t_final,
        jnp.zeros((1, p), jnp.float32),
    )
    jax.lax.while_loop(lambda c: c[0] >= 0, body, init)

    # drain outstanding writes (chunks 0 and 1 are never waited in-loop)
    @pl.when(stop >= 1)
    def _():
        wdma(0, 0).wait()

    @pl.when(stop >= 2)
    def _():
        wdma(1, 1).wait()


# --------------------------------------------------------------------------
# stats (importance / count) — forward-only replay with a pixel mask
# --------------------------------------------------------------------------


def _stats_kernel(
    start_ref,
    len_ref,
    entries_ref,
    mask_ref,
    thres_ref,
    imp_ref,
    cnt_ref,
    buf,
    sem,
    wimp,
    wcnt,
    wsem,
    *,
    ntx,
    cfg,
    approx=False,
    tpv=None,
):
    kchunk = cfg.chunk
    t = pl.program_id(0)
    start = start_ref[t]
    ln = len_ref[t]
    nch = pl.cdiv(ln, kchunk)
    px, py = _tile_pixel_coords(t, ntx, cfg, tpv)
    # (8, P) broadcast rows; row 0 is the real mask
    mask = mask_ref[0]
    pix_mask = mask[0:1, :]
    thres = thres_ref[0, 0]

    def wdma(slot, chunk):
        off = pl.multiple_of(start + chunk * kchunk, kchunk)
        return (
            pltpu.make_async_copy(
                wimp.at[slot], imp_ref.at[:, pl.ds(off, kchunk)], wsem.at[slot, 0]
            ),
            pltpu.make_async_copy(
                wcnt.at[slot], cnt_ref.at[:, pl.ds(off, kchunk)], wsem.at[slot, 1]
            ),
        )

    @pl.when(nch > 0)
    def _():
        _entry_dma(entries_ref, buf, sem, start, 0, 0, kchunk).start()

    def cond(c):
        i, trans = c
        return (i < nch) & (jnp.max(trans) > cfg.term_eps)

    def body(c):
        i, trans = c
        _entry_dma(entries_ref, buf, sem, start, i, i % 2, kchunk).wait()

        @pl.when(i + 1 < nch)
        def _():
            _entry_dma(entries_ref, buf, sem, start, i + 1, (i + 1) % 2, kchunk).start()

        e = buf[i % 2]
        cols = _chunk_cols(e, cfg)
        alpha, _ = pp.eval_alpha_depth_cols(cols, px, py, cfg, approx)
        one_m = 1.0 - alpha
        excl, total = _excl_cumprod_total(one_m, kchunk)
        wgt = alpha * excl * trans
        wm = wgt * pix_mask
        imp = jnp.sum(wm, axis=-1, keepdims=True)  # (K, 1)
        cnt = jnp.sum(
            jnp.where(wm >= thres, 1.0, 0.0), axis=-1, keepdims=True
        )

        # double-buffered writes: wait only when reusing a slot (two chunks
        # back), so chunk i+1's compute overlaps chunk i's write DMA
        @pl.when(i > 1)
        def _():
            a, b = wdma(i % 2, i - 2)
            a.wait()
            b.wait()

        wimp[i % 2] = imp.reshape(kchunk, 1).T
        wcnt[i % 2] = cnt.reshape(kchunk, 1).T
        a, b = wdma(i % 2, i)
        a.start()
        b.start()

        return (i + 1, trans * total)

    p = cfg.tile_pixels
    trans0 = jnp.ones((1, p), jnp.float32)
    i_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), trans0))

    @pl.when(i_end < nch)
    def _():
        _entry_dma(entries_ref, buf, sem, start, i_end, i_end % 2, kchunk).wait()

    @pl.when(i_end > 1)
    def _():
        a, b = wdma(i_end % 2, i_end - 2)
        a.wait()
        b.wait()

    @pl.when(i_end > 0)
    def _():
        a, b = wdma((i_end - 1) % 2, i_end - 1)
        a.wait()
        b.wait()

    # zero-fill unreached chunks (both slots zeroed, DMAs pipelined)
    @pl.when(i_end < nch)
    def _():
        wimp[0] = jnp.zeros((1, kchunk), jnp.float32)
        wimp[1] = jnp.zeros((1, kchunk), jnp.float32)
        wcnt[0] = jnp.zeros((1, kchunk), jnp.float32)
        wcnt[1] = jnp.zeros((1, kchunk), jnp.float32)

    def zero_body(i, _):
        @pl.when(i - 2 >= i_end)
        def _():
            a, b = wdma((i - 2) % 2, i - 2)
            a.wait()
            b.wait()

        a, b = wdma(i % 2, i)
        a.start()
        b.start()
        return 0

    jax.lax.fori_loop(i_end, nch, zero_body, 0)

    @pl.when(nch - 2 >= i_end)
    def _():
        a, b = wdma((nch - 2) % 2, nch - 2)
        a.wait()
        b.wait()

    @pl.when(nch - 1 >= i_end)
    def _():
        a, b = wdma((nch - 1) % 2, nch - 1)
        a.wait()
        b.wait()


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------


def _out_block(num_programs: int, cfg: RasterConfig):
    """(block_shape, out_shape_rows) of the per-tile output."""
    return (1, OUT_ROWS, cfg.tile_pixels), num_programs


def _run_fwd(entries, tile_start, tile_len, num_tiles, ntx, cfg, tpv=None):
    interpret = _use_interpret(cfg)
    kernel = functools.partial(
        _fwd_kernel, ntx=ntx, cfg=cfg, approx=not interpret, tpv=tpv
    )
    blk, out_rows = _out_block(num_tiles, cfg)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(blk, lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (out_rows, OUT_ROWS, blk[2]), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (3 if cfg.cross_tile_prefetch else 2, PARAM_DIM, cfg.chunk),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((3 if cfg.cross_tile_prefetch else 2,)),
        ],
        interpret=interpret,
    )(tile_start, tile_len, entries)


def _run_bwd(
    entries, tile_start, tile_len, stop, out_fwd, gout, num_tiles, ntx, cfg, tpv=None
):
    interpret = _use_interpret(cfg)
    kernel = functools.partial(
        _bwd_kernel, ntx=ntx, cfg=cfg, approx=not interpret, tpv=tpv
    )
    blk, _ = _out_block(num_tiles, cfg)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(blk, lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(entries.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, PARAM_DIM, cfg.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, PARAM_DIM, cfg.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_start, tile_len, stop, entries, out_fwd, gout)


def _unpack_static(static):
    """static = (num_tiles, ntx, cfg[, tiles_per_view]). The optional 4th
    element batches several concatenated views onto one grid (see
    renderer.render_views_batched); a 3-tuple (or tpv == num_tiles) keeps
    the single-view traced program byte-identical."""
    num_tiles, ntx, cfg = static[:3]
    tpv = static[3] if len(static) > 3 else None
    if tpv == num_tiles:
        tpv = None
    return num_tiles, ntx, cfg, tpv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def composite_tiled(entries, tile_start, tile_len, static):
    """Differentiable tiled composite. static = (num_tiles, ntx, cfg) or
    (num_tiles, ntx, cfg, tiles_per_view) for multi-view batched grids."""
    num_tiles, ntx, cfg, tpv = _unpack_static(static)
    return _run_fwd(entries, tile_start, tile_len, num_tiles, ntx, cfg, tpv)


def _composite_fwd(entries, tile_start, tile_len, static):
    num_tiles, ntx, cfg, tpv = _unpack_static(static)
    out = _run_fwd(entries, tile_start, tile_len, num_tiles, ntx, cfg, tpv)
    stop = out[:, ROW_STOP, 0].astype(jnp.int32)
    return out, (entries, tile_start, tile_len, stop, out)


def _composite_bwd(static, res, gout):
    num_tiles, ntx, cfg, tpv = _unpack_static(static)
    entries, tile_start, tile_len, stop, out = res
    dentries = _run_bwd(
        entries, tile_start, tile_len, stop, out, gout, num_tiles, ntx, cfg, tpv
    )
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return dentries, f0(tile_start), f0(tile_len)


composite_tiled.defvjp(_composite_fwd, _composite_bwd)


def composite_stats(
    entries, tile_start, tile_len, pixel_mask, num_tiles, ntx, cfg, weight_thres
):
    """Per-entry importance/count replay (`count`/`importance` outputs of the
    CUDA rasterizer, used by `gaussian_map.py:193-232`). pixel_mask:
    (T, 8, P) f32 (row 0 = render mask; padded rows for tiling). Returns
    (importance (1, E), count (1, E)). Single-view grids only: the batched
    multi-view (tpv) form exists for fwd/bwd (composite_tiled, used by
    renderer.render_views_batched) but stats has no batched caller — grow
    the parameter back WITH a parity test if one appears."""
    interpret = _use_interpret(cfg)
    kernel = functools.partial(
        _stats_kernel, ntx=ntx, cfg=cfg, approx=not interpret
    )
    thres = jnp.full((1, 1), weight_thres, jnp.float32)
    mask_blk = (1, 8, cfg.tile_pixels)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(mask_blk, lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, entries.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((1, entries.shape[1]), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PARAM_DIM, cfg.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 1, cfg.chunk), jnp.float32),
            pltpu.VMEM((2, 1, cfg.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_start, tile_len, entries, pixel_mask, thres)
