"""Dense reference compositor — the test oracle for the tiled Pallas path.

Composites every gaussian against every pixel with one (N, H*W) alpha
matrix: no binning, no tiling, no chunking, so its correctness is obvious by
inspection. Differentiable end-to-end through JAX autodiff. Only usable for
small scenes/images (tests); the production path is render/renderer.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import preprocess as pp
from .types import (
    FEAT_DIM,
    O_CONF,
    O_DEPTH,
    O_TRANS,
    Camera,
    GaussianAttrs,
    RasterConfig,
)


def composite_dense(
    params2d: jnp.ndarray,
    order: jnp.ndarray,
    image_shape: tuple[int, int],
    cfg: RasterConfig,
    render_mask: jnp.ndarray | None = None,
    weight_thres: float = 0.03,
):
    """Composite depth-ordered gaussians densely over the full image.

    params2d: (N, PARAM_DIM); order: (N,) int32 front-to-back ordering
    (invalid gaussians must have zeroed params). Returns
    (out (10, H*W), importance (N,), count (N,)).
    """
    h, w = image_shape
    n = params2d.shape[0]
    entries = params2d[order, :]  # (N, PARAM_DIM) sorted front-to-back

    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    px = gx.reshape(1, -1)
    py = gy.reshape(1, -1)

    cols = pp.entry_cols(entries)
    alpha, tdep = pp.eval_alpha_depth_cols(cols, px, py, cfg)  # (N, P)

    one_m = 1.0 - alpha
    cum = jnp.cumprod(one_m, axis=0)
    excl = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)
    weight = alpha * excl  # (N, P)
    t_final = cum[-1]

    feats = jnp.concatenate(
        [entries[:, 6:12], entries[:, 16:17]], axis=1
    )  # (N, 7)
    ch = feats.T @ weight  # (7, P)
    depth = jnp.sum(weight * tdep, axis=0, keepdims=True)

    out = jnp.concatenate(
        [ch[:6], depth, ch[6:7], t_final[None], jnp.zeros_like(t_final)[None]], axis=0
    )

    # flat (P,): a (1, P) mask would broadcast wm to (1, N, P) and silently
    # produce (N, P)-shaped importance via clipped indexing
    mask = (
        jnp.ones((h * w,), jnp.float32)
        if render_mask is None
        else render_mask.reshape(-1).astype(jnp.float32)
    )
    wm = weight * mask[None, :]
    importance_sorted = jnp.sum(wm, axis=1)
    count_sorted = jnp.sum((wm >= weight_thres).astype(jnp.int32), axis=1)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return out, importance_sorted[inv], count_sorted[inv]


def render_dense(
    attrs: GaussianAttrs,
    camera: Camera,
    image_shape: tuple[int, int],
    cfg: RasterConfig = RasterConfig(),
    front_only: bool = False,
    render_mask: jnp.ndarray | None = None,
    weight_thres: float = 0.03,
    background: jnp.ndarray | None = None,
):
    """Full oracle render: preprocess + dense composite + channel post.

    Returns a dict with the reference channel set (`utils/operations.py:703`):
    rgb/depth/normal/opacity/confidence images, per-gaussian importance/count,
    in-frustum mask (radii > 0) and raw transmittance.
    """
    h, w = image_shape
    params2d, radius, depth_z, in_view = pp.preprocess(
        attrs, camera, image_shape, cfg, front_only=front_only
    )
    order = jnp.argsort(jnp.where(in_view, depth_z, jnp.inf))
    out, importance, count = composite_dense(
        params2d, order, image_shape, cfg, render_mask, weight_thres
    )
    trans = out[O_TRANS].reshape(1, h, w)
    rgb = out[0:3].reshape(3, h, w)
    if background is not None:
        rgb = rgb + trans * background[:, None, None]
    normal = out[3:6].reshape(3, h, w)
    opacity = 1.0 - trans
    vis = opacity > 1e-2
    n2 = jnp.sum(normal * normal, axis=0, keepdims=True)
    normal = normal * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    normal = normal * vis
    return {
        "rgb": rgb,
        "depth": out[O_DEPTH].reshape(1, h, w),
        "normal": normal,
        "opacity": opacity,
        "confidence": out[O_CONF].reshape(1, h, w),
        "importance": importance,
        "count": count,
        "in_view": in_view,
        "radius": radius,
        "transmittance": trans,
        "raw": out,
    }
