"""Training losses for the Gaussian-surfel map.

Functional equivalents of `mapping/utils.py:14-187` and the loss assembly in
`GaussianMap.train` (`mapping/gaussian_map.py:106-124`). All operate on
(V, C, H, W) batches and are pure jnp (fused into the jitted train step).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.image_ops import central_diff_sq


def l1_masked(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-element masked L1 map (`l1_loss_fc_mask`, `mapping/utils.py:120-121`)."""
    return jnp.abs((pred - gt) * mask)


def consistency_loss(normals: jnp.ndarray, depth_normals: jnp.ndarray) -> jnp.ndarray:
    """1 - cos(rendered normal, depth-derived normal) per pixel
    (`cons_loss_fc`, `mapping/utils.py:14-16`). Inputs (V, 3, H, W)."""
    return 1.0 - jnp.sum(normals * depth_normals, axis=1)


def normal_tv_loss(
    normals: jnp.ndarray,
    depths: jnp.ndarray,
    mask: jnp.ndarray,
    sigma: float = 0.3,
) -> jnp.ndarray:
    """Edge-aware normal total-variation loss (`normal_tv_loss_fc`,
    `mapping/utils.py:28-39`): squared normal differences to 4 neighbors,
    gated to flat-depth regions (depth diff <= 1e-4) and weighted by
    exp(-diff / 2 sigma^2). depths are detached by the caller.

    Equivalent to `mean(depth_mask * exp(-cd(n)/2s^2) * cd(n) * mask)` with
    cd = central_diff_sq, but computed in ONE pass per axis: the left/right
    (up/down) differences are the same squared values at shifted positions,
    so each axis contributes `term * (mask_left + mask_right)` — this avoids
    materializing the (V, C, 4, H, W) stack (100 MB/step in the train loop,
    fwd + VJP) that the naive stacked form costs."""
    v, _, h, w = normals.shape
    m = mask[:, 0] if mask.ndim == 4 else mask  # (V, H, W)
    inv_two_sigma_sq = 1.0 / (2.0 * sigma**2)

    def axis_term(sl_a, sl_b):
        """Slices select the two adjacent views along one axis."""
        nd = jnp.sum((normals[sl_a] - normals[sl_b]) ** 2, axis=1)  # (V,h',w')
        dd = jnp.sum((depths[sl_a] - depths[sl_b]) ** 2, axis=1)
        term = (dd <= 1e-4) * jnp.exp(-nd * inv_two_sigma_sq) * nd
        msl_a = (sl_a[0],) + sl_a[2:]
        msl_b = (sl_b[0],) + sl_b[2:]
        return jnp.sum(term * (m[msl_a] + m[msl_b]))

    s = slice(None)
    total = axis_term(
        (s, s, s, slice(None, -1)), (s, s, s, slice(1, None))
    ) + axis_term((s, s, slice(None, -1), s), (s, s, slice(1, None), s))
    return total / (v * 4 * h * w)


# NOTE: the reference also defines `scale_loss_fc`/`op_loss_fc`
# (`mapping/utils.py:104-113`) but its train loop never assembles them into
# the total (`gaussian_map.py:119-124`); they are deliberately not carried
# here — the 4-term total below is the complete loss contract.

# 4-term total weights (`gaussian_map.py:119-124`):
# rgb + 0.8 depth + 0.1 consistency + 0.1 normal-TV
W_DEPTH = 0.8
W_CONS = 0.1
W_TV = 0.1


def total_from_view_terms(rgb_t, depth_t, cons_t, tv_t):
    """The 4-term total of `gaussian_map.py:119-124` from per-view scalar
    terms (each (V,), already meaned within its view — equal view sizes
    make the view-mean-of-means identical to the stacked-batch mean).

    REFERENCE FORM: the train step folds these weights into two per-view
    reductions (`trainer._view_loss`) for fewer ops; equality is pinned by
    tests/test_mapping.py::test_view_loss_matches_unfused_terms."""
    return (
        jnp.mean(rgb_t)
        + W_DEPTH * jnp.mean(depth_t)
        + W_CONS * jnp.mean(cons_t)
        + W_TV * jnp.mean(tv_t)
    )
