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
    exp(-diff / 2 sigma^2). depths are detached by the caller."""
    normal_diff = central_diff_sq(normals)  # (V, 4, H, W)
    depth_diff = central_diff_sq(depths)
    depth_mask = (depth_diff <= 1e-4).astype(normals.dtype)
    weights = jnp.exp(-normal_diff / (2.0 * sigma**2))
    return jnp.mean(depth_mask * weights * normal_diff * mask)


def scale_loss(scales: jnp.ndarray) -> jnp.ndarray:
    """Isotropy regularizer on the two tangent scales (`scale_loss_fc`,
    `mapping/utils.py:104-108`)."""
    mean2 = jnp.mean(scales[..., :2], axis=-1, keepdims=True)
    return jnp.mean(jnp.abs(scales[..., :2] - mean2))


def opacity_loss(opacities: jnp.ndarray, confidences: jnp.ndarray) -> jnp.ndarray:
    """(1 - confidence) * opacity (`op_loss_fc`, `mapping/utils.py:111-113`)."""
    return jnp.mean((1.0 - confidences) * opacities)


def total_mapping_loss(rgb_l1_map, depth_l1_map, cons_map, tv_loss, vis_mask):
    """The 4-term total of `gaussian_map.py:119-124`:
    rgb + 0.8 depth + 0.1 consistency + 0.1 normal-TV."""
    rgb_loss = jnp.mean(rgb_l1_map)
    depth_loss = jnp.mean(depth_l1_map)
    cons = jnp.mean(cons_map * vis_mask)
    return rgb_loss + 0.8 * depth_loss + 0.1 * cons + 0.1 * tv_loss
