"""Image-space operators: depth->normal, bilateral smoothing, SSIM.

Functional equivalents of `utils/operations.py:161-219` (depth smoothing and
depth->normal) and `mapping/utils.py:128-187` (SSIM), written as pure jnp so
they fuse into the jitted training step instead of bouncing to OpenCV on the
host like the reference (`gaussian_map.py:297`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_replicate(x: jnp.ndarray, r: int, axes=(-2, -1)) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    for a in axes:
        pad[a % x.ndim] = (r, r)
    return jnp.pad(x, pad, mode="edge")


def depth_to_normal(
    depth: jnp.ndarray, mask: jnp.ndarray, intrinsics: jnp.ndarray
) -> jnp.ndarray:
    """Camera-space normals (h, w, 3) from a z-depth map (h, w).

    Equivalent of `depth2normal` (`utils/operations.py:172-219`): back-project
    pixels to camera space, take masked finite differences to the 4
    neighbors, average the 4 adjacent cross products, normalize, zero out
    masked pixels. `mask` marks valid depth. Differentiable w.r.t. depth.
    """
    h, w = depth.shape
    fx = intrinsics[0, 0] * w
    fy = intrinsics[1, 1] * h
    cx = intrinsics[0, 2] * w
    cy = intrinsics[1, 2] * h
    us = jnp.arange(w, dtype=depth.dtype) + 0.5
    vs = jnp.arange(h, dtype=depth.dtype) + 0.5
    gv, gu = jnp.meshgrid(vs, us, indexing="ij")
    x = (gu - cx) / fx * depth
    y = (gv - cy) / fy * depth
    p = jnp.stack([x, y, depth], axis=-1)  # (h, w, 3) camera points

    m = mask.astype(depth.dtype)[..., None]
    pp = _pad_replicate(p, 1, axes=(0, 1))
    mp = _pad_replicate(m, 1, axes=(0, 1))

    p_c = pp[1:-1, 1:-1] * mp[1:-1, 1:-1]
    p_u = (pp[:-2, 1:-1] - p_c) * mp[:-2, 1:-1]
    p_l = (pp[1:-1, :-2] - p_c) * mp[1:-1, :-2]
    p_b = (pp[2:, 1:-1] - p_c) * mp[2:, 1:-1]
    p_r = (pp[1:-1, 2:] - p_c) * mp[1:-1, 2:]

    n = (
        jnp.cross(p_u, p_l)
        + jnp.cross(p_r, p_u)
        + jnp.cross(p_b, p_r)
        + jnp.cross(p_l, p_b)
    )
    # rsqrt(max(.)) normalization: NaN-free gradient where n == 0 (this is
    # differentiated through the rendered depth in the consistency loss)
    n2 = jnp.sum(n * n, axis=-1, keepdims=True)
    n = n * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    return n * m


def bilateral_filter(
    depth: jnp.ndarray,
    radius: int = 7,
    sigma_value: float = 0.5,
    sigma_space: float = 20.0,
) -> jnp.ndarray:
    """Edge-preserving depth smoothing before normal estimation.

    On-device replacement for `get_smooth_depth` (`utils/operations.py:
    161-169`, cv2.bilateralFilter(d=15, sigmaColor=0.5, sigmaSpace=20));
    invalid (< 0) depths are treated as 0-weight and restored afterwards.
    """
    invalid = depth < 0.0
    d = jnp.where(invalid, 0.0, depth)
    valid = (~invalid).astype(depth.dtype)

    k = 2 * radius + 1
    dp = _pad_replicate(d, radius, axes=(0, 1))
    vp = _pad_replicate(valid, radius, axes=(0, 1))
    h, w = depth.shape

    offs = [(dy, dx) for dy in range(k) for dx in range(k)]
    offs_arr = jnp.array(offs, jnp.int32)
    space_w = jnp.exp(
        -((offs_arr[:, 0] - radius) ** 2 + (offs_arr[:, 1] - radius) ** 2)
        / (2.0 * sigma_space**2)
    )

    def body(i, acc):
        num, den = acc
        dy = offs_arr[i, 0]
        dx = offs_arr[i, 1]
        nb = jax.lax.dynamic_slice(dp, (dy, dx), (h, w))
        nv = jax.lax.dynamic_slice(vp, (dy, dx), (h, w))
        wgt = (
            jnp.exp(-((nb - d) ** 2) / (2.0 * sigma_value**2)) * nv * space_w[i]
        )
        return num + wgt * nb, den + wgt

    num, den = jax.lax.fori_loop(
        0, len(offs), body, (jnp.zeros_like(d), jnp.zeros_like(d))
    )
    out = jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), d)
    return jnp.where(invalid, -1.0, out)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM between (..., c, h, w) images, data range 1.0.

    Gaussian-window SSIM matching `_ssim` (`mapping/utils.py:158-187`),
    sigma 1.5, C1=0.01^2, C2=0.03^2, 'same' padding.
    """
    xs = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(xs**2) / (2.0 * 1.5**2))
    g = g / jnp.sum(g)
    win = jnp.outer(g, g)

    def blur(x):
        b = x.reshape((-1, 1) + x.shape[-2:])
        out = jax.lax.conv_general_dilated(
            b,
            win[None, None],
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out.reshape(x.shape)

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(ssim_map)


def central_diff_sq(x: jnp.ndarray) -> jnp.ndarray:
    """Squared-norm forward/backward differences, (v, c, h, w) -> (v, 4, h, w).

    `central_diff` (`mapping/utils.py:42-62`): left/right/up/down shifted
    differences, zero padded on the vacated edge, summed over channels.
    """
    zl = jnp.zeros_like(x[..., :, :1])
    zr = jnp.zeros_like(x[..., :1, :])
    left = jnp.concatenate([x[..., :, :-1] - x[..., :, 1:], zl], axis=-1)
    right = jnp.concatenate([zl, x[..., :, 1:] - x[..., :, :-1]], axis=-1)
    up = jnp.concatenate([x[..., :-1, :] - x[..., 1:, :], zr], axis=-2)
    down = jnp.concatenate([zr, x[..., 1:, :] - x[..., :-1, :]], axis=-2)
    diffs = jnp.stack([left, right, up, down], axis=-3)  # (v, c, 4, h, w)
    return jnp.sum(diffs**2, axis=-4)  # (v, 4, h, w)
