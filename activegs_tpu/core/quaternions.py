"""Quaternion / rotation utilities (pure jnp, batched).

Functional equivalents of the reference math in
`utils/operations.py:261-369,481-541` (quaternion<->matrix conversions,
normal->surfel-frame construction), written for JAX. Quaternions use
(w, x, y, z) ordering with the real part first, matching the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Safe L2 normalization."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Matches `utils/operations.py:261-278`. The input need not be normalized
    (callers apply the normalize activation first, `gaussian_map.py:60`).
    """
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    m = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - r * z),
            2 * (x * z + r * y),
            2 * (x * y + r * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - r * x),
            2 * (x * z - r * y),
            2 * (y * z + r * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Robust 4-candidate construction (no NaN for trace <= -1, unlike the
    reference's simple form `rotmat2quaternion` at `utils/operations.py:
    526-541`, which NaNs near 180-degree rotations and then filters them out
    at spawn, `gaussian_map.py:389-390`). Output is standardized to w >= 0.
    """
    b = m.shape[:-2]
    f = m.reshape(b + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(f, -1, 0)

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    # candidate quaternions scaled by each of (w, x, y, z)
    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        axis=-2,
    )
    cand = cand / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    q = jnp.where(q[..., :1] < 0, -q, q)  # w >= 0 standard form
    return normalize(q)


def normal_to_quaternion(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build a surfel frame whose third column is the given normal.

    Equivalent of `normal2rotation` (`utils/operations.py:481-500`): pick a
    reference vector ([1,0,0], or [0,1,0] when nearly parallel to the
    normal), Gram-Schmidt an x-axis, y = z cross x, return (quat, R) with
    R = [x | y | z] columns.
    """
    z = normalize(z)
    ref = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], z.dtype), z.shape)
    alt = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], z.dtype), z.shape)
    ref = jnp.where(jnp.abs(z[..., :1]) > 0.99, alt, ref)
    x = ref - jnp.sum(ref * z, -1, keepdims=True) * z
    x = normalize(x)
    y = normalize(jnp.cross(z, x))
    rot = jnp.stack([x, y, z], axis=-1)
    return matrix_to_quaternion(rot), rot


def rotation_from_z(z: jnp.ndarray) -> jnp.ndarray:
    """Camera rotation whose +z (view) axis is `z`, with no roll.

    Equivalent of `rotation_from_z_batch` (`planning/utils.py:228-259`):
    the camera's y axis is derived from world -z "down", with a special case
    when the view direction is (anti)parallel to down.
    """
    z = normalize(z)
    down = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], z.dtype), z.shape)
    collinear = jnp.abs(jnp.abs(jnp.sum(z * down, -1, keepdims=True)) - 1.0) < 1e-6
    x = jnp.where(
        collinear,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], z.dtype), z.shape),
        jnp.cross(down, z),
    )
    x = normalize(x)
    y = normalize(jnp.cross(z, x))
    return jnp.stack([x, y, z], axis=-1)


def slerp_vec(v1: jnp.ndarray, v2: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation between two unit vectors at times t (K,).

    Equivalent of `slerp` (`planning/utils.py:288-312`), including the
    parallel-vector fallback to v2.
    """
    v1 = normalize(v1)
    v2 = normalize(v2)
    dot = jnp.clip(jnp.sum(v1 * v2, -1), -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    t = t[..., None]
    out = (jnp.sin((1 - t) * theta) * v1 + jnp.sin(t * theta) * v2) / jnp.maximum(
        sin_theta, 1e-12
    )
    out = jnp.where(theta < 1e-3, v2, out)
    return normalize(out)
