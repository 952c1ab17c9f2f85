"""Camera / projection geometry (pure jnp, batched, TPU friendly).

Functional equivalents of `utils/operations.py:157-642` and
`simulator/utils.py:13-56`. Conventions match the reference:

* extrinsics are OpenCV camera-to-world 4x4 (x right, y down, z forward),
* intrinsics are 3x3 and **normalized** (focal lengths / principal point in
  units of image size; `simulator/utils.py:23-27` with normalize=True),
* image-plane coordinates are in [0, 1] with pixel centers at
  (i + 0.5) / n (`utils/operations.py:372-392`).
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_rotation(rot: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) @ (..., 3) as explicit elementwise math.

    Written without dot_general on purpose: tiny 3x3 products otherwise get
    lowered onto the MXU at bfloat16 input precision on TPU, which costs
    ~1e-3 relative error in camera transforms. Elementwise keeps full f32 on
    the VPU.
    """
    return (
        rot[..., :, 0] * v[..., 0:1]
        + rot[..., :, 1] * v[..., 1:2]
        + rot[..., :, 2] * v[..., 2:3]
    )


def fov_to_focal(fov: jnp.ndarray, pixels) -> jnp.ndarray:
    """`fov2focal` (`utils/operations.py:157-158`)."""
    return pixels / (2.0 * jnp.tan(fov / 2.0))


def focal_to_fov(focal: jnp.ndarray, pixels) -> jnp.ndarray:
    """`Camera.focal2fov` (`utils/common.py:98-100`)."""
    return 2.0 * jnp.arctan2(pixels, 2.0 * focal)


def intrinsics_from_fov(vfov_deg: float, hfov_deg: float) -> jnp.ndarray:
    """Normalized pinhole intrinsics from FOV in degrees.

    `compute_camera_intrinsic` (`simulator/utils.py:13-30`) with
    normalize=True: fx = 0.5/tan(hfov/2), cx = cy = 0.5.
    """
    vfov = jnp.deg2rad(vfov_deg)
    hfov = jnp.deg2rad(hfov_deg)
    fx = 0.5 / jnp.tan(hfov / 2.0)
    fy = 0.5 / jnp.tan(vfov / 2.0)
    return jnp.array([[fx, 0.0, 0.5], [0.0, fy, 0.5], [0.0, 0.0, 1.0]], jnp.float32)


def fov_from_intrinsics(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) normalized intrinsics -> (..., 2) (fov_x, fov_y) radians.

    Closed form of `get_fov` (`utils/operations.py:628-642`), which measures
    the angle between rays through the left/right (top/bottom) image-edge
    midpoints. For a pinhole K with principal point c and focal f (all
    normalized) that angle is atan((1-c)/f) + atan(c/f).
    """
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    fov_x = jnp.arctan2(1.0 - cx, fx) + jnp.arctan2(cx, fx)
    fov_y = jnp.arctan2(1.0 - cy, fy) + jnp.arctan2(cy, fy)
    return jnp.stack([fov_x, fov_y], axis=-1)


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 2) normalized (x, y) pixel-center coordinates in [0, 1].

    `sample_image_grid` (`utils/operations.py:372-392`).
    """
    ys = (jnp.arange(h, dtype=dtype) + 0.5) / h
    xs = (jnp.arange(w, dtype=dtype) + 0.5) / w
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def homogenize_points(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def homogenize_vectors(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)


def invert_rigid(extrinsic: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid 4x4 camera-to-world transform."""
    r = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    top = jnp.concatenate([rt, -apply_rotation(rt, t)[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], extrinsic.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def unproject(coords: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray):
    """Normalized image coords (..., 2) + depth (...,) -> camera points (..., 3).

    `unproject` (`utils/operations.py:464-478`).
    """
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    x = (coords[..., 0] - cx) / fx
    y = (coords[..., 1] - cy) / fy
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return d * z[..., None]


def get_world_rays(coords: jnp.ndarray, extrinsic: jnp.ndarray, intrinsics: jnp.ndarray):
    """Normalized image coords -> (origins, directions) in world space.

    `get_world_rays` (`utils/operations.py:544-569`). Directions are NOT
    normalized: they have unit z in camera space so `origin + dir * depth`
    lands on the surface for a z-depth map.
    """
    d_cam = unproject(coords, jnp.ones_like(coords[..., 0]), intrinsics)
    d_world = apply_rotation(extrinsic[..., :3, :3], d_cam)
    origins = jnp.broadcast_to(extrinsic[..., :3, 3], d_world.shape)
    return origins, d_world


def project_points(
    points: jnp.ndarray, extrinsic: jnp.ndarray, intrinsics: jnp.ndarray
):
    """World points (..., 3) -> normalized image xy (..., 2), cam depth, valid.

    `project` / `_project_3d_points` (`utils/operations.py:447-461`,
    `mapping/voxel_map.py:226-238`).
    """
    w2c = invert_rigid(extrinsic)
    p_cam = apply_rotation(w2c[..., :3, :3], points) + w2c[..., :3, 3]
    z = p_cam[..., 2]
    eps = jnp.finfo(jnp.float32).eps
    xy = p_cam[..., :2] / (z[..., None] + eps)
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    u = xy[..., 0] * fx + cx
    v = xy[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1), z, z > 0


def backproject_depth(
    depth: jnp.ndarray, extrinsic: jnp.ndarray, intrinsics: jnp.ndarray
) -> jnp.ndarray:
    """Depth map (h, w) -> world points (h, w, 3) (z-depth convention).

    The spawn path `gaussian_map.py:305-308` composed from world rays.
    """
    h, w = depth.shape[-2:]
    coords = pixel_grid(h, w, depth.dtype)
    origins, dirs = get_world_rays(coords, extrinsic, intrinsics)
    return origins + dirs * depth[..., None]
