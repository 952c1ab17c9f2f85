"""Per-gaussian view preprocessing: projection, EWA covariance, surfel plane.

Pure jnp and fully differentiable — this is the half of the CUDA rasterizer's
`preprocess` stage (projection + `computeCov3D`/`computeCov2D`, faithful GLSL
reference at `visualization/gl_render/shaders/gau_vert.glsl:60-156`) that
carries gradients. JAX autodiff transposes it for the backward pass, so only
the tile compositor needs a hand-written VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import geometry as geo
from ..core import quaternions as quat
from .types import PARAM_DIM, Camera, GaussianAttrs, RasterConfig


def preprocess(
    attrs: GaussianAttrs,
    camera: Camera,
    image_shape: tuple[int, int],
    cfg: RasterConfig,
    front_only: bool = False,
):
    """Project all gaussians into one view.

    Returns:
      params2d: (PARAM_DIM, N) float32 — entry parameter rows (types.py),
      radius:   (N,) float32 — screen-space bbox radius in pixels,
      depth_z:  (N,) float32 — camera z (sort key),
      in_view:  (N,) bool — frustum/validity mask (the `radii > 0` mask of
                `utils/operations.py:815`).
    """
    h, w = image_shape
    k = camera.intrinsic
    fx = k[0, 0] * w
    fy = k[1, 1] * h
    cx = k[0, 2] * w
    cy = k[1, 2] * h

    w2c = geo.invert_rigid(camera.extrinsic)
    rot_w2c = w2c[:3, :3]

    p_cam = geo.apply_rotation(rot_w2c, attrs.means) + w2c[:3, 3]
    z = p_cam[..., 2]
    in_front = z > cfg.near
    zs = jnp.where(in_front, z, 1.0)  # safe z for divisions

    mean_x = fx * p_cam[..., 0] / zs + cx
    mean_y = fy * p_cam[..., 1] / zs + cy

    # --- EWA 2D covariance (gau_vert.glsl:82-107) ---
    # cov3d = R diag(s^2) R^T with R columns = surfel axes
    rmat = quat.quaternion_to_matrix(attrs.rotations)  # (N, 3, 3)
    # M = R * diag(s): columns scaled. HIGHEST precision keeps these tiny
    # matmuls in full f32 (TPU would otherwise use bf16 MXU passes).
    m = rmat * attrs.scales[..., None, :]
    cov3d = jnp.einsum("nij,nkj->nik", m, m, precision=jax.lax.Precision.HIGHEST)

    # frustum-clamped point for the Jacobian
    lim_x = cfg.tan_clamp * (0.5 * w / fx)  # tan(fov_x / 2) in camera units
    lim_y = cfg.tan_clamp * (0.5 * h / fy)
    tx = jnp.clip(p_cam[..., 0] / zs, -lim_x, lim_x) * zs
    ty = jnp.clip(p_cam[..., 1] / zs, -lim_y, lim_y) * zs

    # J = d(pixel)/d(cam): rows (fx/z, 0, -fx tx/z^2), (0, fy/z, -fy ty/z^2)
    inv_z = 1.0 / zs
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z * inv_z

    # T = J @ W (2x3), W = world->cam rotation; cov2d = T cov3d T^T
    t0 = j00[..., None] * rot_w2c[0] + j02[..., None] * rot_w2c[2]  # (N, 3)
    t1 = j11[..., None] * rot_w2c[1] + j12[..., None] * rot_w2c[2]
    hi = jax.lax.Precision.HIGHEST
    c0 = jnp.einsum("ni,nij->nj", t0, cov3d, precision=hi)
    c1 = jnp.einsum("ni,nij->nj", t1, cov3d, precision=hi)
    cov_a = jnp.sum(c0 * t0, -1) + cfg.lowpass
    cov_b = jnp.sum(c0 * t1, -1)
    cov_c = jnp.sum(c1 * t1, -1) + cfg.lowpass

    det = cov_a * cov_c - cov_b * cov_b
    det_safe = jnp.maximum(det, 1e-12)
    inv_det = 1.0 / det_safe
    conic_a = cov_c * inv_det
    conic_b = -cov_b * inv_det
    conic_c = cov_a * inv_det

    # bbox radius: 3 sigma of the max eigenvalue (3DGS convention)
    mid = 0.5 * (cov_a + cov_c)
    eig_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(cfg.sigma_extent * jnp.sqrt(eig_max))

    # --- surfel plane for per-pixel depth ---
    # world normal = third column of R (gaussian_map.py:567-571); the
    # composited normal channel is CAMERA-space (it gets dotted with the
    # depth-derived camera-frame normals in the consistency loss,
    # `mapping/utils.py:14-16`, and with camera ray dirs at
    # `utils/operations.py:716`)
    n_world = rmat[..., :, 2]
    n_cam = geo.apply_rotation(rot_w2c, n_world)
    plane_dot = jnp.sum(n_cam * p_cam, -1)  # n . p  (plane offset)
    # t(u, v) = plane_dot / (n . r), r = ((u-cx)/fx, (v-cy)/fy, 1)
    # expressed as D / (A u + B v + C):
    pa = n_cam[..., 0] / fx
    pb = n_cam[..., 1] / fy
    pc = n_cam[..., 2] - pa * cx - pb * cy
    pd = plane_dot

    in_view = (
        attrs.valid
        & in_front
        & (det > 1e-12)
        & (mean_x + radius > 0)
        & (mean_x - radius < w)
        & (mean_y + radius > 0)
        & (mean_y - radius < h)
    )
    if front_only:
        # cull surfels facing away from the camera (config[4] of the CUDA
        # rasterizer, `utils/operations.py:666-668,697-699`)
        in_view = in_view & (plane_dot < 0)

    zero = jnp.zeros_like(mean_x)
    rows = [
        mean_x,
        mean_y,
        conic_a,
        conic_b,
        conic_c,
        attrs.opacities,
        attrs.colors[..., 0],
        attrs.colors[..., 1],
        attrs.colors[..., 2],
        n_cam[..., 0],
        n_cam[..., 1],
        n_cam[..., 2],
        pa,
        pb,
        pc,
        pd,
        attrs.confidences,
        z,
    ]
    rows += [zero] * (PARAM_DIM - len(rows))
    params2d = jnp.stack(rows, axis=0).astype(jnp.float32)
    # zero out invalid gaussians so stray entries are inert
    params2d = jnp.where(in_view[None, :], params2d, 0.0)
    return params2d, jnp.where(in_view, radius, 0.0), z, in_view


def eval_alpha_depth_cols(
    cols: dict, px: jnp.ndarray, py: jnp.ndarray, cfg: RasterConfig
):
    """Evaluate per-(entry, pixel) alpha and surfel-plane depth.

    `cols` holds per-entry parameter columns shaped (K, 1) (or (N, 1));
    px/py are pixel-center coordinates shaped (1, P). Returns alpha (K, P)
    and depth (K, P). Shared by the Pallas kernels and the dense oracle so
    both paths use identical math: alpha = min(alpha_max,
    opacity * exp(-0.5 d^T conic d)), zeroed below alpha_cut
    (`gau_frag.glsl:20-26`); depth = ray/plane intersection clamped around
    the center depth.
    """
    dx = px - cols["mean_x"]
    dy = py - cols["mean_y"]
    power = (
        -0.5 * (cols["ca"] * dx * dx + cols["cc"] * dy * dy) - cols["cb"] * dx * dy
    )
    alpha = cols["op"] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(alpha, cfg.alpha_max)
    alpha = jnp.where(alpha >= cfg.alpha_cut, alpha, 0.0)

    denom = cols["pa"] * px + cols["pb"] * py + cols["pc"]
    ok = jnp.abs(denom) > 1e-8
    denom_safe = jnp.where(ok, denom, 1.0)
    t = jnp.where(ok, cols["pd"] / denom_safe, cols["dz"])
    t = jnp.clip(t, cfg.depth_lo * cols["dz"], cfg.depth_hi * cols["dz"])
    return alpha, t


def entry_cols(entries_t: jnp.ndarray) -> dict:
    """Split a transposed entry block (K, PARAM_DIM) into (K, 1) columns."""
    names = [
        "mean_x",
        "mean_y",
        "ca",
        "cb",
        "cc",
        "op",
        "cr",
        "cg",
        "cb_col",
        "nx",
        "ny",
        "nz",
        "pa",
        "pb",
        "pc",
        "pd",
        "conf",
        "dz",
    ]
    return {n: entries_t[:, i : i + 1] for i, n in enumerate(names)}
