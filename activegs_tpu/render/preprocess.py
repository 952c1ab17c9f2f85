"""Per-gaussian view preprocessing: projection, EWA covariance, surfel plane.

Pure jnp and fully differentiable — this is the half of the CUDA rasterizer's
`preprocess` stage (projection + `computeCov3D`/`computeCov2D`, faithful GLSL
reference at `visualization/gl_render/shaders/gau_vert.glsl:60-156`) that
carries gradients. JAX autodiff transposes it for the backward pass, so only
the tile compositor needs a hand-written VJP.

TPU layout note: everything is computed on flat (N,) component arrays —
(N, 3)/(N, 3, 3) layouts put tiny trailing dims in the lane dimension and
waste ~97% of the VPU, which measured as a ~40x slowdown. The small-matrix
algebra (R(q), covariances, J W products) is therefore unrolled by hand.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import geometry as geo
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
      params2d: (N, PARAM_DIM) float32 — entry parameters, ROW-major: the
                entry gather copies contiguous 96-byte rows and its output
                feeds the Pallas kernels' (K, PARAM_DIM) chunk DMAs without
                a relayout copy (profiled: the old (PARAM_DIM, N) layout
                made XLA gather + copy cost ~7 ms/step at N=262k),
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
    # rotation rows and translation as scalars (free at trace time)
    r00, r01, r02 = w2c[0, 0], w2c[0, 1], w2c[0, 2]
    r10, r11, r12 = w2c[1, 0], w2c[1, 1], w2c[1, 2]
    r20, r21, r22 = w2c[2, 0], w2c[2, 1], w2c[2, 2]
    t0, t1, t2 = w2c[0, 3], w2c[1, 3], w2c[2, 3]

    mx = attrs.means[:, 0]
    my = attrs.means[:, 1]
    mz = attrs.means[:, 2]
    px = r00 * mx + r01 * my + r02 * mz + t0
    py = r10 * mx + r11 * my + r12 * mz + t1
    pz = r20 * mx + r21 * my + r22 * mz + t2

    in_front = pz > cfg.near
    zs = jnp.where(in_front, pz, 1.0)
    inv_z = 1.0 / zs

    mean_x = fx * px * inv_z + cx
    mean_y = fy * py * inv_z + cy

    # --- rotation matrix components from the quaternion (wxyz) ---
    qw = attrs.rotations[:, 0]
    qx = attrs.rotations[:, 1]
    qy = attrs.rotations[:, 2]
    qz = attrs.rotations[:, 3]
    R00 = 1 - 2 * (qy * qy + qz * qz)
    R01 = 2 * (qx * qy - qw * qz)
    R02 = 2 * (qx * qz + qw * qy)
    R10 = 2 * (qx * qy + qw * qz)
    R11 = 1 - 2 * (qx * qx + qz * qz)
    R12 = 2 * (qy * qz - qw * qx)
    R20 = 2 * (qx * qz - qw * qy)
    R21 = 2 * (qy * qz + qw * qx)
    R22 = 1 - 2 * (qx * qx + qy * qy)

    s0 = attrs.scales[:, 0] ** 2
    s1 = attrs.scales[:, 1] ** 2
    s2 = attrs.scales[:, 2] ** 2

    # cov3d = R diag(s^2) R^T, 6 unique world-frame entries
    c00 = s0 * R00 * R00 + s1 * R01 * R01 + s2 * R02 * R02
    c01 = s0 * R00 * R10 + s1 * R01 * R11 + s2 * R02 * R12
    c02 = s0 * R00 * R20 + s1 * R01 * R21 + s2 * R02 * R22
    c11 = s0 * R10 * R10 + s1 * R11 * R11 + s2 * R12 * R12
    c12 = s0 * R10 * R20 + s1 * R11 * R21 + s2 * R12 * R22
    c22 = s0 * R20 * R20 + s1 * R21 * R21 + s2 * R22 * R22

    # frustum-clamped Jacobian point (gau_vert.glsl:86-91)
    lim_x = cfg.tan_clamp * (0.5 * w / fx)
    lim_y = cfg.tan_clamp * (0.5 * h / fy)
    tx = jnp.clip(px * inv_z, -lim_x, lim_x) * zs
    ty = jnp.clip(py * inv_z, -lim_y, lim_y) * zs

    # rows of T = J @ W (2x3): t0_i = j00 * W0i + j02 * W2i, etc.
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z * inv_z
    a0 = j00 * r00 + j02 * r20
    a1 = j00 * r01 + j02 * r21
    a2 = j00 * r02 + j02 * r22
    b0 = j11 * r10 + j12 * r20
    b1 = j11 * r11 + j12 * r21
    b2 = j11 * r12 + j12 * r22

    # cov2d = T cov3d T^T (+ pixel low-pass, gau_vert.glsl:104-105)
    ca0 = a0 * c00 + a1 * c01 + a2 * c02
    ca1 = a0 * c01 + a1 * c11 + a2 * c12
    ca2 = a0 * c02 + a1 * c12 + a2 * c22
    cov_a = ca0 * a0 + ca1 * a1 + ca2 * a2 + cfg.lowpass
    cov_b = ca0 * b0 + ca1 * b1 + ca2 * b2
    cb0 = b0 * c00 + b1 * c01 + b2 * c02
    cb1 = b0 * c01 + b1 * c11 + b2 * c12
    cb2 = b0 * c02 + b1 * c12 + b2 * c22
    cov_c = cb0 * b0 + cb1 * b1 + cb2 * b2 + cfg.lowpass

    det = cov_a * cov_c - cov_b * cov_b
    inv_det = 1.0 / jnp.maximum(det, 1e-12)
    conic_a = cov_c * inv_det
    conic_b = -cov_b * inv_det
    conic_c = cov_a * inv_det

    mid = 0.5 * (cov_a + cov_c)
    eig_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(cfg.sigma_extent * jnp.sqrt(eig_max))
    # tight per-axis extents: the AABB of the sigma_extent-level ellipse is
    # exactly +-s*sqrt(cov_a) x +-s*sqrt(cov_c) (marginal sigmas). The
    # circumscribed square of `radius` (3DGS convention) covers the same
    # ellipse but wastes tiles on elongated surfels (projected disks seen at
    # grazing angles); binning uses these instead (rows P_EXT_X/P_EXT_Y).
    ext_x = jnp.ceil(cfg.sigma_extent * jnp.sqrt(jnp.maximum(cov_a, 0.0)))
    ext_y = jnp.ceil(cfg.sigma_extent * jnp.sqrt(jnp.maximum(cov_c, 0.0)))

    # --- surfel plane for per-pixel depth ---
    # world normal = third column of R (gaussian_map.py:567-571); the
    # composited normal channel is CAMERA-space (it gets dotted with the
    # depth-derived camera-frame normals in the consistency loss,
    # `mapping/utils.py:14-16`, and with camera ray dirs at
    # `utils/operations.py:716`)
    nwx, nwy, nwz = R02, R12, R22
    ncx = r00 * nwx + r01 * nwy + r02 * nwz
    ncy = r10 * nwx + r11 * nwy + r12 * nwz
    ncz = r20 * nwx + r21 * nwy + r22 * nwz
    plane_dot = ncx * px + ncy * py + ncz * pz
    # t(u, v) = plane_dot / (n . r), r = ((u-cx)/fx, (v-cy)/fy, 1),
    # expressed as D / (A u + B v + C):
    pa = ncx / fx
    pb = ncy / fy
    pc = ncz - pa * cx - pb * cy
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
        attrs.colors[:, 0],
        attrs.colors[:, 1],
        attrs.colors[:, 2],
        ncx,
        ncy,
        ncz,
        pa,
        pb,
        pc,
        pd,
        attrs.confidences,
        pz,
        jax.lax.stop_gradient(ext_x),
        jax.lax.stop_gradient(ext_y),
    ]
    rows += [zero] * (PARAM_DIM - len(rows))
    params2d = jnp.stack(rows, axis=1).astype(jnp.float32)  # (N, PARAM_DIM)
    # zero out invalid gaussians so stray entries are inert
    params2d = jnp.where(in_view[:, None], params2d, 0.0)
    return params2d, jnp.where(in_view, radius, 0.0), pz, in_view


def recip(x: jnp.ndarray, approx: bool) -> jnp.ndarray:
    """1/x. With approx=True (Pallas kernels on real TPU only) uses the
    hardware approximate reciprocal plus one Newton-Raphson step
    r*(2 - x*r): the raw approximation's ~2^-14 relative error squares to
    ~1e-8, far inside the 2e-5 oracle/gradcheck tolerances.

    Measured effect (v5e bench, 3 per-pair divides replaced): 55.6 -> 56.2
    Mrays/s, only +1%. The XLA-level microbench had shown f32 div at 12x a
    mul (scripts/microbench_vpu.py: 0.38 vs 4.8 Tops/s), predicting ~2.5
    ms/step — but Mosaic evidently already lowers in-kernel f32 division
    efficiently, so the explicit form only shaves the margin. Kept: exact
    interpret/oracle behavior is preserved (approx=False there) and the
    on-chip validation gate passes at oracle tolerances."""
    if not approx or x.dtype != jnp.float32:
        return 1.0 / x
    from jax.experimental import pallas as pl

    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _cut(alpha: jnp.ndarray, cfg: RasterConfig) -> jnp.ndarray:
    """Zero alpha below alpha_cut. Mosaic v5e has no bf16 vector compare
    (`arith.cmpf` on bf16 fails to compile), so under bf16_pairs the
    threshold test runs on an f32 upcast; the select stays in bf16."""
    if alpha.dtype == jnp.bfloat16:
        keep = alpha.astype(jnp.float32) >= cfg.alpha_cut
        return jnp.where(keep, alpha, 0.0)
    return jnp.where(alpha >= cfg.alpha_cut, alpha, 0.0)


def effective_alpha_max(cfg: RasterConfig) -> float:
    """The clamp value alpha actually saturates at: cfg.alpha_max rounded to
    the pair dtype (the backward `active` mask must compare against the
    value the forward clamp produced, or clamped entries leak gradient)."""
    if cfg.bf16_pairs:
        import ml_dtypes
        import numpy as np

        return float(np.asarray(cfg.alpha_max, ml_dtypes.bfloat16))
    return cfg.alpha_max


def eval_alpha_depth_cols(
    cols: dict,
    px: jnp.ndarray,
    py: jnp.ndarray,
    cfg: RasterConfig,
    approx_recip: bool = False,
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
    dx = px - cols["mean_x"]  # formed in f32: screen coords need the mantissa
    dy = py - cols["mean_y"]
    if cfg.bf16_pairs:
        # bf16 alpha evaluation (2.1x VPU, scripts/microbench_bf16.py):
        # dx/dy span at most the tile + 3 sigma (tens of pixels), so the
        # bf16 cast after the f32 subtraction costs ~0.4% relative — far
        # below alpha_cut-level significance
        b = jnp.bfloat16
        dxb, dyb = dx.astype(b), dy.astype(b)
        power = (
            -0.5 * (cols["ca"].astype(b) * dxb * dxb + cols["cc"].astype(b) * dyb * dyb)
            - cols["cb"].astype(b) * dxb * dyb
        )
        alpha = cols["op"].astype(b) * jnp.exp(jnp.minimum(power, 0.0))
    else:
        power = (
            -0.5 * (cols["ca"] * dx * dx + cols["cc"] * dy * dy) - cols["cb"] * dx * dy
        )
        alpha = cols["op"] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(alpha, cfg.alpha_max)
    alpha = _cut(alpha, cfg)

    denom = cols["pa"] * px + cols["pb"] * py + cols["pc"]
    ok = jnp.abs(denom) > 1e-8
    denom_safe = jnp.where(ok, denom, 1.0)
    t = jnp.where(ok, cols["pd"] * recip(denom_safe, approx_recip), cols["dz"])
    t = jnp.clip(t, cfg.depth_lo * cols["dz"], cfg.depth_hi * cols["dz"])
    return alpha, t


def eval_pair_terms_bwd(
    cols: dict,
    px: jnp.ndarray,
    py: jnp.ndarray,
    cfg: RasterConfig,
    approx_recip: bool = False,
):
    """Alpha/depth evaluation for the hand-written backward kernel.

    Same math as `eval_alpha_depth_cols` but returns the shared
    intermediates the gradient chains need (dx, dy, exp(power), 1/denom,
    raw plane depth, clamp masks), so the kernel computes each per-pair
    divide/exponential exactly once instead of re-deriving them.

    With cfg.bf16_pairs, alpha/ex/dx/dy come back in bfloat16 (the backward
    kernel keeps its big (K, P) products in bf16 and accumulates reductions
    in f32); the depth-plane chain stays f32 throughout."""
    dx = px - cols["mean_x"]
    dy = py - cols["mean_y"]
    if cfg.bf16_pairs:
        b = jnp.bfloat16
        dx, dy = dx.astype(b), dy.astype(b)
        power = (
            -0.5 * (cols["ca"].astype(b) * dx * dx + cols["cc"].astype(b) * dy * dy)
            - cols["cb"].astype(b) * dx * dy
        )
        ex = jnp.exp(jnp.minimum(power, 0.0))
        alpha = cols["op"].astype(b) * ex
    else:
        power = (
            -0.5 * (cols["ca"] * dx * dx + cols["cc"] * dy * dy) - cols["cb"] * dx * dy
        )
        ex = jnp.exp(jnp.minimum(power, 0.0))
        alpha = cols["op"] * ex
    alpha = jnp.minimum(alpha, cfg.alpha_max)
    alpha = _cut(alpha, cfg)

    denom = cols["pa"] * px + cols["pb"] * py + cols["pc"]
    ok = jnp.abs(denom) > 1e-8
    inv_denom = recip(jnp.where(ok, denom, 1.0), approx_recip)
    t_raw = cols["pd"] * inv_denom
    lo = cfg.depth_lo * cols["dz"]
    hi = cfg.depth_hi * cols["dz"]
    t = jnp.where(ok, jnp.clip(t_raw, lo, hi), cols["dz"])
    inside = ok & (t_raw > lo) & (t_raw < hi)
    return {
        "alpha": alpha,
        "t": t,
        "dx": dx,
        "dy": dy,
        "ex": ex,
        "inv_denom": inv_denom,
        "t_raw": t_raw,
        "ok": ok,
        "inside": inside,
    }


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
    return {n: entries_t[..., i : i + 1] for i, n in enumerate(names)}
