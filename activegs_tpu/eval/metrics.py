"""Rendering + mesh quality metrics.

Equivalents of `mapping/utils.py:269-292` (PSNR/SSIM/LPIPS/MSE) and
`utils/operations.py:55-98` (mesh accuracy/completion/completion-ratio/
chamfer via KD-trees). LPIPS uses torchmetrics' AlexNet backbone when its
pretrained weights are available locally; otherwise it is reported as None
(this machine has no network egress to download them).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from ..core.image_ops import ssim as _ssim_jnp


def cal_mse(pred, gt, mask=1.0) -> float:
    """(`cal_mse`, `mapping/utils.py:269-271`)."""
    return float(jnp.mean(((pred - gt) * mask) ** 2))


def cal_psnr(rgb_pred, rgb_gt) -> float:
    """(`cal_psnr`, `mapping/utils.py:274-277`)."""
    return -10.0 * math.log10(cal_mse(rgb_pred, rgb_gt) + 1e-8)


def cal_ssim(rgb_pred, rgb_gt) -> float:
    """(`cal_ssim`, `mapping/utils.py:280-283`)."""
    return float(_ssim_jnp(jnp.asarray(rgb_pred)[None], jnp.asarray(rgb_gt)[None]))


_lpips_model = None
_lpips_failed = False


def cal_lpips(rgb_pred, rgb_gt) -> Optional[float]:
    """(`cal_lpips`, `mapping/utils.py:286-288`); None if AlexNet weights
    are unavailable offline."""
    global _lpips_model, _lpips_failed
    if _lpips_failed:
        return None
    if _lpips_model is None:
        # constructing the metric downloads AlexNet weights; with no network
        # egress that HANGS, so require the torch hub cache to exist first
        import glob
        import os

        hub_dir = os.path.expanduser("~/.cache/torch/hub/checkpoints")
        if not glob.glob(os.path.join(hub_dir, "alexnet*")):
            _lpips_failed = True
            return None
        try:
            from torchmetrics.image.lpip import (
                LearnedPerceptualImagePatchSimilarity,
            )

            _lpips_model = LearnedPerceptualImagePatchSimilarity(
                net_type="alex", normalize=True
            )
        except Exception:
            _lpips_failed = True
            return None
    import torch

    p = torch.from_numpy(np.asarray(rgb_pred, np.float32))[None].clamp(0, 1)
    g = torch.from_numpy(np.asarray(rgb_gt, np.float32))[None].clamp(0, 1)
    with torch.no_grad():
        return float(_lpips_model(p, g))


_perc_params = None


def _perceptual_features(x: jnp.ndarray):
    """3-stage fixed-random-conv feature pyramid (NCHW, stride 2, ReLU).

    Weights are fixed He-scaled draws from a seeded NUMPY rng (not
    jax.random: this helper is traced inside the jitted eval scorer, and a
    lazily-created jax array would leak a tracer into the module global) —
    random-filter feature distances are a documented reasonable proxy for
    learned perceptual metrics, and need no downloaded weights."""
    global _perc_params
    import jax

    if _perc_params is None:
        rng = np.random.default_rng(0)
        dims = [(3, 16), (16, 32), (32, 64)]
        _perc_params = [
            np.asarray(
                rng.normal(size=(cout, cin, 3, 3)) * np.sqrt(2.0 / (cin * 9)),
                np.float32,
            )
            for cin, cout in dims
        ]
    feats = []
    for w in _perc_params:
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        x = jnp.maximum(x, 0.0)
        # unit-normalize the channel dim (LPIPS-style) before comparing
        norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-10)
        feats.append(x / norm)
    return feats


def perceptual_distance(rgb_pred: jnp.ndarray, rgb_gt: jnp.ndarray) -> jnp.ndarray:
    """jnp core of `cal_perceptual` (traceable: returns a scalar array, so
    the evaluation harness can fuse it into its jitted per-view scorer)."""
    p = jnp.asarray(rgb_pred, jnp.float32)[None]
    g = jnp.asarray(rgb_gt, jnp.float32)[None]
    fp = _perceptual_features(jnp.clip(p, 0, 1))
    fg = _perceptual_features(jnp.clip(g, 0, 1))
    d = [jnp.mean(jnp.sum((a - b) ** 2, axis=1)) for a, b in zip(fp, fg)]
    return sum(d) / len(d)


def cal_perceptual(rgb_pred, rgb_gt) -> float:
    """Self-contained perceptual distance: mean squared distance between
    channel-normalized fixed-random-conv features, averaged over 3 scales.

    OFFLINE STAND-IN for LPIPS (`mapping/utils.py:286-288`): reported
    alongside `lpips` (which stays None when AlexNet weights are absent) so
    eval JSONs always carry a perceptual channel. NOT numerically
    comparable to published LPIPS values — use it for relative comparisons
    between runs of this framework only."""
    return float(perceptual_distance(rgb_pred, rgb_gt))


def lpips_available() -> bool:
    """True when the AlexNet LPIPS weights exist locally (no egress on this
    machine — usually False; see `cal_lpips`)."""
    import glob
    import os

    hub_dir = os.path.expanduser("~/.cache/torch/hub/checkpoints")
    return bool(glob.glob(os.path.join(hub_dir, "alexnet*")))


# ---------------------------------------------------------------------------
# mesh metrics (`utils/operations.py:55-98`)
# ---------------------------------------------------------------------------


def sample_surface(vertices: np.ndarray, faces: np.ndarray, n: int, seed=0):
    """Area-weighted uniform surface sampling (trimesh.sample.sample_surface
    replacement; the reference samples 500k points per mesh,
    `operations.py:61-65`)."""
    rng = np.random.default_rng(seed)
    v = vertices[faces]  # (F, 3, 3)
    cross = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    total = area.sum()
    if total <= 0:
        return np.zeros((0, 3), np.float32)
    probs = area / total
    tri = rng.choice(len(faces), size=n, p=probs)
    r1 = np.sqrt(rng.uniform(size=n))
    r2 = rng.uniform(size=n)
    a = 1 - r1
    b = r1 * (1 - r2)
    c = r1 * r2
    pts = a[:, None] * v[tri, 0] + b[:, None] * v[tri, 1] + c[:, None] * v[tri, 2]
    return pts.astype(np.float32)


def accuracy(gt_points, rec_points) -> float:
    """Mean distance rec -> gt (`operations.py:87-91`)."""
    d, _ = cKDTree(gt_points).query(rec_points, workers=-1)
    return float(np.mean(d))


def completion(gt_points, rec_points) -> float:
    """Mean distance gt -> rec (`operations.py:94-98`)."""
    d, _ = cKDTree(rec_points).query(gt_points, workers=-1)
    return float(np.mean(d))


def completion_ratio(gt_points, rec_points, dist_th=0.01) -> float:
    """(`operations.py:80-84`)."""
    d, _ = cKDTree(rec_points).query(gt_points, workers=-1)
    return float(np.mean((d < dist_th).astype(np.float32)))


def calc_3d_mesh_metric(
    mesh_rec: tuple, mesh_gt: tuple, dist_thres=0.05, n_samples=500_000
):
    """(accuracy cm, completion cm, completion-ratio %, chamfer)
    (`calc_3d_mesh_metric`, `operations.py:55-77`). Meshes are
    (vertices, faces) tuples."""
    rec_pc = sample_surface(*mesh_rec, n_samples, seed=0)
    gt_pc = sample_surface(*mesh_gt, n_samples, seed=1)
    acc = accuracy(gt_pc, rec_pc)
    comp = completion(gt_pc, rec_pc)
    chamfer = (acc + comp) / 2.0
    ratio = completion_ratio(gt_pc, rec_pc, dist_th=dist_thres)
    return acc * 100.0, comp * 100.0, ratio * 100.0, chamfer
