"""Evaluation harness + mesh generation pipeline.

Equivalents of `EvaluationTool` (`utils/evaluation_tool.py:18-166`) and
`generate_mesh` (`mesh_generation.py:63-102`): render every saved map
snapshot at the test poses, score PSNR/SSIM/LPIPS/depth-MSE; fuse rendered
RGB-D along the executed trajectory into a TSDF and extract/score the mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..mapping import gaussians as gm
from ..render.renderer import render_view
from ..render.types import Camera, RasterConfig
from . import metrics, tsdf


@functools.partial(jax.jit, static_argnames=("grid", "shape", "raster_cfg"))
def _render_and_integrate(state, attrs, extrinsic, intrinsic, grid, shape, raster_cfg):
    """One TSDF-fusion step. `attrs` is an ARGUMENT, not a closure capture:
    a closed-over device array becomes an HLO constant, so every snapshot's
    mesh pass would be a distinct program — and on this stack every new
    jitted program pays a 30-100 s remote compile (CLAUDE.md)."""
    out, _ = render_view(
        attrs,
        Camera(extrinsic=extrinsic, intrinsic=intrinsic),
        shape,
        raster_cfg,
    )
    return tsdf.integrate(state, grid, out.rgb, out.depth[0], extrinsic, intrinsic)


def generate_mesh(
    gm_state,
    map_cfg: gm.MapConfig,
    camera_params,
    resolution: int = 1024,
    raster_cfg: RasterConfig = RasterConfig(),
    voxel: float = 0.02,
    trunc: float = 0.1,
    bbox=None,
    min_cluster_tris: int = 50,
):
    """Render the saved map along the executed trajectory and TSDF-fuse
    (`mesh_generation.py:63-102`: 1024^2 renders, 2 cm voxels, 10 cm
    truncation, isolated-cluster filter). camera_params: iterable of
    (extrinsic (4,4), intrinsic (3,3)). Returns (vertices, faces, colors).
    """
    n = int(gm_state.count)
    if bbox is None:
        means = np.asarray(gm_state.means[: max(n, 1)])
        bbox = (means.min(0) - 0.1, means.max(0) + 0.1)
    grid = tsdf.TSDFGrid.create(bbox, voxel=voxel, trunc=trunc)
    state = tsdf.init_state(grid)
    # render on the live-prefix capacity bucket (exact: live gaussians fill
    # [0, count)) so per-index render costs scale with the map, not the
    # full static capacity — and so snapshots of similar size share one
    # compiled program
    bucket = gm.bucket_capacity(n, map_cfg.capacity)
    attrs = gm.attrs_of(gm.slice_state(gm_state, bucket), map_cfg)
    shape = (resolution, resolution)

    for extrinsic, intrinsic in camera_params:
        state = _render_and_integrate(
            state,
            attrs,
            jnp.asarray(extrinsic),
            jnp.asarray(intrinsic),
            grid,
            shape,
            raster_cfg,
        )
    verts, faces, colors = tsdf.extract_mesh(state, grid)
    return tsdf.filter_isolated(verts, faces, colors, min_tris=min_cluster_tris)


@functools.partial(jax.jit, static_argnames=("shape", "raster_cfg"))
def _score_view(attrs, bg, extrinsic, intrinsic, rgb_gt, depth_gt, shape, raster_cfg):
    """Render ONE map at ONE test pose and score it — one dispatch per
    (pose, map) instead of the eager per-op round-trips of the naive loop
    (~30 ms/dispatch through the axon tunnel). Returns
    (psnr, ssim, depth_mse, perceptual, rgb_pred); rgb_pred feeds the
    optional host-side LPIPS when its weights exist locally."""
    from ..core.image_ops import ssim as _ssim_jnp

    out, _ = render_view(
        attrs,
        Camera(extrinsic=extrinsic, intrinsic=intrinsic),
        shape,
        raster_cfg,
        background=bg,
    )
    rgb_pred = jnp.clip(out.rgb, 0.0, 1.0)
    valid = (depth_gt > 0).astype(jnp.float32)
    mse = jnp.mean((rgb_pred - rgb_gt) ** 2)
    psnr = -10.0 * jnp.log10(mse + 1e-8)
    ssim = _ssim_jnp(rgb_pred[None], rgb_gt[None])
    depth_mse = jnp.mean(((out.depth - depth_gt) * valid) ** 2)
    perceptual = metrics.perceptual_distance(rgb_pred, rgb_gt)
    return psnr, ssim, depth_mse, perceptual, rgb_pred


class EvaluationTool:
    """Scores map snapshots against test views + a GT mesh
    (`utils/evaluation_tool.py`)."""

    def __init__(
        self,
        maps,  # list of (GaussianMapState, MapConfig)
        meshes,  # list of (vertices, faces) or None
        test_poses: np.ndarray,  # (V, 4, 4)
        gt_provider,  # simulator with simulate(pose, require_gt=True)
        mesh_gt=None,  # (vertices, faces)
        raster_cfg: RasterConfig = RasterConfig(),
    ):
        self.maps = maps
        self.meshes = meshes
        self.test_poses = np.asarray(test_poses)
        self.gt_provider = gt_provider
        self.mesh_gt = mesh_gt
        self.raster_cfg = raster_cfg

    def eval(self, mode: str = "complete", mesh_dist_thres: float = 0.02, mesh_samples: int = 500_000) -> dict:
        """(`evaluation_tool.py:92-166`). mode in {complete, rendering, mesh}."""
        out = {}
        if mode in ("complete", "rendering"):
            n_maps = len(self.maps)
            psnr = np.zeros(n_maps)
            ssim = np.zeros(n_maps)
            lpips = np.zeros(n_maps)
            lpips_n = np.zeros(n_maps)
            perceptual = np.zeros(n_maps)
            depth_mse = np.zeros(n_maps)

            # slice every snapshot to ONE shared capacity bucket (the max
            # over snapshots) so all (pose, map) scorings run through a
            # single compiled program — per-snapshot buckets would each pay
            # a remote compile, and the full static capacity would pay
            # per-index render costs for dead slots
            bucket = max(
                gm.bucket_capacity(int(state.count), cfg.capacity)
                for state, cfg in self.maps
            )
            renderers = [
                (
                    gm.attrs_of(gm.slice_state(state, bucket), cfg),
                    jnp.asarray(cfg.background),
                )
                for state, cfg in self.maps
            ]
            want_lpips = metrics.lpips_available()

            for pose in self.test_poses:
                frame = self.gt_provider.simulate(pose, require_gt=True)
                rgb_gt = jnp.asarray(frame["rgb"])
                depth_gt = jnp.asarray(frame["depth"])
                h, w = rgb_gt.shape[-2:]
                for i, (attrs, bg) in enumerate(renderers):
                    p, s, d, pc, rgb_pred = _score_view(
                        attrs,
                        bg,
                        jnp.asarray(frame["extrinsic"]),
                        jnp.asarray(frame["intrinsic"]),
                        rgb_gt,
                        depth_gt,
                        (int(h), int(w)),
                        self.raster_cfg,
                    )
                    psnr[i] += float(p)
                    ssim[i] += float(s)
                    depth_mse[i] += float(d)
                    perceptual[i] += float(pc)
                    if want_lpips:
                        lp = metrics.cal_lpips(
                            np.asarray(rgb_pred), np.asarray(rgb_gt)
                        )
                        if lp is not None:
                            lpips[i] += lp
                            lpips_n[i] += 1

            v = len(self.test_poses)
            out["mean_psnr"] = (psnr / v).tolist()
            out["mean_ssim"] = (ssim / v).tolist()
            out["mean_lpips"] = [
                (lpips[i] / lpips_n[i]) if lpips_n[i] else None
                for i in range(n_maps)
            ]
            # offline LPIPS stand-in (fixed random-conv features; see
            # metrics.cal_perceptual) so the perceptual channel is never null
            out["mean_perceptual"] = (perceptual / v).tolist()
            out["mean_depth_mse"] = (depth_mse / v).tolist()

        if mode in ("complete", "mesh") and self.mesh_gt is not None:
            acc, comp, ratio, chamfer = [], [], [], []
            for mesh in self.meshes:
                if mesh is None or len(mesh[1]) == 0:
                    acc.append(None), comp.append(None)
                    ratio.append(None), chamfer.append(None)
                    continue
                a, c, r, ch = metrics.calc_3d_mesh_metric(
                    (mesh[0], mesh[1]), self.mesh_gt, dist_thres=mesh_dist_thres,
                    n_samples=mesh_samples,
                )
                acc.append(a), comp.append(c), ratio.append(r), chamfer.append(ch)
            out["mesh_accuracy"] = acc
            out["mesh_completion"] = comp
            out["mesh_completion_ratio"] = ratio
            out["mesh_chamfer_distance"] = chamfer
        return out
