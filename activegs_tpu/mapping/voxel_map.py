"""Voxel occupancy map: log-odds grid + exploration/ROI masks (pure jnp).

TPU-native re-design of `mapping/voxel_map.py`: the update is a single
jitted program of projections + scatters (the reference's
`update:126-182` maps 1:1 onto masked scatter-adds), and the binary
dilations that the reference bounces to scipy on the host
(`voxel_map.py:208-213`) are static shift-OR loops on device, so planner
utility evaluation can stay fused with the batched candidate renders.

Grid geometry (dims/sizes) is static Python (`VoxelGrid`); the mutable
fields (log-odds, unexplored, ROI, per-voxel normals) live in a pytree
(`VoxelMapState`).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo

LO_STEP = 2.8  # log-odds increment (`voxel_map.py:170-172`)
LO_CLIP = 4.5  # keeps p in (0.01, 0.99) (`voxel_map.py:177-179`)


@dataclasses.dataclass(frozen=True)
class VoxelConfig:
    """`config/mapper/incremental.yaml:5-8`."""

    map_resolution: tuple[float, float, float] = (0.2, 0.2, 0.2)
    safety_margin: float = 0.3
    min_gaussian_per_voxel: int = 5
    occ_thres: float = 0.8
    free_thres: float = 0.2


@dataclasses.dataclass(frozen=True)
class VoxelGrid:
    """Static grid geometry derived from the scene bbox
    (`voxel_map.py:15-33`): dim = ceil(extent / resolution), size =
    extent / dim."""

    bbox_min: tuple[float, float, float]
    bbox_max: tuple[float, float, float]
    dim: tuple[int, int, int]
    size: tuple[float, float, float]

    @classmethod
    def create(cls, bbox, cfg: VoxelConfig) -> "VoxelGrid":
        bmin = np.asarray(bbox[0], np.float64)
        bmax = np.asarray(bbox[1], np.float64)
        extent = bmax - bmin
        dim = np.ceil(extent / np.asarray(cfg.map_resolution)).astype(int)
        size = extent / dim
        return cls(
            bbox_min=tuple(bmin.tolist()),
            bbox_max=tuple(bmax.tolist()),
            dim=tuple(int(d) for d in dim),
            size=tuple(size.tolist()),
        )

    @property
    def num_voxels(self) -> int:
        return int(np.prod(self.dim))

    @functools.cached_property
    def centers(self) -> np.ndarray:
        """(T, 3) voxel centers (`voxel_map.py:25-37`).

        Cached as NUMPY on purpose: a jnp constant materialized inside a jit
        trace is a tracer, and caching it would leak the tracer into eager
        callers. numpy auto-converts at jnp call sites."""
        idx = np.stack(
            np.meshgrid(*[np.arange(d) for d in self.dim], indexing="ij"), axis=-1
        ).reshape(-1, 3)
        c = np.asarray(self.bbox_min) + (idx + 0.5) * np.asarray(self.size)
        return np.asarray(c, np.float32)

    def voxelize(self, points: jnp.ndarray):
        """xyz -> (ijk index, in-bounds mask) (`_voxelize`,
        `voxel_map.py:196-206`)."""
        rel = points - jnp.asarray(self.bbox_min)
        idx = jnp.floor(rel / jnp.asarray(self.size)).astype(jnp.int32)
        ok = jnp.all(idx >= 0, -1) & jnp.all(idx < jnp.asarray(self.dim), -1)
        return idx, ok

    def linear(self, idx: jnp.ndarray) -> jnp.ndarray:
        """(`to_linear_indices`, `voxel_map.py:184-194`)."""
        return (
            idx[..., 0] * (self.dim[1] * self.dim[2])
            + idx[..., 1] * self.dim[2]
            + idx[..., 2]
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelMapState:
    log_odds: jnp.ndarray  # (T,)
    unexplored: jnp.ndarray  # (T,) bool
    roi_mask: jnp.ndarray  # (T,) bool
    voxel_normal: jnp.ndarray  # (T, 3) mean normal of low-confidence surfels


def init_state(grid: VoxelGrid) -> VoxelMapState:
    t = grid.num_voxels
    return VoxelMapState(
        log_odds=jnp.zeros((t,)),
        unexplored=jnp.ones((t,), bool),
        roi_mask=jnp.zeros((t,), bool),
        voxel_normal=jnp.zeros((t, 3)),
    )


# ---------------------------------------------------------------------------
# dilation structuring elements (static offset lists)
# ---------------------------------------------------------------------------


def sphere_offsets(radius_vox: float):
    """Spherical structuring element
    (`_create_spherical_structuring_element`, `voxel_map.py:215-224`)."""
    r = int(np.ceil(radius_vox))
    offs = [
        (x, y, z)
        for x in range(-r, r + 1)
        for y in range(-r, r + 1)
        for z in range(-r, r + 1)
        if x * x + y * y + z * z <= radius_vox * radius_vox
    ]
    return tuple(offs)


CROSS_OFFSETS = tuple(
    [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
)  # generate_binary_structure(3, 1) (`voxel_map.py:23`)


def dilate(mask: jnp.ndarray, grid: VoxelGrid, offsets) -> jnp.ndarray:
    """Binary dilation by a static offset set — on-device replacement for
    scipy.ndimage.binary_dilation (`voxel_map.py:208-213`)."""
    m = mask.reshape(grid.dim)
    rx = max(abs(o[0]) for o in offsets)
    ry = max(abs(o[1]) for o in offsets)
    rz = max(abs(o[2]) for o in offsets)
    mp = jnp.pad(m, ((rx, rx), (ry, ry), (rz, rz)))
    out = jnp.zeros_like(m)
    dx, dy, dz = grid.dim
    for ox, oy, oz in offsets:
        out = out | jax.lax.dynamic_slice(
            mp, (rx - ox, ry - oy, rz - oz), (dx, dy, dz)
        )
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# state masks (`voxel_map.py:324-361`)
# ---------------------------------------------------------------------------


def probabilities(state: VoxelMapState) -> jnp.ndarray:
    return jax.nn.sigmoid(state.log_odds)  # `inverse_log_odds`


def free_mask(state: VoxelMapState, cfg: VoxelConfig) -> jnp.ndarray:
    return probabilities(state) <= cfg.free_thres


def occ_mask(state: VoxelMapState, cfg: VoxelConfig) -> jnp.ndarray:
    return probabilities(state) >= cfg.occ_thres


def unknown_mask(state: VoxelMapState, cfg: VoxelConfig) -> jnp.ndarray:
    return ~free_mask(state, cfg) & ~occ_mask(state, cfg)


def free_mask_w_margin(
    state: VoxelMapState, grid: VoxelGrid, cfg: VoxelConfig
) -> jnp.ndarray:
    """Free voxels minus a safety-margin dilation of occupied space
    (`voxel_map.py:328-338`)."""
    radius = max(
        cfg.safety_margin / s for s in grid.size
    )
    occ_d = dilate(occ_mask(state, cfg), grid, sphere_offsets(radius))
    return free_mask(state, cfg) & ~occ_d


def frontier_mask(
    state: VoxelMapState, grid: VoxelGrid, cfg: VoxelConfig
) -> jnp.ndarray:
    """Free voxels adjacent to unexplored space (`voxel_map.py:340-349`)."""
    une_d = dilate(state.unexplored, grid, CROSS_OFFSETS)
    return une_d & free_mask(state, cfg)


# ---------------------------------------------------------------------------
# projection / visibility (`voxel_map.py:226-278`)
# ---------------------------------------------------------------------------


def _frustum_mask(grid, extrinsic, intrinsic, depth_map):
    """Voxels in the camera frustum in front of the observed surface
    (`_get_frustum_mask`, `voxel_map.py:240-269`). depth_map (h, w), with
    negative entries meaning invalid measurements."""
    h, w = depth_map.shape
    uv, z, front = geo.project_points(grid.centers, extrinsic, intrinsic)
    x = uv[..., 0] * w
    y = uv[..., 1] * h
    valid_x = (x >= 0) & (x < w)
    valid_y = (y >= 0) & (y < h)
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    depth_at = depth_map[yi, xi]
    depth_at = jnp.where(valid_x & valid_y, depth_at, -1.0)
    fov = front & valid_x & valid_y
    frustum = fov & (depth_at > z)
    invalid = fov & (depth_at < 0.0)
    return frustum, invalid


def visible_mask(state, grid, extrinsic, intrinsic, depth_map):
    """`cal_visible_mask` (`voxel_map.py:271-278`)."""
    frustum, _ = _frustum_mask(grid, extrinsic, intrinsic, depth_map)
    return frustum


# ---------------------------------------------------------------------------
# update (`VoxelMap.update`, `voxel_map.py:126-182`)
# ---------------------------------------------------------------------------


def inverse_sensor_model(distance: jnp.ndarray) -> jnp.ndarray:
    """Distance-weighted evidence (`voxel_map.py:423-426`)."""
    return jnp.clip(1.0 - 0.1 * distance, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("grid",))
def update(
    state: VoxelMapState,
    grid: VoxelGrid,
    frame: dict,
) -> VoxelMapState:
    """Log-odds update from one posed depth frame: hit voxels +, pass-through
    voxels -, both distance weighted; clears unexplored."""
    depth_map = frame["depth"][0]  # (h, w), sentinels -1 (range) / -2 (hole)
    extrinsic = frame["extrinsic"]
    intrinsic = frame["intrinsic"]
    depth_range = frame["depth_range"]

    depth_clone = jnp.where(depth_map == -1.0, depth_range[1], depth_map)
    pass_mask, _ = _frustum_mask(grid, extrinsic, intrinsic, depth_clone)

    # hit voxels: back-projected valid-depth pixels
    pts = geo.backproject_depth(depth_map, extrinsic, intrinsic).reshape(-1, 3)
    idx, in_bounds = grid.voxelize(pts)
    ok = in_bounds & (depth_map.reshape(-1) >= 0.0)
    lin = jnp.where(ok, grid.linear(idx), grid.num_voxels)
    hit = (
        jnp.zeros((grid.num_voxels + 1,), bool).at[lin].set(True)[: grid.num_voxels]
    )

    pass_mask = pass_mask & ~hit
    dist = jnp.linalg.norm(grid.centers - extrinsic[:3, 3], axis=-1)
    w_lo = LO_STEP * inverse_sensor_model(dist)
    lo = state.log_odds + jnp.where(hit, w_lo, 0.0) - jnp.where(pass_mask, w_lo, 0.0)
    lo = jnp.clip(lo, -LO_CLIP, LO_CLIP)
    unexplored = state.unexplored & ~hit & ~pass_mask
    return dataclasses.replace(state, log_odds=lo, unexplored=unexplored)


# ---------------------------------------------------------------------------
# utility / ROI (`update_utility`, `voxel_map.py:62-116`)
# ---------------------------------------------------------------------------


def update_utility(
    state: VoxelMapState,
    grid: VoxelGrid,
    cfg: VoxelConfig,
    gaussian_means: jnp.ndarray,
    gaussian_normals: jnp.ndarray,
    gaussian_confidences: jnp.ndarray,
    gaussian_opacities: jnp.ndarray,
    gaussian_alive: jnp.ndarray,
    use_confidence: bool = True,
    confidence_thres: float = 0.3,
) -> VoxelMapState:
    """ROI = frontier voxels + voxels holding > min_gaussian_per_voxel
    low-confidence (<0.3) high-opacity (>0.7) surfels, restricted to voxels
    touching free space; per-ROI mean surfel normal for cone sampling."""
    t = grid.num_voxels
    raw_roi = frontier_mask(state, grid, cfg)
    voxel_normal = jnp.zeros((t, 3))

    if use_confidence:
        idx, ok = grid.voxelize(gaussian_means)
        sel = (
            ok
            & gaussian_alive
            & (gaussian_confidences < confidence_thres)
            & (gaussian_opacities > 0.7)
        )
        lin = jnp.where(sel, grid.linear(idx), t)
        counts = jnp.zeros((t + 1,)).at[lin].add(1.0)[:t]
        nsum = jnp.zeros((t + 1, 3)).at[lin].add(gaussian_normals)[:t]
        update_m = counts > cfg.min_gaussian_per_voxel
        mean_n = nsum / jnp.maximum(counts[:, None], 1.0)
        mean_n = mean_n / jnp.maximum(
            jnp.linalg.norm(mean_n, axis=-1, keepdims=True), 1e-12
        )
        voxel_normal = jnp.where(update_m[:, None], mean_n, 0.0)
        raw_roi = raw_roi | update_m

    free_d = dilate(free_mask(state, cfg), grid, CROSS_OFFSETS)
    roi = raw_roi & free_d  # (`get_roi_mask`, `voxel_map.py:280-292`)
    return dataclasses.replace(state, roi_mask=roi, voxel_normal=voxel_normal)


def in_free_space(
    state: VoxelMapState, grid: VoxelGrid, cfg: VoxelConfig, points: jnp.ndarray
) -> jnp.ndarray:
    """(`in_free_space`, `voxel_map.py:379-394`) against the margin mask."""
    idx, ok = grid.voxelize(points)
    lin = jnp.where(ok, grid.linear(idx), 0)
    free = free_mask_w_margin(state, grid, cfg)[lin]
    return jnp.where(ok, free, False)


def occupied_filter(
    state: VoxelMapState, grid: VoxelGrid, cfg: VoxelConfig, points: jnp.ndarray
) -> jnp.ndarray:
    """Points inside the (margin-extended) scene box but not in free space
    (`voxel_filter`, `voxel_map.py:396-409`)."""
    bmin = jnp.asarray(grid.bbox_min) - 0.05
    bmax = jnp.asarray(grid.bbox_max) + 0.05
    inside = jnp.all(points > bmin, -1) & jnp.all(points < bmax, -1)
    return inside & ~in_free_space(state, grid, cfg, points)
