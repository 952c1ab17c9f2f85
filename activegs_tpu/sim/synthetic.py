"""Synthetic RGB-D simulator: a procedurally textured box room, ray-traced
in JAX (runs on the TPU).

Replaces habitat-sim (C++/OpenGL, unavailable on TPU hosts — SURVEY §2.1
C21) for full-mission runs and tests: same sensor contract (base.py), scene
bbox from the mesh, GT mesh available for evaluation. Ray casting is
brute-force Möller-Trumbore over all triangles, batched (H*W, M) — for
room-scale triangle counts this is a trivial TPU workload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo
from .base import SimulatorBase


def _box(bmin, bmax, inward: bool):
    """12 triangles of an axis-aligned box; inward=True flips windings so
    normals face inside (room walls)."""
    x0, y0, z0 = bmin
    x1, y1, z1 = bmax
    v = np.array(
        [
            [x0, y0, z0],
            [x1, y0, z0],
            [x1, y1, z0],
            [x0, y1, z0],
            [x0, y0, z1],
            [x1, y0, z1],
            [x1, y1, z1],
            [x0, y1, z1],
        ]
    )
    faces = [
        (0, 2, 1),
        (0, 3, 2),  # z0
        (4, 5, 6),
        (4, 6, 7),  # z1
        (0, 1, 5),
        (0, 5, 4),  # y0
        (3, 6, 2),
        (3, 7, 6),  # y1
        (0, 4, 7),
        (0, 7, 3),  # x0
        (1, 2, 6),
        (1, 6, 5),  # x1
    ]
    f = np.array(faces)
    if inward:
        f = f[:, [0, 2, 1]]
    return v, f


def default_room():
    """A 6 x 5 x 3 m room with three furniture boxes and a pillar."""
    verts = []
    faces = []
    mats = []  # per-face material id

    def add(bmin, bmax, mat, inward=False):
        v, f = _box(bmin, bmax, inward)
        faces.append(f + sum(len(x) for x in verts))
        verts.append(v)
        mats.append(np.full(len(f), mat))

    add((0.0, 0.0, 0.0), (6.0, 5.0, 3.0), 0, inward=True)  # room shell
    add((1.0, 1.0, 0.0), (2.2, 2.0, 0.9), 1)  # table
    add((4.0, 3.2, 0.0), (5.4, 4.6, 1.4), 2)  # cabinet
    add((2.8, 0.4, 0.0), (3.4, 1.0, 0.5), 3)  # stool
    add((4.4, 0.8, 0.0), (4.9, 1.3, 3.0), 4)  # pillar
    return (
        np.concatenate(verts).astype(np.float32),
        np.concatenate(faces).astype(np.int32),
        np.concatenate(mats).astype(np.int32),
    )


def two_room():
    """Two 5 x 5 x 3 m rooms joined by a 1.2 m-wide, 2.1 m-tall doorway in
    a dividing wall — the canonical active-exploration shape (the reference
    sweeps multiple Replica apartments for the same reason, `run.sh:9-27`):
    room B is invisible from the start pose, so frontier/exploration
    utility must route the robot through the door; in the convex boxroom
    exploration is nearly trivial."""
    verts = []
    faces = []
    mats = []

    def add(bmin, bmax, mat, inward=False):
        v, f = _box(bmin, bmax, inward)
        faces.append(f + sum(len(x) for x in verts))
        verts.append(v)
        mats.append(np.full(len(f), mat))

    add((0.0, 0.0, 0.0), (10.0, 5.0, 3.0), 0, inward=True)  # outer shell
    # dividing wall at x ~ 5 m with a doorway y in [1.9, 3.1], z < 2.1
    add((4.92, 0.0, 0.0), (5.08, 1.9, 3.0), 0)  # wall, left of door
    add((4.92, 3.1, 0.0), (5.08, 5.0, 3.0), 0)  # wall, right of door
    add((4.92, 1.9, 2.1), (5.08, 3.1, 3.0), 0)  # lintel above door
    # room A furniture
    add((1.0, 1.0, 0.0), (2.2, 2.0, 0.9), 1)  # table
    add((2.8, 3.6, 0.0), (3.4, 4.2, 0.5), 3)  # stool
    # room B furniture
    add((6.2, 3.4, 0.0), (8.2, 4.6, 0.6), 2)  # bed
    add((9.2, 0.4, 0.0), (9.8, 1.6, 1.8), 4)  # shelf
    return (
        np.concatenate(verts).astype(np.float32),
        np.concatenate(faces).astype(np.int32),
        np.concatenate(mats).astype(np.int32),
    )


# scene registry consumed by `BoxRoomSimulator.from_config` via
# `cfg.scene.scene_name` (the analog of the reference's Replica scene
# selection, `config/scene/replica/*.yaml`)
SCENE_BUILDERS = {
    "boxroom": default_room,
    "tworoom": two_room,
}


_BASE_COLORS = np.array(
    [
        [0.75, 0.72, 0.68],  # walls
        [0.55, 0.35, 0.20],  # table
        [0.25, 0.45, 0.60],  # cabinet
        [0.60, 0.20, 0.25],  # stool
        [0.35, 0.55, 0.30],  # pillar
    ],
    np.float32,
)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _raycast(extrinsic, intrinsic, tri_v, tri_mat, h: int, w: int):
    """Returns (rgb (3,h,w), depth (h,w) z-depth, hit mask)."""
    coords = geo.pixel_grid(h, w).reshape(-1, 2)
    origin, dirs = geo.get_world_rays(coords, extrinsic, intrinsic)
    o = origin[0]
    d = dirs  # (P, 3), unit z in camera frame -> t is z-depth

    v0 = tri_v[:, 0]
    e1 = tri_v[:, 1] - v0
    e2 = tri_v[:, 2] - v0
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])  # (P, M, 3)
    det = jnp.sum(pvec * e1[None], -1)
    ok = jnp.abs(det) > 1e-9
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvec = o[None, None] - v0[None]
    u = jnp.sum(tvec * pvec, -1) * inv
    qvec = jnp.cross(tvec, e1[None])
    vv = jnp.sum(qvec * d[:, None, :], -1) * inv
    t = jnp.sum(qvec * e2[None], -1) * inv
    hit = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > 1e-4)
    t = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t, axis=1)
    t_best = jnp.take_along_axis(t, best[:, None], 1)[:, 0]
    has_hit = jnp.isfinite(t_best)
    depth = jnp.where(has_hit, t_best, 0.0)

    # procedural texture: material base color x 20 cm checker + position tint
    p = o[None] + d * t_best[:, None]
    mat = tri_mat[best]
    base = jnp.asarray(_BASE_COLORS)[mat]
    checker = (
        jnp.floor(p[:, 0] / 0.2) + jnp.floor(p[:, 1] / 0.2) + jnp.floor(p[:, 2] / 0.2)
    ) % 2.0
    tint = 0.85 + 0.15 * checker[:, None]
    wave = 0.08 * jnp.sin(7.0 * p[:, 0:1]) * jnp.cos(5.0 * p[:, 1:2] + 3.0 * p[:, 2:3])
    rgb = jnp.clip(base * tint + wave, 0.0, 1.0)
    rgb = jnp.where(has_hit[:, None], rgb, 0.0)
    return (
        rgb.T.reshape(3, h, w),
        depth.reshape(h, w),
        has_hit.reshape(h, w),
    )


class BoxRoomSimulator(SimulatorBase):
    """Habitat-adapter-equivalent simulator over the synthetic room."""

    def __init__(
        self,
        resolution=(512, 512),
        fov=(60.0, 60.0),
        depth_range=(0.0, 5.0),
        depth_noise_co=0.01,
        seed=0,
        scene=None,
        scene_name="boxroom",
        missing_band=None,
    ):
        self.scene_name = scene_name
        self.resolution = np.asarray(resolution)
        self.fov = np.asarray(fov)
        self.intrinsic = np.asarray(geo.intrinsics_from_fov(fov[0], fov[1]))
        self.depth_range = tuple(depth_range)
        self.depth_noise_co = depth_noise_co
        self.rng = np.random.default_rng(seed)
        verts, faces, mats = scene if scene is not None else default_room()
        self.mesh_vertices = verts
        self.mesh_faces = faces
        self.tri_v = jnp.asarray(verts[faces])  # (M, 3, 3)
        self.tri_mat = jnp.asarray(mats)
        self.bbox = np.stack([verts.min(0), verts.max(0)])
        # optional synthetic "missing surface" horizontal height band: ANY
        # hit whose world z lies in [z0, z1] is dropped (walls, furniture —
        # whatever the band crosses), exercising the has_missing_surface
        # planner path
        self.missing_band = missing_band
        self.has_missing_surface = missing_band is not None

    @classmethod
    def from_config(cls, cfg):
        s = cfg.simulator
        name = cfg.scene.scene_name
        # scene_name doubles as the experiment-dir name; `geometry` lets a
        # variant (e.g. boxroom_holes) reuse a builder WITHOUT its runs
        # colliding with the base scene's experiment directories
        geom = cfg.scene.get("geometry", name)
        if geom not in SCENE_BUILDERS:
            raise ValueError(
                f"unknown synthetic scene {geom!r}; have {sorted(SCENE_BUILDERS)}"
            )
        # scenes with unreturned surfaces (the missing -2 sentinel /
        # valid-mask planner path, `habitat_simulator.py:121-123`,
        # `confidence.py:53-64`): the scene config's `missing_band` [z0, z1]
        # drops wall returns in that height band
        band = cfg.scene.get("missing_band", None)
        return cls(
            resolution=tuple(s.sensor.resolution),
            fov=tuple(s.sensor.fov),
            depth_range=tuple(s.sensor.depth_range),
            depth_noise_co=s.sensor.depth_noise_co,
            scene=SCENE_BUILDERS[geom](),
            scene_name=name,
            missing_band=tuple(band) if band else None,
        )

    def render_clean(self, c2w):
        h, w = (int(x) for x in self.resolution)
        rgb, depth, hit = _raycast(
            jnp.asarray(c2w, jnp.float32),
            jnp.asarray(self.intrinsic),
            self.tri_v,
            self.tri_mat,
            h,
            w,
        )
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        hit = np.asarray(hit)
        if self.missing_band is not None:
            z0, z1 = self.missing_band
            pts = np.asarray(
                geo.backproject_depth(
                    jnp.asarray(depth), jnp.asarray(c2w, jnp.float32),
                    jnp.asarray(self.intrinsic),
                )
            )
            hole = (pts[..., 2] > z0) & (pts[..., 2] < z1) & hit
            depth = depth.copy()
            depth[hole] = 0.0
            hit = hit & ~hole
        return rgb, depth, hit

    def simulate(self, c2w, valid_mask_only: bool = False, require_gt: bool = False):
        """`HabitatSimulator.simulate` contract
        (`habitat_simulator.py:84-136`)."""
        c2w = np.asarray(c2w, np.float32)
        rgb, depth, hit = self.render_clean(c2w)
        if valid_mask_only:
            return hit
        depth = np.where(hit, depth, 0.0)
        if require_gt:
            out_depth = depth.copy()
            out_depth[~hit] = -2.0
        else:
            out_depth, _ = self.apply_sensor_model(depth, self.rng)
        return {
            "extrinsic": jnp.asarray(c2w),
            "intrinsic": jnp.asarray(self.intrinsic),
            "rgb": jnp.asarray(rgb),
            "depth": jnp.asarray(out_depth[None].astype(np.float32)),
            "depth_range": jnp.asarray(self.depth_range, jnp.float32),
        }
