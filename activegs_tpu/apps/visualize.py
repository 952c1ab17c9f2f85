"""Saved-map visualization — the analog of the reference's `visualize.py`
(orbit render dump instead of the interactive Open3D window).

    python -m activegs_tpu.apps.visualize --map experiments/.../map_final.npz \
        --out ./viz --views 12 --resolution 512
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .. import runtime
from ..io import checkpoint
from ..planning.paths import rotation_from_z
from ..render.types import Camera, RasterConfig
from ..core import geometry as geo
from ..viz.viewer import render_channel_panel


def orbit_poses(center: np.ndarray, radius: float, height: float, n: int):
    poses = []
    for ang in np.linspace(0, 2 * np.pi, n, endpoint=False):
        pos = center + [radius * np.cos(ang), radius * np.sin(ang), height]
        look = center - pos
        rot = rotation_from_z(look)[0]
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = rot
        e[:3, 3] = pos
        poses.append(e)
    return poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", required=True)
    ap.add_argument("--out", default="./viz")
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--fov", type=float, default=60.0)
    args = ap.parse_args()
    runtime.setup_cache()

    from PIL import Image

    state, cfg = checkpoint.load_gaussian_map(args.map)
    n = int(state.count)
    means = np.asarray(state.means[:n])
    center = means.mean(0)
    radius = 0.6 * float(np.linalg.norm(means.max(0) - means.min(0)))
    os.makedirs(args.out, exist_ok=True)
    intr = geo.intrinsics_from_fov(args.fov, args.fov)
    for i, pose in enumerate(orbit_poses(center, radius, 0.3 * radius, args.views)):
        panel = render_channel_panel(
            state,
            cfg,
            Camera(extrinsic=pose, intrinsic=intr),
            (args.resolution, args.resolution),
            RasterConfig(),
        )
        Image.fromarray(panel).save(os.path.join(args.out, f"view_{i:02d}.png"))
    print(f"wrote {args.views} channel panels to {args.out}")


if __name__ == "__main__":
    main()
