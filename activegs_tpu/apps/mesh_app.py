"""Offline mesh extraction — the analog of `mesh_generation.py`.

For every recorded map snapshot: render RGB-D at 1024^2 along the executed
trajectory, TSDF-fuse (2 cm voxel / 10 cm truncation), filter isolated
clusters, save mesh_XXX.ply.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..eval.evaluation import generate_mesh
from ..io import checkpoint, ply
from ..sim import get_simulator
from .common import build_components, experiment_path, parse_cli


def main():
    cfg = parse_cli("main")
    exp_path = experiment_path(cfg)
    info_file = os.path.join(exp_path, "map", "record_info.txt")
    if not os.path.exists(info_file):
        print("no record file!!!")
        return
    comp = build_components(cfg)
    simulator = get_simulator(cfg)
    bbox = getattr(simulator, "bbox", None)
    resolution = cfg.get("mesh_resolution", 1024)

    for line in open(info_file):
        if not line.strip():
            continue
        map_id = line.split()[0]
        print(f"generating mesh for gaussian map {map_id}")
        state, mcfg = checkpoint.load_gaussian_map(
            os.path.join(exp_path, "map", f"map_{map_id}.npz")
        )
        cam_file = os.path.join(exp_path, "map", f"cameras_{map_id}.json")
        cams = []
        for row in json.load(open(cam_file)):
            ext = np.asarray(row[:16], np.float32).reshape(4, 4)
            intr = np.asarray(row[16:], np.float32).reshape(3, 3)
            cams.append((ext, intr))
        verts, faces, colors = generate_mesh(
            state,
            mcfg,
            cams,
            resolution=resolution,
            raster_cfg=comp["raster_cfg"],
            bbox=bbox,
        )
        ply.save_ply(
            os.path.join(exp_path, "map", f"mesh_{map_id}.ply"), verts, faces, colors
        )


if __name__ == "__main__":
    main()
