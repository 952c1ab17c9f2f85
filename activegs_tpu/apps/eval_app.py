"""Offline evaluation — the analog of the reference's `eval.py`.

Loads every recorded map snapshot + generated mesh of an experiment, renders
the test views, scores rendering + mesh metrics, writes final_result.json.

    python -m activegs_tpu.apps.eval_app experiment.exp_id=test
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..eval.evaluation import EvaluationTool
from ..io import checkpoint, ply
from ..sim import get_simulator
from .common import build_components, experiment_path, parse_cli


def load_snapshots(exp_path: str):
    info_file = os.path.join(exp_path, "map", "record_info.txt")
    if not os.path.exists(info_file):
        print("no record file!!!")
        return None
    rows = [line.split() for line in open(info_file) if line.strip()]
    ids = [r[0] for r in rows]
    times = [float(r[1]) for r in rows]
    lengths = [float(r[2]) for r in rows]
    maps, meshes = [], []
    for i in ids:
        state, mcfg = checkpoint.load_gaussian_map(
            os.path.join(exp_path, "map", f"map_{i}.npz")
        )
        maps.append((state, mcfg))
        mesh_file = os.path.join(exp_path, "map", f"mesh_{i}.ply")
        meshes.append(ply.load_ply(mesh_file) if os.path.exists(mesh_file) else None)
    return ids, times, lengths, maps, meshes


def main():
    cfg = parse_cli("eval")
    exp_path = experiment_path(cfg)
    snap = load_snapshots(exp_path)
    if snap is None:
        return
    ids, times, lengths, maps, meshes = snap

    simulator = get_simulator(cfg)
    comp = build_components(cfg)

    test_folder = cfg.get("test_folder", None)
    traj_file = os.path.join(test_folder, "traj.txt") if test_folder else None
    if traj_file and os.path.exists(traj_file):
        poses = np.loadtxt(traj_file).reshape(-1, 4, 4).astype(np.float32)
    else:
        # fall back: sample poses from the simulator's free space
        from .data_generation import sample_test_views_from_sim

        poses = sample_test_views_from_sim(simulator, cfg.get("num_test_views", 200))

    mesh_gt = None
    if hasattr(simulator, "mesh_vertices"):
        mesh_gt = (simulator.mesh_vertices, simulator.mesh_faces)
    elif test_folder and os.path.exists(os.path.join(test_folder, "mesh.ply")):
        mesh_gt = ply.load_ply(os.path.join(test_folder, "mesh.ply"))

    tool = EvaluationTool(
        maps=maps,
        meshes=meshes,
        test_poses=poses,
        gt_provider=simulator,
        mesh_gt=mesh_gt,
        raster_cfg=comp["raster_cfg"],
    )
    result = tool.eval(mode=cfg.get("eval_mode", "complete"))
    result["step"] = ids
    result["time"] = times
    result["path_length"] = lengths

    out_file = os.path.join(exp_path, "final_result.json")
    if os.path.exists(out_file):
        old = json.load(open(out_file))
        old.update(result)
        result = old
    json.dump(result, open(out_file, "w"), indent=4)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
