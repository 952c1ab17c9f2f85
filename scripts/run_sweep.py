"""One-process experiment sweep: the reference protocol, end to end.

The analog of `/root/reference/run.sh:9-27` + `eval.py` + `mesh_generation.py`
+ `utils/plot.py`: scenes x planners x seeds -> mission -> mesh -> eval ->
plots -> one aggregated summary. This is THE experiment that defines
active-gs (`utils/plot.py:21-28` plots exactly this comparison): the
confidence planner must beat exploration-only and random on rendering and
mesh quality at equal mission budget.

ONE process on purpose (unlike the reference's per-run shell loop): on this
stack a cached executable still costs 5-10 s to LOAD per process, and the
recorder charges real seconds against the mission budget (`io/recorder.py`,
matching `utils/common.py:289-329`) — separate processes would bill every
program load to the first mission of each run, skewing the comparison. Here
a throwaway warm-up mission absorbs the loads once; every recorded mission
then runs warm (VERDICT r4 ask #3a).

    python scripts/run_sweep.py exp_id=sweep budget=150 runs=3 \
        scenes=synthetic/boxroom,synthetic/tworoom \
        planners=confidence,confidence_wo_roi,exploration,random

Artifacts per run: experiments/<exp_id>/<scene>/<planner>/<seed>/
(step_stats.jsonl, map snapshots, final_result.json) + per-scene plots +
experiments/<exp_id>/summary.json (commit as SWEEP_r{N}.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activegs_tpu import runtime  # noqa: E402

runtime.setup_cache()


class _CachedGT:
    """Memoizing simulate() wrapper so eval's GT frames render once per
    scene instead of once per (run, pose)."""

    def __init__(self, simulator):
        self.simulator = simulator
        self._cache = {}

    def __getattr__(self, name):
        return getattr(self.simulator, name)

    def simulate(self, pose, require_gt=False, **kw):
        import numpy as np

        key = np.asarray(pose, np.float32).tobytes()
        if key not in self._cache:
            self._cache[key] = self.simulator.simulate(
                pose, require_gt=require_gt, **kw
            )
        return self._cache[key]


def run_one_mission(cfg, budget, record_interval, recorded=True):
    from activegs_tpu.apps.common import build_mission, dump_config, experiment_path
    from activegs_tpu.io.recorder import MissionRecorder

    mapper, simulator, planner, comp = build_mission(cfg)
    if recorded:
        path = experiment_path(cfg)
        dump_config(cfg, path)
        recorder = MissionRecorder(
            path, budget=budget, record_interval=record_interval
        )
        mapper.load_recorder(recorder)
        mapper.run()
        return path, comp, simulator
    mapper.run(max_steps=int(budget))  # budget = step count in warm-up mode
    return None, comp, simulator


def mesh_and_eval(cfg, exp_path, comp, gt, test_poses, mesh_resolution):
    """In-process equivalents of apps/mesh_app + apps/eval_app."""
    import numpy as np

    from activegs_tpu.apps.eval_app import load_snapshots
    from activegs_tpu.eval.evaluation import EvaluationTool, generate_mesh
    from activegs_tpu.io import checkpoint, ply

    snap = load_snapshots(exp_path)
    if snap is None:
        return None
    ids, times, lengths, maps, meshes = snap

    # mesh per snapshot (mesh_generation.py:63-102)
    meshes = []
    for i, (state, mcfg) in zip(ids, maps):
        cam_file = os.path.join(exp_path, "map", f"cameras_{i}.json")
        cams = []
        for row in json.load(open(cam_file)):
            ext = np.asarray(row[:16], np.float32).reshape(4, 4)
            intr = np.asarray(row[16:], np.float32).reshape(3, 3)
            cams.append((ext, intr))
        verts, faces, colors = generate_mesh(
            state,
            mcfg,
            cams,
            resolution=mesh_resolution,
            raster_cfg=comp["raster_cfg"],
            bbox=getattr(gt, "bbox", None),
        )
        ply.save_ply(
            os.path.join(exp_path, "map", f"mesh_{i}.ply"), verts, faces, colors
        )
        meshes.append((verts, faces))

    mesh_gt = (gt.mesh_vertices, gt.mesh_faces)
    tool = EvaluationTool(
        maps=maps,
        meshes=meshes,
        test_poses=test_poses,
        gt_provider=gt,
        mesh_gt=mesh_gt,
        raster_cfg=comp["raster_cfg"],
    )
    result = tool.eval(mode="complete")
    result["step"] = ids
    result["time"] = times
    result["path_length"] = lengths
    out_file = os.path.join(exp_path, "final_result.json")
    json.dump(result, open(out_file, "w"), indent=4)
    return result


def main():
    import numpy as np

    from activegs_tpu.apps.data_generation import sample_test_views_from_sim
    from activegs_tpu.apps.plot import plot
    from activegs_tpu.config.loader import load_config
    from activegs_tpu.sim import get_simulator

    argd = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    exp_id = argd.get("exp_id", "sweep")
    budget = float(argd.get("budget", 150))
    record_interval = float(argd.get("record_interval", 45))
    runs = int(argd.get("runs", 3))
    scenes = argd.get("scenes", "synthetic/boxroom,synthetic/tworoom").split(",")
    planners = argd.get(
        "planners", "confidence,confidence_wo_roi,exploration,random"
    ).split(",")
    num_test_views = int(argd.get("num_test_views", 128))
    mesh_resolution = int(argd.get("mesh_resolution", 512))
    warmup_steps = int(argd.get("warmup_steps", 20))

    t_sweep = time.time()
    if warmup_steps > 0:
        # throwaway unrecorded mission: loads/compiles the bucket-ladder
        # programs so no recorded mission pays them (see module docstring)
        print(f"=== warm-up mission ({warmup_steps} steps, unrecorded) ===")
        cfg = load_config(
            "main", [f"scene={scenes[0]}", "planner=confidence", "seed=999"]
        )
        run_one_mission(cfg, warmup_steps, 1e9, recorded=False)
        print(f"=== warm-up done in {time.time() - t_sweep:.0f}s ===")

    summary = {
        "budget_s": budget,
        "record_interval_s": record_interval,
        "runs": runs,
        "num_test_views": num_test_views,
        "mesh_resolution": mesh_resolution,
        "scenes": {},
    }
    for scene in scenes:
        scene_base = os.path.basename(scene)
        # one GT set per scene: test poses are IDENTICAL across planners and
        # seeds (reference: a fixed pre-generated test set, eval.yaml)
        cfg0 = load_config("main", [f"scene={scene}"])
        gt = _CachedGT(get_simulator(cfg0))
        test_poses = sample_test_views_from_sim(gt.simulator, num_test_views, seed=0)
        scene_summary = {}
        for planner in planners:
            per_run = []
            for run in range(runs):
                t0 = time.time()
                print(f"=== scene={scene} planner={planner} run={run} ===")
                cfg = load_config(
                    "main",
                    [
                        f"scene={scene}",
                        f"planner={planner}",
                        f"experiment.exp_id={exp_id}",
                        f"experiment.run_id={run}",
                        f"seed={run}",
                    ],
                )
                exp_path, comp, _sim = run_one_mission(
                    cfg, budget, record_interval
                )
                result = mesh_and_eval(
                    cfg, exp_path, comp, gt, test_poses, mesh_resolution
                )
                print(
                    f"=== done in {time.time() - t0:.0f}s: "
                    f"final PSNR {result['mean_psnr'][-1]:.2f} dB, "
                    f"completion-ratio {result['mesh_completion_ratio'][-1]} ==="
                )
                per_run.append(result)
            finals = {
                k: [r[k][-1] for r in per_run if r and r.get(k)]
                for k in (
                    "mean_psnr",
                    "mean_ssim",
                    "mean_depth_mse",
                    "mean_perceptual",
                    "mesh_accuracy",
                    "mesh_completion",
                    "mesh_completion_ratio",
                )
            }
            scene_summary[planner] = {
                "final": {
                    k: {
                        "mean": float(np.mean([v for v in vs if v is not None])),
                        "std": float(np.std([v for v in vs if v is not None])),
                        "runs": vs,
                    }
                    for k, vs in finals.items()
                    if vs and any(v is not None for v in vs)
                },
                "n_runs": len(per_run),
            }
        summary["scenes"][scene_base] = scene_summary
        plot(
            os.path.join("experiments", exp_id, scene_base),
            os.path.join("experiments", exp_id, scene_base, "plots"),
        )

    summary["wall_clock_s"] = round(time.time() - t_sweep, 1)
    out = os.path.join("experiments", exp_id, "summary.json")
    json.dump(summary, open(out, "w"), indent=2)
    print(json.dumps(summary, indent=2))
    print(f"summary written to {out}")


if __name__ == "__main__":
    main()
