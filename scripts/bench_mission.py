"""Mission-level TPU benchmark: steady-state seconds per keyframe.

The train-step bench (bench.py) times one jitted program; the MISSION is
the product — spawn + view_stats + train + post + voxel + the planner's
stats/batch/A* phases (reference protocol: `/root/reference/run.sh:9-27`,
budget accounting `utils/common.py:289-329`). This runs a real mission on
the default config (synthetic boxroom, confidence planner, 512^2,
capacity 524288 — the same shapes as `apps/main`, so executables share the
persistent cache) and reports the steady-state per-keyframe cost.

Steady state = steps >= STEADY_FROM of ONE process (CLAUDE.md: loading a
cached executable still costs ~5-10 s per program per process; in-process
reuse is the only truly warm state; early steps also climb the capacity
bucket ladder, each rung a new program). Run once after any edit to warm
the cache, then trust the second run's numbers.

`prewarm=1` (default) absorbs executable loads BEFORE the measured steps by
running a throwaway unrecorded mission in the same process (VERDICT r4
weak #2: load seconds otherwise land on random measured steps, making the
artifact irreproducible run-to-run). The report carries MEDIANS and
percentiles next to the mean, plus the spike steps (prune/new-bucket), so
round-over-round comparisons track the typical keyframe, not the spikes.

Target (BASELINE.md): mapping median <= 2.5 s/keyframe + planning <= 1.5
s/step at 512^2, ~400k surfels, fully warm.

Prints ONE JSON line; commit the output as BENCH_MISSION_r{N}.json.

    python scripts/bench_mission.py [steps=30] [prewarm=1] [out=experiments/...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activegs_tpu import runtime  # noqa: E402

runtime.setup_cache()

STEADY_FROM = 4  # 1-based frame id; earlier steps climb the bucket ladder


def main():
    import numpy as np

    from activegs_tpu.apps.common import build_mission, experiment_path
    from activegs_tpu.config.loader import load_config
    from activegs_tpu.io.recorder import MissionRecorder

    argd = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    steps = int(argd.pop("steps", 30))
    out = argd.pop("out", None)
    prewarm = int(argd.pop("prewarm", 1))

    if prewarm:
        # throwaway mission: pays every executable load/compile up the
        # bucket ladder once, so the measured mission below runs warm
        print(f" prewarm mission ({max(steps, 20)} steps)...", file=sys.stderr)
        wcfg = load_config("main", [f"{k}={v}" for k, v in argd.items()])
        wmapper, _, _, _ = build_mission(wcfg)
        wmapper.init_map()
        for _ in range(max(steps, 20)):
            wmapper.step()
        del wmapper

    cfg = load_config("main", [f"{k}={v}" for k, v in argd.items()])
    mapper, simulator, planner, comp = build_mission(cfg)
    if out:
        recorder = MissionRecorder(out, budget=1e9, record_interval=1e9)
        mapper.load_recorder(recorder)

    mapper.init_map()
    all_stats = []
    for _ in range(steps):
        s = mapper.step()
        print(
            f" step {s['frame_id']}: mapping {s['t_mapping']:.2f}s "
            f"({' '.join(f'{k}={v:.2f}' for k, v in s['phase_times'].items())}) "
            f"plan({' '.join(f'{k}={v:.3f}' for k, v in s['plan_times'].items())}) "
            f"n={s['n_gaussians']}",
            file=sys.stderr,
        )
        all_stats.append(s)

    steady = [s for s in all_stats if s["frame_id"] >= STEADY_FROM]
    mean = lambda xs: float(np.mean(xs)) if xs else None
    med = lambda xs: float(np.median(xs)) if xs else None
    pct = lambda xs, q: float(np.percentile(xs, q)) if xs else None
    phases = sorted({k for s in steady for k in s["phase_times"]})
    plan_phases = sorted({k for s in steady for k in s["plan_times"]})
    t_map = [s["t_mapping"] for s in steady]
    # spikes: prune/new-bucket steps (loads, the 8-keyframe stats renders) —
    # annotated so the headline median tracks the typical keyframe
    spike_steps = [
        s["frame_id"] for s in steady if s["t_mapping"] > 2.0 * med(t_map)
    ]
    result = {
        "metric": "mission_s_per_keyframe",
        "value": med(t_map),
        "unit": "s/keyframe (mapping, steady-state median)",
        "mean": round(mean(t_map), 3),
        "p10": round(pct(t_map, 10), 3),
        "p90": round(pct(t_map, 90), 3),
        "spike_steps": spike_steps,
        "prewarmed": bool(prewarm),
        "steady_steps": [s["frame_id"] for s in steady],
        "phase_s": {
            k: round(mean([s["phase_times"].get(k, 0.0) for s in steady]), 3)
            for k in phases
        },
        "phase_s_median": {
            k: round(med([s["phase_times"].get(k, 0.0) for s in steady]), 3)
            for k in phases
        },
        # utility_stats/utility_batch are SUB-phases of "utility" (see
        # planning/confidence.candidate_utilities) — excluded from the sum
        # or planning_s would double-count them
        "planning_s": round(
            mean(
                [
                    sum(
                        v
                        for k, v in s["plan_times"].items()
                        if not k.startswith("utility_")
                    )
                    for s in steady
                ]
            )
            or 0.0,
            3,
        ),
        "planning_s_median": round(
            med(
                [
                    sum(
                        v
                        for k, v in s["plan_times"].items()
                        if not k.startswith("utility_")
                    )
                    for s in steady
                ]
            )
            or 0.0,
            3,
        ),
        "plan_phase_s": {
            k: round(mean([s["plan_times"].get(k, 0.0) for s in steady]), 3)
            for k in plan_phases
        },
        "n_gaussians_final": all_stats[-1]["n_gaussians"],
        "capacity_bucket_final": all_stats[-1]["capacity_bucket"],
        "num_dropped_final": all_stats[-1]["num_dropped"],
        "config": {
            "planner": cfg.planner.planner_name,
            "scene": cfg.scene.scene_name,
            "resolution": [int(x) for x in getattr(simulator, "resolution", ())],
            "capacity": comp["map_cfg"].capacity,
            "optimization_steps": comp["map_cfg"].optimization_steps,
        },
    }
    # numpy scalars (int64 counts, float32 times) leak into stats dicts
    print(json.dumps(result, default=lambda o: o.item()))
    if out:
        mapper.recorder.save_map(mapper.gm_state, mapper.map_cfg, "final")
        mapper.recorder.save_path()


if __name__ == "__main__":
    main()
