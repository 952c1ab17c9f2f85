#!/usr/bin/env bash
# Experiment sweep — the analog of the reference's run.sh:
# scenes x planners x N seeds -> mission -> mesh -> eval -> plots.
set -euo pipefail
cd "$(dirname "$0")/.."

SCENES=${SCENES:-"synthetic/boxroom synthetic/tworoom"}
PLANNERS=${PLANNERS:-"confidence confidence_wo_roi exploration random"}
RUNS=${RUNS:-5}
EXP_ID=${EXP_ID:-sweep}
BUDGET=${BUDGET:-300}

for scene in $SCENES; do
  for planner in $PLANNERS; do
    for run in $(seq 0 $((RUNS - 1))); do
      echo "=== scene=$scene planner=$planner run=$run ==="
      python -m activegs_tpu.apps.main \
        scene="$scene" planner="$planner" \
        experiment.exp_id="$EXP_ID" experiment.run_id="$run" \
        experiment.budget="$BUDGET" seed="$run"
      python -m activegs_tpu.apps.mesh_app \
        scene="$scene" planner="$planner" \
        experiment.exp_id="$EXP_ID" experiment.run_id="$run"
      python -m activegs_tpu.apps.eval_app \
        scene="$scene" planner="$planner" \
        experiment.exp_id="$EXP_ID" experiment.run_id="$run"
    done
  done
  scene_dir="./experiments/$EXP_ID/$(basename "$scene")"
  python -m activegs_tpu.apps.plot --root "$scene_dir"
done
