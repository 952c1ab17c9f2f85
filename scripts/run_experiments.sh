#!/usr/bin/env bash
# Experiment sweep — the analog of the reference's run.sh:
# scenes x planners x N seeds -> mission -> mesh -> eval -> plots.
#
# Delegates to the ONE-PROCESS driver (scripts/run_sweep.py): separate
# processes per run (the reference's shell-loop shape, run.sh:9-27) would
# re-pay 5-10 s executable loads per program per process, billed to each
# mission's budget (CLAUDE.md). The driver warms once, then runs every
# recorded mission warm, and writes experiments/$EXP_ID/summary.json.
set -euo pipefail
cd "$(dirname "$0")/.."

SCENES=${SCENES:-"synthetic/boxroom,synthetic/tworoom"}
PLANNERS=${PLANNERS:-"confidence,confidence_wo_roi,exploration,random"}
RUNS=${RUNS:-3}
EXP_ID=${EXP_ID:-sweep}
BUDGET=${BUDGET:-150}

python scripts/run_sweep.py \
  exp_id="$EXP_ID" budget="$BUDGET" runs="$RUNS" \
  scenes="$SCENES" planners="$PLANNERS"
