#!/usr/bin/env bash
# Design-space sweep round 1 (reference run/scripts/design/
# run_design_round1.sh): sample the round1 grid along the controlled
# design dimensions (sample/dimensions.txt), budget-match every point,
# run with repeats, aggregate.
#
# Full-scale mirrors the reference (SAMPLE_NUM=96, REPEAT=3).
# SMOKE=1 runs a toy-scale end-to-end pass (gen -> runner -> agg) on
# the locally-runnable nx chunks (the PyG real-dataset chunks need
# raw data not present in this environment).
set -eu
cd "$(dirname "$0")/../.."

CONFIG=configs/design/design_v1.yaml
GRID=grids/design/round1.txt
ALIASES=sample/dimensions.txt
SAMPLE_NUM=${SAMPLE_NUM:-96}
REPEAT=${REPEAT:-3}
OUT=${OUT:-results/design_v1_grid_round1}

if [ "${SMOKE:-0}" = "1" ]; then
  # toy scale; budget matching skipped (it builds a model per sampled
  # point — minutes of generation for configs the smoke then drops;
  # tests/test_design_space.py asserts budget matching on round1)
  SAMPLE_NUM=6; REPEAT=1; BUDGET=""
else
  BUDGET="$CONFIG"
fi

python - <<PY
from graphgym_tpu.exp.grid import gen_grid_sample_aliased, load_alias_file
paths = gen_grid_sample_aliased(
    "$CONFIG", "$GRID", "$OUT/configs",
    sample_num=int("$SAMPLE_NUM"),
    aliases=load_alias_file("$ALIASES"),
    config_budget="$BUDGET" or None,
    results_dir="$OUT")
print(f"{len(paths)} configs generated under $OUT/configs")
PY

if [ "${SMOKE:-0}" = "1" ]; then
  # keep only runnable nx configs, cap the batch for the smoke pass
  python - <<PY
import glob, os, yaml
kept = 0
for p in sorted(glob.glob("$OUT/configs/*.yaml")):
    cfg = yaml.safe_load(open(p))
    if cfg.get("dataset", {}).get("format") != "nx" or kept >= 6:
        os.remove(p)
    else:
        kept += 1
print(f"smoke: kept {kept} nx configs")
PY
  python -m graphgym_tpu.exp.runner "$OUT/configs" --repeat "$REPEAT" \
      --overrides optim.max_epoch 3 train.eval_period 1
else
  python -m graphgym_tpu.exp.runner "$OUT/configs" --repeat "$REPEAT"
fi

python -m graphgym_tpu.exp.agg "$OUT"
