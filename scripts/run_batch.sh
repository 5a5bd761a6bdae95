#!/usr/bin/env bash
# Grid-search batch pipeline (reference run/run_batch.sh):
# generate grid configs -> fan out jobs (with retry rounds) -> aggregate.
set -e
cd "$(dirname "$0")/.."
BASE=${1:-configs/idgcn_ws.yaml}
GRID=${2:-grids/example.txt}
OUT=${3:-generated_configs}
REPEAT=${4:-3}
MAX_JOBS=${5:-1}   # one TPU process at a time on a single-chip host

python - "$BASE" "$GRID" "$OUT" <<'PY'
import sys
from graphgym_tpu.exp.grid import gen_grid
print("\n".join(gen_grid(sys.argv[1], sys.argv[2], sys.argv[3])))
PY
python -m graphgym_tpu.exp.runner "$OUT" --repeat "$REPEAT" --max_jobs "$MAX_JOBS" --rounds 3
python -m graphgym_tpu.exp.agg results
