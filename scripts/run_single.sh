#!/usr/bin/env bash
# Smoke-test the installation (reference run/run_single.sh): one config,
# 3 seeds, aggregated results under results/.
set -e
cd "$(dirname "$0")/.."
CONFIG=${1:-configs/idgcn_ws.yaml}
python -m graphgym_tpu.main --cfg "$CONFIG" --repeat 3 "${@:2}"
