#!/usr/bin/env bash
# Round-5 CPU queue, phase 5b (continuation window): only GRADEABLE
# cells (see PARITY_NOTES "breadth inventory correction" — the
# reference ships sf/sw artifacts only for the gat/gcn families).
# Order: cheapest/highest-value first so value accrues monotonically.
set -u
cd /root/repo
export GRAPHGYM_PLATFORM=cpu

R() {
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 10800 python tools/run_parity.py "$@"
}

# 1. the 4 missing gradeable Fast breadth cells (one seed each first)
R --models gcnconvFast gatconvFast --datasets scalefree smallworld --repeat 1
# 2. deepen the existing single-seed sf/sw rows to 3 seeds
R --models gcnconv gatconv --datasets scalefree smallworld --repeat 3
# 3. deepen the Fast breadth cells to 3 seeds
R --models gcnconvFast gatconvFast --datasets scalefree smallworld --repeat 3
# 4. deepen idgcn/smallworld (expensive: ego transform) last
R --models idgcn --datasets smallworld --repeat 3

# final merge
timeout 1200 python tools/run_parity.py --harvest \
  --models gcnconv gatconv idgcn idgat gcnconvFast gatconvFast \
  --datasets ws ba scalefree smallworld --repeat 3
echo "CPU QUEUE5b DONE $(date)"
