#!/usr/bin/env bash
# Round-5 CPU queue, phase 2: canonical link/edge re-baseline under
# protocol v3 (the advisor-r4 init fix changed torch-path dynamics —
# conv internals back to gain-1 glorot), failing ws cells first; then
# the plain/Fast breadth + deepening from phase 1.  One run at a time.
set -u
cd /root/repo
export GRAPHGYM_PLATFORM=cpu

R() {
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 14400 python tools/run_parity.py "$@"
}

# --- canonical link matrix re-baseline (protocol v3), failing cells first
R --link --layers gcnconv ginconv --repeat 3
R --link --layers gcnidconv ginidconv --repeat 3

# --- deliberate edge-task cells (VERDICT task 8), v3
R --edge --layers gcnconv sageidconv --repeat 3

R --link --layers sageconv gatconv --repeat 3
R --link --layers sageidconv gatidconv --repeat 3

# --- plain/Fast breadth (gradeable cells only: the reference ships
#     smallworld/scalefree artifacts only for gat/gcn families)
R --models gcnconvFast gatconvFast --datasets smallworld --repeat 3
R --models gcnconvFast gatconvFast --datasets scalefree --repeat 3

# --- ws/ba seed deepening to 3 for plain/Fast rows
R --models gcnconv gatconv sageconv ginconv gcnconvFast gatconvFast \
           sageconvFast ginconvFast --datasets ws ba --repeat 3

# --- existing gcnconv/gatconv breadth rows to 3 seeds
R --models gcnconv gatconv --datasets scalefree smallworld --repeat 3

echo "CPU QUEUE2 DONE $(date)"
