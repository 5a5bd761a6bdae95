#!/usr/bin/env bash
# Round-5 CPU queue, phase 4: endgame priorities — after the in-flight
# gcnidconv/ginidconv v4 sweep: edge-task cells, then the cheap node
# seed-deepening (VERDICT task 2) before the expensive id-link tail.
set -u
cd /root/repo
export GRAPHGYM_PLATFORM=cpu

while pgrep -f "run_parity.py --link --layers gcnidconv ginidconv" > /dev/null; do
  sleep 30
done

R() {
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 14400 python tools/run_parity.py "$@"
}

R --link --layers gcnidconv ginidconv --repeat 3     # merge/resume
R --edge --layers gcnconv sageidconv --repeat 3
R --models gcnconv gatconv sageconv ginconv gcnconvFast gatconvFast \
           sageconvFast ginconvFast --datasets ws ba --repeat 3
R --link --layers sageconv gatconv --repeat 3
R --models gcnconvFast gatconvFast --datasets smallworld --repeat 3
R --models gcnconvFast gatconvFast --datasets scalefree --repeat 3
R --link --layers sageidconv gatidconv --repeat 3
R --models gcnconv gatconv --datasets scalefree smallworld --repeat 3
echo "CPU QUEUE4 DONE $(date)"
