#!/usr/bin/env bash
# Round-5 CPU queue, phase 3: continuation after the mid-flight replan
# (breadth restricted to gradeable gat/gcn-family cells).  Waits for
# the in-flight gcnidconv/ginidconv link sweep, then proceeds.
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

R --link --layers gcnidconv ginidconv --repeat 3    # merge via disk reuse
R --edge --layers gcnconv sageidconv --repeat 3
R --link --layers sageconv gatconv --repeat 3
R --link --layers sageidconv gatidconv --repeat 3
R --models gcnconvFast gatconvFast --datasets smallworld --repeat 3
R --models gcnconvFast gatconvFast --datasets scalefree --repeat 3
R --models gcnconv gatconv sageconv ginconv gcnconvFast gatconvFast \
           sageconvFast ginconvFast --datasets ws ba --repeat 3
R --models gcnconv gatconv --datasets scalefree smallworld --repeat 3
echo "CPU QUEUE3 DONE $(date)"
