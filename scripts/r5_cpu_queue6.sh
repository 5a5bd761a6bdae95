#!/usr/bin/env bash
# Round-5 CPU queue, phase 6: waits for phase 5b, then deepens the
# remaining seeds:1 link cells (gatidconv/sageidconv — the expensive
# id-link tail).  Checkpoint-resume makes partial progress durable.
set -u
cd /root/repo
export GRAPHGYM_PLATFORM=cpu
while ! grep -q "CPU QUEUE5b DONE" results/logs/r5_cpu_q5.log 2>/dev/null; do
  sleep 60
done
R() {
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 14400 python tools/run_parity.py "$@"
}
R --link --layers sageidconv --repeat 3
R --link --layers gatidconv --repeat 3
timeout 1200 python tools/run_parity.py --harvest --link --repeat 3
echo "CPU QUEUE6 DONE $(date)"
