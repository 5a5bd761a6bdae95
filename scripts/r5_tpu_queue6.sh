#!/usr/bin/env bash
# Round-5 TPU queue, phase 6: waits for queue5, then attempts the two
# remaining gradeable breadth cells (idgat smallworld/scalefree —
# expensive ego-transform corpora; checkpoint-resume makes partial
# progress durable across window end).
set -u
cd /root/repo
while ! grep -q "TPU QUEUE5 DONE" results/logs/r5_tpu_q5.log 2>/dev/null; do
  sleep 60
done
R() {
  while [ -f .tpu_pause ]; do sleep 15; done
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 10800 python tools/run_parity.py "$@"
}
R --models idgat --datasets smallworld --repeat 1
R --models idgat --datasets scalefree --repeat 1
R --models idgcn --datasets ws ba --repeat 3
echo "TPU QUEUE6 DONE $(date)"
