#!/usr/bin/env bash
# Round-5 TPU queue, phase 4 (endgame): after idgcn_smallworld, close
# the cheap seed asks first, then the remaining breadth cells.
set -u
cd /root/repo
while pgrep -f "run_parity.py --single idgcn smallworld" > /dev/null; do sleep 30; done
R() {
  while [ -f .tpu_pause ]; do sleep 15; done
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 10800 python tools/run_parity.py "$@"
}
R --models idgcn --datasets smallworld --repeat 1   # merge via disk reuse
R --models idgcn --datasets ws ba --repeat 3
R --models idgat --datasets smallworld --repeat 1
R --models idgin --datasets ws ba --repeat 3
R --models idsage --datasets ws ba --repeat 3
R --models idgat --datasets ws ba --repeat 2
R --models idgat --datasets scalefree --repeat 1
R --models idgat --datasets ws ba --repeat 3
echo "TPU QUEUE4 DONE $(date)"
