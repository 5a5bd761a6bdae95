#!/usr/bin/env bash
# Round-5 TPU queue, phase 5 (continuation window): kill the remaining
# seeds:1 id-family rows, cheapest/highest-value first.  Every run is
# checkpoint-resumed, so a timeout kill mid-run still leaves progress
# for the next invocation / harvest.
set -u
cd /root/repo

R() {
  while [ -f .tpu_pause ]; do sleep 15; done
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 10800 python tools/run_parity.py "$@"
}

# complete the truncated/missing single seeds first (full, un-truncated runs)
R --models idsage --datasets ba --repeat 1
R --models idgin --datasets ws --repeat 2
R --models idsage --datasets ws --repeat 2
R --models idgin --datasets ba --repeat 2
R --models idgat --datasets ws --repeat 1
R --models idgat --datasets ba --repeat 1
# then deepen toward 3 seeds
R --models idgin idsage --datasets ws ba --repeat 3
R --models idgat --datasets ws ba --repeat 2
R --models idgat --datasets ws ba --repeat 3
echo "TPU QUEUE5 DONE $(date)"
