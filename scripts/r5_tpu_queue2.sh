#!/usr/bin/env bash
# Round-5 TPU queue, phase 2 (replan after measuring real epoch rates:
# ~5 s/epoch smallworld id cells + rare 60-80 s tunnel stalls).
# Breadth at 1 seed first (VERDICT missing #2, incl. the idgcn cell
# whose phase-1 slot was lost to a manual kill), then ws/ba deepening,
# then idgat de-truncation.  Killed runs resume from ckpt; harvest
# merges whatever completes.
set -u
cd /root/repo

R() {
  while [ -f .tpu_pause ]; do sleep 15; done
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 10800 python tools/run_parity.py "$@"
}

R --models idgcn  --datasets smallworld --repeat 1
R --models idsage --datasets smallworld --repeat 1
R --models idgin  --datasets smallworld --repeat 1
R --models idgat  --datasets smallworld --repeat 1

R --models idgcn  --datasets ws ba --repeat 3
R --models idgcn  --datasets scalefree --repeat 1

R --models idgin  --datasets ws ba --repeat 3
R --models idsage --datasets ws ba --repeat 3

R --models idgat  --datasets ws ba --repeat 2
R --models idsage --datasets scalefree --repeat 1
R --models idgin  --datasets scalefree --repeat 1
R --models idgat  --datasets ws ba --repeat 3
R --models idgat  --datasets scalefree --repeat 1
echo "TPU QUEUE2 DONE $(date)"
