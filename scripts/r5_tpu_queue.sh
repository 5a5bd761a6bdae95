#!/usr/bin/env bash
# Round-5 TPU queue: id-model parity cells (the class where the TPU
# tunnel beats the 2-core host).  Strictly sequential — one process
# holds the tunnel chip.  Pause between runs: touch /root/repo/.tpu_pause
# Priority order: smallworld breadth (VERDICT r4 missing #2, incl. the
# explicitly-asked idgcn_smallworld merge), then ws/ba seed deepening
# to 3 (VERDICT task 2), then idgat de-truncation + deepening, then
# scalefree breadth.  Killed runs resume via run-dir checkpoints; a
# final `--harvest` pass merges whatever completed.
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
R --models idgin  --datasets ws ba --repeat 3
R --models idsage --datasets ws ba --repeat 3

R --models idgcn  --datasets scalefree --repeat 1
R --models idgat  --datasets ws ba --repeat 3

R --models idsage --datasets scalefree --repeat 1
R --models idgin  --datasets scalefree --repeat 1
R --models idgat  --datasets scalefree --repeat 1

# deepen breadth cells if time allows
R --models idgcn idsage idgin idgat --datasets smallworld scalefree --repeat 3
echo "TPU QUEUE DONE $(date)"
