#!/usr/bin/env bash
# Round-5 TPU queue, phase 3: drop ungradeable breadth cells.  The
# reference ships smallworld/scalefree artifacts ONLY for the gat/gcn
# families (ls results/val/final | grep -E 'smallworld|scalefree' =
# 11 files; no sage/gin/sageFast/ginFast/idsage/idgin, no
# idgcn_scalefree) — VERDICT r4's "~19 cells" over-counted; the
# gradeable missing set is 7 cells.  TPU side: idgcn_smallworld (in
# flight), idgat smallworld+scalefree, then ws/ba seed deepening.
set -u
cd /root/repo

# wait for the in-flight idgcn smallworld single run to release the chip
while pgrep -f "run_parity.py --single idgcn smallworld" > /dev/null; do
  sleep 30
done

R() {
  while [ -f .tpu_pause ]; do sleep 15; done
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 10800 python tools/run_parity.py "$@"
}

R --models idgcn --datasets smallworld --repeat 1   # merge (disk reuse)
R --models idgat --datasets smallworld --repeat 1
R --models idgcn --datasets ws ba --repeat 3
R --models idgat --datasets scalefree --repeat 1
R --models idgin  --datasets ws ba --repeat 3
R --models idsage --datasets ws ba --repeat 3
R --models idgat --datasets ws ba --repeat 2
R --models idgat --datasets ws ba --repeat 3
R --models idgcn idgat --datasets smallworld --repeat 3
echo "TPU QUEUE3 DONE $(date)"
