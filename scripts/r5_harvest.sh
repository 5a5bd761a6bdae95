#!/usr/bin/env bash
# End-of-round harvest: merge every completed on-disk seed into the
# parity tables without launching new runs, then regenerate markdown.
set -u
cd /root/repo
export GRAPHGYM_PLATFORM=cpu
H() { timeout 1200 python tools/run_parity.py --harvest "$@"; }
H --models gcnconv gatconv sageconv ginconv idgcn idgat idsage idgin \
          gcnconvFast gatconvFast sageconvFast ginconvFast \
  --datasets ws ba scalefree smallworld --repeat 3
H --link --repeat 3
H --edge --layers gcnconv sageidconv --repeat 3
echo "HARVEST DONE"
