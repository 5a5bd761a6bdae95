#!/usr/bin/env bash
# Round-5 CPU queue: the ws link-deficit ablations (VERDICT r4 #1)
# first, then plain/Fast breadth + seed deepening — these cells train
# FASTER on host CPU (~0.2 s/epoch) than over the TPU tunnel
# (~2-4.5 s/epoch, latency-bound), so the queue keeps the chip free
# for the id-model queue.  One run at a time (2 host cores shared
# with the TPU stream's collation).
set -u
cd /root/repo
export GRAPHGYM_PLATFORM=cpu

P() {  # probe sweep: env assignment passed explicitly, dedicated out dir
  local probe="$1"; local out="$2"; shift 2
  echo "=== $(date +%H:%M:%S) probe [$probe] -> $out: $*"
  env GRAPHGYM_LINK_PROBE="$probe" timeout 10800 \
      python tools/run_parity.py --out "$out" "$@"
}
R() {
  echo "=== $(date +%H:%M:%S) run_parity $*"
  timeout 10800 python tools/run_parity.py "$@"
}

# --- 1) ws link-deficit ablations on the gcnconv cells (3 seeds each;
#        ba columns double as the do-no-harm control)
P "dataset.resample_negative=True" results/ablation_wslink/resneg \
  --link --layers gcnconv --repeat 3
P "dataset.resample_disjoint=True" results/ablation_wslink/resdis \
  --link --layers gcnconv --repeat 3
P "train.eval_period=1" results/ablation_wslink/evalp1 \
  --link --layers gcnconv --repeat 3

# --- 1b) round-2 probes from the evalp1/resneg/resdis findings: the
#     curve peak never reaches the reference on ws (evalp1), so test
#     eval-protocol hypotheses: leaky eval message graph; eval-negative
#     resampling (best-val max-bias)
P "dataset.link_eval_message_full=True" results/ablation_wslink/leakval \
  --link --layers gcnconv --repeat 3
P "dataset.link_eval_resample_negative=True" results/ablation_wslink/evalresneg \
  --link --layers gcnconv --repeat 3

# --- 2) deliberate edge-task cells (VERDICT task 8)
R --edge --layers gcnconv sageidconv --repeat 3

# --- 3) plain/Fast breadth: smallworld then scalefree, 3 seeds
R --models sageconv ginconv gcnconvFast gatconvFast sageconvFast ginconvFast \
  --datasets smallworld --repeat 3
R --models sageconv ginconv gcnconvFast gatconvFast sageconvFast ginconvFast \
  --datasets scalefree --repeat 3

# --- 4) ws/ba seed deepening to 3 for plain/Fast rows
R --models gcnconv gatconv sageconv ginconv gcnconvFast gatconvFast \
           sageconvFast ginconvFast --datasets ws ba --repeat 3

# --- 5) existing gcnconv/gatconv breadth rows to 3 seeds
R --models gcnconv gatconv --datasets scalefree smallworld --repeat 3

# --- 6) id-link rows to 3 seeds
R --link --layers gcnidconv sageidconv gatidconv ginidconv --repeat 3

echo "CPU QUEUE DONE $(date)"
