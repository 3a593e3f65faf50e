#!/bin/bash
# Relay-window queue (round 4k): trimmed same-window curriculum study.
#
# The full r4j plan (4 arms x 10-20k steps, ~4.5 h) exceeds this window;
# the r3 quality curve shows 95% of final gain lands inside 500 steps and
# the 5k point sits within ~0.1 dB of 10k, so 5k-step arms resolve
# curriculum effects of the ~0.2 dB scale we care about. Every arm runs in
# THIS window against a THIS-window constant control (the eval
# noisy-mixture anchor shifts across code windows — r4d vs r3 showed 5.82
# vs 4.22 dB — so cross-window comparisons are void; arms here share the
# seeded eval set).
#
# Arms (all: fusion mask head, full-encode, b32, Adam constant 1e-3):
#   1. control          — the 11.12 dB record recipe, 5k horizon
#   2. noise linear:0.3:0.1 — denoising curriculum annealing to the eval's
#      0.1 anchor (eval mixtures stay at 0.1: apples-to-apples)
#   3. mode random:1,1,8 — 10%/10%/80% weighted modality dropout
#   4. noise cosine:0.3:0.1 — optional tail arm (cut if the window closes)
#
# Usage: mkdir -p runs/probe_r4k && nohup setsid bash tools/relay_queue_r4k.sh \
#          > runs/probe_r4k/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4k
mkdir -p "$OUT"

log() { echo "[relay_queue_r4k $(date +%H:%M:%S)] $*"; }

run() {
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
  tail -1 "$OUT/$name.json" || true
}

Q="python tools/quality_curve.py --regime fusion --steps 5000 \
   --eval_every 1000 -b 32 --data_path synthetic:8 --mask_head -lr 1e-3 \
   --fusion_encode full"

run q5k_const 2400 $Q --out $OUT/q5k_const.jsonl
run q5k_noise_lin 2400 $Q --noise_schedule linear:0.3:0.1 \
  --out $OUT/q5k_noise_lin.jsonl
run q5k_mode_118 2400 $Q --mode_schedule random:1,1,8 \
  --out $OUT/q5k_mode_118.jsonl
run q5k_noise_cos 2400 $Q --noise_schedule cosine:0.3:0.1 \
  --out $OUT/q5k_noise_cos.jsonl

log "queue complete"
