#!/bin/bash
# Relay-window queue (round 5a): the curriculum study at the horizon that
# decides it (VERDICT r4 item 3).
#
# r4k closed at 5k steps with the linear arm "still climbing faster than
# control at 4-5k" and a literal TBD for the cosine arm. This queue runs the
# rematch at 10k — the horizon the record curve is quoted at — all arms in
# ONE window against a same-window control, on the now-PINNED eval anchor
# (tests/fixtures/eval_anchor.json, 5.8234 dB; quality_curve refuses to run
# if the anchor drifts). eval_every 1000 also re-yields the 5k points, so
# the r4k table back-fills for free.
#
# Arms (all: fusion mask head, full-encode, b32, Adam constant 1e-3;
# schedule horizons pin to 10k via quality_curve's epochs/steps_per_epoch
# override; eval mixtures stay at noise_scalar 0.1 in every arm):
#   1. control              — the 11.12 dB record recipe
#   2. noise linear:0.3:0.1 — annealed denoising curriculum
#   3. noise cosine:0.3:0.1 — the r4k TBD arm, at full horizon
#
# Usage: mkdir -p runs/probe_r5a && nohup setsid bash tools/relay_queue_r5a.sh \
#          > runs/probe_r5a/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r5a
mkdir -p "$OUT"

log() { echo "[relay_queue_r5a $(date +%H:%M:%S)] $*"; }

run() {
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
  tail -1 "$OUT/$name.json" || true
}

Q="python tools/quality_curve.py --regime fusion --steps 10000 \
   --eval_every 1000 -b 32 --data_path synthetic:8 --mask_head -lr 1e-3 \
   --fusion_encode full"

run q10k_const 7200 $Q --out $OUT/q10k_const.jsonl
run q10k_noise_lin 7200 $Q --noise_schedule linear:0.3:0.1 \
  --out $OUT/q10k_noise_lin.jsonl
run q10k_noise_cos 7200 $Q --noise_schedule cosine:0.3:0.1 \
  --out $OUT/q10k_noise_cos.jsonl

log "queue complete"
