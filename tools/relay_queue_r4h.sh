#!/bin/bash
# Relay-window queue (round 4h): --fusion_encode full on chip.
#
# The fusion step is certified AT the HBM roofline (BASELINE r4f: fullgrad
# 98.3% of speed-of-light) — the only lever left is bytes. full-encode runs
# both conv encoders ONCE over the (nf+ns-1)-frame span and slices latent
# windows (~2.9x less encoder input at the defaults), the same move that won
# 2.72x on the frames family (r3d).
#
# 1. Throughput A/B at b128 (tuned-default geometry) and b256.
# 2. Quality: 2k-step x 3-seed window-vs-full A/B (the frames study's
#    protocol, r3e) + a 10k full-encode curve against the r4g constant-1e-3
#    control (11.11 dB, eval noisy-anchor 5.82).
#
# Usage: mkdir -p runs/probe_r4h && nohup setsid bash tools/relay_queue_r4h.sh \
#          > runs/probe_r4h/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4h
mkdir -p "$OUT"

log() { echo "[relay_queue_r4h $(date +%H:%M:%S)] $*"; }

wait_idle() {
  local l
  while :; do
    l=$(awk '{print ($1 < 0.35) ? "ok" : $1}' /proc/loadavg)
    [ "$l" = ok ] && return
    log "host busy (loadavg $l); sleeping 120s"
    sleep 120
  done
}

probe() {
  timeout 600 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0
EOF
}
attempt=0
until probe; do
  attempt=$((attempt + 1))
  log "relay down (attempt $attempt); sleeping 300s"
  sleep 300
done
log "relay is UP"

run() {
  local name=$1 tmo=$2; shift 2
  wait_idle
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
  tail -1 "$OUT/$name.json" || true
}

BENCH="python bench.py"
export MAAVSS_BENCH_SKIP_BASELINE=1

# 1. throughput A/B
run fullenc_b128 3600 env MAAVSS_BENCH_FUSION_ENCODE=full $BENCH
run fullenc_b256 3600 \
  env MAAVSS_BENCH_FUSION_ENCODE=full MAAVSS_BENCH_BATCH=256 $BENCH

# 2. quality
QC="python tools/quality_curve.py --regime fusion --eval_every 1000
    -b 32 --data_path synthetic:8 --mask_head -lr 1e-3"
for s in 0 1 2; do
  run q2k_window_s$s 3600 $QC --steps 2000 --seed $s \
      --out $OUT/q2k_window_s$s.jsonl
  run q2k_full_s$s 3600 $QC --steps 2000 --seed $s --fusion_encode full \
      --out $OUT/q2k_full_s$s.jsonl
done
run q10k_full 5400 $QC --steps 10000 --fusion_encode full \
    --out $OUT/q10k_full.jsonl

log "queue complete"
