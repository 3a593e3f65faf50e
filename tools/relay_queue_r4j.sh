#!/bin/bash
# Relay-window queue (round 4j): quality studies on the full-encode flagship.
#
# The 11.12 dB record (r4h: 10k steps, constant 1e-3, mask head, full-encode)
# is the anchor. This window sweeps the two VERDICT-#8 knobs LR schedules
# didn't cover, plus a longer-horizon record push:
# 1. 20k-step constant-1e-3 arm (the 10k curve was still monotone at 11.12 —
#    does the record move with horizon?)
# 2. --noise_schedule linear:0.3:0.1 (denoising curriculum: start harder,
#    anneal to the eval's 0.1 anchor; eval mixtures stay at 0.1 so arms
#    compare apples-to-apples)
# 3. --noise_schedule cosine:0.3:0.1 (same endpoints, slower early decay)
# 4. --mode_schedule random:1,1,8 (10%/10%/80% weighted per-step modality
#    dropout — does occasional single-modality training regularize the AV
#    separator?)
#
# Usage: mkdir -p runs/probe_r4j && nohup setsid bash tools/relay_queue_r4j.sh \
#          > runs/probe_r4j/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4j
mkdir -p "$OUT"

log() { echo "[relay_queue_r4j $(date +%H:%M:%S)] $*"; }

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

Q="python tools/quality_curve.py --regime fusion --eval_every 1000 -b 32 \
   --data_path synthetic:8 --mask_head -lr 1e-3 --fusion_encode full"

# 1. horizon push: 20k constant (the r4h 10k record arm, doubled)
run q20k_const 5400 $Q --steps 20000 --out $OUT/q20k_const.jsonl

# 2+3. noise curricula, 10k each (same eval window as the 11.12 record)
run q10k_noise_lin 3600 $Q --steps 10000 \
  --noise_schedule linear:0.3:0.1 --out $OUT/q10k_noise_lin.jsonl
run q10k_noise_cos 3600 $Q --steps 10000 \
  --noise_schedule cosine:0.3:0.1 --out $OUT/q10k_noise_cos.jsonl

# 4. weighted modality-dropout curriculum, 10k
run q10k_mode_118 3600 $Q --steps 10000 \
  --mode_schedule random:1,1,8 --out $OUT/q10k_mode_118.jsonl

log "queue complete"
