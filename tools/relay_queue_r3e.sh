#!/bin/bash
# Relay-window queue (round 3e): multi-seed quality A/B for
# --frames_encode full. The single-seed r3d A/B (window +5.94 dB SI-SDR vs
# full +5.47 at 2k steps) sits inside the ~±0.5 dB seed variance seen across
# earlier runs — 3 seeds x 2 modes resolves whether the 2.72x-faster trunk
# is quality-neutral before it can be recommended for production.
#
# ONE process on the chip; idle host. Each run ~4-8 min.
# Usage: nohup setsid bash tools/relay_queue_r3e.sh > runs/probe_r3e/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r3e
mkdir -p "$OUT"

log() { echo "[relay_queue_r3e $(date +%H:%M:%S)] $*"; }

while pgrep -f "relay_queue_r3d.sh" >/dev/null 2>&1; do
  log "waiting for the r3d queue"
  sleep 120
done
while pgrep -x pytest >/dev/null 2>&1 || pgrep -f "pytest" >/dev/null 2>&1; do
  log "host busy (pytest); sleeping 60s"
  sleep 60
done

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
log "relay is UP; starting seed study"

run() {
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
  tail -1 "$OUT/$name.json" || true
}

for seed in 0 1 2; do
  run "q_window_s$seed" 5400 python tools/quality_curve.py --regime frames \
    --steps 2000 --eval_every 1000 --out "$OUT/q_window_s$seed.jsonl" \
    -b 32 -lr 1e-3 --data_path synthetic:8 --mask_head --seed "$seed"
  run "q_full_s$seed" 5400 python tools/quality_curve.py --regime frames \
    --steps 2000 --eval_every 1000 --out "$OUT/q_full_s$seed.jsonl" \
    -b 32 -lr 1e-3 --data_path synthetic:8 --mask_head --frames_encode full \
    --seed "$seed"
done
log "seed study complete"
