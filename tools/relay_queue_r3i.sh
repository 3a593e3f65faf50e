#!/bin/bash
# Relay-window queue (round 3i): serving latency vs batch (the b8 rows are
# in runs/probe_r3f; these fill in the single-request and b32 points).
set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r3i
mkdir -p "$OUT"
log() { echo "[relay_queue_r3i $(date +%H:%M:%S)] $*"; }
while pgrep -x pytest >/dev/null 2>&1 || pgrep -f "pytest" >/dev/null 2>&1; do
  log "host busy (pytest); sleeping 60s"; sleep 60
done
probe() {
  timeout 600 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0
PYEOF
}
attempt=0
until probe; do
  attempt=$((attempt + 1)); log "relay down ($attempt)"; sleep 300
done
log "relay UP; starting"
run() {
  local name=$1 tmo=$2; shift 2
  log "START $name"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"; tail -1 "$OUT/$name.json" || true
}
run serve_fusion_b1 3600 python tools/serve_bench.py --calls 50 -b 1
run serve_fusion_b32 3600 python tools/serve_bench.py --calls 30 -b 32
run serve_frames_full_b1 3600 python tools/serve_bench.py --model frames \
  --calls 20 -b 1 --frames_encode full
log "queue complete"
