#!/bin/bash
# Relay-window queue (round 3h): s2d spatial-cutoff refinement.
# The r3g bisection showed folding WINS at 256/128 spatial but LOSES at 64
# (s3 +33%); MAAVSS_S2D_MIN_HW=128 (now the default) folds only stages 1-2.
# Usage: nohup setsid bash tools/relay_queue_r3h.sh > runs/probe_r3h/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r3h
mkdir -p "$OUT"

log() { echo "[relay_queue_r3h $(date +%H:%M:%S)] $*"; }

while pgrep -f "relay_queue_r3g.sh" >/dev/null 2>&1; do
  log "waiting for r3g"
  sleep 60
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
log "relay is UP; starting"

run() {
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
  tail -1 "$OUT/$name.json" || true
}

# cutoff 128 (stages 1-2 fold) at the tuned full-encode geometry
run frames_full_s2d_cut128 3600 env MAAVSS_CONV3D=s2d \
  MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 \
  MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
# no-cutoff control (stages 1-3 fold), same geometry — isolates the s3 loss
run frames_full_s2d_cut0 3600 env MAAVSS_CONV3D=s2d MAAVSS_S2D_MIN_HW=0 \
  MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 \
  MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
# window encode with the cutoff (the reference-semantics config's number)
run frames_window_s2d_cut128 3600 env MAAVSS_CONV3D=s2d \
  MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 \
  MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
log "queue complete"
