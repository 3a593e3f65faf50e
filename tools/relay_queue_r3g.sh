#!/bin/bash
# Relay-window queue (round 3g): space-to-depth conv3d A/B.
#
# The frames trunk runs at ~11% MXU because its first stages are
# channel-starved (BASELINE round 3f). MAAVSS_CONV3D=s2d reformulates the
# (·,5,5)/p2 + pool-2 stages EXACTLY onto 2x2 phase channels: 4x contraction
# depth, 4x output rows, pool free as a phase max (layers.py fold helpers;
# parity in tests/test_frames_s2d.py). Measure:
#   1. stage bisection, s2d (vs the r3c window/BN-on rows)
#   2. end-to-end bench: full-encode + s2d at the tuned b256 geometry
#   3. end-to-end bench: window encode + s2d (reference-semantics config)
#
# ONE process on the chip; idle host.
# Usage: nohup setsid bash tools/relay_queue_r3g.sh > runs/probe_r3g/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r3g
mkdir -p "$OUT"

log() { echo "[relay_queue_r3g $(date +%H:%M:%S)] $*"; }

while pgrep -f "relay_queue_r3[ef].sh" >/dev/null 2>&1; do
  log "waiting for earlier queues"
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
log "relay is UP; starting"

run() {
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
  tail -1 "$OUT/$name.json" || true
}

run frames_probe_s2d 3600 env MAAVSS_CONV3D=s2d \
  python benchmarks/frames_probe.py --batch 128
run frames_bench_full_s2d 3600 env MAAVSS_CONV3D=s2d \
  MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 \
  MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
run frames_bench_window_s2d 3600 env MAAVSS_CONV3D=s2d \
  MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 \
  MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
log "queue complete"
