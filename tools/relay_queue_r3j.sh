#!/bin/bash
# Relay-window queue (round 3j): on-chip A/B of the temporal-fold conv3d
# stages (MAAVSS_CONV3D=tfold). Comparators in BASELINE.md round 3g/3h:
# bisection s2d 62.9/127.5/176.2/191.1/191.7 ms (b128, BN on); end-to-end
# window+s2d 174.2, full+s2d 488.4 clips/s/chip (b256, microbatch 2).
set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r3j
mkdir -p "$OUT"
log() { echo "[relay_queue_r3j $(date +%H:%M:%S)] $*"; }
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
# 1) stage bisection: tfold composed with the s2d cutoff (production form)
run bisect_tfold 3600 env MAAVSS_CONV3D=tfold \
  python benchmarks/frames_probe.py --batch 128
# 2) stage bisection: tfold only (no spatial fold) — separates the two folds
run bisect_tfold_nos2d 3600 env MAAVSS_CONV3D=tfold MAAVSS_S2D_MIN_HW=100000 \
  python benchmarks/frames_probe.py --batch 128
# 3) end-to-end, window encode (reference semantics), tuned frames config
run bench_frames_window_tfold 5400 env MAAVSS_BENCH_REGIME=frames \
  MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 MAAVSS_CONV3D=tfold \
  python bench.py
# 4) end-to-end, full encode (throughput config)
run bench_frames_full_tfold 5400 env MAAVSS_BENCH_REGIME=frames \
  MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 MAAVSS_CONV3D=tfold \
  MAAVSS_BENCH_FRAMES_ENCODE=full python bench.py
log "queue complete"
