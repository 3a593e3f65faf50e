#!/bin/bash
# Relay-window queue (round 3f):
#   1-2. frames serving latency over the new uint8 wire (4x smaller
#        requests; the fp32 wire measured transfer-bound), window + full
#   3-4. 10k-step quality A/B window-vs-full (does the ~0.25 dB 2k-step
#        gap close with training? BASELINE.md round-3d seed study)
#
# ONE process on the chip; idle host preferred (quality runs tolerate load,
# serve latency rows do not — keep the host quiet during 1-2).
# Usage: nohup setsid bash tools/relay_queue_r3f.sh > runs/probe_r3f/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r3f
mkdir -p "$OUT"

log() { echo "[relay_queue_r3f $(date +%H:%M:%S)] $*"; }

while pgrep -f "relay_queue_r3e.sh" >/dev/null 2>&1; do
  log "waiting for the r3e queue"
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

run serve_frames_u8_window 3600 python tools/serve_bench.py --model frames \
  --calls 20 -b 8
run serve_frames_u8_full 3600 python tools/serve_bench.py --model frames \
  --calls 20 -b 8 --frames_encode full
run q10k_window 7200 python tools/quality_curve.py --regime frames \
  --steps 10000 --eval_every 2000 --out "$OUT/q10k_window.jsonl" \
  -b 32 -lr 1e-3 --data_path synthetic:8 --mask_head --seed 0
run q10k_full 7200 python tools/quality_curve.py --regime frames \
  --steps 10000 --eval_every 2000 --out "$OUT/q10k_full.jsonl" \
  -b 32 -lr 1e-3 --data_path synthetic:8 --mask_head --frames_encode full \
  --seed 0
log "queue complete"

# appended: relay-safe rooflines for the frames step, window vs full, at the
# measured geometries (compile-only)
run roofline_frames_window 3600 env MAAVSS_BENCH_MICROBATCH=2 \
  python tools/cost_report.py --regime frames --batch 256 --json \
  --measured_ms 1636
run roofline_frames_full 3600 env MAAVSS_BENCH_MICROBATCH=2 \
  MAAVSS_BENCH_FRAMES_ENCODE=full python tools/cost_report.py \
  --regime frames --batch 256 --json --measured_ms 602.6
log "queue complete (incl. rooflines)"

# appended: the first two serving rows ran concurrently with the slow pytest
# tier (host contention inflates dispatch); re-measure them on the idle host
while pgrep -x pytest >/dev/null 2>&1 || pgrep -f "pytest" >/dev/null 2>&1; do
  log "waiting for pytest before the clean serving re-runs"
  sleep 60
done
run serve_frames_u8_window_clean 3600 python tools/serve_bench.py \
  --model frames --calls 20 -b 8
run serve_frames_u8_full_clean 3600 python tools/serve_bench.py \
  --model frames --calls 20 -b 8 --frames_encode full
run serve_fusion_clean 3600 python tools/serve_bench.py --calls 50 -b 8
log "queue complete (incl. clean serving re-runs)"
