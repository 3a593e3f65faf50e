#!/bin/bash
# Relay-window queue (round 4e) — runs AFTER relay_queue_r4d exits:
#
# 1. v3 epilogue on-chip validation, post i1-pad fix (r4d hit the Mosaic
#    backend wall "Invalid vector register cast" on padded bool vectors —
#    the routing masks now shift as fp32 0/1).
# 2. Stage decomposition A/B (stage 1 + 2, b128) for the v3 epilogue.
# 3. End-to-end frames A/B (b256 mb2, window + full) + s2d MIN_HW=64.
# 4. --stft_fold A/B: the lane-folded STFT encoder (enc_a) on top of the
#    pgenc-fold default, fusion b256.
#
# Usage: nohup setsid bash tools/relay_queue_r4e.sh <r4d_pid> \
#          > runs/probe_r4e/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4e
mkdir -p "$OUT"
R4D_PID=${1:-0}

log() { echo "[relay_queue_r4e $(date +%H:%M:%S)] $*"; }

if [ "$R4D_PID" != 0 ]; then
  while kill -0 "$R4D_PID" 2>/dev/null; do
    log "waiting for r4d queue (pid $R4D_PID)"
    sleep 120
  done
fi
log "r4d done"

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

run validate_epilogue 5400 python tools/validate_pallas_epilogue.py
if ! tail -1 "$OUT/validate_epilogue.json" | grep -q '"ok": true'; then
  log "EPILOGUE VALIDATION FAILED — skipping fused benches"
  SKIP_FUSED=1
else
  SKIP_FUSED=0
fi

BENCH="python bench.py"
export MAAVSS_BENCH_SKIP_BASELINE=1

if [ "$SKIP_FUSED" = 0 ]; then
  run stage1 5400 python benchmarks/stage1_probe.py --stage 1 --batch 128
  run stage2 5400 python benchmarks/stage1_probe.py --stage 2 --batch 128
  export MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 \
         MAAVSS_BENCH_MICROBATCH=2
  run frames_window_fused 3600 env MAAVSS_EPILOGUE=fused $BENCH
  export MAAVSS_BENCH_FRAMES_ENCODE=full
  run frames_full_fused 3600 env MAAVSS_EPILOGUE=fused $BENCH
  run frames_full_fused_minhw64 3600 \
    env MAAVSS_EPILOGUE=fused MAAVSS_S2D_MIN_HW=64 $BENCH
  unset MAAVSS_BENCH_FRAMES_ENCODE MAAVSS_BENCH_REGIME MAAVSS_BENCH_BATCH \
        MAAVSS_BENCH_MICROBATCH
fi

# 4. enc_a lane fold on the fusion step (pgenc fold rides the auto default)
run fusion_stft_fold 3600 env MAAVSS_BENCH_STFT_FOLD=fold $BENCH
unset MAAVSS_BENCH_SKIP_BASELINE

log "queue complete"
