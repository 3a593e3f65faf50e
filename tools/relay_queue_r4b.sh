#!/bin/bash
# Relay-window queue (round 4b): TIMED runs for the fused Pallas epilogue,
# after tools/validate_pallas_epilogue.py passed on chip (runs/probe_r4b/
# validate3.json: all geometries ok; dy holds to the fp64 first-match golden
# at bf16 rounding noise).
#
# 1. Stage decomposition A/B (stage 1 + 2, b128): stage_fused_* vs the
#    unfused stage cases — does fused beat 63.3/52.5 ms fwd+bwd (r3j)?
# 2. End-to-end frames A/B at the production geometry (b256, microbatch 2):
#    window + full encode, MAAVSS_EPILOGUE xla vs fused.
# 3. s2d cutoff re-test at MIN_HW=64: the fused epilogue changes stage-3
#    economics.
#
# ONE process on the chip; waits for an IDLE HOST before every timed run
# (concurrent CPU work inflates dispatch ~3x — CLAUDE.md).
# Usage: nohup setsid bash tools/relay_queue_r4b.sh > runs/probe_r4b/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4b
mkdir -p "$OUT"

log() { echo "[relay_queue_r4b $(date +%H:%M:%S)] $*"; }

wait_idle() {
  # 1-min loadavg < 0.35 = nothing else on this single-core host
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

# 1. stage decomposition (fused cases now compile: VMEM blocks + fp32 compare)
run stage1 5400 python benchmarks/stage1_probe.py --stage 1 --batch 128
run stage2 5400 python benchmarks/stage1_probe.py --stage 2 --batch 128

# 2. end-to-end frames A/B (b256 microbatch-2: the production geometry)
BENCH="python bench.py"
export MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 \
       MAAVSS_BENCH_MICROBATCH=2 MAAVSS_BENCH_SKIP_BASELINE=1
run frames_window_fused 3600 env MAAVSS_EPILOGUE=fused $BENCH
export MAAVSS_BENCH_FRAMES_ENCODE=full
run frames_full_fused 3600 env MAAVSS_EPILOGUE=fused $BENCH

# 3. s2d cutoff re-test: with the fused epilogue, does folding stage 3 pay?
run frames_full_fused_minhw64 3600 \
  env MAAVSS_EPILOGUE=fused MAAVSS_S2D_MIN_HW=64 $BENCH
unset MAAVSS_BENCH_FRAMES_ENCODE
run frames_window_fused_minhw64 3600 \
  env MAAVSS_EPILOGUE=fused MAAVSS_S2D_MIN_HW=64 $BENCH
unset MAAVSS_BENCH_REGIME MAAVSS_BENCH_BATCH MAAVSS_BENCH_MICROBATCH \
      MAAVSS_BENCH_SKIP_BASELINE

log "queue complete"
