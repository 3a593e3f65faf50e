#!/bin/bash
# Relay-window queue (round 4c): the lane-PACKED fused epilogue + the
# lane-folded phasegram encoder.
#
# r4b lesson: the first epilogue build streamed [N, C<=64] tensors and paid
# the 128-lane padding tax (fused fwd 53.6 ms vs XLA 11.3; bwd OOMed HBM on
# the padded sel residual). The kernels now pack P=128/C rows per tile and
# the enc_v stack gains an exact lane-folded execution (ops/pgenc_fold.py).
#
# 1. On-chip validation of the packed epilogue kernels (values + full vjp).
# 2. Stage decomposition A/B (stage 1 + 2, b128): fused vs the 63.7/52.5 ms
#    XLA stage fwd+bwd.
# 3. pgenc probe (b256): per-layer + whole-encoder, xla vs fold32/fold128,
#    with compile-side bytes (the padding-tax evidence).
# 4. End-to-end A/B: frames window/full (epilogue fused), fusion
#    --pgenc fold; then the s2d cutoff re-test at MIN_HW=64.
#
# ONE process on the chip; waits for an IDLE HOST before every timed run.
# Usage: nohup setsid bash tools/relay_queue_r4c.sh > runs/probe_r4c/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4c
mkdir -p "$OUT"

log() { echo "[relay_queue_r4c $(date +%H:%M:%S)] $*"; }

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

# 1. packed-kernel validation (gates the fused benches)
run validate_epilogue 5400 python tools/validate_pallas_epilogue.py
if ! tail -1 "$OUT/validate_epilogue.json" | grep -q '"ok": true'; then
  log "EPILOGUE VALIDATION FAILED — skipping fused benches"
  SKIP_FUSED=1
else
  SKIP_FUSED=0
fi

# 2. stage decomposition
run stage1 5400 python benchmarks/stage1_probe.py --stage 1 --batch 128
run stage2 5400 python benchmarks/stage1_probe.py --stage 2 --batch 128

# 3. enc_v decomposition + fold A/B (timed + compile-side bytes)
run pgenc 7200 python benchmarks/pgenc_probe.py --batch 256

# 4. end-to-end
BENCH="python bench.py"
export MAAVSS_BENCH_SKIP_BASELINE=1
run fusion_fold 3600 env MAAVSS_BENCH_PGENC=fold $BENCH
export MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 \
       MAAVSS_BENCH_MICROBATCH=2
if [ "$SKIP_FUSED" = 0 ]; then
  run frames_window_fused 3600 env MAAVSS_EPILOGUE=fused $BENCH
  export MAAVSS_BENCH_FRAMES_ENCODE=full
  run frames_full_fused 3600 env MAAVSS_EPILOGUE=fused $BENCH
  run frames_full_fused_minhw64 3600 \
    env MAAVSS_EPILOGUE=fused MAAVSS_S2D_MIN_HW=64 $BENCH
  unset MAAVSS_BENCH_FRAMES_ENCODE
fi
unset MAAVSS_BENCH_REGIME MAAVSS_BENCH_BATCH MAAVSS_BENCH_MICROBATCH \
      MAAVSS_BENCH_SKIP_BASELINE

log "queue complete"
