#!/bin/bash
# Relay-window queue (round 4a): the fused Pallas BN+phase-max epilogue.
#
# 1. On-chip validation of the new kernels (Mosaic BACKEND compile +
#    value/grad parity at the product stage geometries) — the cross-lowering
#    CI cannot see layout-inference failures (CLAUDE.md).
# 2. Stage decomposition A/B (stage1_probe now carries stage_fused_* cases):
#    does fused beat the 63.3/52.5 ms stage fwd+bwd (BASELINE round 3j)?
# 3. End-to-end frames A/B at the production configs: window + full encode,
#    epilogue xla vs fused; then the s2d cutoff re-test at MIN_HW=64 (the
#    fused epilogue changes stage-3 economics).
# 4. Headline fusion re-run with the new host_load field (VERDICT #3).
#
# ONE process on the chip; idle host (no pytest/builds alongside).
# Usage: nohup setsid bash tools/relay_queue_r4a.sh > runs/probe_r4a/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4a
mkdir -p "$OUT"

log() { echo "[relay_queue_r4a $(date +%H:%M:%S)] $*"; }

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
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
  tail -1 "$OUT/$name.json" || true
}

# 1. kernel validation (gates everything fused below)
run validate_epilogue 5400 python tools/validate_pallas_epilogue.py
if ! tail -1 "$OUT/validate_epilogue.json" | grep -q '"ok": true'; then
  log "EPILOGUE VALIDATION FAILED — skipping fused benches, keeping xla rows"
  SKIP_FUSED=1
else
  SKIP_FUSED=0
fi

# 2. stage decomposition (both stages, fused vs xla vs conv-only cases)
run stage1 5400 python benchmarks/stage1_probe.py --stage 1 --batch 128
run stage2 5400 python benchmarks/stage1_probe.py --stage 2 --batch 128

# 3. end-to-end frames A/B (b256 microbatch-2: the production geometry)
BENCH="python bench.py"
export MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 \
       MAAVSS_BENCH_MICROBATCH=2 MAAVSS_BENCH_SKIP_BASELINE=1
run frames_window_xla 3600 env MAAVSS_EPILOGUE=xla $BENCH
if [ "$SKIP_FUSED" = 0 ]; then
  run frames_window_fused 3600 env MAAVSS_EPILOGUE=fused $BENCH
fi
export MAAVSS_BENCH_FRAMES_ENCODE=full
run frames_full_xla 3600 env MAAVSS_EPILOGUE=xla $BENCH
if [ "$SKIP_FUSED" = 0 ]; then
  run frames_full_fused 3600 env MAAVSS_EPILOGUE=fused $BENCH
  # s2d cutoff re-test: with the fused epilogue, does folding stage 3 pay?
  run frames_full_fused_minhw64 3600 \
    env MAAVSS_EPILOGUE=fused MAAVSS_S2D_MIN_HW=64 $BENCH
  unset MAAVSS_BENCH_FRAMES_ENCODE
  run frames_window_fused_minhw64 3600 \
    env MAAVSS_EPILOGUE=fused MAAVSS_S2D_MIN_HW=64 $BENCH
fi
unset MAAVSS_BENCH_REGIME MAAVSS_BENCH_BATCH MAAVSS_BENCH_MICROBATCH \
      MAAVSS_BENCH_FRAMES_ENCODE

# 4. headline fusion re-run (tuned default config, WITH torch baseline,
#    host_load now in the JSON — the VERDICT #3 reconcile artifact)
unset MAAVSS_BENCH_SKIP_BASELINE
run headline 3600 python bench.py

log "queue complete"
