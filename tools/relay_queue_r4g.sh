#!/bin/bash
# Relay-window queue (round 4g):
#
# 1. Headline of record at the new conv-STFT default (full bench with the
#    torch-CPU baseline leg -> vs_baseline).
# 2. Fusion remat A/Bs: the step is AT the HBM roofline (BASELINE r4f:
#    fullgrad 98.3% of speed-of-light, 27% MXU) so recomputing activations
#    in the backward instead of storing them trades idle MXU for the
#    binding resource. full (save nothing) and dots (save MXU outputs,
#    recompute elementwise chains) policies.
# 3. Quality: same-window constant-1e-3 control for the r4d LR-schedule A/B
#    (the r3 +9.76 record's eval noisy-anchor differs: 4.22 vs 5.82 dB),
#    plus a 20k-step warmup_cosine record attempt.
#
# Usage: nohup setsid bash tools/relay_queue_r4g.sh \
#          > runs/probe_r4g/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4g
mkdir -p "$OUT"

log() { echo "[relay_queue_r4g $(date +%H:%M:%S)] $*"; }

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

BENCH="python bench.py"

# 1. headline with baseline leg (conv-STFT now the auto default)
run headline 5400 $BENCH

# 2. fusion remat A/Bs
export MAAVSS_BENCH_SKIP_BASELINE=1
run fusion_remat_full 3600 env MAAVSS_BENCH_REMAT=1 $BENCH
run fusion_remat_dots 3600 \
  env MAAVSS_BENCH_REMAT=1 MAAVSS_REMAT_POLICY=dots $BENCH
# remat at b256 (larger live set -> more bytes for remat to save)
run fusion_remat_dots_b256 3600 \
  env MAAVSS_BENCH_REMAT=1 MAAVSS_REMAT_POLICY=dots MAAVSS_BENCH_BATCH=256 $BENCH
run fusion_b256 3600 env MAAVSS_BENCH_BATCH=256 $BENCH
unset MAAVSS_BENCH_SKIP_BASELINE

# 3. quality: same-window const control + 20k record attempt
QC="python tools/quality_curve.py --regime fusion --eval_every 1000
    -b 32 --data_path synthetic:8 --mask_head"
run quality_const1e3 5400 $QC --steps 10000 -lr 1e-3 \
    --out $OUT/quality_const1e3.jsonl
run quality_wc1e3_20k 10800 $QC --steps 20000 -lr 1e-3 \
    --lr_schedule warmup_cosine --warmup_steps 500 \
    --out $OUT/quality_wc1e3_20k.jsonl

log "queue complete"
