#!/bin/bash
# Relay-window queue (round 4d):
#
# 1. On-chip validation of the v3 epilogue kernels (native-layout lane
#    shifts — no packing relayout, no sub-lane slice loops). Gates 2-3.
# 2. Stage decomposition A/B (stage 1 + 2, b128): v3 fused vs the
#    63.6/52.6 ms XLA stage fwd+bwd (runs/probe_r4c).
# 3. End-to-end frames A/B at the production geometry (b256 mb2, window +
#    full encode) with the v3 epilogue; s2d cutoff re-test at MIN_HW=64.
# 4. Headline re-pin: bench.py default config now resolves pgenc auto->fold
#    (+10.7% in r4c) — run WITH the in-process torch baseline for the
#    vs_baseline figure of record.
# 5. Serving daemon on-chip (VERDICT r3 #5): tools/serve.py at artifact
#    batch 8 and 32, driven by tools/serve_client.py with concurrent
#    clients — p50/p90/p99 + daemon fill factor, next to the r3i
#    direct-call rows.
# 6. Quality (VERDICT r3 #8): 10k-step fusion mask-head curves — constant
#    3e-3 and warmup_cosine peak 3e-3 vs the +9.76 dB constant-1e-3 record.
#
# ONE process on the chip; waits for an IDLE HOST before every timed run.
# Usage: nohup setsid bash tools/relay_queue_r4d.sh > runs/probe_r4d/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4d
mkdir -p "$OUT"

log() { echo "[relay_queue_r4d $(date +%H:%M:%S)] $*"; }

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

# 1. v3 kernel validation (gates the fused benches)
run validate_epilogue 5400 python tools/validate_pallas_epilogue.py
if ! tail -1 "$OUT/validate_epilogue.json" | grep -q '"ok": true'; then
  log "EPILOGUE VALIDATION FAILED — skipping fused benches"
  SKIP_FUSED=1
else
  SKIP_FUSED=0
fi

# 2. stage decomposition
if [ "$SKIP_FUSED" = 0 ]; then
  run stage1 5400 python benchmarks/stage1_probe.py --stage 1 --batch 128
  run stage2 5400 python benchmarks/stage1_probe.py --stage 2 --batch 128
fi

# 4 (early: artifact of record). headline with the in-process torch baseline
run headline 5400 python bench.py

# 3. end-to-end frames A/B with the v3 epilogue
BENCH="python bench.py"
export MAAVSS_BENCH_SKIP_BASELINE=1
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

# 5. serving daemon on-chip (artifact batch 8, then 32)
serve_daemon() {
  local b=$1 port=$2
  wait_idle
  log "START daemon -b $b port $port"
  # plain background child (this script already runs under nohup setsid;
  # `setsid` here would fork and orphan the real pid, leaving the daemon
  # holding the chip after a failed kill)
  python tools/serve.py --port "$port" -b "$b" \
    --data_path synthetic:8 > "$OUT/daemon_b$b.log" 2>&1 &
  echo $! > /tmp/serve_r4d.pid
  local i=0
  until curl -s "http://127.0.0.1:$port/healthz" >/dev/null 2>&1; do
    i=$((i + 1))
    if [ $i -gt 120 ]; then log "daemon -b $b never came up"; return 1; fi
    sleep 5
  done
  log "daemon -b $b up"
}

stop_daemon() {
  if [ -f /tmp/serve_r4d.pid ]; then
    kill "$(cat /tmp/serve_r4d.pid)" 2>/dev/null
    rm -f /tmp/serve_r4d.pid
    sleep 3
  fi
}

CLIENT="python tools/serve_client.py --data_path synthetic:8"
if serve_daemon 8 8427; then
  run daemon8_r1c1 1800 $CLIENT --url http://127.0.0.1:8427 -b 8 \
      --rows 1 --calls 50 --concurrency 1
  run daemon8_r1c8 1800 $CLIENT --url http://127.0.0.1:8427 -b 8 \
      --rows 1 --calls 96 --concurrency 8
  run daemon8_r8c4 1800 $CLIENT --url http://127.0.0.1:8427 -b 8 \
      --rows 8 --calls 48 --concurrency 4
fi
stop_daemon
if serve_daemon 32 8428; then
  run daemon32_r1c32 1800 $CLIENT --url http://127.0.0.1:8428 -b 32 \
      --rows 1 --calls 128 --concurrency 32
  run daemon32_r32c2 1800 $CLIENT --url http://127.0.0.1:8428 -b 32 \
      --rows 32 --calls 24 --concurrency 2
fi
stop_daemon

# 6. quality: LR-schedule A/B at 10k steps (control = r3's +9.76 dB at
# constant 1e-3, runs/quality_r3/fusion_mask_10k.jsonl)
QC="python tools/quality_curve.py --regime fusion --steps 10000
    --eval_every 1000 -b 32 --data_path synthetic:8 --mask_head"
run quality_const3e3 5400 $QC -lr 3e-3 \
    --out $OUT/quality_const3e3.jsonl
run quality_wc3e3 5400 $QC -lr 3e-3 --lr_schedule warmup_cosine \
    --warmup_steps 500 --out $OUT/quality_wc3e3.jsonl
run quality_wc1e3 5400 $QC -lr 1e-3 --lr_schedule warmup_cosine \
    --warmup_steps 500 --out $OUT/quality_wc1e3.jsonl

log "queue complete"
