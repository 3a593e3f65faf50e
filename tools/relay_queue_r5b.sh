#!/bin/bash
# Relay-window queue (round 5b): the round's on-chip A/Bs.
#
# Sections (each self-contained; a partial window still yields artifacts):
#   A. fusion full-encode byte cuts (VERDICT r4 item 2): sliced-target loss
#      (MAAVSS_FULLENC_LOSS=slice) and fusable XLA mask (MAAVSS_MASK_IMPL=xla)
#      vs the r4h headline config, b256.
#   B. frames trunk (VERDICT r4 item 1): end-to-end full-encode b256 with the
#      lean epilogue (ops/lean_epilogue.py) vs xla, plus the per-stage
#      speed-of-light certification tables (benchmarks/frames_sol.py).
#   C. serving wire gap (VERDICT r4 item 6): persistent keep-alive + f16
#      audio wire + pipelined executor vs the legacy per-request client.
#   D. frames full-encode halo quality A/B (VERDICT r4 item 7): 3 seeds x 2k
#      steps, --frames_halo 1 vs 0 (identical eval sets).
#
# Usage: mkdir -p runs/probe_r5b && nohup setsid bash tools/relay_queue_r5b.sh \
#          > runs/probe_r5b/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r5b
mkdir -p "$OUT"

log() { echo "[relay_queue_r5b $(date +%H:%M:%S)] $*"; }

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
export MAAVSS_BENCH_SKIP_BASELINE=1

# ---- A. fusion byte cuts (b256 full-encode, the r4h headline config) ------
run fus_control 3600 $BENCH
run fus_slice 3600 env MAAVSS_FULLENC_LOSS=slice $BENCH
run fus_mask_control 3600 env MAAVSS_BENCH_MASK_HEAD=1 $BENCH
run fus_mask_xla 3600 env MAAVSS_BENCH_MASK_HEAD=1 MAAVSS_MASK_IMPL=xla $BENCH
run fus_mask_xla_slice 3600 env MAAVSS_BENCH_MASK_HEAD=1 \
    MAAVSS_MASK_IMPL=xla MAAVSS_FULLENC_LOSS=slice $BENCH

# ---- B. frames trunk: lean epilogue A/B + per-stage SOL tables ------------
FR="env MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_FRAMES_ENCODE=full"
run fr_control 5400 $FR $BENCH
run fr_lean 5400 $FR MAAVSS_EPILOGUE=lean $BENCH
run fr_sol_xla 7200 python benchmarks/frames_sol.py --batch 128
run fr_sol_lean 5400 env MAAVSS_EPILOGUE=lean \
    python benchmarks/frames_sol.py --batch 128 --stages 1,2

# ---- C. serving wire gap ---------------------------------------------------
serve_daemon() {
  local b=$1 port=$2
  wait_idle
  log "START daemon -b $b port $port"
  python tools/serve.py --port "$port" -b "$b" \
    --data_path synthetic:8 > "$OUT/daemon_b$b.log" 2>&1 &
  echo $! > /tmp/serve_r5b.pid
  local i=0
  until curl -s "http://127.0.0.1:$port/healthz" >/dev/null 2>&1; do
    i=$((i + 1))
    if [ $i -gt 120 ]; then log "daemon -b $b never came up"; return 1; fi
    sleep 5
  done
  log "daemon -b $b up"
}

stop_daemon() {
  if [ -f /tmp/serve_r5b.pid ]; then
    kill "$(cat /tmp/serve_r5b.pid)" 2>/dev/null
    rm -f /tmp/serve_r5b.pid
    sleep 3
  fi
}

CLIENT="python tools/serve_client.py --data_path synthetic:8"
if serve_daemon 32 8431; then
  # the r4f fill-1.00 row, legacy wire vs the round-5 wire
  run srv32_legacy 1800 $CLIENT --url http://127.0.0.1:8431 -b 32 \
      --rows 1 --calls 128 --concurrency 32 --wire f32 --no_keepalive
  run srv32_new 1800 $CLIENT --url http://127.0.0.1:8431 -b 32 \
      --rows 1 --calls 128 --concurrency 32
  run srv32_keepalive_f32 1800 $CLIENT --url http://127.0.0.1:8431 -b 32 \
      --rows 1 --calls 128 --concurrency 32 --wire f32
fi
stop_daemon
if serve_daemon 8 8432; then
  # single-request latency (the b1 p50 target) + the b8 throughput row
  run srv8_b1_legacy 1800 $CLIENT --url http://127.0.0.1:8432 -b 8 \
      --rows 1 --calls 50 --concurrency 1 --wire f32 --no_keepalive
  run srv8_b1_new 1800 $CLIENT --url http://127.0.0.1:8432 -b 8 \
      --rows 1 --calls 50 --concurrency 1
  run srv8_r8c4_new 1800 $CLIENT --url http://127.0.0.1:8432 -b 8 \
      --rows 8 --calls 48 --concurrency 4
fi
stop_daemon

# ---- D. frames halo quality A/B (3 seeds x 2k, identical eval sets) -------
QF="python tools/quality_curve.py --regime frames --steps 2000 \
    --eval_every 1000 -b 32 --data_path synthetic:8 --mask_head -lr 1e-3 \
    --frames_encode full"
for seed in 0 1 2; do
  run halo0_s$seed 5400 $QF --seed $seed --out $OUT/halo0_s$seed.jsonl
  run halo1_s$seed 5400 $QF --seed $seed --frames_halo 1 \
      --out $OUT/halo1_s$seed.jsonl
done

log "queue complete"
