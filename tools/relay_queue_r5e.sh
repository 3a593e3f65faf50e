#!/bin/bash
# Relay-window queue (round 5e): round-5 close-out, consolidated.
#
# The r5c window's results beyond the two OOM notes (lean/halo rows) were
# lost with the container (runs/ is gitignored); this queue re-runs the
# lost r5c rows AND the r5d retries in one window, front-loading the
# highest-value artifacts in case the window dies:
#
#  1. headline of record (current round-5 defaults, pinned + fresh baseline)
#  2. windowed-mode mask-impl A/B (decides the global MAAVSS_MASK_IMPL auto)
#  3. lean-epilogue end-to-end A/B, post m_signed-residual fix (r5c OOM'd
#     315 MB past HBM; the custom VJP now recomputes m_signed in-backward)
#  4. frames halo cost legs at b128 monolithic + mb4 (r5c b256/mb2 OOM'd
#     by 212 MB: +2 span frames per chunk), with same-window controls
#  5. frames_sol --no_tail conv-vs-tail bisection for stages 3-4; lean
#     stages 1,2 SOL re-check post-fix
#  6. frames halo 10k quality points (halo 0 vs 1, seed 0, one window)
#  7. serving re-A/B after the TCP_NODELAY fix
#  8. headline_mask with the (r5b-measured) xla+slice winners
#
# Usage: mkdir -p runs/probe_r5e && nohup setsid bash tools/relay_queue_r5e.sh \
#          > runs/probe_r5e/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r5e
mkdir -p "$OUT"

log() { echo "[relay_queue_r5e $(date +%H:%M:%S)] $*"; }

wait_idle() {
  local l
  while :; do
    l=$(awk '{print ($1 < 0.35) ? "ok" : $1}' /proc/loadavg)
    [ "$l" = ok ] && return
    log "host busy (loadavg $l); sleeping 120s"
    sleep 120
  done
}

run() {
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.json" ]; then log "SKIP $name (exists)"; return; fi
  wait_idle
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
  tail -1 "$OUT/$name.json" || true
}

BENCH="python bench.py"

# ---- 1. headline of record: round-5 defaults + both baseline legs ---------
run headline 5400 $BENCH

export MAAVSS_BENCH_SKIP_BASELINE=1

# ---- 2. windowed-mode mask-impl A/B (fusion, b256, vectorized windows) ----
run fus_win_mask_pallas 3600 env MAAVSS_BENCH_MASK_HEAD=1 \
    MAAVSS_BENCH_FUSION_ENCODE=window MAAVSS_MASK_IMPL=pallas $BENCH
run fus_win_mask_xla 3600 env MAAVSS_BENCH_MASK_HEAD=1 \
    MAAVSS_BENCH_FUSION_ENCODE=window MAAVSS_MASK_IMPL=xla $BENCH

# ---- 3. lean epilogue end-to-end A/B (post residual fix) ------------------
FR="env MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_FRAMES_ENCODE=full"
run fr_control_b128 5400 $FR MAAVSS_BENCH_BATCH=128 $BENCH
run fr_lean_b128 5400 $FR MAAVSS_BENCH_BATCH=128 MAAVSS_EPILOGUE=lean $BENCH
run fr_control_mb2 5400 $FR MAAVSS_BENCH_MICROBATCH=2 $BENCH
run fr_lean_mb2 5400 $FR MAAVSS_BENCH_MICROBATCH=2 MAAVSS_EPILOGUE=lean $BENCH
run fr_leanall_mb2 5400 $FR MAAVSS_BENCH_MICROBATCH=2 MAAVSS_EPILOGUE=lean \
    MAAVSS_LEAN_STAGES=all $BENCH

# ---- 4. frames halo cost legs + same-window controls ----------------------
run fr_halo_b128 5400 $FR MAAVSS_BENCH_BATCH=128 MAAVSS_BENCH_FRAMES_HALO=1 \
    $BENCH
run fr_control_mb4 5400 $FR MAAVSS_BENCH_MICROBATCH=4 $BENCH
run fr_halo_mb4 5400 $FR MAAVSS_BENCH_MICROBATCH=4 MAAVSS_BENCH_FRAMES_HALO=1 \
    $BENCH

# ---- 5. SOL bisections ----------------------------------------------------
run fr_sol_notail34 3600 python benchmarks/frames_sol.py --batch 128 \
    --stages 3,4 --no_tail
run fr_sol_lean12 5400 env MAAVSS_EPILOGUE=lean MAAVSS_LEAN_STAGES=all \
    python benchmarks/frames_sol.py --batch 128 --stages 1,2

# ---- 6. frames halo at the 10k horizon (seed 0, one window) ---------------
QF="python tools/quality_curve.py --regime frames --steps 10000 \
    --eval_every 2000 -b 32 --data_path synthetic:8 --mask_head -lr 1e-3 \
    --frames_encode full --seed 0"
run halo0_10k 9000 $QF --out $OUT/halo0_10k.jsonl
run halo1_10k 9000 $QF --frames_halo 1 --out $OUT/halo1_10k.jsonl

# ---- 7. serving re-A/B after TCP_NODELAY ----------------------------------
serve_daemon() {
  local b=$1 port=$2
  wait_idle
  log "START daemon -b $b port $port"
  python tools/serve.py --port "$port" -b "$b" \
    --data_path synthetic:8 > "$OUT/daemon_b$b.log" 2>&1 &
  echo $! > /tmp/serve_r5e.pid
  local i=0
  until curl -s "http://127.0.0.1:$port/healthz" >/dev/null 2>&1; do
    i=$((i + 1))
    if [ $i -gt 240 ]; then log "daemon -b $b never came up"; return 1; fi
    sleep 5
  done
  log "daemon -b $b up"
}

stop_daemon() {
  if [ -f /tmp/serve_r5e.pid ]; then
    kill "$(cat /tmp/serve_r5e.pid)" 2>/dev/null
    rm -f /tmp/serve_r5e.pid
    sleep 3
  fi
}

CLIENT="python tools/serve_client.py --data_path synthetic:8"
if serve_daemon 32 8441; then
  run srv32_nodelay_f16 1800 $CLIENT --url http://127.0.0.1:8441 -b 32 \
      --rows 1 --calls 128 --concurrency 32
  run srv32_nodelay_f32 1800 $CLIENT --url http://127.0.0.1:8441 -b 32 \
      --rows 1 --calls 128 --concurrency 32 --wire f32
  run srv32_legacy 1800 $CLIENT --url http://127.0.0.1:8441 -b 32 \
      --rows 1 --calls 128 --concurrency 32 --no_keepalive
  run srv32_fill1 1800 $CLIENT --url http://127.0.0.1:8441 -b 32 \
      --rows 32 --calls 64 --concurrency 4
fi
stop_daemon
if serve_daemon 8 8442; then
  run srv8_b1_nodelay 1800 $CLIENT --url http://127.0.0.1:8442 -b 8 \
      --rows 1 --calls 50 --concurrency 1
  run srv8_b1_nodelay_f32 1800 $CLIENT --url http://127.0.0.1:8442 -b 8 \
      --rows 1 --calls 50 --concurrency 1 --wire f32
  run srv8_b1_legacy 1800 $CLIENT --url http://127.0.0.1:8442 -b 8 \
      --rows 1 --calls 50 --concurrency 1 --no_keepalive
fi
stop_daemon

# ---- 8. headline with mask head (xla+slice winners) -----------------------
run headline_mask 3600 env MAAVSS_BENCH_MASK_HEAD=1 $BENCH

unset MAAVSS_BENCH_SKIP_BASELINE
log "queue complete"
