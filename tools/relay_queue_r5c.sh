#!/bin/bash
# Relay-window queue (round 5c): corrections + follow-ups from r5b.
#
#  - frames full-encode b256 benches RE-RUN with MAAVSS_BENCH_MICROBATCH=2
#    (the r3h 488.4 configuration; r5b ran monolithic b256 and OOM'd at
#    23.8G — the known frames b256 ceiling, BASELINE.md round-3 frames table)
#  - windowed-mode mask-impl A/B (decides whether the MASK_IMPL auto default
#    can flip to xla globally, or only under full-encode)
#  - headline re-run with the measured winners as defaults (after the
#    default-flip commit) + the pinned-baseline leg
#
# Usage: mkdir -p runs/probe_r5c && nohup setsid bash tools/relay_queue_r5c.sh \
#          > runs/probe_r5c/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r5c
mkdir -p "$OUT"

log() { echo "[relay_queue_r5c $(date +%H:%M:%S)] $*"; }

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
  wait_idle
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
  tail -1 "$OUT/$name.json" || true
}

BENCH="python bench.py"
export MAAVSS_BENCH_SKIP_BASELINE=1

# frames full-encode b256 mb2 — the r3h configuration, xla vs lean epilogue.
# MAAVSS_EPILOGUE=lean now defaults to the measured-winner stage gate
# (MAAVSS_LEAN_STAGES=1: lean where the r5b SOL table won, xla on stage 0);
# the 'all' row reproduces the ungated variant for the record.
FR="env MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_FRAMES_ENCODE=full \
    MAAVSS_BENCH_MICROBATCH=2"
run fr_control_mb2 5400 $FR $BENCH
run fr_lean_mb2 5400 $FR MAAVSS_EPILOGUE=lean $BENCH
run fr_leanall_mb2 5400 $FR MAAVSS_EPILOGUE=lean MAAVSS_LEAN_STAGES=all $BENCH
# b128 monolithic A/B too (no microbatch confound)
run fr_control_b128 5400 env MAAVSS_BENCH_REGIME=frames \
    MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_BATCH=128 $BENCH
run fr_lean_b128 5400 env MAAVSS_BENCH_REGIME=frames \
    MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_BATCH=128 \
    MAAVSS_EPILOGUE=lean $BENCH
run fr_leanall_b128 5400 env MAAVSS_BENCH_REGIME=frames \
    MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_BATCH=128 \
    MAAVSS_EPILOGUE=lean MAAVSS_LEAN_STAGES=all $BENCH
# --frames_halo throughput cost leg (quality A/B: r5b halo rows; VERDICT
# item 7 wants the dB gap closed at <10% throughput cost)
run fr_halo_mb2 5400 $FR MAAVSS_BENCH_FRAMES_HALO=1 $BENCH

# stages 3-4 SOL attribution: they sit 2.7x off BOTH rooflines (r5b:
# 43.9 ms vs max(sol) 16.3; 21.4 vs 7.8) and every conv reformulation is
# a measured negative (taps 2.5x slower layers.py:413, s2d +33% at 64^2
# r3g, tfold r3j) — bisect conv vs tail with the BN+pool+leaky tail
# stripped (--no_tail) to finish the attribution
run fr_sol_notail34 3600 python benchmarks/frames_sol.py --batch 128 \
    --stages 3,4 --no_tail

# windowed-mode mask-impl A/B (fusion, b256, vectorized windows)
run fus_win_mask_pallas 3600 env MAAVSS_BENCH_MASK_HEAD=1 \
    MAAVSS_BENCH_FUSION_ENCODE=window MAAVSS_MASK_IMPL=pallas $BENCH
run fus_win_mask_xla 3600 env MAAVSS_BENCH_MASK_HEAD=1 \
    MAAVSS_BENCH_FUSION_ENCODE=window MAAVSS_MASK_IMPL=xla $BENCH

# serving re-A/B after the TCP_NODELAY fix (r5b found keep-alive pays a
# ~40 ms Nagle/delayed-ACK stall per response: srv8_b1_new 108 ms vs legacy
# 67.5; and f16 lost to f32 under keep-alive at c32). Same rows as r5b.
serve_daemon() {
  local b=$1 port=$2
  wait_idle
  log "START daemon -b $b port $port"
  python tools/serve.py --port "$port" -b "$b" \
    --data_path synthetic:8 > "$OUT/daemon_b$b.log" 2>&1 &
  echo $! > /tmp/serve_r5c.pid
  local i=0
  until curl -s "http://127.0.0.1:$port/healthz" >/dev/null 2>&1; do
    i=$((i + 1))
    if [ $i -gt 120 ]; then log "daemon -b $b never came up"; return 1; fi
    sleep 5
  done
  log "daemon -b $b up"
}

stop_daemon() {
  if [ -f /tmp/serve_r5c.pid ]; then
    kill "$(cat /tmp/serve_r5c.pid)" 2>/dev/null
    rm -f /tmp/serve_r5c.pid
    sleep 3
  fi
}

CLIENT="python tools/serve_client.py --data_path synthetic:8"
if serve_daemon 32 8441; then
  run srv32_nodelay_f16 1800 $CLIENT --url http://127.0.0.1:8441 -b 32 \
      --rows 1 --calls 128 --concurrency 32
  run srv32_nodelay_f32 1800 $CLIENT --url http://127.0.0.1:8441 -b 32 \
      --rows 1 --calls 128 --concurrency 32 --wire f32
  # saturation row: full-batch requests back-to-back (the r4f fill-1.00
  # comparison point: direct-call path = 123.3 clips/s at b32)
  run srv32_fill1 1800 $CLIENT --url http://127.0.0.1:8441 -b 32 \
      --rows 32 --calls 64 --concurrency 4
fi
stop_daemon
if serve_daemon 8 8442; then
  run srv8_b1_nodelay 1800 $CLIENT --url http://127.0.0.1:8442 -b 8 \
      --rows 1 --calls 50 --concurrency 1
  run srv8_b1_nodelay_f32 1800 $CLIENT --url http://127.0.0.1:8442 -b 8 \
      --rows 1 --calls 50 --concurrency 1 --wire f32
fi
stop_daemon

unset MAAVSS_BENCH_SKIP_BASELINE

# headline of record with the round-5 defaults + both baseline legs
run headline 3600 $BENCH

log "queue complete"
