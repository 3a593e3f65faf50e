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

# frames full-encode b256 mb2 — the r3h configuration, xla vs lean epilogue
FR="env MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_FRAMES_ENCODE=full \
    MAAVSS_BENCH_MICROBATCH=2"
run fr_control_mb2 5400 $FR $BENCH
run fr_lean_mb2 5400 $FR MAAVSS_EPILOGUE=lean $BENCH
# b128 monolithic A/B too (no microbatch confound)
run fr_control_b128 5400 env MAAVSS_BENCH_REGIME=frames \
    MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_BATCH=128 $BENCH
run fr_lean_b128 5400 env MAAVSS_BENCH_REGIME=frames \
    MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_BATCH=128 \
    MAAVSS_EPILOGUE=lean $BENCH

# windowed-mode mask-impl A/B (fusion, b256, vectorized windows)
run fus_win_mask_pallas 3600 env MAAVSS_BENCH_MASK_HEAD=1 \
    MAAVSS_BENCH_FUSION_ENCODE=window MAAVSS_MASK_IMPL=pallas $BENCH
run fus_win_mask_xla 3600 env MAAVSS_BENCH_MASK_HEAD=1 \
    MAAVSS_BENCH_FUSION_ENCODE=window MAAVSS_MASK_IMPL=xla $BENCH

unset MAAVSS_BENCH_SKIP_BASELINE

# headline of record with the round-5 defaults + both baseline legs
run headline 3600 $BENCH

log "queue complete"
