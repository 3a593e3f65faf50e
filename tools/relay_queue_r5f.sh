#!/bin/bash
# Relay-window queue (round 5f): lean-epilogue retries after the CSE fix.
#
# r5e found the m_signed-recompute fix was DEFEATED BY XLA CSE (the backward
# recompute was syntactically identical to the forward's, so HloCSE merged
# them and kept the value live fwd->bwd: the b128 OOM excess stayed
# byte-identical at 315.50M). lean_epilogue.py now routes the backward's
# reads of y through lax.optimization_barrier. Retries:
#
#  - fr_lean_b128 / fr_lean_mb2 / fr_leanall_mb2 (the r5e OOM rows)
#  - fr_leanall_b128 (leanall measured 1.64G LEANER than stages-'1' at mb2:
#    the lean backward avoids XLA BN-backward's conv-output temps)
#  - fr_halo_leanall_mb2: halo@mb2 OOM'd by only 212M with the xla epilogue
#    (r5c) — leanall's memory savings may unlock the halo cost leg at the
#    throughput-optimal chunk-128 config (r5e's mb4 pair sits on the
#    chunk-64 cliff: 229.2 vs 271.0, -15.4%)
#
# Usage: mkdir -p runs/probe_r5f && nohup setsid bash tools/relay_queue_r5f.sh \
#          > runs/probe_r5f/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r5f
mkdir -p "$OUT"

log() { echo "[relay_queue_r5f $(date +%H:%M:%S)] $*"; }

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
export MAAVSS_BENCH_SKIP_BASELINE=1
FR="env MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_FRAMES_ENCODE=full"

run fr_lean_b128 5400 $FR MAAVSS_BENCH_BATCH=128 MAAVSS_EPILOGUE=lean $BENCH
run fr_leanall_b128 5400 $FR MAAVSS_BENCH_BATCH=128 MAAVSS_EPILOGUE=lean \
    MAAVSS_LEAN_STAGES=all $BENCH
run fr_lean_mb2 5400 $FR MAAVSS_BENCH_MICROBATCH=2 MAAVSS_EPILOGUE=lean $BENCH
run fr_leanall_mb2 5400 $FR MAAVSS_BENCH_MICROBATCH=2 MAAVSS_EPILOGUE=lean \
    MAAVSS_LEAN_STAGES=all $BENCH
run fr_halo_leanall_mb2 5400 $FR MAAVSS_BENCH_MICROBATCH=2 \
    MAAVSS_BENCH_FRAMES_HALO=1 MAAVSS_EPILOGUE=lean MAAVSS_LEAN_STAGES=all \
    $BENCH

log "queue complete"
