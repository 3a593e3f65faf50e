#!/bin/bash
# Relay-window queue (round 5d): round-5 close-out.
#
#  - frames halo 10k points (VERDICT r4 item 7 "done" bar: 3-seed 2k A/B
#    [done, r5b: +0.55 dB mean] + a 10k point): halo-1 vs halo-0 at seed 0,
#    same window, same eval set.
#  - headline of record AFTER the r5c-informed default flips (mask auto,
#    lean auto), with the pinned + fresh baseline legs.
#  - full-encode fusion quality re-gate if any default flip touches the
#    fusion math path (slice loss is exact math; mask xla is exact math —
#    a 2k spot check, not a full re-gate).
#
# Usage: mkdir -p runs/probe_r5d && nohup setsid bash tools/relay_queue_r5d.sh \
#          > runs/probe_r5d/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r5d
mkdir -p "$OUT"

log() { echo "[relay_queue_r5d $(date +%H:%M:%S)] $*"; }

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

# ---- lean epilogue end-to-end A/B, re-run after the residual fix ----------
# (r5c rows OOM'd 315 MB past HBM: the custom VJP saved m_signed, 0.7-1.5 GB
# of rematerializer-opaque residual per stage; now recomputed in-backward)
FR="env MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_FRAMES_ENCODE=full"
run fr_lean_b128 5400 $FR MAAVSS_BENCH_BATCH=128 MAAVSS_EPILOGUE=lean $BENCH
run fr_lean_mb2 5400 $FR MAAVSS_BENCH_MICROBATCH=2 MAAVSS_EPILOGUE=lean $BENCH
run fr_leanall_mb2 5400 $FR MAAVSS_BENCH_MICROBATCH=2 MAAVSS_EPILOGUE=lean \
    MAAVSS_LEAN_STAGES=all $BENCH
run fr_sol_lean2 5400 env MAAVSS_EPILOGUE=lean MAAVSS_LEAN_STAGES=all \
    python benchmarks/frames_sol.py --batch 128 --stages 1,2

# halo cost leg re-tries (b256 mb2 + halo OOM'd by 212 MB in r5c: +2 span
# frames per chunk): b128 monolithic, then mb4 fallback
run fr_halo_b128 5400 $FR MAAVSS_BENCH_BATCH=128 MAAVSS_BENCH_FRAMES_HALO=1 \
    $BENCH
run fr_halo_mb4 5400 $FR MAAVSS_BENCH_MICROBATCH=4 MAAVSS_BENCH_FRAMES_HALO=1 \
    $BENCH
unset MAAVSS_BENCH_SKIP_BASELINE

# ---- frames halo at the 10k horizon (seed 0, one window) ------------------
QF="python tools/quality_curve.py --regime frames --steps 10000 \
    --eval_every 2000 -b 32 --data_path synthetic:8 --mask_head -lr 1e-3 \
    --frames_encode full --seed 0"
run halo0_10k 7200 $QF --out $OUT/halo0_10k.jsonl
run halo1_10k 7200 $QF --frames_halo 1 --out $OUT/halo1_10k.jsonl

# ---- headline of record with round-5 defaults + both baseline legs --------
run headline 3600 python bench.py
run headline_mask 3600 env MAAVSS_BENCH_SKIP_BASELINE=1 \
    MAAVSS_BENCH_MASK_HEAD=1 python bench.py

log "queue complete"
