#!/bin/bash
# Relay-window measurement queue (round 3c).
#
# The axon TPU relay has been UNAVAILABLE since ~2026-08-17 22:30; this script
# waits for it to answer, then captures every queued on-chip measurement in
# one window, strictly sequentially (ONE process may touch the chip at a
# time — CLAUDE.md) and with the host otherwise idle (concurrent CPU work
# inflates dispatch ~3x).
#
# Queue (see docs/STATUS.md "Perf-attribution probes"):
#   1. frames encoder stage bisection, pool=window  (baseline attribution)
#   2. same, pool=reshape                           (SelectAndScatter suspect)
#   3. same, pool=window, BN off                    (BN attribution)
#   4. frames end-to-end bench with pool=reshape    (A/B vs 156.5 clips/s)
#   5. fusion per-stage probe + rooflines at b256
#   6. headline bench re-run (tuned default config)
#
# Usage: nohup setsid bash tools/relay_queue.sh > runs/probe_r3c/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r3c
mkdir -p "$OUT"

log() { echo "[relay_queue $(date +%H:%M:%S)] $*"; }

# -- wait for an idle host (default+slow pytest tiers, builds) ---------------
while pgrep -x pytest >/dev/null 2>&1 || pgrep -f "pytest" >/dev/null 2>&1; do
  log "waiting for pytest to finish (host must be idle for honest timing)"
  sleep 60
done

# -- wait for the relay -------------------------------------------------------
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
  log "relay still down (attempt $attempt); sleeping 300s"
  sleep 300
done
log "relay is UP after $attempt retries"

# host may have picked up new work while we waited for the relay
while pgrep -x pytest >/dev/null 2>&1 || pgrep -f "pytest" >/dev/null 2>&1; do
  log "relay up but host busy (pytest); sleeping 60s"
  sleep 60
done
log "host idle; starting queue"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  local rc=$?
  log "END $name rc=$rc"
  tail -2 "$OUT/$name.json" || true
}

run frames_probe_window 3600 env MAAVSS_POOL=window \
  python benchmarks/frames_probe.py --batch 128
run frames_probe_reshape 3600 env MAAVSS_POOL=reshape \
  python benchmarks/frames_probe.py --batch 128
run frames_probe_nobn 3600 env MAAVSS_POOL=window MAAVSS_PROBE_BN=0 \
  python benchmarks/frames_probe.py --batch 128
run frames_bench_reshape 3600 env MAAVSS_POOL=reshape \
  MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 \
  MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
run fusion_probe_b256 5400 python benchmarks/fusion_probe.py --batch 256
run opt_floor 5400 python benchmarks/opt_floor.py
run bench_pallas_adam 3600 env MAAVSS_BENCH_OPT_KERNEL=pallas \
  MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
run headline_bench 3600 python bench.py

log "queue complete"

# appended while the queue waits (safe: append-only, offsets unchanged;
# if the running bash already buffered EOF these just don't auto-run —
# run them manually after "queue complete")
run mosaic_probe 3600 python benchmarks/mosaic_probe.py
log "queue complete (incl. appended items)"
run serve_bench_fusion 3600 python tools/serve_bench.py --calls 50 -b 8
run serve_bench_frames 3600 python tools/serve_bench.py --model frames --calls 20 -b 8
log "queue complete (incl. serve bench)"
# appended round-3c continuation: fused phasegram-encoder on-chip gate
run validate_pgenc 5400 python tools/validate_pallas_pgenc.py
run bench_pgenc_pallas 3600 env MAAVSS_BENCH_PGENC=pallas \
  MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
run bench_pgenc_strided 3600 env MAAVSS_BENCH_PGENC=pallas \
  MAAVSS_PGENC_TAPS=strided MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
log "queue complete (incl. pgenc gate)"
# appended: frames_probe HTTP-413 fix (x was a jit closure capture -> 268MB
# HLO constant blew the relay compile body limit); rerun the two failed items
run frames_probe_window2 3600 env MAAVSS_POOL=window \
  python benchmarks/frames_probe.py --batch 128
run frames_probe_reshape2 3600 env MAAVSS_POOL=reshape \
  python benchmarks/frames_probe.py --batch 128
log "queue complete (incl. frames probe reruns)"
