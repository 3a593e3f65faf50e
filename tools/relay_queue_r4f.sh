#!/bin/bash
# Relay-window queue (round 4f) — runs AFTER relay_queue_r4e exits:
#
# 1. Conv-STFT A/B (MAAVSS_STFT_IMPL=conv): the forward STFT as one strided
#    MXU conv vs the gather+rfft form, fusion b256.
# 2. Combined-levers bench: conv STFT + stft_fold on top of the fold
#    default — the candidate next headline config.
# 3. fusion_probe re-attribution at the new default (where does the step's
#    time go AFTER pgenc fold).
# 4. Serving daemon reruns: r8c4 (relay stall last window) and r1c32 (fixed
#    listen backlog).
#
# Usage: nohup setsid bash tools/relay_queue_r4f.sh <r4e_pid> \
#          > runs/probe_r4f/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4f
mkdir -p "$OUT"
PREV_PID=${1:-0}

log() { echo "[relay_queue_r4f $(date +%H:%M:%S)] $*"; }

if [ "$PREV_PID" != 0 ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do
    log "waiting for r4e queue (pid $PREV_PID)"
    sleep 120
  done
fi
log "r4e done"

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

# 1-2. fusion lever A/Bs on top of the fold default
run fusion_stft_conv 3600 env MAAVSS_STFT_IMPL=conv $BENCH
run fusion_all_levers 3600 \
  env MAAVSS_STFT_IMPL=conv MAAVSS_BENCH_STFT_FOLD=fold $BENCH

# 3. re-attribution at the new default
run fusion_probe 7200 python benchmarks/fusion_probe.py --batch 256

unset MAAVSS_BENCH_SKIP_BASELINE

# 4. serving daemon reruns
serve_daemon() {
  local b=$1 port=$2
  wait_idle
  log "START daemon -b $b port $port"
  python tools/serve.py --port "$port" -b "$b" \
    --data_path synthetic:8 > "$OUT/daemon_b$b.log" 2>&1 &
  echo $! > /tmp/serve_r4f.pid
  local i=0
  until curl -s "http://127.0.0.1:$port/healthz" >/dev/null 2>&1; do
    i=$((i + 1))
    if [ $i -gt 120 ]; then log "daemon -b $b never came up"; return 1; fi
    sleep 5
  done
  log "daemon -b $b up"
}

stop_daemon() {
  if [ -f /tmp/serve_r4f.pid ]; then
    kill "$(cat /tmp/serve_r4f.pid)" 2>/dev/null
    rm -f /tmp/serve_r4f.pid
    sleep 3
  fi
}

CLIENT="python tools/serve_client.py --data_path synthetic:8"
if serve_daemon 8 8427; then
  run daemon8_r8c4 1800 $CLIENT --url http://127.0.0.1:8427 -b 8 \
      --rows 8 --calls 48 --concurrency 4
fi
stop_daemon
if serve_daemon 32 8428; then
  run daemon32_r1c32 1800 $CLIENT --url http://127.0.0.1:8428 -b 32 \
      --rows 1 --calls 128 --concurrency 32
fi
stop_daemon

log "queue complete"
