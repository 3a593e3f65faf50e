#!/bin/bash
# Relay-window queue (round 4i): consolidate the --fusion_encode full win.
#
# r4h measured full-encode at 24,713 clips/s/chip vs the 14,681 windowed
# default (+68%), quality gate passed (10k: 11.12 dB vs the 11.11 record),
# and the new bench default reproduced 25,100 with the baseline leg
# (vs_baseline 5,687x; /tmp/verify_bench.json -> BASELINE r4i). This window:
# 1. Re-attribute the full-encode step (fusion_probe --fusion_encode full):
#    where do the bytes go now — heads? rnn? What is the next lever?
# 2. Batch scaling: b512 (the encoder is ~2.9x lighter per clip, so the
#    old b256 saturation point may move).
# 4. Serving: direct serve_bench with a full-encode fusion artifact vs the
#    windowed artifact (the separator now batches all heads in one apply).
#
# Usage: mkdir -p runs/probe_r4i && nohup setsid bash tools/relay_queue_r4i.sh \
#          > runs/probe_r4i/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r4i
mkdir -p "$OUT"

log() { echo "[relay_queue_r4i $(date +%H:%M:%S)] $*"; }

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

# 1. attribution of the new step shape
run probe_full_b256 3600 \
  python benchmarks/fusion_probe.py --batch 256 --fusion_encode full

# 2. batch scaling with the lighter encoder (default is now full-encode)
export MAAVSS_BENCH_SKIP_BASELINE=1
run fullenc_b512 3600 env MAAVSS_BENCH_BATCH=512 python bench.py
unset MAAVSS_BENCH_SKIP_BASELINE

# 4. serving: full-encode artifact vs windowed (direct path, batch 8)
run serve_fusion_window 3600 \
  python tools/serve_bench.py --model fusion -b 8 --calls 50
run serve_fusion_full 3600 \
  python tools/serve_bench.py --model fusion -b 8 --calls 50 \
    --fusion_encode full

log "queue complete"
