#!/bin/bash
# Relay-window measurement queue (round 3d) — reruns of the r3c items that
# crashed on now-fixed bugs, plus the fused-pgenc gate with the
# Mosaic-lowering fixes (no strided slices, no scatter-add).
#
# Fixes under test (see git log):
#   - pallas_adam dtype discipline: bf16 leaves stay bf16 (opt_floor and the
#     --opt_kernel pallas bench both crashed on the promotion bug)
#   - pallas_pgenc: strided slice -> reshape-split; scatter-add -> 9 shifted
#     adds (validate_pgenc and both pgenc benches crashed on chip)
#   - serve_bench: weights device-resident by default (the r3c 5.9 s p50 was
#     re-uploading the param tree per request)
#
# ONE process on the chip at a time; idle host for honest numbers.
# Usage: nohup setsid bash tools/relay_queue_r3d.sh > runs/probe_r3d/queue.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=runs/probe_r3d
mkdir -p "$OUT"

log() { echo "[relay_queue_r3d $(date +%H:%M:%S)] $*"; }

# -- wait for the r3c queue (and any other TPU client / busy host) ----------
while pgrep -f "relay_queue.sh" >/dev/null 2>&1; do
  log "waiting for the r3c queue to finish"
  sleep 120
done
while pgrep -x pytest >/dev/null 2>&1 || pgrep -f "pytest" >/dev/null 2>&1; do
  log "host busy (pytest); sleeping 60s"
  sleep 60
done

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
log "relay is UP after $attempt retries; starting queue"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  local rc=$?
  log "END $name rc=$rc"
  tail -2 "$OUT/$name.json" || true
}

# correctness gates first
run validate_pgenc 5400 python tools/validate_pallas_pgenc.py
# optimizer floor with the fixed pallas-Adam row
run opt_floor 5400 python benchmarks/opt_floor.py
# end-to-end A/Bs at the tuned default config (b256 vect + pgram + LSTM auto)
run bench_pallas_adam 3600 env MAAVSS_BENCH_OPT_KERNEL=pallas \
  MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
run bench_pgenc_dense 3600 env MAAVSS_BENCH_PGENC=pallas \
  MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
run bench_pgenc_strided 3600 env MAAVSS_BENCH_PGENC=pallas \
  MAAVSS_PGENC_TAPS=strided MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
# candidate combined headline (all winners stacked; keep whatever wins)
run bench_combo 3600 env MAAVSS_BENCH_PGENC=pallas \
  MAAVSS_BENCH_OPT_KERNEL=pallas MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
# frames regime: --frames_encode full (encode the sequence once, slice
# latent windows; ~2.9x fewer conv3d FLOPs on paper) vs the 156.5 clips/s
# windowed baseline
run frames_bench_full 3600 env MAAVSS_BENCH_REGIME=frames \
  MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 \
  MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
run frames_bench_full_b512 3600 env MAAVSS_BENCH_REGIME=frames \
  MAAVSS_BENCH_BATCH=512 MAAVSS_BENCH_MICROBATCH=4 \
  MAAVSS_BENCH_FRAMES_ENCODE=full MAAVSS_BENCH_SKIP_BASELINE=1 python bench.py
# serving with device-resident weights (the real replica mode)
run serve_bench_fusion 3600 python tools/serve_bench.py --calls 50 -b 8
run serve_bench_frames 3600 python tools/serve_bench.py --model frames --calls 20 -b 8
# quality A/B for --frames_encode full (does the faster trunk hurt SI-SDR?
# same 2k-step protocol as the r3 head comparison, mask head on both)
run quality_frames_window 5400 python tools/quality_curve.py --regime frames \
  --steps 2000 --eval_every 500 --out "$OUT/quality_frames_window.jsonl" \
  -b 32 -lr 1e-3 --data_path synthetic:8 --mask_head
run quality_frames_full 5400 python tools/quality_curve.py --regime frames \
  --steps 2000 --eval_every 500 --out "$OUT/quality_frames_full.jsonl" \
  -b 32 -lr 1e-3 --data_path synthetic:8 --mask_head --frames_encode full
log "queue complete"

# appended: Mosaic-compiler subsample capability probe (validate_pgenc found
# the reshape-split passes lowering but fails backend layout inference)
run mosaic_probe2 1800 python benchmarks/mosaic_probe2.py
log "queue complete (incl. mosaic_probe2)"

# appended: frames serving with the full-encode separator (the training-side
# 2.7x should show up at serving time too)
run serve_bench_frames_full 3600 python tools/serve_bench.py --model frames \
  --calls 20 -b 8 --frames_encode full
log "queue complete (incl. frames-full serving)"
