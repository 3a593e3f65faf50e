#!/bin/bash
# Round-3 serialized TPU bench sweep — the full protocol behind BASELINE.md's
# round-3 tables, consolidated from the incremental parts actually run.
# ONE process touches the chip at a time; run with an otherwise-idle host
# (CLAUDE.md "Bench with an idle host"). Each line prints one fetch-closed
# bench.py JSON into $OUT/<name>.json.
#
# Every lever is pinned explicitly because bench.py's DEFAULTS moved to the
# tuned config after this sweep picked it (b256 + pgram cache + auto Pallas
# LSTM) — re-running unpinned rows would not reproduce the A/B table.
set -u
OUT=${1:-runs/bench_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S))" >&2
  if env "$@" timeout 3000 python bench.py > "$OUT/$name.json" 2> "$OUT/$name.log"; then
    echo "--- $name: $(cat "$OUT/$name.json")" >&2
  else
    echo "--- $name FAILED (see $OUT/$name.log)" >&2
  fi
}

SKIP=MAAVSS_BENCH_SKIP_BASELINE=1
BASE="MAAVSS_BENCH_BATCH=128 MAAVSS_BENCH_PGRAM=0 MAAVSS_LSTM=scan"

# ---- fusion: reference point + multistep dispatch amortization hypothesis
run fusion_vec_b128 $BASE MAAVSS_BENCH_WINDOW_MODE=vectorized
run fusion_vec_b128_k4  $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=vectorized MAAVSS_BENCH_MULTISTEP=4  MAAVSS_BENCH_STEPS=48
run fusion_vec_b128_k16 $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=vectorized MAAVSS_BENCH_MULTISTEP=16 MAAVSS_BENCH_STEPS=48
run fusion_vec_u8_b128_k16 $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=vectorized MAAVSS_BENCH_UNROLL=8 MAAVSS_BENCH_MULTISTEP=16 MAAVSS_BENCH_STEPS=48

# ---- fusion: scan baseline + honest Pallas-LSTM A/B (both window modes)
run fusion_scan_b128 $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=scan
run fusion_scan_b128_pallaslstm $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=scan MAAVSS_LSTM=pallas
run fusion_vec_b128_pallaslstm $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=vectorized MAAVSS_LSTM=pallas

# ---- fusion: ingest-time phasegram precompute (--pgram_cache)
run fusion_vec_b128_pgram $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=vectorized MAAVSS_BENCH_PGRAM=1
run fusion_scan_b128_pgram $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=scan MAAVSS_BENCH_PGRAM=1
run fusion_vec_u8_b128_pgram $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=vectorized MAAVSS_BENCH_UNROLL=8 MAAVSS_BENCH_PGRAM=1

# ---- fusion: stacked winners + batch scaling (headline-default candidates)
run fusion_vec_b128_pgram_pallaslstm $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=vectorized MAAVSS_BENCH_PGRAM=1 MAAVSS_LSTM=pallas
run fusion_vec_u8_b128_pgram_pallaslstm $SKIP $BASE MAAVSS_BENCH_WINDOW_MODE=vectorized MAAVSS_BENCH_UNROLL=8 MAAVSS_BENCH_PGRAM=1 MAAVSS_LSTM=pallas
run fusion_vec_b256_pgram_pallaslstm $SKIP MAAVSS_BENCH_WINDOW_MODE=vectorized MAAVSS_BENCH_PGRAM=1 MAAVSS_LSTM=pallas MAAVSS_BENCH_BATCH=256

# ---- the new headline: plain `python bench.py` exactly as the driver runs it
run headline_default

# ---- frames: remat A/B + post-jit_init monolithic/microbatch ladder
# (runs AFTER train/setup.py:jit_init — eager full-batch init was the old OOM)
run frames_b128 $SKIP MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=128 MAAVSS_BENCH_STEPS=10
run frames_b128_remat $SKIP MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=128 MAAVSS_BENCH_REMAT=1 MAAVSS_BENCH_STEPS=10
run frames_b256_mb1 $SKIP MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_STEPS=6
run frames_b256_remat_post $SKIP MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_REMAT=1 MAAVSS_BENCH_STEPS=6
run frames_b256_mb2 $SKIP MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=2 MAAVSS_BENCH_STEPS=6
run frames_b256_mb4 $SKIP MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=256 MAAVSS_BENCH_MICROBATCH=4 MAAVSS_BENCH_STEPS=6
run frames_b512_mb4_post $SKIP MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=512 MAAVSS_BENCH_MICROBATCH=4 MAAVSS_BENCH_STEPS=6
run frames_b512_mb8 $SKIP MAAVSS_BENCH_REGIME=frames MAAVSS_BENCH_BATCH=512 MAAVSS_BENCH_MICROBATCH=8 MAAVSS_BENCH_STEPS=6

# ---- optimizer floor decomposition (dispatched vs scanned Adam updates)
echo "=== opt_floor ($(date +%H:%M:%S))" >&2
timeout 1800 python benchmarks/opt_floor.py > "$OUT/opt_floor.json" 2> "$OUT/opt_floor.log" \
  && echo "--- opt_floor: $(cat "$OUT/opt_floor.json")" >&2 \
  || echo "--- opt_floor FAILED" >&2

echo "=== sweep done ($(date +%H:%M:%S))" >&2
