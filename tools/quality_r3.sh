#!/bin/bash
# Round-3 quality runs, serialized on the one TPU client:
#  1-2. frames-family head comparison (regression vs --mask_head), 2000 steps
#       at b32 — mirrors the round-2 fusion head comparison protocol.
#  3. fusion --mask_head 10k-step quality curve (VERDICT r2 #9).
set -u
OUT=runs/quality_r3
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S))" >&2
  timeout 5400 python tools/quality_curve.py "$@" > "$OUT/$name.out" 2> "$OUT/$name.log" \
    && echo "--- $name done: $(tail -1 "$OUT/$name.out")" >&2 \
    || echo "--- $name FAILED (see $OUT/$name.log)" >&2
}
run frames_reg  --regime frames --steps 2000 --eval_every 500 --out $OUT/frames_reg.jsonl  -b 32 -lr 1e-3 --data_path synthetic:8
run frames_mask --regime frames --steps 2000 --eval_every 500 --out $OUT/frames_mask.jsonl -b 32 -lr 1e-3 --data_path synthetic:8 --mask_head
run fusion_mask_10k --regime fusion --steps 10000 --eval_every 500 --out $OUT/fusion_mask_10k.jsonl -b 32 -lr 1e-3 --data_path synthetic:8 --mask_head
echo "=== quality runs done ($(date +%H:%M:%S))" >&2
