#!/bin/sh
# Round-2 TPU measurement session — run when the axon tunnel is up.
# Each step appends JSON to /tmp/chip_session/; run steps SEQUENTIALLY
# (the tunnel allows one client). Bound every run with timeout.
set -x
OUT=${1:-/tmp/chip_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# 0) sanity: device present
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1) north-star bench (x8, current defaults incl. lazy branches)
timeout 1200 python bench.py | tee "$OUT/bench.json"

# 2) serving-knob sweep for the x8 push (batch x lazy/style/o-chunk/hoist)
timeout 3000 python tools/sweep_serving.py | tee "$OUT/sweep_serving.jsonl"

# 3) per-scale precision ladder (x2/x3: fp32/mixed/bf16c/bf16c3/bf16/nohoist)
timeout 3000 python tools/bench_scales.py | tee "$OUT/bench_scales.jsonl"

# 4) training step + MFU
timeout 1800 python tools/bench_train.py | tee "$OUT/bench_train.json"

# 5) input-vs-device verdict at the new loader rate
timeout 900 python tools/bench_input.py --n 32 --batches 12 --workers 0 \
    | tee "$OUT/bench_input.txt"
