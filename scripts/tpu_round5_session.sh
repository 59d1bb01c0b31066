#!/bin/bash
# Round-5 TPU measurement session — run the moment the tunnel is back.
# Sequential (never two TPU processes at once):
#   1. fused-head kernel sweep  -> .bench_fused_head_tune.json
#   2. configured trainer       -> .bench_train_configured.json + trained
#      weights + in-distribution batches (feature-bank rates, bf16 gate)
#   3. full bench               -> stdout JSON (+ .bench_last_good.json)
# Usage: nohup bash scripts/tpu_round5_session.sh > /tmp/tpu_r5.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== probe ==="
timeout -k 10 240 python -c "import jax; d=jax.devices(); print(d[0])" || exit 1

echo "=== 1. fused-head tune ==="
timeout -k 30 3000 python scripts/tune_fused_head.py

echo "=== 2. configured trainer ==="
timeout -k 30 4200 python scripts/bench_train_configured.py

# bench.py LAST: refreshes .bench_last_good.json with round-5 numbers so
# even a later tunnel-down driver run replays THIS round's measurements.
# (If the driver's own bench overlaps, its probe retries ~13 min — the
# window for contention is small and the last-good refresh is worth it.)
echo "=== 3. bench ==="
timeout -k 30 4200 python bench.py

echo "=== done ==="
