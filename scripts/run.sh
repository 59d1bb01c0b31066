#!/bin/bash
# Seed-replication runner (reference scripts/run.sh): every experiment runs
# N seeds; results accumulate into test_result.csv per scope and are
# aggregated with misc_tools/merge_csv.py.
# Usage: bash scripts/run.sh "python train.py <args>" [n_seeds] [device]
# `device` is accepted for reference-script parity; on TPU it is forwarded
# as the no-op --devices flag (device selection is via JAX / --mesh).

cmd=$1
num_runs=${2:-5}
device=${3:-0}

for ((seed=0; seed<num_runs; seed++)); do
    this_cmd="$cmd --seed $seed --devices $device"
    echo "cmd: $this_cmd"
    eval $this_cmd
done
