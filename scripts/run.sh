#!/bin/bash
# Seed-replication runner (reference scripts/run.sh): every experiment runs
# N seeds; results accumulate into test_result.csv per scope and are
# aggregated with misc_tools/merge_csv.py.
# Usage: bash scripts/run.sh "<train.py args>" [n_seeds]

ARGS=$1
N_SEEDS=${2:-5}

for ((seed=0; seed<N_SEEDS; seed++)); do
    python train.py $ARGS --seed $seed
done
