#!/bin/bash
# Retrieval-DB robustness sweep (reference scripts/retrieval_db_ratio.sh):
# re-score the 5 seed checkpoints of a PointerGen/retrieval run while
# shrinking the retrieval database to 0.1% / 1% / 10% of its size; rows
# accumulate into retrieval_db_ratio_<ratio>.csv next to each checkpoint.
# See care_tpu/analysis.py (retrieval_robustness) for aggregation.
# Usage: bash scripts/retrieval_db_ratio.sh <exp_path> [device]

path=$1
device=${2:-0}

for ratio in 0.1 1 10; do
    echo "retrieval_db_ratio=$ratio"
    for name in best.ckpt best-v1.ckpt best-v2.ckpt best-v3.ckpt best-v4.ckpt; do
        cmd="python translate.py -cp $path/$name --retrieval_db_ratio $ratio --save_csv --csv_name retrieval_db_ratio_${ratio}.csv --mode test --devices $device"
        echo "cmd: $cmd"
        eval $cmd
    done
done
