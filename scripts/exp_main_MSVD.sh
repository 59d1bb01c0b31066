#!/bin/bash
# MSVD main-table experiments (reference scripts/exp_main_MSVD.sh):
# CARE across feature combinations, CA-Baseline, Baseline; 5 seeds each.
# Usage: bash scripts/exp_main_MSVD.sh [num_runs] [device]

num_runs=${1:-5}
device=${2:-0}

base_cmd="python train.py \
--dataset MSVD \
--arch base \
--method Transformer"

# CARE with different feature combinations
cmd="$base_cmd --task CARE --feats R101 --decoder_modality_flags V --predictor_modality_flags VT"
bash scripts/run.sh "$cmd" $num_runs $device

cmd="$base_cmd --task CARE --feats IRv2 --decoder_modality_flags V --predictor_modality_flags VT"
bash scripts/run.sh "$cmd" $num_runs $device

cmd="$base_cmd --task CARE --feats IRv2 --decoder_modality_flags I --predictor_modality_flags IT"
bash scripts/run.sh "$cmd" $num_runs $device

cmd="$base_cmd --task CARE --feats ViT --decoder_modality_flags V --predictor_modality_flags VT"
bash scripts/run.sh "$cmd" $num_runs $device

# CA-Baseline
cmd="$base_cmd --task CABase --feats ViT --decoder_modality_flags V"
bash scripts/run.sh "$cmd" $num_runs $device

# Baseline (`--modality mi` == `--decoder_modality_flags V`, but the task
# `Base` is selected via --modality)
cmd="$base_cmd --task Base --feats ViT --modality mi"
bash scripts/run.sh "$cmd" $num_runs $device
