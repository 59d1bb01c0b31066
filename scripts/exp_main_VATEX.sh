#!/bin/bash
# VATEX main-table experiments (reference scripts/exp_main_VATEX.sh):
# CARE at median/large archs, CA-Baseline, Baseline; 5 seeds each.
# Usage: bash scripts/exp_main_VATEX.sh [num_runs] [device]
#
# VATEX note (reference): the official splits are 25,991/3,000/6,000 but
# some clips are unavailable, leaving 25,006/2,893/5,792.  Predictions for
# the 208 missing test videos are completed from a model trained on the
# officially released I3D features; ./data/VATEX_I3D_preds.json is built:
#   python train.py --method Transformer --devices 0 --seed 0 --feats I3D \
#       --task Base --dataset VATEX --arch large
#   python translate.py -cp ./exps/VATEX/Transformer/Base/large_I3D_m/best.ckpt \
#       --json_path ./data --json_name VATEX_I3D_preds.json

num_runs=${1:-5}
device=${2:-0}

base_cmd="python train.py \
--dataset VATEX \
--method Transformer \
--VATEX_I3D_preds_json ./data/VATEX_I3D_preds.json"

# CARE with different architectures and feature combinations
cmd="$base_cmd --task CARE --arch median --feats IRv2 --decoder_modality_flags V --predictor_modality_flags VT"
bash scripts/run.sh "$cmd" $num_runs $device

cmd="$base_cmd --task CARE --arch median --feats ViT --decoder_modality_flags VA --predictor_modality_flags VAT"
bash scripts/run.sh "$cmd" $num_runs $device

cmd="$base_cmd --task CARE --arch large --feats ViT --decoder_modality_flags VA --predictor_modality_flags VAT"
bash scripts/run.sh "$cmd" $num_runs $device

# CA-Baseline
cmd="$base_cmd --task CABase --arch median --feats ViT --decoder_modality_flags VA"
bash scripts/run.sh "$cmd" $num_runs $device

# Baseline
cmd="$base_cmd --task Base --arch median --feats ViT --modality ami"
bash scripts/run.sh "$cmd" $num_runs $device
