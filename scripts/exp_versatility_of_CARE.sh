#!/bin/bash
# Versatility: CARE grafted onto other captioning methods (reference
# scripts/exp_versatility_of_CARE.sh): SALSTM / TopDown / NACF /
# PointerGen / SwinBERT-feature Transformer, each Base vs CARE, on both
# MSVD and MSRVTT; 5 seeds each.
# Usage: bash scripts/exp_versatility_of_CARE.sh [num_runs] [device]

num_runs=${1:-5}
device=${2:-0}

base_cmd_on_msvd="python train.py \
--dataset MSVD \
--arch base \
--feats ViT \
--modality mi \
--decoder_modality_flags V \
--predictor_modality_flags VT"

base_cmd_on_msrvtt="python train.py \
--dataset MSRVTT \
--arch base \
--feats ViT \
--modality ami \
--decoder_modality_flags VA \
--predictor_modality_flags VAT"

########## SALSTM (Base, then + CARE)
cmd="$base_cmd_on_msvd --method SALSTM --task Base"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method SALSTM --task Base"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msvd --method SALSTM --task CARE"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method SALSTM --task CARE"
bash scripts/run.sh "$cmd" $num_runs $device

########## TopDown (Base, then + CARE)
cmd="$base_cmd_on_msvd --method TopDown --task Base"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method TopDown --task Base"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msvd --method TopDown --task CARE"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method TopDown --task CARE"
bash scripts/run.sh "$cmd" $num_runs $device

########## NACF: train the AR teacher (ARB) first, then the NAR student
cmd="$base_cmd_on_msvd --method ARB --task Base"
bash scripts/run.sh "$cmd" 1 $device
cmd="$base_cmd_on_msrvtt --method ARB --task Base"
bash scripts/run.sh "$cmd" 1 $device
cmd="$base_cmd_on_msvd --method NACF --task Base --with_teacher_during_training"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method NACF --task Base --with_teacher_during_training"
bash scripts/run.sh "$cmd" $num_runs $device

########## NACF + CARE
cmd="$base_cmd_on_msvd --method ARB --task CARE"
bash scripts/run.sh "$cmd" 1 $device
cmd="$base_cmd_on_msrvtt --method ARB --task CARE"
bash scripts/run.sh "$cmd" 1 $device
cmd="$base_cmd_on_msvd --method NACF --task CARE --with_teacher_during_training"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method NACF --task CARE --with_teacher_during_training"
bash scripts/run.sh "$cmd" $num_runs $device

########## PointerGen (Base, then + CARE)
cmd="$base_cmd_on_msvd --method PointerGen --task Base"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method PointerGen --task Base"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msvd --method PointerGen --task CARE"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method PointerGen --task CARE"
bash scripts/run.sh "$cmd" $num_runs $device

########## SwinBERT features (no end-to-end training; features extracted
########## from fine-tuned SwinBERT checkpoints), Base then + CARE
cmd="$base_cmd_on_msvd --method Transformer --task Base --feats SwinBERTDense"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method Transformer --task Base --feats SwinBERTDense"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msvd --method Transformer --task CARE --feats SwinBERTDense"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd_on_msrvtt --method Transformer --task CARE --feats SwinBERTDense"
bash scripts/run.sh "$cmd" $num_runs $device
