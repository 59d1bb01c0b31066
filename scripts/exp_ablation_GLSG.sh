#!/bin/bash
# GSG x LSG ablation matrix (reference scripts/exp_ablation_GLSG.sh):
# global semantic guidance {none, emb-add, semantic composition} x local
# semantic guidance {none, extra semantic layer @ 3 positions, hybrid
# attention +/- biases}; 5 seeds each.
# Usage: bash scripts/exp_ablation_GLSG.sh [num_runs] [device]

num_runs=${1:-5}
device=${2:-0}

base_cmd="python train.py \
--dataset MSRVTT \
--arch base \
--method Transformer \
--task Concept \
--feats ViT \
--decoder_modality_flags VA \
--predictor_modality_flags VAT"

## GSG: None;      LSG: None
cmd="$base_cmd --use_attr_flags G0L0"
bash scripts/run.sh "$cmd" $num_runs $device

## GSG: Emb-Add;   LSG: None
cmd="$base_cmd --use_attr_flags G1L0"
bash scripts/run.sh "$cmd" $num_runs $device

## GSG: Semantic Composition; LSG: None
cmd="$base_cmd --use_attr_flags G0L0 --compositional_intra --compositional_ffn --scope SC"
bash scripts/run.sh "$cmd" $num_runs $device

## GSG: Emb-Add;   LSG: Hybrid Attention
cmd="$base_cmd --use_attr_flags G1Lc --add_hybrid_attention_bias"
bash scripts/run.sh "$cmd" $num_runs $device

## GSG: Semantic Composition; LSG: Hybrid Attention
cmd="$base_cmd --use_attr_flags G0Lc --compositional_intra --compositional_ffn --scope SC --add_hybrid_attention_bias"
bash scripts/run.sh "$cmd" $num_runs $device

## GSG: None;      LSG: Hybrid Attention
cmd="$base_cmd --use_attr_flags G0Lc --add_hybrid_attention_bias"
bash scripts/run.sh "$cmd" $num_runs $device

## GSG: None;      LSG: Hybrid Attention w/o biases
cmd="$base_cmd --use_attr_flags G0Lc"
bash scripts/run.sh "$cmd" $num_runs $device

## GSG: None;      LSG: extra semantic layer at 3 positions
cmd="$base_cmd --use_attr_flags G0L1 --attr_layer_pos cross2attr --scope cross2semantic"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd --use_attr_flags G0L1 --attr_layer_pos attr2cross --scope semantic2cross"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd --use_attr_flags G0L1 --attr_layer_pos parallel --scope parallel"
bash scripts/run.sh "$cmd" $num_runs $device

## GSG: Emb-Add;   LSG: Hybrid Attention w/o biases
cmd="$base_cmd --use_attr_flags G1Lc"
bash scripts/run.sh "$cmd" $num_runs $device

## GSG: Emb-Add;   LSG: extra semantic layer at 3 positions
cmd="$base_cmd --use_attr_flags G1L1 --attr_layer_pos cross2attr --scope cross2semantic"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd --use_attr_flags G1L1 --attr_layer_pos attr2cross --scope semantic2cross"
bash scripts/run.sh "$cmd" $num_runs $device
cmd="$base_cmd --use_attr_flags G1L1 --attr_layer_pos parallel --scope parallel"
bash scripts/run.sh "$cmd" $num_runs $device
