#!/bin/bash
# Main ablation grid (reference scripts/exp_ablation_main.sh): concept
# detection modality combinations x {GSG, LSG} flags, for both an
# ImageNet-pretrained image encoder (R101) and CLIP's (ViT); 5 seeds each.
# Usage: bash scripts/exp_ablation_main.sh [num_runs] [device]

num_runs=${1:-5}
device=${2:-0}

base_cmd="python train.py \
--dataset MSRVTT \
--arch base \
--method Transformer \
--modality ami \
--decoder_modality_flags VA"

for feats in R101 ViT; do
    # concept-detection modality ablation (GSG + LSG on)
    for pm_flags in VAT VT VA V; do
        cmd="$base_cmd --task Concept --feats $feats --predictor_modality_flags $pm_flags --use_attr_flags G1Lc --add_hybrid_attention_bias"
        bash scripts/run.sh "$cmd" $num_runs $device
    done

    # semantic-guidance ablation at VAT: no GSG / no LSG / neither
    cmd="$base_cmd --task Concept --feats $feats --predictor_modality_flags VAT --use_attr_flags G0Lc --add_hybrid_attention_bias"
    bash scripts/run.sh "$cmd" $num_runs $device

    cmd="$base_cmd --task Concept --feats $feats --predictor_modality_flags VAT --use_attr_flags G1L0"
    bash scripts/run.sh "$cmd" $num_runs $device

    cmd="$base_cmd --task Concept --feats $feats --predictor_modality_flags VAT --use_attr_flags G0L0"
    bash scripts/run.sh "$cmd" $num_runs $device

    # baseline
    cmd="$base_cmd --task Base --feats $feats"
    bash scripts/run.sh "$cmd" $num_runs $device
done
