#!/bin/bash
# MSRVTT main-table experiments (reference scripts/exp_main_MSRVTT.sh):
# Base vs CARE across feature sets.

for feats in ViT; do
  bash scripts/run.sh "--dataset MSRVTT --method Transformer --task Base --feats $feats --modality ami" 5
  bash scripts/run.sh "--dataset MSRVTT --method Transformer --task CARE --feats $feats -dm_flags VA -pm_flags VAT" 5
done
