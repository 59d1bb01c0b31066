#!/bin/bash
# Versatility: CARE grafted onto other methods (reference
# scripts/exp_versatility_of_CARE.sh): SALSTM / TopDown / NACF / PointerGen.

for method in SALSTM TopDown; do
  bash scripts/run.sh "--dataset MSRVTT --method $method --task Base --feats ViT --modality ami" 5
  bash scripts/run.sh "--dataset MSRVTT --method $method --task CARE --feats ViT -dm_flags VA -pm_flags VAT" 5
done

# NAR pipeline: train the AR teacher first, then NACF
bash scripts/run.sh "--dataset MSRVTT --method ARB --task Base --feats ViT --modality ami" 5
bash scripts/run.sh "--dataset MSRVTT --method NACF --task Base --feats ViT --modality ami" 5

bash scripts/run.sh "--dataset MSRVTT --method PointerGen --task Base --feats ViT --modality ami" 5
