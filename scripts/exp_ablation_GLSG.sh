#!/bin/bash
# GSG x LSG ablation matrix (reference scripts/exp_ablation_GLSG.sh):
# use_attr_flags in {G0,G1,Gp} x {L0,L1,Lc}.

for G in G0 G1 Gp; do
  for L in L0 L1 Lc; do
    [ "$G$L" = "G0L0" ] && continue
    bash scripts/run.sh "--dataset MSRVTT --method Transformer --task Concept \
        --feats ViT -dm_flags VA -pm_flags VAT \
        --override {\"use_attr_flags\":\"$G$L\"}" 5
  done
done
