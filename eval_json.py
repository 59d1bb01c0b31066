"""Score a saved predictions JSON against references
(parity with reference ``eval_json.py:9-27``)."""

import argparse
import json
import pickle

from care_tpu.metrics import COCOScorer

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-json", "--json_path", type=str, required=True)
    p.add_argument("-ref", "--reference", type=str, required=True)
    args = p.parse_args()

    with open(args.json_path) as f:
        preds = json.load(f)
    with open(args.reference, "rb") as f:
        refs = pickle.load(f)

    # accept either {vid: [{'caption': ...}]} or {vid: 'caption'}
    preds = {k: (v if isinstance(v, list) else [{"caption": v}])
             for k, v in preds.items()}
    scorer = COCOScorer()
    scores, _ = scorer.score(refs, preds, list(preds.keys()))
    for k, v in scores.items():
        print(f"{k}: {v:.4f}")
