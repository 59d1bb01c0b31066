"""Seed-sweep aggregation (misc_tools/merge_csv): mean (std), x100."""

import os
import sys

import pandas as pd


def test_merge_csv(tmp_path):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "misc_tools"))
    from merge_csv import merge

    scope_dir = tmp_path / "MSRVTT" / "Transformer" / "CARE" / "base_ViT"
    scope_dir.mkdir(parents=True)
    rows = pd.DataFrame([
        {"Bleu_4": 0.40, "CIDEr": 0.50, "Sum": 1.5, "seed": 0},
        {"Bleu_4": 0.42, "CIDEr": 0.52, "Sum": 1.6, "seed": 1},
    ])
    rows.to_csv(scope_dir / "test_result.csv", index=False)

    out = merge(str(tmp_path), "MSRVTT")
    assert len(out) == 1
    row = out.iloc[0]
    assert row["method"] == "Transformer"
    assert row["n_seeds"] == 2
    assert row["Bleu_4"] == "41.0 (1.0)"
    assert row["CIDEr"] == "51.0 (1.0)"
