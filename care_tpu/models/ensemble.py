"""Model ensembling helpers.

Parity target: reference ``ModelEnsemble`` (``Wrapper.py:617-714``): loads N
checkpoints, validates that shared modalities use identical feature files,
unions the modalities, and splits each batch's feature list per model before
translation. Decoding-time log-prob averaging itself lives in
``care_tpu.decoding.translator`` (one step_fn per model, mean of log-probs).
"""

from typing import Any, Dict, List, Tuple


class EnsembleSpec:
    def __init__(self, opts: List[dict]):
        assert len(opts) >= 1
        self.model_modalities = [o["modality"] for o in opts]
        merged = dict(opts[0])
        full = ""
        for o in opts:
            for char in o["modality"]:
                if char in full:
                    # shared modalities must use the same feature files
                    a, b = o.get(f"feats_{char}"), merged.get(f"feats_{char}")
                    assert a == b, (char, a, b)
                else:
                    full += char
                    merged[f"feats_{char}"] = o.get(f"feats_{char}")
                    merged[f"dim_{char}"] = o.get(f"dim_{char}")
        merged["modality"] = full
        self.opt = merged
        self.need_to_split_feats = len(set(self.model_modalities)) > 1

    def split_feats(self, feats: List[Any]) -> List[List[Any]]:
        """Union-ordered feats -> one feats list per model."""
        if not self.need_to_split_feats:
            return feats
        union = self.opt["modality"]
        out = []
        for modality in self.model_modalities:
            out.append([feats[union.index(c)] for c in modality])
        return out
