"""Heterogeneous-modality ensemble: checkpoints with different modalities
load together, feats split per model, decode jointly."""

import os

import numpy as np
import pytest

from care_tpu.training.checkpoints import save_checkpoint
from care_tpu.models.loading import load_model
from care_tpu.decoding import get_translator

from helpers import tiny_opt, tiny_model_and_batch


def test_heterogeneous_ensemble_decode(tmp_path):
    # model 1: modality mi; model 2: modality m only (same m feature file)
    opt1 = tiny_opt(vocab_size=40, beam_size=2)
    opt1["feats_m"], opt1["feats_i"] = ["m.hdf5"], ["i.hdf5"]
    m1, v1, batch = tiny_model_and_batch(opt1, batch_size=2, seed=1)

    opt2 = tiny_opt(vocab_size=40, beam_size=2, modality="m")
    opt2["feats_m"] = ["m.hdf5"]
    m2, v2, _ = tiny_model_and_batch(opt2, batch_size=2, seed=2)

    p1 = os.path.join(str(tmp_path), "m1.ckpt")
    p2 = os.path.join(str(tmp_path), "m2.ckpt")
    save_checkpoint(p1, v1, opt1, {})
    save_checkpoint(p2, v2, opt2, {})

    models, opt, spec = load_model([p1, p2], do_replace_paths=False,
                                   return_spec=True)
    assert spec is not None and spec.need_to_split_feats
    assert set(opt["modality"]) == {"m", "i"}

    # union-ordered feats (mi): split per model
    feats = batch["feats"]  # helper built [m, i] for opt1's modality 'mi'
    per_model = spec.split_feats(feats)
    assert len(per_model) == 2
    assert len(per_model[0]) == 2 and len(per_model[1]) == 1

    tr = get_translator(opt)
    hyps, scores = tr.translate_batch(models, {"feats": per_model})
    assert len(hyps) == 2
    for h in hyps:
        assert len(h[0]) >= 1


def test_heterogeneous_ensemble_fused_k_decode(tmp_path):
    """Fused K-batch decode with a heterogeneous ensemble (nested per-model
    feats lists): must equal per-batch decode — regression for the
    --fused_k shape probe crashing on list-of-lists feats."""
    opt1 = tiny_opt(vocab_size=40, beam_size=2)
    opt1["feats_m"], opt1["feats_i"] = ["m.hdf5"], ["i.hdf5"]
    m1, v1, b1 = tiny_model_and_batch(opt1, batch_size=2, seed=1)
    opt2 = tiny_opt(vocab_size=40, beam_size=2, modality="m")
    opt2["feats_m"] = ["m.hdf5"]
    m2, v2, _ = tiny_model_and_batch(opt2, batch_size=2, seed=2)

    p1 = os.path.join(str(tmp_path), "m1.ckpt")
    p2 = os.path.join(str(tmp_path), "m2.ckpt")
    save_checkpoint(p1, v1, opt1, {})
    save_checkpoint(p2, v2, opt2, {})
    models, opt, spec = load_model([p1, p2], do_replace_paths=False,
                                   return_spec=True)

    _, _, b2 = tiny_model_and_batch(opt1, batch_size=2, seed=5)
    batches = [{"feats": spec.split_feats(b["feats"])} for b in (b1, b2)]

    tr = get_translator(opt)
    seq = [tr.translate_batch(models, b) for b in batches]
    fused = tr.translate_batches_fused(models, batches)
    assert fused == seq
