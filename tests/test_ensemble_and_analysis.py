"""Ensemble loading/decoding e2e + analysis utilities."""

import os

import numpy as np
import pytest

from care_tpu.training.checkpoints import save_checkpoint
from care_tpu.models.loading import load_model
from care_tpu.decoding import get_translator
from care_tpu.models.ensemble import EnsembleSpec

from helpers import tiny_opt, tiny_model_and_batch


def test_ensemble_of_two_checkpoints(tmp_path):
    opt = tiny_opt(vocab_size=40, beam_size=3)
    _, v1, batch = tiny_model_and_batch(opt, batch_size=2, seed=1)
    _, v2, _ = tiny_model_and_batch(opt, batch_size=2, seed=2)
    p1 = os.path.join(str(tmp_path), "m1.ckpt")
    p2 = os.path.join(str(tmp_path), "m2.ckpt")
    save_checkpoint(p1, v1, opt, {})
    save_checkpoint(p2, v2, opt, {})

    models, lopt = load_model([p1, p2], do_replace_paths=False)
    assert len(models) == 2
    tr = get_translator(lopt)
    hyps, scores = tr.translate_batch(models, {"feats": batch["feats"]})
    assert len(hyps) == 2


def test_ensemble_spec_modality_union():
    o1 = {"modality": "mi", "feats_m": ["m.hdf5"], "feats_i": ["i.hdf5"],
          "dim_m": 8, "dim_i": 8}
    o2 = {"modality": "ai", "feats_a": ["a.hdf5"], "feats_i": ["i.hdf5"],
          "dim_a": 4, "dim_i": 8}
    spec = EnsembleSpec([o1, o2])
    assert spec.need_to_split_feats
    assert set(spec.opt["modality"]) == {"m", "i", "a"}
    feats = ["M", "I", "A"]  # union order mia
    per_model = spec.split_feats(feats)
    union = spec.opt["modality"]
    assert per_model[0] == [feats[union.index(c)] for c in "mi"]
    assert per_model[1] == [feats[union.index(c)] for c in "ai"]


def test_ensemble_spec_rejects_mismatched_shared_feats():
    o1 = {"modality": "i", "feats_i": ["a.hdf5"], "dim_i": 8}
    o2 = {"modality": "i", "feats_i": ["b.hdf5"], "dim_i": 8}
    with pytest.raises(AssertionError):
        EnsembleSpec([o1, o2])


def test_hybrid_bias_analysis():
    from care_tpu.analysis import hybrid_attention_bias
    opt = tiny_opt(task="CARE", decoder_modality_flags="V",
                   predictor_modality_flags="V", vocab_size=40,
                   attribute_prediction_k=16, use_attr_topk=4)
    assert opt["add_hybrid_attention_bias"]
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    out = hybrid_attention_bias(variables, opt)
    assert out, "no hybrid_bias parameters found"
    for path, info in out.items():
        assert "concept_mean" in info
        n_heads = opt["num_attention_heads"]
        assert info["bias"].shape[0] == n_heads


def test_concept_usage():
    from care_tpu.analysis import concept_usage
    preds = {"video0": [{"caption": "man running"}]}
    labels = np.asarray([[0, 1]])  # concept ids 0,1 -> vocab ids 6,7
    itow = {6: "man", 7: "dog"}
    out = concept_usage(preds, labels, ["video0"], itow)
    assert out["concept_word_ratio"] == pytest.approx(0.5)


def test_topic_classification_probe():
    """SVM probe over GSG latents (reference MSRVTT SVM notebook): runs on
    both the G1 (latent topic vector) and mean-semantic-embs paths and
    separates categories when the features carry them."""
    import numpy as np
    from care_tpu.analysis import topic_classification_probe

    opt = tiny_opt(task="CARE", decoder_modality_flags="V",
                   predictor_modality_flags="V", vocab_size=40)
    assert "emb" in opt["use_attr_type"]
    model, variables, batch = tiny_model_and_batch(opt, batch_size=8)

    class OneBatchLoader:
        def __iter__(self):
            yield {"feats": batch["feats"]}

    cats = np.asarray([0, 1] * 4)
    for use_latent in (True, False):
        out = topic_classification_probe(model, variables, OneBatchLoader(),
                                         cats, n_train=6,
                                         use_latent=use_latent)
        assert 0.0 <= out["accuracy"] <= 100.0
        assert out["n_train"] == 6 and out["n_test"] == 2

    # sanity: with features that ARE the category, the probe is perfect
    from sklearn.svm import SVC
    rs = np.random.RandomState(0)
    y = rs.randint(0, 4, 60)
    x = np.eye(4)[y] + 0.01 * rs.randn(60, 4)
    svc = SVC(random_state=0, kernel="rbf").fit(x[:40], y[:40])
    assert (svc.predict(x[40:]) == y[40:]).mean() == 1.0
