"""Loss-layer fixtures: hand-computed noisy-OR, label smoothing, KL."""

import numpy as np
import jax.numpy as jnp
import pytest

from care_tpu import constants
from care_tpu.models.predictors import prepare_merged_probs
from care_tpu.training.losses import (
    lang_loss, _noisy_or_mil, length_loss, Criterion)


def test_prepare_merged_probs_hand_computed():
    # 1 sample, 2 positions, 2 attributes
    scores = np.log(np.asarray([[[1/3, 1.0], [1.0, 3.0]]]))  # sigmoid = p/(1+p)
    # sigmoid(log(x)) = x / (1 + x)
    p = np.asarray([[0.25, 0.5], [0.5, 0.75]])
    expected = 1 - (1 - p[0]) * (1 - p[1])   # noisy-OR over positions
    merged = np.asarray(prepare_merged_probs(jnp.asarray(scores)))
    np.testing.assert_allclose(merged[0], expected, rtol=1e-5)


def test_prepare_merged_probs_mask_excludes_positions():
    scores = np.random.RandomState(0).randn(2, 4, 8).astype(np.float32)
    mask = np.zeros((2, 4), dtype=bool)
    mask[:, 2:] = True  # exclude the last two positions
    merged_masked = np.asarray(prepare_merged_probs(
        jnp.asarray(scores), mask=jnp.asarray(mask)))
    merged_trunc = np.asarray(prepare_merged_probs(
        jnp.asarray(scores[:, :2])))
    np.testing.assert_allclose(merged_masked, merged_trunc, rtol=1e-5)


def test_noisy_or_mil_matches_manual_bce():
    rs = np.random.RandomState(1)
    preds = jnp.asarray(rs.uniform(0.02, 0.98, (3, 10)), jnp.float32)
    labels = jnp.asarray(rs.randint(0, 2, (3, 10)), jnp.float32)
    loss, _ = _noisy_or_mil({"attribute_prediction_sparse_sampling": False},
                            preds, None, labels)
    p = np.clip(np.asarray(preds), 0.01, 0.99)
    l = np.asarray(labels)
    bce = -(l * np.log(p) + (1 - l) * np.log(1 - p)).sum(1)
    expected = (bce / np.maximum(1.0, l.sum(1))).sum()
    assert float(loss) == pytest.approx(expected, rel=1e-5)


def test_lang_loss_label_smoothing_and_pad_mask():
    vocab = 7
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, vocab),
                         jnp.float32)
    labels = jnp.asarray([[4, 5, constants.PAD], [6, constants.PAD,
                                                  constants.PAD]], jnp.int32)
    opt = {"label_smoothing": 0.1, "use_attr": False,
           "visual_word_generation": False}
    loss, metrics = lang_loss(opt, {"logits": logits, "labels": labels})

    lp = np.asarray(jnp.log(jnp.exp(logits)
                            / jnp.exp(logits).sum(-1, keepdims=True)))
    l = np.asarray(labels)
    total = 0.0
    for b in range(2):
        for t in range(3):
            if l[b, t] == constants.PAD:
                continue
            nll = -lp[b, t, l[b, t]]
            smooth = -lp[b, t].mean()
            total += 0.9 * nll + 0.1 * smooth
    assert float(loss) == pytest.approx(total / 2.0, rel=1e-4)
    assert float(metrics["word_acc_den0"]) == 3.0


def test_lang_loss_strips_concept_prefix():
    vocab, topk = 7, 4
    labels = jnp.asarray([[4, 5, 6]], jnp.int32)
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 3 + topk, vocab),
                         jnp.float32)
    opt = {"label_smoothing": 0.0, "use_attr": True,
           "use_attr_type": "emb_prefix", "use_attr_topk": topk,
           "visual_word_generation": False}
    loss, _ = lang_loss(opt, {"logits": logits, "labels": labels})
    # equivalent to dropping the first topk positions
    opt2 = {"label_smoothing": 0.0, "use_attr": False,
            "visual_word_generation": False}
    loss2, _ = lang_loss(opt2, {"logits": logits[:, topk:], "labels": labels})
    assert float(loss) == pytest.approx(float(loss2), rel=1e-6)


def test_length_kl_matches_torch_semantics():
    preds = jnp.log(jnp.asarray([[0.2, 0.3, 0.5]], jnp.float32))
    target = jnp.asarray([[0.1, 0.0, 0.9]], jnp.float32)
    loss, _ = length_loss({}, {"preds_length": preds,
                               "length_target": target})
    t = np.asarray(target)[0]
    p = np.asarray(preds)[0]
    expected = sum(t[i] * (np.log(t[i]) - p[i]) for i in range(3) if t[i] > 0)
    assert float(loss) == pytest.approx(expected, rel=1e-5)


def test_criterion_aggregates_and_scales():
    opt = {"crits": ["lang", "length"], "label_smoothing": 0.0,
           "language_generation_scale": 2.0, "length_prediction_scale": 0.5,
           "use_attr": False, "visual_word_generation": False}
    c = Criterion(opt)
    logits = jnp.zeros((1, 2, 5))
    labels = jnp.asarray([[1, 2]], jnp.int32)
    preds_length = jnp.log(jnp.full((1, 4), 0.25))
    target = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    total, losses, _ = c({"logits": logits, "labels": labels,
                          "preds_length": preds_length,
                          "length_target": target})
    expected = 2.0 * float(losses["Lang Loss"]) \
        + 0.5 * float(losses["Length Loss"])
    assert float(total) == pytest.approx(expected, rel=1e-6)
