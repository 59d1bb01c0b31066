"""NAR decoding tests: canvases, select_worst, MaskPredict convergence,
full NAR translator path."""

import numpy as np
import jax.numpy as jnp
import pytest

from care_tpu import constants
from care_tpu.decoding import nar, get_translator

from helpers import tiny_opt, tiny_model_and_batch


def test_select_worst_counts():
    probs = jnp.asarray([[0.9, 0.1, 0.5, 0.8], [0.2, 0.3, 0.9, 0.4]])
    mask = np.asarray(nar.select_worst(probs, jnp.asarray([2, 1])))
    assert mask[0].sum() == 2 and mask[0, 1] and mask[0, 2]
    assert mask[1].sum() == 1 and mask[1, 0]


def test_select_worst_at_least_one():
    probs = jnp.asarray([[0.9, 0.8]])
    mask = np.asarray(nar.select_worst(probs, jnp.asarray([0])))
    assert mask.sum() == 1


def test_generate_step_with_prob():
    logits = jnp.asarray([[[0.0, 10.0, 0.0]]])
    idx, p, _ = nar.generate_step_with_prob(logits)
    assert int(idx[0, 0]) == 1
    assert float(p[0, 0]) > 0.99


def test_mask_predict_fills_canvas():
    # trivial "model": always predicts token 7 with high confidence
    V = 10

    def forward_logits(tokens):
        logits = jnp.full(tokens.shape + (V,), -5.0)
        return logits.at[..., 7].set(5.0)

    canvas = jnp.asarray([[constants.MASK] * 4 + [constants.PAD] * 2],
                         jnp.int32)
    out, lprobs = nar.mask_predict(canvas, forward_logits, iterations=3)
    out = np.asarray(out)
    assert (out[0, :4] == 7).all()
    assert (out[0, 4:] == constants.PAD).all()
    lp = np.asarray(lprobs)
    assert (lp[0, 4:] == pytest.approx(0.0, abs=1e-6))  # pad prob = 1


def test_nar_translator_end_to_end():
    opt = tiny_opt(method="NAB", vocab_size=40)
    # NAB preset: NARFormer + length prediction + EncoderWithHighWayBN
    assert opt["decoding_type"] == "NARFormer"
    opt["length_beam_size"] = 3
    opt["iterations"] = 2
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)

    tr = get_translator(opt)
    hyps, lprobs = tr.translate_batch([(model, variables)],
                                      {"feats": batch["feats"]})
    assert len(hyps) == 2
    for h in hyps:
        assert len(h[0]) == opt["max_len"]
        # outputs contain no MASK tokens
        assert constants.MASK not in h[0]


def test_nar_translator_with_teacher_identity_mapping():
    opt = tiny_opt(method="NAB", vocab_size=40)
    opt["length_beam_size"] = 2
    opt["iterations"] = 2
    opt["masking_decision"] = True
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)

    t_opt = tiny_opt(vocab_size=40)
    teacher, t_vars, _ = tiny_model_and_batch(t_opt, batch_size=2)

    tr = get_translator(opt)
    hyps, lprobs = tr.translate_batch(
        [(model, variables)], {"feats": batch["feats"]},
        teacher=(teacher, t_vars))
    assert len(hyps) == 2


def _const_model(V=10, best=7):
    def forward_logits(tokens):
        logits = jnp.full(tokens.shape + (V,), -5.0)
        return logits.at[..., best].set(5.0)
    return forward_logits


def test_left2right_fills_canvas():
    canvas = jnp.asarray([[constants.MASK] * 4 + [constants.PAD] * 2],
                         jnp.int32)
    out, lprobs = nar.left2right(canvas, _const_model(), q=1, q_iterations=1)
    out = np.asarray(out)
    assert (out[0, :4] == 7).all()
    assert (out[0, 4:] == constants.PAD).all()


def test_easy_first_fills_canvas():
    canvas = jnp.asarray([[constants.MASK] * 5 + [constants.PAD]],
                         jnp.int32)
    out, lprobs = nar.easy_first(canvas, _const_model(), q=2,
                                 q_iterations=1)
    out = np.asarray(out)
    assert (out[0, :5] == 7).all()
    assert out[0, 5] == constants.PAD


def test_nar_translator_l2r_and_ef():
    for paradigm in ("l2r", "ef"):
        opt = tiny_opt(method="NAB", vocab_size=40)
        opt["paradigm"] = paradigm
        opt["length_beam_size"] = 2
        opt["q"], opt["q_iterations"] = 2, 1
        model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
        tr = get_translator(opt)
        hyps, lprobs = tr.translate_batch([(model, variables)],
                                          {"feats": batch["feats"]})
        assert len(hyps) == 2
        assert constants.MASK not in hyps[0][0]
