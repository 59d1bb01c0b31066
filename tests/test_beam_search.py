"""Beam-search parity: fixed-shape KV-cached beam vs python reference beam.

The python reference replicates the reference repo's ``Beam`` bookkeeping
(EOS row kill at -1e20, finished-list capacity, prev_k = id // vocab,
forced finish at max_len, score/len^alpha ranking) driven by full-prefix
decoder forwards — exactly what ``Translator_ARFormer`` does.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from care_tpu import constants
from care_tpu.decoding import get_translator
from care_tpu.models.framework import Captioner

from helpers import tiny_opt, tiny_model_and_batch, python_reference_beam


@pytest.mark.parametrize("beam_size,topk", [(1, 1), (3, 1), (5, 3)])
def test_beam_matches_python_reference(beam_size, topk):
    opt = tiny_opt(beam_size=beam_size, topk=topk,
                   num_hidden_layers_decoder=2, vocab_size=40)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=3, seed=7)

    enc = model.apply(variables, batch["feats"],
                      method=Captioner.encoding_phase)
    inputs = model.apply(variables, enc, {},
                         method=Captioner.prepare_inputs_for_decoder)

    # enlarge inputs beam_size times, instance-major
    from care_tpu.decoding.translator import auto_enlarge
    inputs_enl = auto_enlarge(inputs, beam_size)

    def step_logprobs_fn(tokens):
        out = model.apply(variables, jnp.asarray(tokens), inputs_enl,
                          method=Captioner.decoding_phase,
                          last_time_step_logits=True)
        return np.asarray(jnp.log(jnp.exp(out["logits"]) /
                                  jnp.sum(jnp.exp(out["logits"]),
                                          axis=-1, keepdims=True)))

    ref_hyps, ref_scores = python_reference_beam(
        step_logprobs_fn, batch_size=3, beam_size=beam_size,
        max_len=opt["max_len"], vocab_size=opt["vocab_size"],
        alpha=opt["beam_alpha"], topk=topk)

    tr = get_translator(opt)
    hyps, scores = tr.translate_batch([(model, variables)], batch)

    for n in range(3):
        for k in range(topk):
            assert hyps[n][k] == ref_hyps[n][k], (n, k, hyps[n], ref_hyps[n])
            assert scores[n][k] == pytest.approx(ref_scores[n][k], abs=1e-4)


def test_beam_hypotheses_end_with_eos_or_maxlen():
    opt = tiny_opt(beam_size=5, topk=5)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2, seed=3)
    tr = get_translator(opt)
    hyps, scores = tr.translate_batch([(model, variables)], batch)
    for n in range(2):
        assert 1 <= len(hyps[n]) <= 5
        for h in hyps[n]:
            assert len(h) <= opt["max_len"] - 1
            assert (h[-1] == constants.EOS) or len(h) == opt["max_len"] - 1


def test_ensemble_two_identical_models_match_single():
    opt = tiny_opt(beam_size=3)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2, seed=5)
    tr = get_translator(opt)
    single, _ = tr.translate_batch([(model, variables)], batch)
    double, _ = tr.translate_batch([(model, variables), (model, variables)],
                                   batch)
    assert single == double
