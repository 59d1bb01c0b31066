"""KV-cached decode vs full-forward recompute: logit-exact equivalence for
every G-LSG guidance mode (the hard-parity surface of SURVEY §7).

Greedy-token comparisons are flaky on random weights (argmax flips on
float-noise ties), so the check teacher-forces one token sequence through
BOTH paths and compares the per-step next-token logits to tight tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from care_tpu import constants
from care_tpu.models.framework import Captioner

from helpers import tiny_opt, tiny_model_and_batch


def per_step_logits_full(model, variables, inputs, token_seq):
    """Full-forward recompute path (reference execution model)."""
    B, L = token_seq.shape
    outs = []
    for t in range(1, L + 1):
        out = model.apply(variables, token_seq[:, :t], inputs,
                          method=Captioner.decoding_phase,
                          last_time_step_logits=True)
        outs.append(np.asarray(out["logits"]))
    return np.stack(outs, axis=1)          # [B, L, V]


def per_step_logits_kv(model, variables, inputs, token_seq, max_len):
    state = model.apply(variables, inputs, max_len,
                        method=Captioner.init_decode_state)
    B, L = token_seq.shape
    outs = []
    for t in range(L):
        logits, state, _ = model.apply(
            variables, token_seq[:, t], jnp.asarray(t), state, inputs,
            method=Captioner.decode_step)
        outs.append(np.asarray(logits))
    return np.stack(outs, axis=1)


MODES = [
    ("emb_concat", {}),                       # CARE G1Lc
    ("_att", {"add_hybrid_attention_bias": False}),      # CABase G0L1
    ("pp_emb_concat", {}),                    # GpLc
    ("_prefix", {"add_hybrid_attention_bias": False}),   # prefix-LSG
    ("emb_att", {"add_hybrid_attention_bias": False}),   # G1L1
]


def _roll_tokens(opt, B, seed):
    rs = np.random.RandomState(seed)
    L = opt["max_len"] - 1
    seq = rs.randint(6, opt["vocab_size"], (B, L))
    seq[:, 0] = constants.BOS
    return jnp.asarray(seq, jnp.int32)


@pytest.mark.parametrize("use_attr_type,extra", MODES)
def test_kv_logits_match_full_forward(use_attr_type, extra):
    overrides = dict(
        task="CARE", decoder_modality_flags="V", predictor_modality_flags="V",
        vocab_size=50, num_hidden_layers_decoder=2, beam_size=1, topk=1,
        attribute_prediction_k=16, use_attr_topk=4,
        final_overrides={"use_attr_type": use_attr_type, **extra},
    )
    opt = tiny_opt(**overrides)
    assert opt["use_attr_type"] == use_attr_type
    model, variables, batch = tiny_model_and_batch(opt, batch_size=3, seed=11)

    enc = model.apply(variables, batch["feats"],
                      method=Captioner.encoding_phase)
    inputs = model.apply(variables, enc, {},
                         method=Captioner.prepare_inputs_for_decoder)
    seq = _roll_tokens(opt, 3, seed=5)
    full = per_step_logits_full(model, variables, inputs, seq)
    kv = per_step_logits_kv(model, variables, inputs, seq, opt["max_len"])
    np.testing.assert_allclose(kv, full, atol=2e-4,
                               err_msg=use_attr_type)


def test_kv_logits_match_with_category():
    opt = tiny_opt(vocab_size=50, beam_size=1, topk=1, with_category=True,
                   num_hidden_layers_decoder=2)
    assert opt["with_category"]
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2, seed=4)
    category = jnp.asarray([[1], [3]], jnp.int32)

    enc = model.apply(variables, batch["feats"],
                      method=Captioner.encoding_phase)
    inputs = model.apply(variables, enc, {"category": category},
                         method=Captioner.prepare_inputs_for_decoder)
    seq = _roll_tokens(opt, 2, seed=6)
    full = per_step_logits_full(model, variables, inputs, seq)
    kv = per_step_logits_kv(model, variables, inputs, seq, opt["max_len"])
    np.testing.assert_allclose(kv, full, atol=2e-4)


def test_rpe_kv_logits_match_full_forward():
    """Relative position bias: full-forward bias matrix vs the decode
    step's per-position row selection must agree."""
    opt = tiny_opt(vocab_size=50, num_hidden_layers_decoder=2, beam_size=1,
                   topk=1)
    opt["RPE"] = True
    opt["RPE_keep_abs_pos"] = False
    opt["max_relative_position"] = 6
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2, seed=8)

    enc = model.apply(variables, batch["feats"],
                      method=Captioner.encoding_phase)
    inputs = model.apply(variables, enc, {},
                         method=Captioner.prepare_inputs_for_decoder)
    seq = _roll_tokens(opt, 2, seed=9)
    full = per_step_logits_full(model, variables, inputs, seq)
    kv = per_step_logits_kv(model, variables, inputs, seq, opt["max_len"])
    np.testing.assert_allclose(kv, full, atol=2e-4)


@pytest.mark.parametrize("use_attr_type,extra", [
    ("emb_concat", {}),
    ("pp_emb_concat", {}),
    # hybrid bias + prefix/att is invalid (bias length excludes the
    # prefix / attr rows), same as MODES above
    ("_prefix", {"add_hybrid_attention_bias": False}),
    # attr cross-attention: attr K/V stays [B], grouped attend folds beam
    ("_att", {"add_hybrid_attention_bias": False}),
    ("emb_att", {"add_hybrid_attention_bias": False}),
])
def test_beam_grouped_cache_matches_enlarged(use_attr_type, extra):
    """Beam-shared cross-K/V layout (init_decode_state(beam_size=k) on
    UN-enlarged inputs, cross/attr K/V at [B]) must produce the same
    per-step logits as the naive layout (auto_enlarge then beam_size=1,
    every K/V duplicated to [B*beam])."""
    from care_tpu.decoding.translator import auto_enlarge

    opt = tiny_opt(
        task="CARE", decoder_modality_flags="V", predictor_modality_flags="V",
        vocab_size=50, num_hidden_layers_decoder=2, beam_size=1, topk=1,
        attribute_prediction_k=16, use_attr_topk=4,
        final_overrides={"use_attr_type": use_attr_type, **extra},
    )
    B, beam = 3, 4
    model, variables, batch = tiny_model_and_batch(opt, batch_size=B, seed=13)
    enc = model.apply(variables, batch["feats"],
                      method=Captioner.encoding_phase)
    inputs = model.apply(variables, enc, {},
                         method=Captioner.prepare_inputs_for_decoder)
    enlarged = auto_enlarge(inputs, beam)

    state_naive = model.apply(variables, enlarged, opt["max_len"],
                              method=Captioner.init_decode_state)
    state_grouped = model.apply(variables, inputs, opt["max_len"], beam,
                                method=Captioner.init_decode_state)

    seq = _roll_tokens(opt, B * beam, seed=17)
    for t in range(4):
        ln, state_naive, _ = model.apply(
            variables, seq[:, t], jnp.asarray(t), state_naive, enlarged,
            method=Captioner.decode_step)
        lg, state_grouped, _ = model.apply(
            variables, seq[:, t], jnp.asarray(t), state_grouped, enlarged,
            method=Captioner.decode_step)
        np.testing.assert_allclose(np.asarray(lg), np.asarray(ln),
                                   atol=2e-5, err_msg=f"{use_attr_type} t={t}")
