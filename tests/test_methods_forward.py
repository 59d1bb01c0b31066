"""Every method preset forwards + trains one step (capability matrix)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from care_tpu.training.losses import Criterion
from care_tpu.models.framework import Captioner

from helpers import tiny_opt, tiny_model_and_batch


def _loss_step(opt, model, variables, batch):
    criterion = Criterion(opt)
    # minimal targets
    labels = batch["input_ids"]
    if isinstance(labels, list):
        results_extra = {"labels": labels}
    else:
        results_extra = {"labels": labels}
    extras = dict(results_extra)
    if "attribute" in opt["crits"]:
        extras["labels_attr"] = jnp.asarray(
            np.random.RandomState(0).randint(
                0, 2, (labels[0].shape[0] if isinstance(labels, list)
                       else labels.shape[0],
                       opt["attribute_prediction_k"])), jnp.float32)
    if "length" in opt["crits"]:
        bs = (labels[0].shape[0] if isinstance(labels, list)
              else labels.shape[0])
        t = np.zeros((bs, opt["max_len"]), np.float32)
        t[:, 5] = 1.0
        extras["length_target"] = jnp.asarray(t)

    def loss_fn(params):
        vs = {"params": params,
              **{k: v for k, v in variables.items() if k != "params"}}
        out = model.apply(vs, batch, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(0),
                                "sampling": jax.random.PRNGKey(1)},
                          **({"mutable": ["batch_stats"]}
                             if "batch_stats" in variables else {}))
        if isinstance(out, tuple):
            out = out[0]
        total, _, _ = criterion(
            {**out, **batch, **extras},
            lambda f, fl: model.apply(vs, f, fl,
                                      method=Captioner.project_attribute))
        return total

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    # at least some grads flow
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree.leaves(grads))
    assert gnorm > 0


@pytest.mark.parametrize("method", ["Transformer", "SALSTM", "TopDown",
                                    "VOE", "ARB", "NAB"])
def test_method_forward_and_grad(method):
    opt = tiny_opt(method=method, vocab_size=40)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    if opt["decoding_type"] == "NARFormer":
        batch["input_ids"] = jnp.full_like(batch["input_ids"], 4)
    _loss_step(opt, model, variables, batch)


def test_nacf_two_stage_forward():
    opt = tiny_opt(method="NACF", vocab_size=40)
    assert opt["visual_word_generation"]
    model, variables, batch0 = tiny_model_and_batch(opt, batch_size=2)
    B, L = batch0["input_ids"].shape
    # two-stage inputs: [visual-word canvas, MLM canvas]
    vis = jnp.full((B, L), 5, jnp.int32)
    mlm = jnp.full((B, L), 4, jnp.int32)
    batch = dict(batch0)
    batch["input_ids"] = [vis, mlm]
    batch["labels"] = [jnp.full((B, L), 4, jnp.int32), batch0["input_ids"]]
    out = model.apply(variables, batch, deterministic=True)
    assert isinstance(out["logits"], list) and len(out["logits"]) == 2
    _loss_step(opt, model, variables, batch)


def test_pointer_gen_forward():
    opt = tiny_opt(method="PointerGen", vocab_size=40)
    assert opt["pointer"] == "Pointer" and "t" in opt["modality"]
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    out = model.apply(variables, batch, deterministic=True)
    assert "probs" in out
    probs = np.asarray(out["probs"])
    # probabilities approximately normalised
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)


def test_care_pointer_combination():
    opt = tiny_opt(method="PointerGen", task="CARE", vocab_size=40,
                   decoder_modality_flags="V",
                   predictor_modality_flags="V")
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    out = model.apply(variables, batch, deterministic=True)
    assert "probs" in out and "preds_attr" in out


@pytest.mark.parametrize("fusion", ["addition", "channel_concat"])
def test_transformer_fusion_modes(fusion):
    opt = tiny_opt(vocab_size=40)
    opt["fusion"] = fusion
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    out = model.apply(variables, batch, deterministic=True,
                      collect_aux=False)
    assert out["logits"].shape == (2, opt["max_len"] - 1, 40)


@pytest.mark.parametrize("fusion", ["none", "addition"])
def test_rnn_fusion_modes_decode(fusion):
    from care_tpu.decoding import get_translator
    opt = tiny_opt(method="SALSTM", vocab_size=40, beam_size=2)
    opt["fusion"] = fusion
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    out = model.apply(variables, batch, deterministic=True)
    assert out["logits"].shape[-1] == 40
    tr = get_translator(opt)
    hyps, _ = tr.translate_batch([(model, variables)],
                                 {"feats": batch["feats"]})
    assert len(hyps) == 2


def test_pointer_gen_trains_with_copy_probs():
    opt = tiny_opt(method="PointerGen", vocab_size=40)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    _loss_step(opt, model, variables, batch)


def test_vap_sparse_sampling_trains():
    # VAP: visual concept detection with train-time sparse frame sampling
    opt = tiny_opt(task="VAP", vocab_size=40, attribute_prediction_k=16)
    assert opt["attribute_prediction_sparse_sampling"]
    assert "attribute" in opt["crits"]
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    _loss_step(opt, model, variables, batch)


def test_dap_dual_flags_trains():
    # DAP: V + I flags -> decoder-side NoisyOrMILWithEmbs on input_embs
    opt = tiny_opt(task="DAP", vocab_size=40, attribute_prediction_k=16)
    assert opt["attribute_prediction_flags"] == "VI"
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    _loss_step(opt, model, variables, batch)


def test_tap_rnn_sentence_flag_trains():
    # TAP_RNN: flag 'S' (sentence embeddings) + TextPostProcesser (PE+LN)
    opt = tiny_opt(task="TAP_RNN", vocab_size=40,
                   attribute_prediction_k=16)
    assert opt["attribute_prediction_flags"] == "S"
    assert opt["TAP_ln"] and opt["TAP_pos"]
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    _loss_step(opt, model, variables, batch)


def test_shared_projection_heads():
    opt = tiny_opt(task="DAP", vocab_size=40, attribute_prediction_k=16)
    opt["attribute_prediction_share_prj"] = True
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    _loss_step(opt, model, variables, batch)


def test_multilevel_attention_rnn():
    opt = tiny_opt(method="SALSTM", vocab_size=40)
    opt["with_multileval_attention"] = True
    opt["fusion"] = "none"   # multi-feat temporal->modality attention
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    out = model.apply(variables, batch, deterministic=True)
    assert out["logits"].shape[-1] == 40
