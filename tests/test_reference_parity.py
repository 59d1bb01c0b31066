"""Logit-level parity against the ACTUAL reference PyTorch model.

The reference's model code is pure torch (no Lightning needed for the
forward); we instantiate it in place, transplant its weights into our flax
Captioner, feed identical inputs, and require near-identical logits. This
pins LayerNorm placement, residual order, mask semantics, embedding
composition, noisy-OR arithmetic and the hybrid attention bias — end to
end.
"""

import copy

import numpy as np
import pytest

from care_tpu.config import get_opt

from reference_adapter import import_reference, transplant_transformer_weights


def _ref_opt(care=False):
    opt = {
        "decoder": "TransformerDecoder", "cls_head": "NaiveHead",
        "decoding_type": "ARFormer", "fusion": "temporal_concat",
        "encoder": "Embedder", "modality": "mi",
        "dim_m": 24, "dim_i": 16, "dim_hidden": 64,
        "encoder_dropout_prob": 0.0, "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0,
        "num_attention_heads": 4, "intermediate_size": 128,
        "hidden_act": "relu", "layer_norm_eps": 1e-12,
        "num_hidden_layers_decoder": 2, "vocab_size": 40,
        "max_len": 12, "n_frames": 8, "trainable_pe": True,
        "enhance_input": 2, "watch": 0, "crits": ["lang"],
        "feats": "", "retrieval_topk": 20,
    }
    if care:
        opt.update({
            "crits": ["lang", "attribute"],
            "attribute_prediction": True,
            "attribute_prediction_k": 16,
            "attribute_prediction_flags": "V",
            "attribute_prediction_mean_pooling": True,
            "attribute_prediction_channel_concat": True,
            "use_attr": True,
            "use_attr_type": "emb_concat",
            "use_attr_topk": 4,
            "use_attr_flags": "G1Lc",
            "add_hybrid_attention_bias": True,
            "attr_layer_pos": "cross2attr",
            "predictors_to_be_added": ["SemanticContainer"],
        })
    return opt


def _our_opt(ref_opt):
    from care_tpu.config import default_opt
    opt = default_opt()
    opt.update(copy.deepcopy(ref_opt))
    return opt


@pytest.mark.parametrize("care", [False, True])
def test_logits_match_reference_torch_model(care):
    torch = pytest.importorskip("torch")
    get_framework = import_reference()

    ref_opt = _ref_opt(care=care)
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    B = 3
    rs = np.random.RandomState(7)
    feats_np = [rs.randn(B, 8, 24).astype(np.float32),
                rs.randn(B, 8, 16).astype(np.float32)]
    input_ids_np = rs.randint(6, 40, (B, 11)).astype(np.int64)

    with torch.no_grad():
        batch_t = {"feats": [torch.from_numpy(f) for f in feats_np],
                   "input_ids": torch.from_numpy(input_ids_np)}
        ref_out = ref_model(batch_t)
    ref_logits = ref_out["logits"].numpy()

    # ---- our model with transplanted weights ----------------------------
    import jax
    import jax.numpy as jnp
    from care_tpu.models import build_captioner

    opt = _our_opt(ref_opt)
    model = build_captioner(opt)
    batch = {"feats": [jnp.asarray(f) for f in feats_np],
             "input_ids": jnp.asarray(input_ids_np.astype(np.int32))}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch,
                           deterministic=True)
    params = jax.tree.map(np.asarray, variables["params"])
    params = transplant_transformer_weights(ref_model.state_dict(), params,
                                            ref_opt)
    out = model.apply({"params": params}, batch, deterministic=True)
    our_logits = np.asarray(out["logits"])

    assert our_logits.shape == ref_logits.shape
    np.testing.assert_allclose(our_logits, ref_logits, atol=2e-4,
                               rtol=1e-4)

    if care:
        np.testing.assert_allclose(np.asarray(out["preds_attr"]),
                                   ref_out["preds_attr"].numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["semantic_labels"]),
                                   ref_out["semantic_labels"].numpy())


def test_nab_nar_logits_match_reference():
    """NAB: HighWayBN encoder (BatchNorm running stats) + NAR decoder
    (no causal mask, mean-pool input enhancement)."""
    torch = pytest.importorskip("torch")
    from reference_adapter import (transplant_highwaybn_encoder,
                                   transplant_transformer_weights)
    get_framework = import_reference()

    ref_opt = _ref_opt()
    ref_opt.update({"encoder": "EncoderWithHighWayBN",
                    "decoding_type": "NARFormer", "enhance_input": 2})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()   # BN uses running stats; dropout off

    B = 3
    rs = np.random.RandomState(5)
    feats_np = [rs.randn(B, 8, 24).astype(np.float32),
                rs.randn(B, 8, 16).astype(np.float32)]
    # NAR canvas: MASK tokens with PAD tail
    canvas = np.full((B, 11), 4, dtype=np.int64)
    canvas[:, 8:] = 0

    with torch.no_grad():
        ref_out = ref_model({"feats": [torch.from_numpy(f)
                                       for f in feats_np],
                             "input_ids": torch.from_numpy(canvas)})
    ref_logits = ref_out["logits"].numpy()

    import jax
    import jax.numpy as jnp
    from care_tpu.models import build_captioner

    opt = _our_opt(ref_opt)
    model = build_captioner(opt)
    batch = {"feats": [jnp.asarray(f) for f in feats_np],
             "input_ids": jnp.asarray(canvas.astype(np.int32))}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch,
                           deterministic=True)
    variables = jax.tree.map(np.asarray, variables)
    variables = transplant_highwaybn_encoder(ref_model.state_dict(),
                                             variables, ref_opt)
    variables["params"] = transplant_transformer_weights(
        ref_model.state_dict(), variables["params"],
        {**ref_opt, "modality": ""})  # encoder handled above
    out = model.apply(variables, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits,
                               atol=3e-4, rtol=1e-4)


def test_salstm_logits_match_reference():
    torch = pytest.importorskip("torch")
    from reference_adapter import transplant_salstm_weights
    get_framework = import_reference()

    ref_opt = _ref_opt()
    ref_opt.update({"decoder": "SingleLayerRNNDecoder", "rnn_type": "lstm",
                    "scheduled_sampling_start": -1})
    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    B = 3
    rs = np.random.RandomState(9)
    feats_np = [rs.randn(B, 8, 24).astype(np.float32),
                rs.randn(B, 8, 16).astype(np.float32)]
    input_ids_np = rs.randint(6, 40, (B, 11)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref_model({"feats": [torch.from_numpy(f)
                                       for f in feats_np],
                             "input_ids": torch.from_numpy(input_ids_np)})
    ref_logits = ref_out["logits"].numpy()

    import jax
    import jax.numpy as jnp
    from care_tpu.models import build_captioner

    opt = _our_opt(ref_opt)
    model = build_captioner(opt)
    batch = {"feats": [jnp.asarray(f) for f in feats_np],
             "input_ids": jnp.asarray(input_ids_np.astype(np.int32))}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng,
                            "sampling": rng}, batch, deterministic=True)
    params = jax.tree.map(np.asarray, variables["params"])
    params = transplant_salstm_weights(ref_model.state_dict(), params,
                                       ref_opt)
    out = model.apply({"params": params}, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits,
                               atol=3e-4, rtol=1e-4)
