"""Encoder variants + misc config dimensions not covered elsewhere."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import tiny_opt, tiny_model_and_batch


@pytest.mark.parametrize("encoder", ["ReLUEmbedder", "MultiTransformerEncoder",
                                     "TransformerEncoder"])
def test_encoder_variants_forward(encoder):
    opt = tiny_opt(vocab_size=40)
    opt["encoder"] = encoder
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    out = model.apply(variables, batch, deterministic=True,
                      collect_aux=False)
    assert out["logits"].shape == (2, opt["max_len"] - 1, 40)


def test_identity_encoder_single_modality():
    opt = tiny_opt(vocab_size=40, modality="m")
    opt["encoder"] = "Identity"
    opt["dim_m"] = opt["dim_hidden"]  # identity requires matching width
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    out = model.apply(variables, batch, deterministic=True,
                      collect_aux=False)
    assert out["logits"].shape[-1] == 40


def test_voe_method_decodes():
    from care_tpu.decoding import get_translator
    opt = tiny_opt(method="VOE", vocab_size=40, beam_size=2)
    assert opt["encoder"] == "VOE" and opt["decoder"] == "VOERNNDecoder"
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    tr = get_translator(opt)
    hyps, _ = tr.translate_batch([(model, variables)],
                                 {"feats": batch["feats"]})
    assert len(hyps) == 2


def test_rnn_with_category_one_hot():
    opt = tiny_opt(method="SALSTM", vocab_size=40, with_category=True)
    assert opt["with_category"]
    model, variables0, batch = tiny_model_and_batch(opt, batch_size=2)
    # RNN decoders consume a one-hot category vector (reference
    # dataloader.py:784-789)
    one_hot = np.zeros((2, opt["num_category"]), np.float32)
    one_hot[0, 3] = 1
    one_hot[1, 7] = 1
    batch = dict(batch)
    batch["category"] = jnp.asarray(one_hot)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng,
                            "sampling": rng}, batch)
    out = model.apply(variables, batch, deterministic=True)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_watch_windowed_causal_mask():
    from care_tpu.models.decoders import causal_bias
    b = np.asarray(causal_bias(6, watch=2))[0, 0]
    # row 4 sees positions {3, 4} only: future masked AND j <= i-watch
    # masked (reference get_subsequent_mask with tril(diagonal=-watch))
    assert b[4, 4] == 0 and b[4, 3] == 0
    assert b[4, 2] < -1e8  # j == i - watch is masked (j <= i - watch)
    assert b[4, 5] < -1e8
    # row 1 unaffected by the window (len < watch from start)
    assert b[1, 0] == 0 and b[1, 1] == 0


def test_bn1d_train_mode_matches_torch_exactly():
    """Torch BatchNorm1d semantics in train mode: normalise with the
    BIASED batch variance, update running_var with the UNBIASED one
    (flax's nn.BatchNorm stores the biased variance — a 1/(n-1) drift
    that would surface as eval-time mismatch after training)."""
    torch = pytest.importorskip("torch")
    import jax
    from care_tpu.models.encoders import BN1d

    rs = np.random.RandomState(0)
    H, B, T = 6, 4, 3
    x = rs.randn(B, T, H).astype(np.float32)

    bn = BN1d(H)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tbn = torch.nn.BatchNorm1d(H, eps=1e-5, momentum=0.1)
    tbn.train()

    # two train-mode updates (different batches), then one eval pass
    vs = variables
    for seed in (1, 2):
        xb = rs.randn(B, T, H).astype(np.float32)
        out, mut = bn.apply(vs, jnp.asarray(xb), deterministic=False,
                            mutable=["batch_stats"])
        tout = tbn(torch.from_numpy(xb).reshape(-1, H))
        np.testing.assert_allclose(np.asarray(out).reshape(-1, H),
                                   tout.detach().numpy(), atol=2e-5)
        vs = {**vs, **mut}

    np.testing.assert_allclose(
        np.asarray(vs["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vs["batch_stats"]["bn"]["var"]),
        tbn.running_var.numpy(), rtol=1e-6)

    tbn.eval()
    xe = rs.randn(B, T, H).astype(np.float32)
    oe = bn.apply(vs, jnp.asarray(xe), deterministic=True)
    te = tbn(torch.from_numpy(xe).reshape(-1, H))
    np.testing.assert_allclose(np.asarray(oe).reshape(-1, H),
                               te.detach().numpy(), atol=2e-5)
