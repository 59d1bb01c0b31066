"""vocab_xent_stats == dense logits statistics, values AND gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from care_tpu.ops.fused_xent import vocab_xent_stats


def _dense(h, W, b, labels):
    logits = h @ W
    if b is not None:
        logits = logits + b
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    lab = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    tot = logits.sum(-1)
    amax = logits.argmax(-1)
    return lse, lab, tot, amax


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("V,chunk", [(96, 32), (200, 64), (217, 64)])
@pytest.mark.parametrize("with_bias", [False, True])
def test_forward_matches_dense(V, chunk, with_bias, backend):
    rng = np.random.RandomState(0)
    B, L, H = 3, 5, 16
    h = jnp.asarray(rng.randn(B, L, H), jnp.float32)
    W = jnp.asarray(rng.randn(H, V) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(V) * 0.2, jnp.float32) if with_bias else None
    labels = jnp.asarray(rng.randint(0, V, (B, L)), jnp.int32)

    want = _dense(h, W, b, labels)
    got = vocab_xent_stats(h, W, b, labels, chunk, backend, 8,
                           backend == "pallas")
    np.testing.assert_allclose(got[0], want[0], rtol=0, atol=1e-5)  # lse
    np.testing.assert_allclose(got[1], want[1], rtol=0, atol=1e-5)  # label
    np.testing.assert_allclose(got[2], want[2], rtol=1e-5)          # sum
    np.testing.assert_array_equal(got[3], want[3])                  # argmax


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("with_bias", [False, True])
def test_gradients_match_dense(with_bias, backend):
    rng = np.random.RandomState(1)
    B, L, H, V, chunk = 2, 4, 12, 150, 64
    h = jnp.asarray(rng.randn(B, L, H), jnp.float32)
    W = jnp.asarray(rng.randn(H, V) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(V) * 0.2, jnp.float32) if with_bias else None
    labels = jnp.asarray(rng.randint(0, V, (B, L)), jnp.int32)
    # the language-loss shape: smoothed CE summed with a position mask
    mask = jnp.asarray(rng.rand(B, L) > 0.3, jnp.float32)
    eps = 0.1

    def loss_fused(h, W, b):
        lse, lab, tot, _ = vocab_xent_stats(h, W, b, labels, chunk,
                                            backend, 8,
                                            backend == "pallas")
        nll = lse - lab
        smooth = lse - tot / V
        return jnp.sum(((1 - eps) * nll + eps * smooth) * mask)

    def loss_dense(h, W, b):
        logits = (h @ W + (b if b is not None else 0.0)).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        smooth = -logp.mean(-1)
        return jnp.sum(((1 - eps) * nll + eps * smooth) * mask)

    argnums = (0, 1, 2) if with_bias else (0, 1)
    args = (h, W, b) if with_bias else (h, W, None)

    lf, gf = jax.value_and_grad(loss_fused, argnums)(*args)
    ld, gd = jax.value_and_grad(loss_dense, argnums)(*args)
    np.testing.assert_allclose(lf, ld, rtol=1e-6)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-6)


def test_trainer_fused_xent_matches_dense_path(tmp_path):
    """CARE config through the REAL jitted train step, fused_xent on vs
    off: step-0 loss identical, next steps within online-softmax rounding
    drift.  (Beyond ~3 optimizer steps the trajectories diverge
    chaotically through the concept top-k prefix selection — a discrete
    flip any two rounding-nonidentical implementations produce — so
    whole-epoch averages are not comparable.)"""
    from care_tpu.data import get_loader
    from care_tpu.training.trainer import Trainer, device_batch
    from test_train_e2e import make_synthetic_env

    def make(fused):
        opt, corpus, refs = make_synthetic_env(
            tmp_path / ("f" if fused else "d"), task="CARE",
            extra={"decoder_modality_flags": "V",
                   "predictor_modality_flags": "V", "epochs": 1,
                   "check_val_every_n_epoch": 10})
        opt["fused_xent"] = fused
        opt["fused_xent_chunk"] = 32
        loader = get_loader(opt, "train")
        tr = Trainer(opt, train_loader=loader, references=refs,
                     vocab=corpus["info"]["itow"])
        tr.init_model(next(iter(loader)))
        tr._build_tx(len(loader))
        tr._train_step_fn = tr._make_train_step()
        return tr, loader

    trd, ld = make(False)
    trf, lf = make(True)
    rng = jax.random.PRNGKey(1)
    ld.set_epoch(0)
    lf.set_epoch(0)
    diffs = []
    for i, (bd, bf) in enumerate(zip(ld, lf)):
        rng, k = jax.random.split(rng)
        losses = []
        for tr, b in ((trd, bd), (trf, bf)):
            bb = device_batch(b)
            params = tr.variables["params"]
            extra = {k2: v for k2, v in tr.variables.items()
                     if k2 != "params"}
            params, mutated, tr.opt_state, loss, _, metrics = \
                tr._train_step_fn(params, extra, tr.opt_state, bb, k, 0.0)
            tr.variables = {"params": params, **extra, **mutated}
            losses.append(float(loss))
        diffs.append(abs(losses[0] - losses[1]))
        if i >= 2:
            break
    assert diffs[0] == 0.0, diffs
    assert all(d < 1e-3 for d in diffs), diffs


def test_argmax_tie_breaks_lowest_index_across_chunks():
    H, V, chunk = 4, 128, 32
    h = jnp.ones((1, H), jnp.float32)
    # identical columns at indices 10 and 97 (different chunks)
    Wcols = np.zeros((H, V), np.float32)
    Wcols[:, 10] = 0.5
    Wcols[:, 97] = 0.5
    W = jnp.asarray(Wcols)
    labels = jnp.zeros((1,), jnp.int32)
    _, _, _, amax = vocab_xent_stats(h, W, None, labels, chunk)
    assert int(amax[0]) == 10


def test_fused_xent_auto_threshold(tmp_path):
    """'auto' fuses only when the dense [B, L, V] logits + grad clear
    the memory threshold (bench A/B: the dense step is faster at
    flagship shapes, so small configs must stay dense)."""
    from care_tpu.data import get_loader
    from care_tpu.training.trainer import Trainer
    from test_train_e2e import make_synthetic_env

    def gate(extra):
        opt, corpus, refs = make_synthetic_env(
            tmp_path / str(len(list(tmp_path.iterdir()))), task="CARE",
            extra={"decoder_modality_flags": "V",
                   "predictor_modality_flags": "V", "epochs": 1,
                   **extra})
        loader = get_loader(opt, "train")
        tr = Trainer(opt, train_loader=loader, references=refs,
                     vocab=corpus["info"]["itow"])
        tr.init_model(next(iter(loader)))
        tr._build_tx(len(loader))
        tr._make_train_step()
        return tr._fused_xent

    # synthetic env: tiny vocab/batch -> dense logits far below 512 MB
    assert gate({"fused_xent": "auto"}) is False
    # force via the threshold: 0 MB means any shape fuses
    assert gate({"fused_xent": "auto",
                 "fused_xent_auto_threshold_mb": 0}) is True
    # explicit True still forces regardless of size
    assert gate({"fused_xent": True}) is True
