"""Checkpoint round-trip, top-k management, reproducibility."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from care_tpu.training.checkpoints import (save_checkpoint, load_checkpoint,
                                           CheckpointManager)
from care_tpu.models.framework import Captioner

from helpers import tiny_opt, tiny_model_and_batch


def test_checkpoint_roundtrip(tmp_path):
    opt = tiny_opt(vocab_size=40)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    path = os.path.join(str(tmp_path), "m.ckpt")
    save_checkpoint(path, variables, opt, {"epoch": 3})

    restored, ropt, meta = load_checkpoint(path, variables)
    assert meta["epoch"] == 3
    assert ropt["dim_hidden"] == opt["dim_hidden"]
    out1 = model.apply(variables, batch, deterministic=True,
                       collect_aux=False)["logits"]
    out2 = model.apply(restored, batch, deterministic=True,
                       collect_aux=False)["logits"]
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_checkpoint_load_without_template(tmp_path):
    opt = tiny_opt(vocab_size=40)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=1)
    path = os.path.join(str(tmp_path), "m.ckpt")
    save_checkpoint(path, variables, opt, {})
    raw, ropt, _ = load_checkpoint(path)
    assert "params" in raw


def test_topk_manager_keeps_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path), monitor_metric="CIDEr",
                            save_topk=2, start_saving_epoch=1)
    variables = {"params": {"w": jnp.zeros(3)}}
    # epoch 0 suppressed by start_saving_epoch (only `last` written)
    mgr.on_epoch_end(0, variables, {}, {"CIDEr": 9.0})
    assert len(mgr.topk) == 0
    mgr.on_epoch_end(1, variables, {}, {"CIDEr": 1.0})
    mgr.on_epoch_end(2, variables, {}, {"CIDEr": 3.0})
    mgr.on_epoch_end(3, variables, {}, {"CIDEr": 2.0})   # evicts 1.0
    metrics = sorted(m for m, _ in mgr.topk)
    assert metrics == [2.0, 3.0]
    assert mgr.best_path and os.path.exists(mgr.best_path)
    _, _, meta = load_checkpoint(mgr.best_path)
    assert meta["scores"]["CIDEr"] == 3.0
    assert os.path.exists(os.path.join(str(tmp_path), "last.ckpt"))


def test_loading_module_restores_into_template(tmp_path):
    from care_tpu.models.loading import load_model
    opt = tiny_opt(vocab_size=40)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    path = os.path.join(str(tmp_path), "best.ckpt")
    save_checkpoint(path, variables, opt, {})

    models, lopt = load_model(path, do_replace_paths=False)
    (m2, v2), = models
    out1 = model.apply(variables, batch, deterministic=True,
                       collect_aux=False)["logits"]
    out2 = m2.apply(v2, batch, deterministic=True,
                    collect_aux=False)["logits"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_init_reproducible():
    opt = tiny_opt(vocab_size=40)
    m1, v1, _ = tiny_model_and_batch(opt, batch_size=2, seed=9)
    m2, v2, _ = tiny_model_and_batch(opt, batch_size=2, seed=9)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
