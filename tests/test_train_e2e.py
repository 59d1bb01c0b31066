"""End-to-end slice: synthetic corpus -> train -> validate -> test.

Exercises every layer once (config, data, model, loss, optimizer, decode,
COCO metrics, checkpointing), mirroring SURVEY.md §7 step 3.
"""

import os

import numpy as np
import pytest

from care_tpu.config import get_opt
from care_tpu.data import get_loader
from care_tpu.data.corpus import write_synthetic_dataset, load_info_corpus
from care_tpu.training.trainer import Trainer


def make_synthetic_env(tmp_path, task="Base", method="Transformer",
                       extra=None):
    overrides = {
        "dataset": "MSRVTT", "method": method, "task": task, "feats": "ViT",
        "modality": "mi", "max_len": 12, "n_frames": 8,
        "batch_size": 8, "beam_size": 2, "epochs": 2,
        "num_hidden_layers_decoder": 1, "attribute_prediction_k": 25,
        "use_attr_topk": 5,
    }
    if extra:
        overrides.update(extra)
    opt = get_opt(overrides, read_vocab=False, resolve_paths=False)
    opt["dim_m"], opt["dim_i"] = 32, 16

    root, paths, corpus, refs = write_synthetic_dataset(
        str(tmp_path), opt, n_videos=20)
    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])
    opt["checkpoint_path"] = os.path.join(str(tmp_path), "exps")
    return opt, corpus, refs


def test_train_transformer_base(tmp_path):
    opt, corpus, refs = make_synthetic_env(tmp_path)
    train_loader = get_loader(opt, "train")
    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True)

    trainer = Trainer(opt, train_loader=train_loader, val_loader=val_loader,
                      references=refs, vocab=corpus["info"]["itow"])
    first = next(iter(train_loader))
    trainer.init_model(first)
    trainer._build_tx(len(train_loader))

    # loss decreases over a few epochs on the tiny corpus
    losses = []
    import jax
    rng = jax.random.PRNGKey(0)
    trainer._train_step_fn = trainer._make_train_step()
    from care_tpu.training.trainer import device_batch
    for epoch in range(4):
        train_loader.set_epoch(epoch)
        epoch_losses = []
        for batch in train_loader:
            rng, k = jax.random.split(rng)
            b = device_batch(batch)
            params = trainer.variables["params"]
            extra = {k2: v for k2, v in trainer.variables.items()
                     if k2 != "params"}
            params, mutated, trainer.opt_state, loss, _, _ = \
                trainer._train_step_fn(params, extra, trainer.opt_state,
                                       b, k, 0.0)
            trainer.variables = {"params": params, **extra, **mutated}
            epoch_losses.append(float(loss))
        losses.append(np.mean(epoch_losses))
    assert losses[-1] < losses[0], losses

    scores = trainer.validate(0)
    assert "CIDEr" in scores and np.isfinite(scores["CIDEr"])
    assert "Sum" in scores


def test_train_care_config(tmp_path):
    opt, corpus, refs = make_synthetic_env(
        tmp_path, task="CARE",
        extra={"decoder_modality_flags": "V",
               "predictor_modality_flags": "V", "epochs": 1})
    # CARE: modality mi, concepts on, dual optimizer
    assert opt["wrapper"] == "MultipleOptimizerModel"
    assert "attribute" in opt["crits"]

    train_loader = get_loader(opt, "train")
    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True)
    trainer = Trainer(opt, train_loader=train_loader, val_loader=val_loader,
                      references=refs, vocab=corpus["info"]["itow"])
    trainer.fit(epochs=1)
    assert trainer.ckpt_manager.best_path or True  # ran through

    # dual-optimizer switch works
    trainer._maybe_switch_optimizer(opt["lowlr_start_epoch"])
    assert trainer._switched
