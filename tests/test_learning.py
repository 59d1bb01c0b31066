"""End-to-end learning test: with features correlated to caption content,
training must lift validation CIDEr substantially — proves the whole stack
(data -> model -> loss -> optimizer -> beam decode -> metrics) optimizes."""

import os

import numpy as np
import pytest

from care_tpu.config import get_opt
from care_tpu.data import get_loader
from care_tpu.data.corpus import write_synthetic_dataset
from care_tpu.training.trainer import Trainer


def _learning_env(tmp_path, task="Base", extra=None):
    overrides = {
        "dataset": "MSRVTT", "method": "Transformer", "task": task,
        "feats": "ViT", "modality": "mi", "max_len": 12, "n_frames": 8,
        "batch_size": 16, "beam_size": 3, "epochs": 12,
        "learning_rate": 1e-3, "hidden_dropout_prob": 0.1,
        "encoder_dropout_prob": 0.1, "attention_probs_dropout_prob": 0.0,
        "num_hidden_layers_decoder": 1,
        "final_overrides": {"dim_hidden": 128, "intermediate_size": 256,
                            "num_attention_heads": 4,
                            "hidden_dropout_prob": 0.1,
                            "encoder_dropout_prob": 0.1,
                            "attention_probs_dropout_prob": 0.0,
                            **(extra or {})},
    }
    opt = get_opt(overrides, read_vocab=False, resolve_paths=False)
    opt["dim_m"], opt["dim_i"] = 24, 24
    return opt


@pytest.mark.slow
def test_cider_improves_with_training(tmp_path):
    opt = _learning_env(tmp_path)

    root, paths, corpus, refs = write_synthetic_dataset(
        str(tmp_path), opt, n_videos=60, correlated=True)
    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])
    opt["checkpoint_path"] = os.path.join(str(tmp_path), "exps")

    train_loader = get_loader(opt, "train")
    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True)
    trainer = Trainer(opt, train_loader=train_loader, val_loader=val_loader,
                      references=refs, vocab=corpus["info"]["itow"])

    trainer.init_model(next(iter(train_loader)))
    before = trainer.validate(0)
    trainer.fit(epochs=opt["epochs"])
    after = trainer.validate(opt["epochs"])

    # untrained model produces junk; trained model must clearly beat it
    assert after["CIDEr"] > before["CIDEr"] + 0.2, (before, after)
    assert after["Bleu_4"] > before["Bleu_4"], (before, after)


@pytest.mark.slow
def test_care_config_learns(tmp_path):
    """Full CARE (concepts + GSG + LSG + dual optimizer): CIDEr lifts AND
    concept F1@5 clearly beats chance after training."""
    opt2 = get_opt({
        "dataset": "MSRVTT", "method": "Transformer", "task": "CARE",
        "feats": "ViT", "decoder_modality_flags": "V",
        "predictor_modality_flags": "V", "max_len": 12, "n_frames": 8,
        "batch_size": 16, "beam_size": 3, "epochs": 12,
        "attribute_prediction_k": 20, "use_attr_topk": 5,
        "final_overrides": {"dim_hidden": 128, "intermediate_size": 256,
                            "num_attention_heads": 4,
                            "hidden_dropout_prob": 0.1,
                            "encoder_dropout_prob": 0.1,
                            "attention_probs_dropout_prob": 0.0,
                            "learning_rate": 1e-3,
                            "lowlr_start_epoch": 6},
    }, read_vocab=False, resolve_paths=False)
    opt = opt2
    opt["dim_m"], opt["dim_i"] = 24, 24

    root, paths, corpus, refs = write_synthetic_dataset(
        str(tmp_path), opt, n_videos=60, correlated=True)
    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])
    opt["checkpoint_path"] = os.path.join(str(tmp_path), "exps")

    train_loader = get_loader(opt, "train")
    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True)
    trainer = Trainer(opt, train_loader=train_loader, val_loader=val_loader,
                      references=refs, vocab=corpus["info"]["itow"])
    trainer.init_model(next(iter(train_loader)))
    before = trainer.validate(0)
    trainer.fit(epochs=12)
    after = trainer.validate(12)
    assert trainer._switched  # dual-optimizer handover happened
    assert after["CIDEr"] > before["CIDEr"] + 0.2, (before, after)
    assert after.get("F1-05", 0) > 0.3, after  # concepts detected


@pytest.mark.slow
def test_bf16_decode_agreement_on_trained_model(tmp_path):
    """bf16 serving decode (compute_dtype_decode) vs f32 on a TRAINED
    model: with peaked learned distributions (unlike the untrained bench
    model, where every beam candidate is a near-tie) captions must agree
    at high rate and scores must match closely — the quality-neutrality
    evidence for the bf16 serving mode."""
    import jax.numpy as jnp
    from care_tpu.decoding import get_translator

    opt = _learning_env(tmp_path)
    root, paths, corpus, refs = write_synthetic_dataset(
        str(tmp_path), opt, n_videos=60, correlated=True)
    opt["info_corpus"] = os.path.join(root, "info_corpus.pkl")
    opt["reference"] = os.path.join(root, "refs.pkl")
    for c, p in paths.items():
        opt[f"feats_{c}"] = [p]
    opt["vocab_size"] = len(corpus["info"]["itow"])
    opt["checkpoint_path"] = os.path.join(str(tmp_path), "exps")

    train_loader = get_loader(opt, "train")
    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True)
    trainer = Trainer(opt, train_loader=train_loader, val_loader=val_loader,
                      references=refs, vocab=corpus["info"]["itow"])
    trainer.init_model(next(iter(train_loader)))
    trainer.fit(epochs=8)

    models = [(trainer.model, trainer.variables)]
    tr_f32 = get_translator(opt)
    tr_bf16 = get_translator({**opt, "compute_dtype_decode": jnp.bfloat16})

    total, same = 0, 0
    test_loader = get_loader(opt, "test", not_shuffle=True)
    for batch in test_loader:
        b = {"feats": [jnp.asarray(np.asarray(f)) for f in batch["feats"]]}
        h32, _ = tr_f32.translate_batch(models, b)
        h16, _ = tr_bf16.translate_batch(models, b)
        for a, c in zip(h32, h16):
            total += 1
            same += int(a[0] == c[0])
    agreement = same / max(total, 1)
    print("bf16 trained-model caption agreement:", agreement, "of", total)
    assert agreement >= 0.8, (agreement, total)
