"""Device-resident feature bank == host-shipped feats (round-5, VERDICT
r4 #3).

The bank uploads per-video feature tables once and gathers each batch on
device from (video_ids, frame_ids); results must be bit-identical to the
host-side ``feats[frame_ids]`` gather, and a bank-backed training run
must reproduce the shipping path's loss trajectory exactly.
"""

import numpy as np
import pytest

from care_tpu.data import get_loader
from care_tpu.data.feature_bank import build_feature_bank
from care_tpu.training.trainer import Trainer
from test_train_e2e import make_synthetic_env


def test_bank_gather_matches_host_feats(tmp_path):
    opt, corpus, refs = make_synthetic_env(tmp_path)
    loader = get_loader(opt, "train")
    bank = build_feature_bank(loader.dataset, opt)
    assert bank is not None
    loader.set_epoch(0)
    n_checked = 0
    for batch in loader:
        got = bank.lookup(batch["video_ids"], batch.get("frame_ids"))
        assert len(got) == len(batch["feats"])
        for g, h in zip(got, batch["feats"]):
            np.testing.assert_array_equal(np.asarray(g), h)
        n_checked += 1
    assert n_checked > 0


def test_train_with_bank_reproduces_loss_trajectory(tmp_path):
    def run(cache: bool):
        opt, corpus, refs = make_synthetic_env(
            tmp_path / ("bank" if cache else "ship"),
            extra={"epochs": 2, "check_val_every_n_epoch": 10})
        opt["device_feature_cache"] = cache
        trainer = Trainer(opt, train_loader=get_loader(opt, "train"),
                          references=refs, vocab=corpus["info"]["itow"])
        trainer.fit(epochs=2)
        if cache:
            assert trainer._feature_bank is not None
            assert trainer.train_loader.dataset.skip_feats
        return [h["train_loss"] for h in trainer.history]

    ship = run(False)
    bank = run(True)
    assert len(ship) == len(bank) == 2
    np.testing.assert_allclose(bank, ship, rtol=0, atol=0)


def test_validation_with_bank_reproduces_scores(tmp_path):
    """validate() with the val-side bank == without: identical COCO
    scores (bank gather is bit-equal to host-shipped feats)."""
    def run(cache: bool):
        opt, corpus, refs = make_synthetic_env(
            tmp_path / ("vb" if cache else "vd"))
        opt["device_feature_cache"] = cache
        trainer = Trainer(opt, train_loader=get_loader(opt, "train"),
                          val_loader=get_loader(opt, "validate",
                                                is_validation=True,
                                                not_shuffle=True),
                          references=refs, vocab=corpus["info"]["itow"])
        trainer.init_model(next(iter(trainer.train_loader)))
        trainer._build_tx(1)
        scores = trainer.validate(0)
        if cache:
            banks = [b for b, _ in trainer._val_banks.values()]
            assert any(b is not None for b in banks)
        return scores

    dense = run(False)
    bank = run(True)
    for k in ("Bleu_4", "CIDEr", "ROUGE_L", "METEOR"):
        assert dense[k] == bank[k], (k, dense[k], bank[k])


def test_bank_unsupported_configs_fall_back(tmp_path):
    opt, corpus, refs = make_synthetic_env(tmp_path)
    loader = get_loader(opt, "train")
    assert build_feature_bank(loader.dataset,
                              {**opt, "load_feats_type": 1}) is None
    assert build_feature_bank(loader.dataset,
                              {**opt, "feats": "SwinBERTDense"}) is None


def test_bank_bf16_storage_halves_bytes(tmp_path):
    opt, corpus, refs = make_synthetic_env(tmp_path)
    loader = get_loader(opt, "train")
    f32 = build_feature_bank(loader.dataset, opt)
    bf16 = build_feature_bank(loader.dataset,
                              {**opt, "feature_cache_dtype": "bfloat16"})
    assert bf16.nbytes() * 2 == f32.nbytes()
    got = bf16.lookup(["video0", "video1"], [[0, 1, 2, 3, 4, 5, 6, 7]] * 2)
    # gather returns f32 (model contract), values bf16-rounded
    assert all(np.asarray(g).dtype == np.float32 for g in got)
    ref = f32.lookup(["video0", "video1"], [[0, 1, 2, 3, 4, 5, 6, 7]] * 2)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-2, atol=1e-2)
