"""Dataset/config variants: VATEX activate splits + vid2id, SwinBERTDense
dense-motion path, load_feats_type modes, missing-video zero fill."""

import os
import pickle

import numpy as np
import pytest

from care_tpu import constants
from care_tpu.config import get_opt
from care_tpu.data.corpus import get_ids_set, build_synthetic_corpus
from care_tpu.data.datasets import VideoOnlyDataset


def test_vatex_activate_splits():
    split = {"train": [0, 1, 2], "validate": [3], "test": [4, 5],
             "activate_train": [0, 1], "activate_validate": [3],
             "activate_test": [5]}
    ids = get_ids_set("train", split, is_vatex_activate=True)
    assert ids == [0, 1]
    ids = get_ids_set("test", split, is_vatex_activate=True)
    assert ids == [5]


def test_all_and_trainval_synthetic_splits():
    split = {"train": [0, 1], "validate": [2], "test": [3]}
    assert get_ids_set("all", dict(split)) == [0, 1, 2, 3]
    assert get_ids_set("trainval", dict(split)) == [0, 1, 2]


def test_specific_category_subset():
    split = {"train": [0, 1, 2, 3]}
    split_category = {"train": {7: [1, 3]}}
    ids = get_ids_set("train", split, specific=7,
                      split_category=split_category)
    assert ids == [1, 3]


def _make_video_dataset(tmp_path, opt_overrides, feats_shapes, n_videos=6):
    import h5py
    opt = get_opt({"dataset": "MSRVTT", "method": "Transformer",
                   "task": "Base", "feats": "ViT", "vocab_size": 40,
                   "max_len": 12, "n_frames": 4,
                   "final_overrides": opt_overrides},
                  read_vocab=False, resolve_paths=False)
    corpus = build_synthetic_corpus(n_videos=n_videos, max_len=12)
    corpus_path = os.path.join(str(tmp_path), "info_corpus.pkl")
    with open(corpus_path, "wb") as f:
        pickle.dump(corpus, f)
    opt["info_corpus"] = corpus_path
    rng = np.random.RandomState(0)
    for char, shape in feats_shapes.items():
        p = os.path.join(str(tmp_path), f"{char}.hdf5")
        with h5py.File(p, "w") as hf:
            for v in range(n_videos - 1):   # last video missing -> zero fill
                hf.create_dataset("video%d" % v,
                                  data=rng.randn(*shape).astype(np.float32))
        opt[f"feats_{char}"] = [p]
        opt[f"dim_{char}"] = shape[-1]
    return opt


def test_load_feats_type0_samples_frame_ids(tmp_path):
    opt = _make_video_dataset(tmp_path, {"modality": "m",
                                         "load_feats_type": 0,
                                         "n_total_frames": 12},
                              {"m": (12, 8)})
    ds = VideoOnlyDataset(opt, "train", "equally_sampling")
    s = ds[0]
    assert s["feats"][0].shape == (4, 8)
    assert len(s["frame_ids"]) == 4


def test_load_feats_type1_resamples_short_videos(tmp_path):
    # source shorter than n_frames -> resampled up to n_frames
    opt = _make_video_dataset(tmp_path, {"modality": "m",
                                         "load_feats_type": 1},
                              {"m": (2, 8)})
    ds = VideoOnlyDataset(opt, "train", "equally_sampling")
    s = ds[0]
    assert s["feats"][0].shape == (4, 8)


def test_missing_video_zero_fill(tmp_path):
    opt = _make_video_dataset(tmp_path, {"modality": "m",
                                         "load_feats_type": 1},
                              {"m": (6, 8)}, n_videos=4)
    ds = VideoOnlyDataset(opt, "train", "equally_sampling")
    # train split covers 60% of 4 videos = ids 0,1 — drop into the raw
    # accessor for the missing one instead
    missing = ds.get_video_features_by_vid("video3")
    assert np.all(missing["feats"][0] == 0)


def test_one_dim_feats_broadcast_over_time(tmp_path):
    import h5py
    opt = _make_video_dataset(tmp_path, {"modality": "m",
                                         "load_feats_type": 1,
                                         "n_total_frames": 6},
                              {"m": (6, 8)})
    # overwrite video0 with a 1-D vector: must broadcast over time
    p = opt["feats_m"][0]
    with h5py.File(p, "a") as hf:
        del hf["video0"]
        hf.create_dataset("video0", data=np.ones(8, np.float32))
    ds = VideoOnlyDataset(opt, "train", "equally_sampling")
    s = ds.get_video_features_by_vid("video0")
    assert s["feats"][0].shape == (4, 8)
    assert np.all(s["feats"][0] == 1.0)


def test_swinbert_dense_hybrid_length():
    from care_tpu.models.layers import compute_hybrid_length
    opt = get_opt({"dataset": "MSRVTT", "method": "Transformer",
                   "task": "CARE", "feats": "SwinBERTDense",
                   "decoder_modality_flags": "VA",
                   "predictor_modality_flags": "VA",
                   "vocab_size": 40}, read_vocab=False, resolve_paths=False)
    # n_frames*|ami| + topk - n_frames + 1568 (reference Layers.py:85-90)
    expected = opt["n_frames"] * 3 + opt["use_attr_topk"] \
        - opt["n_frames"] + 1568
    assert compute_hybrid_length(opt) == expected


def test_vid2id_remap_for_vatex_i3d(tmp_path):
    import h5py
    corpus = build_synthetic_corpus(n_videos=3, max_len=12)
    corpus["info"]["vid2id"] = {"video%d" % i: f"yt_{i}_0_10"
                                for i in range(3)}
    corpus_path = os.path.join(str(tmp_path), "info_corpus.pkl")
    with open(corpus_path, "wb") as f:
        pickle.dump(corpus, f)
    p = os.path.join(str(tmp_path), "I3D.hdf5")
    with h5py.File(p, "w") as hf:
        for i in range(3):
            hf.create_dataset(f"yt_{i}_0_10",
                              data=np.full((6, 8), i, np.float32))
    opt = get_opt({"dataset": "VATEX", "method": "Transformer",
                   "task": "Base", "feats": "I3D", "vocab_size": 40,
                   "max_len": 12, "n_frames": 4},
                  read_vocab=False, resolve_paths=False)
    opt["info_corpus"] = corpus_path
    opt["feats_m"] = [p]
    opt["dim_m"] = 8
    ds = VideoOnlyDataset(opt, "train", "equally_sampling")
    s = ds.get_video_features_by_vid("video1")
    assert np.all(s["feats"][0] == 1.0)
