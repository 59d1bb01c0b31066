"""End-to-end pretreatment CLI: annotations -> corpus -> retrieval DB ->
training loader consumes the artifacts."""

import json
import os
import pickle
import subprocess

from helpers import cpu_subprocess_env
import sys

import numpy as np
import pytest


def _repo():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_corpora_cli_then_loader(tmp_path):
    # fixture MSRVTT annotations
    data = {
        "videos": [{"id": i, "split": s, "category": i % 3}
                   for i, s in enumerate(
                       ["train"] * 6 + ["validate"] * 2 + ["test"] * 2)],
        "sentences": [
            {"video_id": "video%d" % i,
             "caption": f"a man number{i % 4} is running fast"}
            for i in range(10) for _ in range(2)
        ],
    }
    ann = tmp_path / "videodatainfo.json"
    ann.write_text(json.dumps(data))
    out_dir = tmp_path / "MSRVTT"

    r = subprocess.run(
        [sys.executable, "pretreatment_cli.py", "corpora",
         "--dataset", "MSRVTT", "--annotation", str(ann),
         "--out_dir", str(out_dir), "--count_thr", "0"],
        cwd=_repo(), env=cpu_subprocess_env(), capture_output=True, text=True, timeout=200)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "info_corpus.pkl").exists()
    assert (out_dir / "refs.pkl").exists()

    with open(out_dir / "info_corpus.pkl", "rb") as f:
        corpus = pickle.load(f)
    itow = corpus["info"]["itow"]
    assert itow[0] == "<pad>"
    # attribute-first: content words before stop words
    from care_tpu.data.corpus import STOP_WORDS
    first_content = itow[6]
    assert first_content not in STOP_WORDS

    # build features and run a loader over the CLI-produced corpus
    import h5py
    feats_dir = out_dir / "feats"
    feats_dir.mkdir()
    p = feats_dir / "synthetic_m.hdf5"
    rng = np.random.RandomState(0)
    with h5py.File(p, "w") as hf:
        for i in range(10):
            hf.create_dataset("video%d" % i,
                              data=rng.randn(12, 8).astype(np.float32))

    from care_tpu.config import get_opt
    from care_tpu.data import get_loader
    opt = get_opt({"dataset": "MSRVTT", "method": "Transformer",
                   "task": "Base", "feats": "ViT", "modality": "m",
                   "max_len": 12, "n_frames": 4, "batch_size": 4,
                   "final_overrides": {"load_feats_type": 1}},
                  read_vocab=False, resolve_paths=False)
    opt["info_corpus"] = str(out_dir / "info_corpus.pkl")
    opt["reference"] = str(out_dir / "refs.pkl")
    opt["feats_m"] = [str(p)]
    opt["dim_m"] = 8
    opt["vocab_size"] = len(itow)
    loader = get_loader(opt, "train")
    batch = next(iter(loader))
    assert batch["input_ids"].shape == (4, 11)
    assert batch["labels_attr"].shape[0] == 4


def test_retrieval_cli(tmp_path):
    import h5py
    # corpus with 4 videos (3 train / 1 val)
    from care_tpu.data.corpus import build_synthetic_corpus
    corpus = build_synthetic_corpus(n_videos=5, max_len=12)
    out_dir = tmp_path
    with open(out_dir / "info_corpus.pkl", "wb") as f:
        pickle.dump(corpus, f)
    from care_tpu.data.corpus import build_synthetic_references
    refs = build_synthetic_references(corpus)
    with open(out_dir / "refs.pkl", "wb") as f:
        pickle.dump(refs, f)

    rng = np.random.RandomState(0)
    with h5py.File(out_dir / "img.hdf5", "w") as hf:
        for i in range(5):
            hf.create_dataset("video%d" % i,
                              data=rng.randn(60, 16).astype(np.float32))
    with h5py.File(out_dir / "txt.hdf5", "w") as hf:
        for i in range(5):
            n = len(refs["video%d" % i])
            hf.create_dataset("video%d" % i,
                              data=rng.randn(n, 16).astype(np.float32))

    r = subprocess.run(
        [sys.executable, "pretreatment_cli.py", "retrieval",
         "--corpus_dir", str(out_dir),
         "--image_embs", str(out_dir / "img.hdf5"),
         "--text_embs", str(out_dir / "txt.hdf5"),
         "--out", str(out_dir / "ret.hdf5"), "--topk", "3",
         "--n_frames", "8"],
        cwd=_repo(), env=cpu_subprocess_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    with h5py.File(out_dir / "ret.hdf5") as hf:
        assert hf["video0"].shape == (3, 16)
        idx = list(hf["video0_i"])
        # own-video captions (range of video0 in the train flat list)
        assert all(i >= len(refs["video0"]) for i in idx)


def test_glove_cli(tmp_path):
    from care_tpu.data.corpus import build_synthetic_corpus
    corpus = build_synthetic_corpus(n_videos=3, max_len=12)
    with open(tmp_path / "info_corpus.pkl", "wb") as f:
        pickle.dump(corpus, f)
    itow = corpus["info"]["itow"]
    # glove file covering a couple of words
    lines = ["man 1.0 2.0 3.0", "running 0.5 0.5 0.5"]
    (tmp_path / "glove.txt").write_text("\n".join(lines))
    r = subprocess.run(
        [sys.executable, "pretreatment_cli.py", "glove",
         "--glove_txt", str(tmp_path / "glove.txt"),
         "--corpus_dir", str(tmp_path),
         "--out", str(tmp_path / "embs.npy")],
        cwd=_repo(), env=cpu_subprocess_env(), capture_output=True, text=True, timeout=200)
    assert r.returncode == 0, r.stderr[-2000:]
    table = np.load(tmp_path / "embs.npy")
    assert table.shape == (len(itow), 3)
    wtoi = {w: i for i, w in itow.items()}
    np.testing.assert_allclose(table[wtoi["man"]], [1.0, 2.0, 3.0])


def test_image_feats_cnn_cli(tmp_path):
    """CNN feature extraction (reference
    ``pretreatment/extract_image_feats_from_frames.py``): frames dir ->
    per-video HDF5 with converted torch weights, uniform-k sampling."""
    import h5py
    import torch
    from PIL import Image
    sys.path.insert(0, os.path.join(_repo(), "tests"))
    from torch_cnn_mirror import TorchResNet
    from test_cnn import _randomize_bn_stats

    rng = np.random.RandomState(0)
    frames_dir = tmp_path / "frames"
    for v in range(2):
        d = frames_dir / f"video{v}"
        d.mkdir(parents=True)
        for f in range(5):
            Image.fromarray(
                (rng.rand(64, 48, 3) * 255).astype(np.uint8)).save(
                d / f"{f:04d}.jpg")

    ckpt = tmp_path / "resnet18.pth"
    torch.manual_seed(7)
    torch.save(_randomize_bn_stats(TorchResNet(depth=18).eval(),
                                   seed=7).state_dict(), str(ckpt))

    out = tmp_path / "image_resnet18.hdf5"
    r = subprocess.run(
        [sys.executable, "pretreatment_cli.py", "image_feats",
         "--frames_dir", str(frames_dir), "--model", "resnet18",
         "--cnn_ckpt", str(ckpt), "--k", "3", "--out", str(out)],
        cwd=_repo(), env=cpu_subprocess_env(), capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    with h5py.File(out) as hf:
        assert set(hf.keys()) == {"video0", "video1"}
        feats = np.asarray(hf["video0"])
    assert feats.shape == (3, 512)
    assert np.isfinite(feats).all() and np.abs(feats).sum() > 0


def test_text_embs_bert_cli(tmp_path):
    """BERT caption-embedding extraction (reference
    ``pretreatment/bert_text_embs.py``): refs.pkl -> BERT.hdf5 via a local
    vocab + converted HF state_dict."""
    import h5py
    import torch
    from transformers import BertConfig, BertModel

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "man", "is", "running", "dog", "##s", "play", "##ing"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")

    torch.manual_seed(0)
    model = BertModel(BertConfig(
        vocab_size=len(vocab), hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32)).eval()
    ckpt = tmp_path / "bert.pth"
    torch.save(model.state_dict(), str(ckpt))

    refs = {"video0": [{"caption": "a man is running"}],
            "video1": [{"caption": "dogs playing"},
                       {"caption": "a dog"}]}
    corpus_dir = tmp_path / "MSRVTT"
    corpus_dir.mkdir()
    with open(corpus_dir / "refs.pkl", "wb") as f:
        pickle.dump(refs, f)

    out = tmp_path / "BERT.hdf5"
    r = subprocess.run(
        [sys.executable, "pretreatment_cli.py", "text_embs",
         "--corpus_dir", str(corpus_dir), "--arch", "bert",
         "--bert_ckpt", str(ckpt), "--vocab", str(vocab_file),
         "--mode", "mean", "--out", str(out)],
        cwd=_repo(), env=cpu_subprocess_env(), capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    with h5py.File(out) as hf:
        assert hf["video0"].shape == (1, 16)
        assert hf["video1"].shape == (2, 16)
