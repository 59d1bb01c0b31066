"""Pretreatment tests: retrieval construction/eval, corpus builder, CLIP."""

import numpy as np
import pytest

from care_tpu.pretreatment import retrieval, corpora


def test_retrieve_topk_excludes_own_and_duplicates():
    rs = np.random.RandomState(0)
    d = 16
    text = rs.randn(20, d).astype(np.float32)
    # video 0 is closest to captions 0..4 (its own) -> must be excluded
    image = text[0:1] + 0.01 * rs.randn(1, d).astype(np.float32)
    refs = [f"cap{i}" for i in range(20)]
    refs[6] = refs[5]  # duplicate caption text
    ids = retrieval.retrieve_topk(image, text, topk=3,
                                  own_ranges=[(0, 5)], refs=refs,
                                  unique=True)
    assert len(ids[0]) == 3
    assert all(i >= 5 for i in ids[0])
    assert not (5 in ids[0] and 6 in ids[0])  # dedup by caption text


def test_retrieval_eval_perfect():
    rs = np.random.RandomState(1)
    d = 8
    # each video's own captions are exactly its embedding
    videos = rs.randn(4, d).astype(np.float32)
    text = np.repeat(videos, 2, axis=0)  # 2 captions per video
    own = [(2 * i, 2 * i + 2) for i in range(4)]
    m = retrieval.evaluate_retrieval(videos, text, own)
    assert m["R@1"] == 100.0
    assert m["MedianRank"] == 1.0
    assert m["mAP"] == pytest.approx(100.0)


def test_build_retrieval_db_contract(tmp_path):
    import h5py
    rs = np.random.RandomState(2)
    d = 8
    image = rs.randn(3, d).astype(np.float32)
    text = rs.randn(30, d).astype(np.float32)
    refs = [f"c{i}" for i in range(30)]
    path = str(tmp_path / "ret.hdf5")
    ids = retrieval.build_retrieval_db(
        path, ["video0", "video1", "video2"], image, text, text, topk=4,
        own_ranges=[(0, 10), (10, 20), (20, 30)], refs=refs)
    with h5py.File(path) as hf:
        assert hf["video0"].shape == (4, d)
        stored = list(hf["video0_i"])
        assert stored == ids[0]
        assert all(i >= 10 for i in stored)


def test_vocab_attribute_first():
    caps = {
        "video0": [["a", "man", "running"], ["a", "man", "singing"]],
        "video1": [["the", "dog", "running"], ["a", "dog", "barking"]],
    }
    vocab = corpora.build_vocab(caps, count_thr=1)
    # count>1: a(4? a appears 3), man(2), running(2), dog(2), the(1 no)...
    # content words sorted by freq first, stop words after
    from care_tpu.data.corpus import STOP_WORDS
    n_content = sum(1 for w in vocab if w not in STOP_WORDS)
    assert vocab[:n_content] == [w for w in vocab if w not in STOP_WORDS]


def test_prepare_corpus_roundtrip():
    caps = {
        "video0": [["a", "man", "is", "running"]] * 3,
        "video1": [["a", "dog", "is", "barking"]] * 3,
    }
    corpus = corpora.prepare_corpus(caps, caps,
                                    {"train": [0], "validate": [1],
                                     "test": []},
                                    count_thr=0)
    itow = corpus["info"]["itow"]
    assert itow[0] == "<pad>" and itow[3] == "<eos>"
    cap0 = corpus["captions"]["video0"][0]
    assert cap0[0] == 2 and cap0[-1] == 3
    words = [itow[i] for i in cap0[1:-1]]
    assert words == ["a", "man", "is", "running"]
    # length histogram: 4 content words (BOS/EOS excluded)
    assert corpus["info"]["length_info"]["video0"][4] == 3

    refs = corpora.build_references(caps)
    assert refs["video0"][0]["caption"] == "a man is running"


def test_clip_vision_shapes():
    import jax
    import jax.numpy as jnp
    from care_tpu.pretreatment.clip import CLIPVisionTransformer
    model = CLIPVisionTransformer(image_size=64, patch_size=32, width=64,
                                  layers=2, heads=4, output_dim=32)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 32)


def test_clip_text_shapes():
    import jax
    import jax.numpy as jnp
    from care_tpu.pretreatment.clip import CLIPTextTransformer
    model = CLIPTextTransformer(vocab_size=100, context_length=16, width=32,
                                layers=2, heads=4, output_dim=24)
    toks = jnp.zeros((3, 16), jnp.int32).at[:, 0].set(5).at[:, 1].set(99)
    params = model.init(jax.random.PRNGKey(0), toks)
    out = model.apply(params, toks)
    assert out.shape == (3, 24)


def test_pointer_beam_decode():
    from care_tpu.decoding import get_translator
    from helpers import tiny_opt, tiny_model_and_batch
    opt = tiny_opt(method="PointerGen", vocab_size=40, beam_size=3,
                   retrieval_topk=4)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    tr = get_translator(opt)
    hyps, scores = tr.translate_batch([(model, variables)],
                                      {"feats": batch["feats"]})
    assert len(hyps) == 2 and all(len(h) >= 1 for h in hyps)
