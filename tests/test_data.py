"""Data-layer fixtures: samplers, masks, MLM, visual-word targets."""

import numpy as np
import pytest

from care_tpu import constants
from care_tpu.data import samplers, text


def test_uniform_ids():
    assert samplers.get_uniform_ids_from_k_snippets(60, 4) == [7, 22, 37, 52]
    assert samplers.get_uniform_ids_from_k_snippets(10, 10) == list(range(10))


def test_segment_random_within_bounds():
    rng = np.random.RandomState(0)
    ids = samplers.get_random_ids_from_k_snippets(60, 6, rng)
    bounds = [int(i) for i in np.linspace(0, 60, 7)]
    for i, idx in enumerate(ids):
        assert bounds[i] <= idx < bounds[i + 1]


def test_resampling_matches_reference_formula():
    assert samplers.resampling(5, 10) == [round(i * 4 / 9) for i in range(10)]


def test_padding_truncates_with_eos():
    seq = list(range(10, 25))
    out = text.padding(seq, 8, add_eos=True)
    assert len(out) == 8
    assert out[-1] == constants.EOS
    out2 = text.padding([10, 11], 5, add_eos=False)
    assert out2 == [10, 11, 0, 0, 0]


def test_ar_source_target_shift():
    cap = [constants.BOS, 10, 11, 12, constants.EOS]
    rng = np.random.RandomState(0)
    r = text.make_source_target(cap, None, 8, "train", "ARFormer", rng)
    assert r["dec_source"] == [constants.BOS, 10, 11, 12, constants.EOS, 0, 0]
    assert r["dec_target"] == [10, 11, 12, constants.EOS, 0, 0, 0]


def test_mlm_eval_all_mask():
    cap = [constants.BOS, 10, 11, 12, constants.EOS]
    rng = np.random.RandomState(0)
    r = text.make_source_target(cap, None, 8, "test", "NARFormer", rng)
    assert r["dec_source"][:3] == [constants.MASK] * 3
    assert r["dec_source"][3:] == [constants.PAD] * 5
    assert r["dec_target"][:3] == [10, 11, 12]


def test_mlm_train_masks_subset():
    cap = [constants.BOS] + list(range(10, 20)) + [constants.EOS]
    rng = np.random.RandomState(3)
    r = text.make_source_target(cap, None, 15, "train", "NARFormer", rng,
                                beta=[0, 1])
    src = np.asarray(r["dec_source"][:10])
    tgt = np.asarray(r["dec_target"][:10])
    masked = src == constants.MASK
    assert masked.sum() >= 1
    # masked positions carry the original token in the target; others PAD
    np.testing.assert_array_equal(tgt[masked], np.arange(10, 20)[masked])
    assert (tgt[~masked] == constants.PAD).all()


def test_visual_word_targets():
    itow = {10: "man", 11: "is", 12: "running", 13: "the", 14: "road"}
    itop = {0: "DET", 1: "NOUN", 2: "VERB"}
    cap = [constants.BOS, 10, 11, 12, constants.EOS]
    tags = [0, 1, 2, 2, 0]  # man=NOUN is=VERB running=VERB
    out = text.source_target_visual_word(cap, tags, itow, itop, 8, "train",
                                         "ARFormer")
    # 'is' is banned even though VERB-tagged; man + running are targets
    t = out["dec_target_1"]
    assert t[0] == constants.BOS
    assert t[1] == 10                    # man
    assert t[2] == constants.MASK        # is (banned)
    assert t[3] == 12                    # running
    assert t[4] == constants.EOS
    src = out["dec_source_1"]
    assert src[:4] == [constants.VIS] * 4


def test_attribute_mask_and_vid2attr():
    labels = [6, 7, 3500, constants.PAD]
    m = text.prepare_attribute_mask(labels, attribute_k=100)
    assert m == [1, 1, 0, 0]
    captions = {"video0": [[constants.BOS, 6, 9, constants.EOS]]}
    v2a = text.vid2attribute_mappings([0], captions)
    assert v2a["video0"][0] == 1 and v2a["video0"][3] == 1
    assert v2a["video0"].sum() == 2


def test_synthetic_corpus_roundtrip(tmp_path):
    from care_tpu.data.corpus import (build_synthetic_corpus,
                                      build_synthetic_references)
    corpus = build_synthetic_corpus(n_videos=10)
    refs = build_synthetic_references(corpus)
    assert len(corpus["captions"]) == 10
    itow = corpus["info"]["itow"]
    for vid, caps in corpus["captions"].items():
        for cap in caps:
            assert cap[0] == constants.BOS and cap[-1] == constants.EOS
            for w in cap[1:-1]:
                assert w in itow
    assert set(refs.keys()) == set(corpus["captions"].keys())
