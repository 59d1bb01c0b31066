"""COCO-metric fixtures: identity scores + the classic pycocoevalcap
fixture (reference ``misc/cocoeval.py:186-230``) whose published outputs we
reproduce."""

import pytest

from care_tpu.metrics import COCOScorer
from care_tpu.metrics.bleu import compute_bleu
from care_tpu.metrics.rouge import compute_rouge, _lcs_len
from care_tpu.metrics.cider import compute_cider


GTS = {
    "184321": [
        {"image_id": "184321", "caption":
         "A train traveling down tracks next to lights.",
         "tokenized": "a train traveling down tracks next to lights"},
        {"image_id": "184321", "caption":
         "A train coming down the tracks arriving at a station.",
         "tokenized": "a train coming down the tracks arriving at a station"}],
    "81922": [
        {"image_id": "81922", "caption":
         "A large jetliner flying over a traffic filled street.",
         "tokenized": "a large jetliner flying over a traffic filled street"},
        {"image_id": "81922", "caption":
         "The plane is flying over top of the cars",
         "tokenized": "the plan is flying over top of the cars"}],
}
SAMPLES = {
    "184321": [{"image_id": "184321",
                "caption": "train traveling down a track in front of a road"}],
    "81922": [{"image_id": "81922",
               "caption": "plane is flying through the sky"}],
}


def test_cocoscorer_reference_fixture():
    scorer = COCOScorer()
    scores, detail = scorer.score(GTS, SAMPLES, ["184321", "81922"])
    # published pycocoevalcap outputs for this fixture
    assert scores["Bleu_1"] == pytest.approx(0.4145, abs=2e-3)
    assert scores["Bleu_2"] == pytest.approx(0.2714, abs=2e-3)
    assert scores["Bleu_3"] == pytest.approx(0.1720, abs=2e-3)
    assert scores["CIDEr"] == pytest.approx(1.0053, abs=5e-3)
    assert scores["ROUGE_L"] == pytest.approx(0.3631, abs=2e-3)
    assert "184321" in detail and "CIDEr" in detail["184321"]


def test_identity_scores():
    ident = {"a": [{"caption": "a man is singing a song"}],
             "b": [{"caption": "two dogs play in the park"}]}
    scorer = COCOScorer()
    scores, _ = scorer.score(ident, ident, ["a", "b"])
    assert scores["Bleu_4"] == pytest.approx(1.0, abs=1e-6)
    assert scores["ROUGE_L"] == pytest.approx(1.0, abs=1e-6)
    assert scores["CIDEr"] > 5.0  # tf-idf weighted self-match, scaled x10


def test_lcs():
    assert _lcs_len("abcde", "ace") == 3
    assert _lcs_len([1, 2, 3], [4, 5]) == 0


def test_bleu_brevity_penalty():
    gts = {"v": ["a b c d e f"]}
    res_short = {"v": ["a b c"]}
    bleus_short, _ = compute_bleu(gts, res_short)
    gts2 = {"v": ["a b c"]}
    bleus_exact, _ = compute_bleu(gts2, {"v": ["a b c"]})
    assert bleus_short[0] < bleus_exact[0]


def test_cider_prefers_consensus():
    gts = {"v1": ["a man is running", "a man runs"],
           "v2": ["a dog is barking", "a dog barks"]}
    good = {"v1": ["a man is running"], "v2": ["a dog is barking"]}
    bad = {"v1": ["the weather is nice"], "v2": ["hello world foo bar"]}
    c_good, _ = compute_cider(gts, good)
    c_bad, _ = compute_cider(gts, bad)
    assert c_good > c_bad
