"""Per-dataset annotation parsers on synthetic fixture files."""

import json
import os
import pickle

from care_tpu.pretreatment import dataset_annotations as da
from care_tpu.pretreatment.corpora import prepare_corpus


def test_msrvtt_parser(tmp_path):
    data = {
        "videos": [
            {"id": 0, "split": "train", "category": 3},
            {"id": 1, "split": "validate", "category": 5},
            {"id": 2, "split": "test", "category": 3},
        ],
        "sentences": [
            {"video_id": "video0", "caption": "A man is running ."},
            {"video_id": "video0", "caption": "a man runs"},
            {"video_id": "video1", "caption": "A dog barks"},
            {"video_id": "video2", "caption": "someone cooks food"},
        ],
    }
    p = tmp_path / "videodatainfo.json"
    p.write_text(json.dumps(data))
    out = da.preprocess_msrvtt(str(p))
    assert out["split"] == {"train": [0], "validate": [1], "test": [2]}
    # punctuation dropped, lowercased
    assert out["raw_caps_all"]["video0"][0] == ["a", "man", "is", "running"]
    assert "video0" in out["raw_caps_train"]
    assert "video1" not in out["raw_caps_train"]
    assert out["itoc"][0] == 3
    assert out["split_category"]["train"][3] == [0]
    assert out["references"]["video0"][1]["caption"] == "a man runs"

    # feeds directly into the corpus builder
    corpus = prepare_corpus(out["raw_caps_train"], out["raw_caps_all"],
                            out["split"], count_thr=0, itoc=out["itoc"])
    assert "video2" in corpus["captions"]


def test_msvd_parser(tmp_path):
    refs = {"video0": [{"caption": "A man Running"}],
            "video1300": [{"caption": "test video"}]}
    rp = tmp_path / "refs.pkl"
    with open(rp, "wb") as f:
        pickle.dump(refs, f)
    mp = tmp_path / "mapping.txt"
    mp.write_text("vid1 ytid_a\nvid2 ytid_b\n")
    out = da.preprocess_msvd(str(rp), str(mp))
    assert out["raw_caps_all"]["video0"] == [["a", "man", "running"]]
    assert "video0" in out["raw_caps_train"]
    assert "video1300" not in out["raw_caps_train"]  # test split
    assert out["vid2id"]["ytid_a"] == "vid1"


def test_vatex_parser(tmp_path):
    train = [{"videoID": "yt_a_0_10", "enCap": ["a man sings"]},
             {"videoID": "yt_b_0_10", "enCap": ["a dog runs"]}]
    val = [{"videoID": "yt_c_0_10", "enCap": ["x y"]},
           {"videoID": "yt_d_0_10", "enCap": ["z w"]}]
    tp = tmp_path / "train.json"
    vp = tmp_path / "val.json"
    tp.write_text(json.dumps(train))
    vp.write_text(json.dumps(val))
    mp = tmp_path / "mapping.txt"
    mp.write_text("x yt_a_0_10\n")
    frames = tmp_path / "frames"
    (frames / "video0").mkdir(parents=True)
    (frames / "video2").mkdir(parents=True)

    out = da.preprocess_vatex(str(tp), str(vp), str(mp), str(frames))
    assert out["split"]["train"] == [0, 1]
    assert out["split"]["validate"] == [2]
    assert out["split"]["test"] == [3]
    assert out["split"]["activate_train"] == [0]
    assert out["split"]["activate_validate"] == [2]
    assert out["raw_caps_all"]["video0"] == [["a", "man", "sings"]]
    assert out["vid2id"]["video0"] == "yt_a_0_10"
