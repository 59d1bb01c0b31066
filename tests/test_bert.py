"""Flax BERT + WordPiece parity vs HuggingFace (offline: tiny random-init
``BertModel`` and a local vocab.txt — no downloads).

Locks ``care_tpu/pretreatment/bert.py``, our equivalent of the reference's
``pretreatment/bert_text_embs.py`` extractor.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from care_tpu.pretreatment.bert import (WordPieceTokenizer, BertEncoder,
                                        convert_hf_bert_state_dict,
                                        pool_caption_embs,
                                        extract_text_embs)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "man", "is", "running", "fast", "the", "dog", "##s",
         "play", "##ing", "guitar", "##ist", "on", "stage", ",", ".", "!",
         "2", "##0", "co", "##ok"]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("bert") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.mark.parametrize("text", [
    "A man is running fast.",
    "the dogs are playing, on stage!",
    "cooking 20 guitarists",
    "the guitarist plays",
])
def test_wordpiece_matches_hf_tokenizer(vocab_file, text):
    from transformers import BertTokenizer
    hf = BertTokenizer(vocab_file=vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file)
    assert ours.tokenize(text) == hf.encode(text, add_special_tokens=False)


def test_encode_batch_layout(vocab_file):
    tok = WordPieceTokenizer(vocab_file)
    ids, mask, lens = tok.encode_batch(["a man is running", "the dogs!"])
    assert ids.shape == mask.shape
    # row 0: [CLS] a man is running [SEP]
    assert ids[0, 0] == tok.cls and ids[0, int(lens[0]) + 1] == tok.sep
    assert mask[0].sum() == lens[0] + 2
    # padding rows are [PAD] with mask 0
    assert (ids[1, int(lens[1]) + 2:] == tok.pad).all()


@pytest.fixture(scope="module")
def tiny_hf_bert():
    from transformers import BertConfig, BertModel
    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=len(VOCAB), hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=64, max_position_embeddings=40,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    return BertModel(cfg).eval()


def test_bert_encoder_matches_hf(tiny_hf_bert, vocab_file):
    sd = {k: v.numpy() for k, v in tiny_hf_bert.state_dict().items()}
    variables, config = convert_hf_bert_state_dict(sd)
    assert config["layers"] == 2 and config["hidden"] == 32
    config["heads"] = 4  # tiny config: 32/64 would floor to 1

    tok = WordPieceTokenizer(vocab_file)
    ids, mask, lens = tok.encode_batch(
        ["a man is running fast", "the dogs play!", "cooking"])
    with torch.no_grad():
        ref = tiny_hf_bert(input_ids=torch.from_numpy(ids).long(),
                           attention_mask=torch.from_numpy(mask).long()
                           ).last_hidden_state.numpy()
    ours = np.asarray(BertEncoder(**config).apply(
        variables, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)

    # pooled caption embeddings (mean + max over non-special tokens)
    for mode in ("mean", "max"):
        pooled = pool_caption_embs(ours, lens, mode)
        ref_pool = []
        for h, n in zip(ref, lens):
            span = h[1:1 + int(n)]
            ref_pool.append(span.mean(0) if mode == "mean" else span.max(0))
        np.testing.assert_allclose(pooled, np.stack(ref_pool), atol=2e-5,
                                   rtol=1e-4)


def test_extract_text_embs_roundtrip(tiny_hf_bert, vocab_file, tmp_path):
    import h5py
    sd = {k: v.numpy() for k, v in tiny_hf_bert.state_dict().items()}
    variables, config = convert_hf_bert_state_dict(sd)
    config["heads"] = 4
    refs = {"video0": [{"caption": "a man is running"},
                       {"caption": "the dogs play"}],
            "video1": [{"caption": "cooking on stage"}]}
    out = str(tmp_path / "BERT.hdf5")
    extract_text_embs(variables, refs, WordPieceTokenizer(vocab_file), out,
                      mode="mean", config=config)
    with h5py.File(out) as hf:
        assert set(hf.keys()) == {"video0", "video1"}
        assert hf["video0"].shape == (2, 32)
        assert hf["video1"].shape == (1, 32)
        assert np.isfinite(np.asarray(hf["video0"])).all()
