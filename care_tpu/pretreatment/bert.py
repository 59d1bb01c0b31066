"""BERT caption embeddings in Flax (+ a pure-python WordPiece tokenizer).

Parity target: reference ``pretreatment/bert_text_embs.py`` — encodes every
reference caption of every video with ``bert-base-uncased`` and pools the
last hidden states over the caption's (non-special) tokens with mean or max,
writing one ``[n_captions, hidden]`` HDF5 dataset per video
(``BERT.hdf5`` / ``BERT_max.hdf5`` under ``<dataset>/text_embs/``).

Zero-egress: weights convert from a local HuggingFace torch state_dict and
the tokenizer loads a local ``vocab.txt`` — no downloads.  Encoding runs as
one jitted, batched XLA program per shape bucket.
"""

import unicodedata
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import traverse_util


# ---------------------------------------------------------------------------
# WordPiece tokenizer (BertTokenizer semantics: BasicTokenizer + WordPiece)
# ---------------------------------------------------------------------------

def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
            or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


class WordPieceTokenizer:
    """``bert-base-uncased``-style tokenization from a local vocab.txt."""

    def __init__(self, vocab_file: str, lowercase: bool = True,
                 max_chars_per_word: int = 100):
        with open(vocab_file, encoding="utf-8") as f:
            self.vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
        self.inv_vocab = {i: w for w, i in self.vocab.items()}
        self.lowercase = lowercase
        self.max_chars = max_chars_per_word
        self.unk, self.cls, self.sep, self.pad = (
            self.vocab["[UNK]"], self.vocab["[CLS]"], self.vocab["[SEP]"],
            self.vocab["[PAD]"])

    def _basic_tokenize(self, text: str) -> List[str]:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or unicodedata.category(ch) == "Cc" \
                    and ch not in ("\t", "\n", "\r"):
                continue
            if _is_cjk(cp):
                out.append(f" {ch} ")
            elif ch in ("\t", "\n", "\r") or unicodedata.category(ch) == "Zs":
                out.append(" ")
            else:
                out.append(ch)
        tokens = []
        for tok in "".join(out).split():
            if self.lowercase:
                tok = tok.lower()
                tok = "".join(c for c in unicodedata.normalize("NFD", tok)
                              if unicodedata.category(c) != "Mn")
            # split punctuation into its own tokens
            word = []
            for ch in tok:
                if _is_punct(ch):
                    if word:
                        tokens.append("".join(word))
                        word = []
                    tokens.append(ch)
                else:
                    word.append(ch)
            if word:
                tokens.append("".join(word))
        return tokens

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_chars:
            return [self.unk]
        pieces, start = [], 0
        while start < len(word):
            end, cur = len(word), None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[int]:
        ids = []
        for word in self._basic_tokenize(text):
            ids.extend(self._wordpiece(word))
        return ids

    def encode_batch(self, texts: List[str], max_len: int = 512):
        """[CLS] tokens [SEP] + pad -> (input_ids, attention_mask, n_tokens);
        ``n_tokens`` excludes the special tokens (reference
        ``bert_text_embs.py:57-59`` computes ``len(input_ids) - 2``)."""
        seqs = [self.tokenize(t)[:max_len - 2] for t in texts]
        lens = np.asarray([len(s) for s in seqs], np.int32)
        width = int(lens.max()) + 2 if len(seqs) else 2
        ids = np.full((len(seqs), width), self.pad, np.int32)
        mask = np.zeros((len(seqs), width), np.int32)
        for i, s in enumerate(seqs):
            row = [self.cls] + s + [self.sep]
            ids[i, :len(row)] = row
            mask[i, :len(row)] = 1
        return ids, mask, lens


# ---------------------------------------------------------------------------
# BERT encoder (HF BertModel semantics)
# ---------------------------------------------------------------------------

class BertLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, mask_bias):
        h = self.hidden
        q = nn.Dense(h, name="query")(x)
        k = nn.Dense(h, name="key")(x)
        v = nn.Dense(h, name="value")(x)
        b, L, _ = x.shape
        hd = h // self.heads

        def split(t):
            return t.reshape(b, L, self.heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) \
            / jnp.sqrt(hd).astype(x.dtype)
        probs = jax.nn.softmax(scores + mask_bias, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, L, h)
        x = nn.LayerNorm(epsilon=self.eps, name="attn_ln")(
            x + nn.Dense(h, name="attn_out")(ctx))
        y = nn.gelu(nn.Dense(self.intermediate, name="inter")(x),
                    approximate=False)
        return nn.LayerNorm(epsilon=self.eps, name="out_ln")(
            x + nn.Dense(h, name="out")(y))


class BertEncoder(nn.Module):
    """input_ids [B, L] + attention_mask [B, L] -> last hidden [B, L, H]."""
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    eps: float = 1e-12

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (self.vocab_size, self.hidden))
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (self.max_position, self.hidden))
        typ = self.param("token_type_embeddings",
                         nn.initializers.normal(0.02),
                         (self.type_vocab, self.hidden))
        L = input_ids.shape[1]
        x = jnp.take(word, input_ids, axis=0) + pos[None, :L] + typ[0][None,
                                                                        None]
        x = nn.LayerNorm(epsilon=self.eps, name="emb_ln")(x)
        bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) \
            * jnp.finfo(x.dtype).min
        for i in range(self.layers):
            x = BertLayer(self.hidden, self.heads, self.intermediate,
                          self.eps, name=f"layer_{i}")(x, bias)
        return x


def convert_hf_bert_state_dict(sd: Dict[str, np.ndarray]):
    """HF ``BertModel`` state_dict (numpy-ified) -> (flax params, config)."""
    sd = {k.removeprefix("bert."): np.asarray(v) for k, v in sd.items()}
    flat = {
        ("word_embeddings",): sd["embeddings.word_embeddings.weight"],
        ("position_embeddings",): sd["embeddings.position_embeddings.weight"],
        ("token_type_embeddings",):
            sd["embeddings.token_type_embeddings.weight"],
        ("emb_ln", "scale"): sd["embeddings.LayerNorm.weight"],
        ("emb_ln", "bias"): sd["embeddings.LayerNorm.bias"],
    }
    n_layers = len({k.split(".")[2] for k in sd
                    if k.startswith("encoder.layer.")})
    for i in range(n_layers):
        pre, fl = f"encoder.layer.{i}", (f"layer_{i}",)
        for ours, theirs in (
                ("query", "attention.self.query"),
                ("key", "attention.self.key"),
                ("value", "attention.self.value"),
                ("attn_out", "attention.output.dense"),
                ("inter", "intermediate.dense"),
                ("out", "output.dense")):
            flat[fl + (ours, "kernel")] = sd[f"{pre}.{theirs}.weight"].T
            flat[fl + (ours, "bias")] = sd[f"{pre}.{theirs}.bias"]
        for ours, theirs in (("attn_ln", "attention.output.LayerNorm"),
                             ("out_ln", "output.LayerNorm")):
            flat[fl + (ours, "scale")] = sd[f"{pre}.{theirs}.weight"]
            flat[fl + (ours, "bias")] = sd[f"{pre}.{theirs}.bias"]
    vocab_size, hidden = sd["embeddings.word_embeddings.weight"].shape
    config = dict(
        vocab_size=vocab_size, hidden=hidden, layers=n_layers,
        heads=max(1, hidden // 64),
        intermediate=sd["encoder.layer.0.intermediate.dense.weight"].shape[0],
        max_position=sd["embeddings.position_embeddings.weight"].shape[0],
        type_vocab=sd["embeddings.token_type_embeddings.weight"].shape[0])
    return {"params": traverse_util.unflatten_dict(flat)}, config


# ---------------------------------------------------------------------------
# caption-embedding extraction
# ---------------------------------------------------------------------------

def pool_caption_embs(hidden_states: np.ndarray, lens: np.ndarray,
                      mode: str = "mean") -> np.ndarray:
    """Pool last hidden states over tokens 1..1+len per caption (skipping
    [CLS]/[SEP]/padding), mean or max — reference ``bert_text_embs.py:66-72``."""
    out = []
    for h, n in zip(hidden_states, lens):
        span = h[1:1 + int(n)]
        out.append(span.mean(axis=0) if mode == "mean" else span.max(axis=0))
    return np.stack(out, axis=0)


def extract_text_embs(variables, refs: Dict[str, list],
                      tokenizer: WordPieceTokenizer, out_path: str,
                      mode: str = "mean", config: dict = None,
                      video_ids: List[str] = None):
    """refs.pkl dict -> HDF5 with one [n_captions, hidden] dataset/video."""
    import h5py
    model = BertEncoder(**(config or {}))
    fn = jax.jit(lambda v, i, m: model.apply(v, i, m))
    keys = video_ids if video_ids is not None else sorted(refs.keys())
    with h5py.File(out_path, "a") as hf:
        for vid in keys:
            if vid in hf:
                continue
            captions = [e["caption"] for e in refs[vid]]
            ids, mask, lens = tokenizer.encode_batch(captions)
            hidden = np.asarray(fn(variables, jnp.asarray(ids),
                                   jnp.asarray(mask)))
            hf[vid] = pool_caption_embs(hidden, lens, mode).astype(np.float32)
    return out_path
