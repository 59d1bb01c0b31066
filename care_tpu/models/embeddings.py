"""Embedding modules: word+position(+category+semantic) stacks.

TPU notes: everything is fixed-shape; position ids are passed explicitly so
the same module serves the full-sequence training path and the single-step
KV-cached decode path (the reference recomputes the whole prefix each beam
step instead, ``models/Translator.py:111-133``).

Parity targets: reference ``models/components/Embeddings.py`` (sinusoidal /
trainable PE, NaiveEmbeddings with prefix/suffix slots, the G-LSG semantic
add / prepend, category embeddings) and ``RelativePositionalEmbedding``.
"""

from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from care_tpu import constants
from care_tpu.models.common import Dense, xavier, embedding_init_with_zero_pad
from care_tpu.ops.attention import relative_position_index


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """Classic sin/cos positional table, [max_len, d_model]."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * -(np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEmbedding(nn.Module):
    """Position embedding: trainable table or fixed sinusoid."""
    max_len: int
    dim_hidden: int
    trainable: bool = False

    @nn.compact
    def __call__(self, position_ids):
        if self.trainable:
            table = self.param("embedding", xavier(),
                               (self.max_len, self.dim_hidden))
        else:
            table = jnp.asarray(sinusoid_table(self.max_len, self.dim_hidden))
        return jnp.take(table, position_ids, axis=0)


class RelativePositionBias(nn.Module):
    """Per-head relative position bias (reference ``Embeddings.py:191-218``).

    For video keys the bias over ``n_frames`` positions is tiled across the
    concatenated modality streams (reference ``Attention.py:99-100``).
    """
    max_relative_position: int
    num_heads: int
    attend_to_video: bool = False

    @nn.compact
    def __call__(self, length_q: int, length_k: int, bidirectional: bool = True,
                 tile_to: Optional[int] = None):
        table = self.param("embedding", xavier(),
                           (2 * self.max_relative_position + 1, self.num_heads))
        if self.attend_to_video:
            bidirectional = True
        idx = relative_position_index(length_q, length_k,
                                      self.max_relative_position, bidirectional)
        values = jnp.take(table, idx, axis=0)           # [lq, lk, H]
        values = jnp.transpose(values, (2, 0, 1))[None]  # [1, H, lq, lk]
        if tile_to is not None and tile_to != length_k:
            reps = tile_to // length_k
            values = jnp.tile(values, (1, 1, 1, reps))
        return values


class NaiveEmbeddings(nn.Module):
    """Word + position (+ learned prefix/suffix slots) + LN + dropout.

    Used for concept-id embeddings in the SemanticContainer and retrieved-
    caption token embeddings (reference ``Embeddings.py:30-87``).
    """
    n_words: int
    n_positions: int
    dim_hidden: int
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.5
    padding_idx: Optional[int] = None
    prefix_len: int = 0
    suffix_len: int = 0
    has_ln: bool = True
    has_dropout: bool = True

    @nn.compact
    def __call__(self, input_ids, input_embs=None, deterministic: bool = True):
        if input_embs is None:
            init = (embedding_init_with_zero_pad
                    if self.padding_idx == constants.PAD else xavier())
            table = self.param("word_embeddings", init,
                               (self.n_words, self.dim_hidden))
            input_embs = jnp.take(table, input_ids, axis=0)

        bsz = input_embs.shape[0]
        if self.prefix_len:
            prefix = self.param("prefix_embeddings", xavier(),
                                (self.prefix_len, self.dim_hidden))
            prefix = jnp.broadcast_to(prefix[None], (bsz,) + prefix.shape)
            input_embs = jnp.concatenate([prefix, input_embs], axis=1)
        if self.suffix_len:
            suffix = self.param("suffix_embeddings", xavier(),
                                (self.suffix_len, self.dim_hidden))
            suffix = jnp.broadcast_to(suffix[None], (bsz,) + suffix.shape)
            input_embs = jnp.concatenate([input_embs, suffix], axis=1)

        if self.n_positions > 0:
            pos_table = self.param("position_embeddings", xavier(),
                                   (self.n_positions, self.dim_hidden))
            seq_len = input_embs.shape[1]
            input_embs = input_embs + pos_table[None, :seq_len]

        if self.has_ln:
            input_embs = nn.LayerNorm(epsilon=self.layer_norm_eps,
                                      name="LayerNorm")(input_embs)
        if self.has_dropout:
            input_embs = nn.Dropout(self.hidden_dropout_prob)(
                input_embs, deterministic=deterministic)
        return input_embs


class Embeddings(nn.Module):
    """Decoder input embeddings (reference ``Embeddings.py:90-188``).

    word + positional (+ category) (+ NAR ``additional_feats``)
    (+ GSG ``semantic_hidden_states`` added to every token or prepended as a
    single prefix token when ``'pp_emb' in use_attr_type``) -> LN -> dropout.
    """
    opt: dict

    def setup(self):
        opt = self.opt
        if opt.get("pretrained_embs_path", ""):
            # frozen pretrained word embeddings (+ projection when the
            # embedding width differs), reference ``Embeddings.py:96-104``.
            # Freezing is enforced by the optimizer mask on
            # `frozen_param_substrings` (set in pretrained_embedding_setup).
            table = np.load(opt["pretrained_embs_path"]).astype(np.float32)
            assert table.shape[0] == opt["vocab_size"], table.shape
            self.word_embeddings = self.param(
                "word_embeddings", lambda key, shape: jnp.asarray(table),
                table.shape)
            if table.shape[1] != opt["dim_hidden"]:
                self.w2h = Dense(opt["dim_hidden"], use_bias=False,
                                 name="w2h")
        else:
            self.word_embeddings = self.param(
                "word_embeddings", embedding_init_with_zero_pad,
                (opt["vocab_size"], opt["dim_hidden"]))

        use_attr_type = opt.get("use_attr_type", "") or ""
        self.semantic_flag = "emb" in use_attr_type
        self.prefix_flag = "pp_emb" in use_attr_type

        rpe = opt.get("RPE", False)
        keep_abs = opt.get("RPE_keep_abs_pos", False)
        self.has_pos = (not rpe) or keep_abs
        if self.has_pos:
            self.position_embeddings = PositionalEmbedding(
                max_len=opt["max_len"], dim_hidden=opt["dim_hidden"],
                trainable=opt.get("trainable_pe", False))

        self.with_category = opt.get("with_category", False)
        self.use_category_embs = opt.get("use_category_embs", False)
        if self.with_category:
            if self.use_category_embs:
                self.category_embeddings = Dense(opt["dim_hidden"],
                                                 name="category_embeddings")
            else:
                self.category_table = self.param(
                    "category_embeddings", xavier(),
                    (opt["num_category"], opt["dim_hidden"]))

        self.has_ln = not opt.get("transformer_pre_ln", False)
        if self.has_ln:
            self.LayerNorm = nn.LayerNorm(epsilon=opt["layer_norm_eps"])
        self.dropout = nn.Dropout(opt["hidden_dropout_prob"])

    def embed_tokens(self, input_ids):
        embs = jnp.take(self.word_embeddings, input_ids, axis=0)
        if hasattr(self, "w2h"):
            embs = self.w2h(embs)
        return embs

    def embed_pp_prefix(self, semantic_hidden_states, category=None,
                        category_embs=None):
        """Embedding of the single GSG prefix token in ``pp_emb`` mode,
        exactly as the training path produces it (reference
        ``Embeddings.py:156-168``: no positional term, + category, then the
        shared LayerNorm; dropout off at decode time). Returns [B, 1, D]."""
        embeddings = semantic_hidden_states[:, None, :]
        if self.with_category:
            if self.use_category_embs:
                cat = self.category_embeddings(category_embs)
            else:
                cat = jnp.take(self.category_table, category.reshape(-1),
                               axis=0)
            if cat.ndim == 2:
                cat = cat[:, None, :]
            embeddings = embeddings + cat
        if self.has_ln:
            embeddings = self.LayerNorm(embeddings)
        return embeddings

    def __call__(self, input_ids, category=None, category_embs=None,
                 additional_feats=None, semantic_hidden_states=None,
                 position_ids=None, only_word_and_position: bool = False,
                 deterministic: bool = True):
        embeddings = self.embed_tokens(input_ids)

        if self.has_pos:
            if position_ids is None:
                seq_len = input_ids.shape[-1]
                position_ids = jnp.arange(seq_len)[None, :]
            embeddings = embeddings + self.position_embeddings(position_ids)

        if not only_word_and_position:
            # semantic branches are conditional on the tensor being supplied:
            # the KV-cached decode path prefills the prefix separately and
            # embeds word tokens with semantic_hidden_states=None
            if (self.semantic_flag and self.prefix_flag
                    and semantic_hidden_states is not None):
                embeddings = jnp.concatenate(
                    [semantic_hidden_states[:, None, :], embeddings], axis=1)

            if self.with_category:
                if self.use_category_embs:
                    cat = self.category_embeddings(category_embs)
                else:
                    cat = jnp.take(self.category_table,
                                   category.reshape(-1), axis=0)
                if cat.ndim == 2:
                    cat = cat[:, None, :]
                embeddings = embeddings + cat

            if additional_feats is not None:
                embeddings = embeddings + additional_feats

            if (self.semantic_flag and not self.prefix_flag
                    and semantic_hidden_states is not None):
                embeddings = embeddings + semantic_hidden_states[:, None, :]

        if self.has_ln:
            embeddings = self.LayerNorm(embeddings)
        embeddings = self.dropout(embeddings, deterministic=deterministic)
        return embeddings
