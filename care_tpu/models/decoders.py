"""Decoders: Transformer (AR + NAR), two-stage NAR, and RNN families.

Parity targets: reference ``models/Decoder/Transformer.py`` (pad+causal
masks, G-LSG prefix-mask surgery, NAR input enhancement, per-layer attention
collection, the rich output dict consumed by the loss layer),
``RNN_single_layer.py`` (SA-LSTM with additive/MHA attention, v2h/v2c init,
scheduled sampling, semantic global add + local attention) and
``RNN_multi_layers.py`` (TopDown two-cell decoder).

TPU-first deltas:
* masks are additive 0/-1e9 biases computed as pure functions of the token
  ids -- no boolean masked_fill;
* the AR hot path is NOT this full forward: ``care_tpu.decoding.beam_search``
  drives the layers' ``step``/KV-cache methods instead (the reference
  re-runs this full forward per beam step, ``Translator.py:111-133``);
* NAR "resample" input enhancement is vectorised (no per-row python loop).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from care_tpu import constants
from care_tpu.models.common import Dense, xavier
from care_tpu.models.embeddings import Embeddings, NaiveEmbeddings
from care_tpu.models.layers import DecoderLayer
from care_tpu.models.predictors import TextPostProcesser
from care_tpu.ops.attention import NEG_INF


# ---------------------------------------------------------------------------
# mask builders (pure functions)
# ---------------------------------------------------------------------------

def key_pad_bias(seq_k, len_q: int):
    """Additive bias masking PAD keys: [B, 1, len_q, len_k]."""
    pad = (seq_k == constants.PAD)
    bias = jnp.where(pad[:, None, None, :], NEG_INF, 0.0).astype(jnp.float32)
    return jnp.broadcast_to(bias, (seq_k.shape[0], 1, len_q, seq_k.shape[1]))


def causal_bias(len_s: int, watch: int = 0):
    """Additive causal bias [1, 1, len_s, len_s]; optional `watch` window."""
    i = jnp.arange(len_s)[:, None]
    j = jnp.arange(len_s)[None, :]
    future = j > i
    if watch > 0:
        future = future | (j <= i - watch)
    return jnp.where(future, NEG_INF, 0.0).astype(jnp.float32)[None, None]


def prefix_mask_surgery(bias, prefix_len: int):
    """Prepend concept-prefix rows/cols to a self-attention bias
    (reference ``Transformer.py:131-152``): every word position may attend
    to all prefix slots; each prefix slot attends ONLY to itself."""
    b = bias.shape[0]
    len_q, len_k = bias.shape[2], bias.shape[3]
    # left block: words -> prefix, fully visible
    left = jnp.zeros((b, 1, len_q, prefix_len), jnp.float32)
    bias = jnp.concatenate([left, bias], axis=3)
    # top rows: prefix -> (prefix + words); only the diagonal visible
    eye = jnp.eye(prefix_len, dtype=jnp.float32)
    top_prefix = jnp.where(eye > 0, 0.0, NEG_INF)
    top_words = jnp.full((prefix_len, len_k), NEG_INF, jnp.float32)
    top = jnp.concatenate([top_prefix, top_words], axis=1)[None, None]
    top = jnp.broadcast_to(top, (b, 1, prefix_len, prefix_len + len_k))
    return jnp.concatenate([top, bias], axis=2)


def nar_resample(source, tgt_tokens):
    """Resample encoder states to per-row target lengths
    (vectorised reference ``Transformer.py:50-63``)."""
    pad_mask = (tgt_tokens == constants.PAD)
    length = jnp.sum(~pad_mask, axis=-1)                       # [B]
    bsz, seq_len = tgt_tokens.shape
    src_len = source.shape[1]
    scale = src_len / jnp.maximum(length, 1).astype(jnp.float32)  # [B]
    idx = (jnp.arange(seq_len)[None, :] * scale[:, None]).astype(jnp.int32)
    idx = jnp.minimum(idx, src_len - 1)
    return jnp.take_along_axis(source, idx[:, :, None], axis=1)


# ---------------------------------------------------------------------------
# transformer decoder
# ---------------------------------------------------------------------------

class TransformerDecoder(nn.Module):
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        if opt.get("TAP_pos", False) or opt.get("TAP_ln", False):
            self.TPP = TextPostProcesser(opt, name="TPP")
        self.embedding = Embeddings(opt, name="embedding")
        num_layers = opt["num_hidden_layers_decoder"]
        self.layers = [DecoderLayer(opt, is_last=(i == num_layers - 1),
                                    name=f"layer_{i}")
                       for i in range(num_layers)]
        if opt.get("transformer_pre_ln", False):
            self.final_ln = nn.LayerNorm(epsilon=opt["layer_norm_eps"],
                                         name="LayerNorm")
        self.dropout = nn.Dropout(opt["hidden_dropout_prob"])
        self.enhance_input = opt["enhance_input"]
        self.decoding_type = opt["decoding_type"]

    # ----- embedding helpers -------------------------------------------------
    def get_sentence_embeddings(self, input_ids, average_pooling: bool = True,
                                deterministic: bool = True):
        embs = self.embedding.embed_tokens(input_ids)
        if average_pooling:
            mask = (embs != constants.PAD).astype(jnp.float32)
            n_words = mask.sum(axis=1, keepdims=True)
            embs = jnp.sum(embs * mask, axis=1) / jnp.squeeze(n_words, 1)
        if hasattr(self, "TPP"):
            embs = self.TPP(embs, deterministic=deterministic)
        return embs

    def get_attr_embeddings(self, attr_input_ids, deterministic: bool = True):
        embs = self.embedding.embed_tokens(attr_input_ids)
        if hasattr(self, "TPP"):
            embs = self.TPP(embs, deterministic=deterministic)
        return embs

    def _prefix_len(self) -> int:
        opt = self.opt
        t = opt.get("use_attr_type") or ""
        if opt.get("use_attr", False) and "prefix" in t:
            return opt["use_attr_topk"]
        if opt.get("use_attr", False) and "pp" in t:
            return 1
        return 0

    def _self_attention_bias(self, input_ids, decoding_type):
        bias = key_pad_bias(input_ids, input_ids.shape[1])
        if decoding_type != "NARFormer":
            bias = bias + causal_bias(input_ids.shape[1],
                                      self.opt.get("watch", 0))
        prefix_len = self._prefix_len()
        if prefix_len:
            bias = prefix_mask_surgery(bias, prefix_len)
        return bias

    # ----- full forward (training / NAR iterations) ---------------------------
    def __call__(self, input_ids, encoder_hidden_states=None, category=None,
                 category_embs=None, semantic_embs=None,
                 semantic_hidden_states=None, preds_attr=None,
                 attr_input_ids=None, decoding_type: Optional[str] = None,
                 deterministic: bool = True,
                 return_input_embs: bool = False,
                 collect_aux: bool = True,
                 **kwargs) -> Dict[str, Any]:
        opt = self.opt
        decoding_type = decoding_type or self.decoding_type

        if isinstance(encoder_hidden_states, (list, tuple)):
            assert len(encoder_hidden_states) == 1
            encoder_hidden_states = encoder_hidden_states[0]

        attention_bias = self._self_attention_bias(input_ids, decoding_type)
        # all encoder positions are visible (reference builds an all-ones
        # src_seq, Transformer.py:179-180) -> no cross bias needed
        encoder_attention_bias = None

        additional_feats = None
        if decoding_type == "NARFormer":
            if self.enhance_input == 1:
                additional_feats = nar_resample(encoder_hidden_states, input_ids)
            elif self.enhance_input == 2:
                additional_feats = jnp.broadcast_to(
                    encoder_hidden_states.mean(axis=1, keepdims=True),
                    (input_ids.shape[0], input_ids.shape[1],
                     encoder_hidden_states.shape[-1]))
            elif self.enhance_input != 0:
                raise ValueError("enhance_input should be 0, 1 or 2")

        input_embs = self.embedding(
            input_ids, category=category, category_embs=category_embs,
            additional_feats=additional_feats,
            semantic_hidden_states=semantic_hidden_states,
            deterministic=deterministic)

        original_input_embs = input_embs
        if opt.get("use_attr", False) and "prefix" in (opt.get("use_attr_type") or ""):
            assert semantic_embs is not None
            input_embs = jnp.concatenate([semantic_embs, input_embs], axis=1)

        if return_input_embs:
            return input_embs

        all_hidden_states = [input_embs]
        all_intra, all_inter, all_attr = (), (), ()
        for layer in self.layers:
            hidden_states, probs, contexts, embs = layer(
                all_hidden_states[-1], encoder_hidden_states,
                attention_mask=attention_bias,
                encoder_attention_mask=encoder_attention_bias,
                semantic_embs=semantic_embs, preds_attr=preds_attr,
                deterministic=deterministic, decoding_type=decoding_type,
                n_frames=opt["n_frames"])
            intra_probs, inter_probs, *rest = probs
            text_context, context, *_ = contexts
            self_embs, cross_embs, *_ = embs
            all_hidden_states.append(hidden_states)
            all_intra += (intra_probs,)
            all_inter += (inter_probs,)
            if rest:
                all_attr += (rest[0],)

        hidden_states = all_hidden_states[-1]
        if hasattr(self, "final_ln"):
            hidden_states = self.final_ln(hidden_states)
        hidden_states = self.dropout(hidden_states, deterministic=deterministic)

        outputs: Dict[str, Any] = {"hidden_states": hidden_states}
        if collect_aux:
            outputs.update({
                "all_hidden_states": all_hidden_states,
                "all_intra_attentions": all_intra,
                "all_inter_attentions": all_inter,
                "attention_probs": all_inter[-1].mean(axis=1),
                "context": context,
                "text_context": text_context,
                "self_embs": self_embs,
                "cross_embs": cross_embs,
                "input_embs": original_input_embs,
                "input_embs_exclude_bos": original_input_embs[:, 1:, :],
                "sentence_embs": self.get_sentence_embeddings(
                    input_ids, average_pooling=False,
                    deterministic=deterministic),
            })
            if opt.get("use_attr"):
                outputs["attr_attention_probs"] = all_attr
            if attr_input_ids is not None:
                outputs["attr_embs"] = self.get_attr_embeddings(
                    attr_input_ids, deterministic=deterministic)
        return outputs

    # ----- KV-cached incremental decoding --------------------------------------
    def init_decode_state(self, batch_size: int, max_len: int,
                          encoder_hidden_states, semantic_embs=None,
                          semantic_hidden_states=None, preds_attr=None,
                          category=None, category_embs=None,
                          dtype=jnp.float32, beam_size: int = 1) -> Dict[str, Any]:
        """Build the decode cache: cross-attn K/V per layer + empty self KV.

        The G-LSG concept prefix (``prefix``/``pp_emb`` modes) is prefilled
        into the self-attention cache; word positions then attend over
        [prefix ; generated words], reproducing the prefix mask semantics
        (prefix rows never become queries during stepping).

        ``beam_size`` > 1: the encoder-side inputs arrive UN-enlarged
        ([B, ...]); only the per-row state (self KV cache, aux consumed by
        the per-token embedding/projections) is expanded to ``batch_size``
        (= B*beam) rows. Cross-attention and attr K/V stay at [B] — beams
        of one instance attend over identical keys, so ``attend`` folds the
        beam into the query rows instead of duplicating K/V in HBM (the
        decode roofline's dominant traffic term).
        """
        opt = self.opt
        if isinstance(encoder_hidden_states, (list, tuple)):
            encoder_hidden_states = encoder_hidden_states[0]
        h = opt["num_attention_heads"]
        dh = opt["dim_hidden"] // h
        prefix_len = self._prefix_len()
        cache_len = max_len + prefix_len
        rep = (lambda x: None if x is None
               else jnp.repeat(x, beam_size, axis=0)) if beam_size > 1 \
            else (lambda x: x)

        layers_state = []
        for layer in self.layers:
            inter_kv, attr_kv = layer.init_step(
                encoder_hidden_states, semantic_embs=semantic_embs,
                preds_attr=preds_attr)
            self_k = jnp.zeros((batch_size, h, cache_len, dh), dtype)
            self_v = jnp.zeros((batch_size, h, cache_len, dh), dtype)
            layers_state.append({"inter_kv": inter_kv, "attr_kv": attr_kv,
                                 "self_k": self_k, "self_v": self_v})

        state = {"layers": layers_state,
                 "aux": {"category": rep(category),
                         "category_embs": rep(category_embs),
                         "semantic_hidden_states": rep(semantic_hidden_states),
                         "semantic_embs": semantic_embs,
                         "preds_attr": rep(preds_attr)}}

        if prefix_len:
            t = opt.get("use_attr_type") or ""
            if "prefix" in t:
                prefix_embs = semantic_embs
            else:  # pp_emb: single GSG token, embedded exactly like training
                prefix_embs = self.embedding.embed_pp_prefix(
                    semantic_hidden_states, category=category,
                    category_embs=category_embs)
            # prefix tokens see only themselves: run each layer on the prefix
            # block with a diagonal-only bias to obtain its K/V per layer.
            x = prefix_embs
            diag = jnp.where(jnp.eye(prefix_len, dtype=bool), 0.0, NEG_INF)
            diag = diag[None, None].astype(jnp.float32)
            for li, layer in enumerate(self.layers):
                # prefill runs at [B]; the per-beam cache rows of one
                # instance get identical prefix K/V (rep is instance-major)
                k, v = layer.prefill_self_kv(x, preds_attr=preds_attr)
                st = layers_state[li]
                st["self_k"] = st["self_k"].at[:, :, :prefix_len, :].set(
                    rep(k).astype(st["self_k"].dtype))
                st["self_v"] = st["self_v"].at[:, :, :prefix_len, :].set(
                    rep(v).astype(st["self_v"].dtype))
                # advance prefix hidden states through the layer so deeper
                # layers cache the correct representations
                x, _, _, _ = layer(
                    x, encoder_hidden_states, attention_mask=diag,
                    encoder_attention_mask=None, semantic_embs=semantic_embs,
                    preds_attr=preds_attr, deterministic=True,
                    decoding_type="ARFormer", n_frames=opt["n_frames"])
        return state

    def decode_step(self, token_ids, position, state) -> Dict[str, Any]:
        """One AR step. token_ids: [B] int32; position: scalar int32 (word
        position, 0-based). Returns (hidden [B, D], new_state)."""
        opt = self.opt
        prefix_len = self._prefix_len()
        aux = state["aux"]
        cache_len = state["layers"][0]["self_k"].shape[2]

        # word tokens in prefix/pp modes are embedded WITHOUT the semantic
        # term (the prefix carries it, and it's already prefilled into the
        # cache); in plain 'emb' GSG mode the per-token add applies
        x = self.embedding(
            token_ids[:, None], category=aux["category"],
            category_embs=aux["category_embs"],
            semantic_hidden_states=(None if prefix_len else
                                    aux["semantic_hidden_states"]),
            position_ids=jnp.full((token_ids.shape[0], 1), position),
            deterministic=True)

        cache_pos = position + prefix_len
        # bias over the cache: visible = prefix slots + positions <= current
        ar = jnp.arange(cache_len)
        visible = (ar < prefix_len) | ((ar >= prefix_len) &
                                       (ar <= cache_pos))
        self_bias = jnp.where(visible, 0.0, NEG_INF).astype(jnp.float32)
        self_bias = self_bias[None, None, None, :]

        fused_qkv = opt.get("decode_fused_qkv", True)
        new_layers = []
        h = x
        for layer, st in zip(self.layers, state["layers"]):
            if fused_qkv:
                # fused q/k/v projection: ONE matmul launch per layer
                # instead of three, identical results.  A/B on v5e was
                # neutral (0.3715 vs 0.3724 s/call fused-K8 — the 1.6 ms
                # step is not launch-count-bound on this runtime); kept
                # as the default for runtimes where dispatch dominates.
                q_new, (k_new, v_new) = layer.self_qkv(
                    h, preds_attr=aux["preds_attr"])
            else:
                q_new = None
                k_new, v_new = layer.prefill_self_kv(
                    h, preds_attr=aux["preds_attr"])
            # half-precision decode: intermediate ops may up/down-cast, but
            # the cache dtype is authoritative (dynamic_update_slice
            # requires exact dtype match)
            self_k = jax.lax.dynamic_update_slice(
                st["self_k"], k_new.astype(st["self_k"].dtype),
                (0, 0, cache_pos, 0))
            self_v = jax.lax.dynamic_update_slice(
                st["self_v"], v_new.astype(st["self_v"].dtype),
                (0, 0, cache_pos, 0))
            # RPE rows select by the position in the full (prefix + words)
            # sequence
            h = layer.step(h, cache_pos, (self_k, self_v), st["inter_kv"],
                           attr_kv=st["attr_kv"], self_bias=self_bias,
                           preds_attr=aux["preds_attr"],
                           n_frames=opt["n_frames"], q=q_new)
            new_layers.append({**st, "self_k": self_k, "self_v": self_v})

        if hasattr(self, "final_ln"):
            h = self.final_ln(h)
        new_state = {**state, "layers": new_layers}
        return h[:, 0, :], new_state


class TwoStageTransformerDecoder(TransformerDecoder):
    """NACF decoder: a visual-word pass (all <vis>) + an MLM pass
    (reference ``Transformer.py:271-287``)."""

    def __call__(self, input_ids, *args, **kwargs):
        if isinstance(input_ids, (list, tuple)):
            assert len(input_ids) in (2, 3)
            outputs1 = super().__call__(input_ids[0], *args, **kwargs)
            outputs2 = super().__call__(input_ids[1], *args, **kwargs)
            outputs2["hidden_states"] = [outputs1["hidden_states"],
                                         outputs2["hidden_states"]]
            if len(input_ids) == 3:
                kw = dict(kwargs)
                kw["return_input_embs"] = True
                outputs2["input_embs"] = super().__call__(input_ids[2], *args, **kw)
                outputs2["sentence_embs"] = self.get_sentence_embeddings(
                    input_ids[2], average_pooling=False,
                    deterministic=kwargs.get("deterministic", True))
            return outputs2
        return super().__call__(input_ids, *args, **kwargs)


# ---------------------------------------------------------------------------
# RNN decoders
# ---------------------------------------------------------------------------

class AdditiveAttention(nn.Module):
    """Bahdanau attention with per-modality loop
    (reference ``Attention.py:134-206``)."""
    dim_hidden: int
    dim_mid: int
    num_feats: int = 1
    feats_share_weights: bool = False
    add_hybrid_attention_bias: bool = False
    hybrid_length: int = 0

    @nn.compact
    def __call__(self, hidden_states, feats, return_raw: bool = False):
        if not isinstance(feats, (list, tuple)):
            feats = [feats]
        n_layers = 1 if self.feats_share_weights else len(feats)
        f_layers = [Dense(self.dim_mid, name=f"linear1_f_{i}")
                    for i in range(n_layers)]
        h_layer = Dense(self.dim_mid, name="linear1_h")
        out_layer = Dense(1, use_bias=False, name="linear2")
        hybrid = None
        if self.add_hybrid_attention_bias:
            hybrid = self.param("hybrid_bias", nn.initializers.zeros,
                                (1, self.hybrid_length))

        emb_h = h_layer(hidden_states)[:, None, :]     # [B, 1, mid]
        probs, context = [], []
        for i, inputs in enumerate(feats):
            layer = f_layers[min(i, n_layers - 1)]
            emb_f = layer(inputs)                      # [B, L, mid]
            logits = out_layer(nn.tanh(emb_h + emb_f))[:, :, 0]  # [B, L]
            if hybrid is not None:
                logits = logits + hybrid
            p = jax.nn.softmax(logits, axis=1)
            ctx = jnp.einsum("bl,bld->bd", p, inputs)
            probs.append(p)
            context.append(ctx)

        if return_raw:
            return context, probs
        return jnp.concatenate(context, axis=1), jnp.stack(probs, axis=1)


class MultiLevelAttention(nn.Module):
    """Two-stage temporal->modality attention (reference
    ``Attention.py:209-237``)."""
    dim_hidden: int
    dim_mid: int
    num_feats: int
    feats_share_weights: bool = False

    @nn.compact
    def __call__(self, hidden_states, feats, return_raw: bool = False):
        temporal = AdditiveAttention(self.dim_hidden, self.dim_mid,
                                     num_feats=self.num_feats,
                                     feats_share_weights=self.feats_share_weights,
                                     name="temporal_aware_attention")
        modal = AdditiveAttention(self.dim_hidden, self.dim_mid,
                                  name="modality_aware_attention")
        context, probs = temporal(hidden_states, feats, return_raw=True)
        stacked = jnp.stack(context, axis=1)  # [B, num_feats, D]
        ctx2, probs2 = modal(hidden_states, stacked, return_raw=True)
        # temporal probs are [B, L] per feat; modality probs are
        # [B, num_feats] — stack the temporal ones for the recorder (the
        # reference stacks both, which only type-checks when the shapes
        # coincide; we keep the well-defined part)
        return ctx2[0], jnp.stack(probs, axis=1)


def _rnn_uniform_init(features):
    """torch LSTMCell/GRUCell default init: U(-1/sqrt(h), 1/sqrt(h)) for all
    kernels and biases (the reference's xavier pass touches only Linear and
    Embedding modules, so cells keep this default)."""
    k = 1.0 / (features ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -k, k)
    return init


def _rnn_dense(features_out, cell_features, name, forget_offset=0.0):
    init = _rnn_uniform_init(cell_features)
    if forget_offset:
        base = init
        h = cell_features

        def bias_init(key, shape, dtype=jnp.float32):
            b = base(key, shape, dtype)
            return b.at[h:2 * h].add(forget_offset)
        return nn.Dense(features_out, kernel_init=init, bias_init=bias_init,
                        name=name)
    return nn.Dense(features_out, kernel_init=init, bias_init=init, name=name)


class LSTMCellTorch(nn.Module):
    """LSTM cell matching torch.nn.LSTMCell semantics (uniform init, gate
    order i,f,g,o). The reference adds +1.0 to the forget chunk of BOTH
    bias_ih and bias_hh post-init (``_init_lstm_forget_bias``), so the
    offset is baked into both bias initialisers here — the cell body stays
    pure, which also makes torch-weight transplantation exact."""
    features: int

    @nn.compact
    def __call__(self, carry, inputs):
        h, c = carry
        gates = (_rnn_dense(4 * self.features, self.features, "ih",
                            forget_offset=1.0)(inputs)
                 + _rnn_dense(4 * self.features, self.features, "hh",
                              forget_offset=1.0)(h))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f)
        g = nn.tanh(g)
        o = nn.sigmoid(o)
        new_c = f * c + i * g
        new_h = o * nn.tanh(new_c)
        return (new_h, new_c), new_h


class GRUCellTorch(nn.Module):
    features: int

    @nn.compact
    def __call__(self, carry, inputs):
        h = carry
        rz = nn.sigmoid(
            _rnn_dense(2 * self.features, self.features, "ih_rz")(inputs)
            + _rnn_dense(2 * self.features, self.features, "hh_rz")(h))
        r, z = jnp.split(rz, 2, axis=-1)
        n = nn.tanh(_rnn_dense(self.features, self.features, "ih_n")(inputs)
                    + r * _rnn_dense(self.features, self.features,
                                     "hh_n")(h))
        new_h = (1 - z) * n + z * h
        return new_h, new_h


def _word_embedding_init(opt):
    """Word-embedding initializer: frozen pretrained table when
    ``pretrained_embs_path`` is set (reference ``RNN_single_layer.py:58-69``),
    xavier with zeroed PAD row otherwise."""
    if opt.get("pretrained_embs_path", ""):
        import numpy as np
        table = np.load(opt["pretrained_embs_path"]).astype(np.float32)
        assert table.shape == (opt["vocab_size"], opt["dim_hidden"]), \
            table.shape
        return lambda key, shape: jnp.asarray(table)
    return lambda key, shape: xavier()(key, shape).at[constants.PAD].set(0.0)


def _mean_video_features(encoder_hidden_states):
    if not isinstance(encoder_hidden_states, (list, tuple)):
        encoder_hidden_states = [encoder_hidden_states]
    mean_v = jnp.mean(jnp.stack(encoder_hidden_states, axis=0), axis=0)
    return mean_v.mean(axis=1)


class SingleLayerRNNDecoder(nn.Module):
    """SA-LSTM style single-cell decoder (reference ``RNN_single_layer.py``)."""
    opt: Dict[str, Any]
    has_v2h_v2c: bool = True

    def setup(self):
        opt = self.opt
        self.word_embeddings = self.param(
            "word_embeddings", _word_embedding_init(opt),
            (opt["vocab_size"], opt["dim_hidden"]))
        self.LayerNorm = nn.LayerNorm(epsilon=opt.get("layer_norm_eps", 1e-12))

        self.rnn_type = opt.get("rnn_type", "lstm").lower()
        cell_cls = LSTMCellTorch if self.rnn_type == "lstm" else GRUCellTorch
        self.rnn = cell_cls(opt["dim_hidden"], name="rnn")

        if self.has_v2h_v2c:
            self.v2h = Dense(opt["dim_hidden"], name="v2h")
            if self.rnn_type == "lstm":
                self.v2c = Dense(opt["dim_hidden"], name="v2c")

        modality = opt.get("modality_for_decoder") or opt["modality"]
        self.num_modality = len(modality)
        self.num_att_modality = (1 if opt["fusion"] == "temporal_concat"
                                 else self.num_modality)

        self.semantic_global_flag = (opt.get("use_attr", False)
                                     and "emb" in (opt.get("use_attr_type") or ""))
        self.semantic_local_flag = (opt.get("use_attr", False)
                                    and "att" in (opt.get("use_attr_type") or ""))

        hybrid_length = (opt["n_frames"] * self.num_modality
                         + opt.get("use_attr_topk", 30))
        self.mha_flag = opt.get("rnn_use_mha", False)
        if self.mha_flag:
            from care_tpu.models.layers import MultiHeadAttention
            self.att = MultiHeadAttention(
                dim_hidden=opt["dim_hidden"],
                num_attention_heads=opt["num_attention_heads"],
                attention_probs_dropout_prob=opt["attention_probs_dropout_prob"],
                hidden_dropout_prob=opt["hidden_dropout_prob"],
                layer_norm_eps=opt["layer_norm_eps"],
                attend_to_video=True,
                add_hybrid_attention_bias=opt.get("add_hybrid_attention_bias",
                                                  False),
                hybrid_length=hybrid_length,
                name="att")
        elif opt.get("with_multileval_attention", False):
            self.att = MultiLevelAttention(
                opt["dim_hidden"], opt["dim_hidden"],
                num_feats=self.num_att_modality,
                feats_share_weights=opt.get("feats_share_weights", False),
                name="att")
        else:
            self.att = AdditiveAttention(
                opt["dim_hidden"], opt["dim_hidden"],
                num_feats=self.num_att_modality,
                feats_share_weights=opt.get("feats_share_weights", False),
                add_hybrid_attention_bias=opt.get("add_hybrid_attention_bias", False),
                hybrid_length=hybrid_length,
                name="att")

        if self.semantic_local_flag:
            self.semantic_att = AdditiveAttention(
                opt["dim_hidden"], opt["dim_hidden"], name="semantic_att")

        self.dropout = nn.Dropout(opt["hidden_dropout_prob"])
        self.with_category = opt.get("with_category", False)

    def init_rnn_state(self, encoder_hidden_states):
        mean_v = _mean_video_features(encoder_hidden_states)
        if self.has_v2h_v2c:
            hidden = self.v2h(mean_v)
            cell = self.v2c(mean_v) if self.rnn_type == "lstm" else None
        else:
            # reference ``RNN_single_layer.py:91-113``: with v2h/v2c set to
            # None (VOE), h0/c0 are the RAW mean video features, not zeros
            hidden = mean_v
            cell = mean_v if self.rnn_type == "lstm" else None
        return (hidden, cell) if self.rnn_type == "lstm" else hidden

    def _get_h(self, state):
        return state[0] if self.rnn_type == "lstm" else state

    def forward_step(self, it, encoder_hidden_states, rnn_state=None,
                     category=None, semantic_embs=None,
                     semantic_hidden_states=None,
                     deterministic: bool = True, **kwargs):
        if rnn_state is None:
            rnn_state = self.init_rnn_state(encoder_hidden_states)

        h_query = self._get_h(rnn_state)
        if self.mha_flag:
            # reference RNN_single_layer.py:298-306: MHA over the fused
            # encoder states with h(t-1) as the query
            context, attention_probs, _ = self.att(
                h_query[:, None, :],
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=None, deterministic=deterministic)
            context = context[:, 0, :]
        else:
            context, attention_probs = self.att(h_query,
                                                encoder_hidden_states)

        word = jnp.take(self.word_embeddings, it, axis=0)
        if self.semantic_global_flag:
            word = word + semantic_hidden_states
        word = self.LayerNorm(word)

        rnn_inputs = [word]
        if self.with_category:
            rnn_inputs.append(category)
        rnn_inputs.append(context)

        outputs = {"context": context, "attention_probs": attention_probs}
        if self.semantic_local_flag:
            sem_ctx, sem_probs = self.semantic_att(h_query, semantic_embs)
            rnn_inputs.append(sem_ctx)
            outputs["semantic_attention_probs"] = sem_probs

        x = self.dropout(jnp.concatenate(rnn_inputs, axis=-1),
                         deterministic=deterministic)
        rnn_state, _ = self.rnn(rnn_state, x)
        final_h = self._get_h(rnn_state)
        outputs.update({
            "hidden_states": self.dropout(final_h, deterministic=deterministic),
            "decoder_rnn_hidden_states": rnn_state,
        })
        return outputs

    def __call__(self, input_ids, encoder_hidden_states, cls_head=None,
                 schedule_sampling_prob: float = 0.0,
                 deterministic: bool = True, **kwargs):
        """Teacher-forcing scan with optional scheduled sampling
        (reference ``RNN_single_layer.py:179-222``); see
        :func:`_rnn_training_scan`."""
        return _rnn_training_scan(self, input_ids, encoder_hidden_states,
                                  cls_head, schedule_sampling_prob,
                                  deterministic, **kwargs)


def VOERNNDecoder(opt, name="decoder"):
    """SingleLayerRNNDecoder without the v2h/v2c init
    (reference ``RNN_single_layer.py:354-356``)."""
    return SingleLayerRNNDecoder(opt, has_v2h_v2c=False, name=name)


def _rnn_training_scan(decoder, input_ids, encoder_hidden_states, cls_head,
                       schedule_sampling_prob, deterministic, **kwargs):
    """Teacher-forcing RNN training forward as ONE ``nn.scan`` over time
    (reference ``RNN_single_layer.py:179-222`` semantics, including
    scheduled sampling), shared by both RNN decoders.

    TPU rationale: the previous python-unrolled loop emitted a ``max_len``-x
    copy of the step graph per config — exactly the compile-surface the
    tunnel punishes.  ``nn.scan`` compiles the step once; per-step dropout /
    sampling rngs come from ``split_rngs``.  With scheduled sampling the
    previous step's logits ride in the carry (``cls_head`` is invoked inside
    the scan); in the pure teacher-forcing path logits are instead computed
    after the scan as one batched ``[B, T, V]`` projection feeding the MXU.
    Scheduled sampling is gated on the static ``opt`` switch
    (``scheduled_sampling_start >= 0``), not the traced probability, so the
    jitted train step never branches on a tracer.
    """
    opt = decoder.opt
    bsz, seq_len = input_ids.shape
    use_ss = ((not deterministic)
              and opt.get("scheduled_sampling_start", -1) >= 0
              and cls_head is not None)
    state0 = decoder.init_rnn_state(encoder_hidden_states)
    xs_ids = jnp.swapaxes(input_ids, 0, 1)        # [T, B]
    split_rngs = {"params": False, "dropout": True, "sampling": True}

    if use_ss:
        def body(mod, carry, xs):
            rnn_state, prev_logits = carry
            it_teacher, first = xs
            k1, k2 = jax.random.split(mod.make_rng("sampling"))
            coin = jax.random.uniform(k1, (bsz,))
            sampled = jax.random.categorical(k2, prev_logits, axis=-1)
            it = jnp.where(first | (coin >= schedule_sampling_prob),
                           it_teacher, sampled)
            out = mod.forward_step(it, encoder_hidden_states, rnn_state,
                                   deterministic=deterministic, **kwargs)
            logits = cls_head(out["hidden_states"])
            return ((out["decoder_rnn_hidden_states"], logits),
                    {"hidden_states": out["hidden_states"],
                     "attention_probs": out["attention_probs"],
                     "logits": logits})

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs=split_rngs, in_axes=0, out_axes=0)
        logits0 = jnp.zeros((bsz, opt["vocab_size"]))
        _, ys = scan(decoder, (state0, logits0),
                     (xs_ids, jnp.arange(seq_len) == 0))
        logits = jnp.swapaxes(ys["logits"], 0, 1)
        hidden = jnp.swapaxes(ys["hidden_states"], 0, 1)
    else:
        def body(mod, carry, it):
            out = mod.forward_step(it, encoder_hidden_states, carry,
                                   deterministic=deterministic, **kwargs)
            return out["decoder_rnn_hidden_states"], {
                "hidden_states": out["hidden_states"],
                "attention_probs": out["attention_probs"]}

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs=split_rngs, in_axes=0, out_axes=0)
        _, ys = scan(decoder, state0, xs_ids)
        hidden = jnp.swapaxes(ys["hidden_states"], 0, 1)
        logits = cls_head(hidden)

    return {
        "hidden_states": hidden,
        # [T, B, ...] -> stacked-on-axis-2 layout of the unrolled loop
        "attention_probs": jnp.moveaxis(ys["attention_probs"], 0, 2),
        "logits": logits,
        "sentence_embs": jnp.take(decoder.word_embeddings, input_ids,
                                  axis=0),
    }


class TopDownAttentionRNNDecoder(nn.Module):
    """Two-cell bottom-up/top-down decoder (reference
    ``RNN_multi_layers.py:60-184``)."""
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        self.word_embeddings = self.param(
            "word_embeddings", _word_embedding_init(opt),
            (opt["vocab_size"], opt["dim_hidden"]))
        self.LayerNorm = nn.LayerNorm(epsilon=opt.get("layer_norm_eps", 1e-12))
        self.rnn_type = opt.get("rnn_type", "lstm").lower()
        cell_cls = LSTMCellTorch if self.rnn_type == "lstm" else GRUCellTorch
        self.bottom_rnn = cell_cls(opt["dim_hidden"], name="bottom_rnn")
        self.top_rnn = cell_cls(opt["dim_hidden"], name="top_rnn")
        self.v2h = Dense(opt["dim_hidden"], name="v2h")
        self.v2c = Dense(opt["dim_hidden"], name="v2c")

        modality = opt.get("modality_for_decoder") or opt["modality"]
        self.num_modality = len(modality)
        self.num_att_modality = (1 if opt["fusion"] == "temporal_concat"
                                 else self.num_modality)
        self.semantic_global_flag = (opt.get("use_attr", False)
                                     and "emb" in (opt.get("use_attr_type") or ""))
        self.semantic_local_flag = (opt.get("use_attr", False)
                                    and "att" in (opt.get("use_attr_type") or ""))
        hybrid_length = (opt["n_frames"] * self.num_modality
                         + opt.get("use_attr_topk", 30))
        self.mha_flag = opt.get("rnn_use_mha", False)
        if self.mha_flag:
            from care_tpu.models.layers import MultiHeadAttention
            self.att = MultiHeadAttention(
                dim_hidden=opt["dim_hidden"],
                num_attention_heads=opt["num_attention_heads"],
                attention_probs_dropout_prob=opt["attention_probs_dropout_prob"],
                hidden_dropout_prob=opt["hidden_dropout_prob"],
                layer_norm_eps=opt["layer_norm_eps"],
                attend_to_video=True,
                add_hybrid_attention_bias=opt.get("add_hybrid_attention_bias",
                                                  False),
                hybrid_length=hybrid_length, name="att")
        else:
            self.att = AdditiveAttention(
                opt["dim_hidden"], opt["dim_hidden"],
                num_feats=self.num_att_modality,
                feats_share_weights=opt.get("feats_share_weights", False),
                add_hybrid_attention_bias=opt.get("add_hybrid_attention_bias",
                                                  False),
                hybrid_length=hybrid_length, name="att")
        if self.semantic_local_flag:
            self.semantic_att = AdditiveAttention(
                opt["dim_hidden"], opt["dim_hidden"], name="semantic_att")
        self.dropout = nn.Dropout(opt["hidden_dropout_prob"])
        self.with_category = opt.get("with_category", False)

    def init_rnn_state(self, encoder_hidden_states):
        mean_v = _mean_video_features(encoder_hidden_states)
        hidden = nn.tanh(self.v2h(mean_v))
        if self.rnn_type == "lstm":
            cell = nn.tanh(self.v2c(mean_v))
            bottom = (hidden, cell)
            top = (jnp.zeros_like(hidden), jnp.zeros_like(cell))
        else:
            bottom = hidden
            top = jnp.zeros_like(hidden)
        return [bottom, top]

    def _get_h(self, state):
        return state[0] if self.rnn_type == "lstm" else state

    def forward_step(self, it, encoder_hidden_states, rnn_state=None,
                     category=None, semantic_embs=None,
                     semantic_hidden_states=None,
                     deterministic: bool = True, **kwargs):
        if rnn_state is None:
            rnn_state = self.init_rnn_state(encoder_hidden_states)
        bottom_state, top_state = rnn_state

        word = jnp.take(self.word_embeddings, it, axis=0)
        if self.semantic_global_flag:
            word = word + semantic_hidden_states
        word = self.LayerNorm(word)
        bottom_inputs = [word, self._get_h(top_state),
                         _mean_video_features(encoder_hidden_states)]
        if self.with_category:
            bottom_inputs.append(category)
        bottom_x = self.dropout(jnp.concatenate(bottom_inputs, axis=-1),
                                deterministic=deterministic)
        bottom_state, _ = self.bottom_rnn(bottom_state, bottom_x)

        h_bottom = self._get_h(bottom_state)
        if self.mha_flag:
            context, attention_probs, _ = self.att(
                h_bottom[:, None, :],
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=None, deterministic=deterministic)
            context = context[:, 0, :]
        else:
            context, attention_probs = self.att(h_bottom,
                                                encoder_hidden_states)
        top_inputs = [h_bottom, context]
        outputs = {"context": context, "attention_probs": attention_probs}
        if self.semantic_local_flag:
            sem_ctx, sem_probs = self.semantic_att(h_bottom, semantic_embs)
            top_inputs.append(sem_ctx)
            outputs["semantic_attention_probs"] = sem_probs
        top_x = self.dropout(jnp.concatenate(top_inputs, axis=-1),
                             deterministic=deterministic)
        top_state, _ = self.top_rnn(top_state, top_x)

        final_h = self._get_h(top_state)
        outputs.update({
            "hidden_states": self.dropout(final_h, deterministic=deterministic),
            "decoder_rnn_hidden_states": [bottom_state, top_state],
        })
        return outputs

    def __call__(self, input_ids, encoder_hidden_states, cls_head=None,
                 schedule_sampling_prob: float = 0.0,
                 deterministic: bool = True, **kwargs):
        return _rnn_training_scan(self, input_ids, encoder_hidden_states,
                                  cls_head, schedule_sampling_prob,
                                  deterministic, **kwargs)


def get_decoder(opt: dict) -> nn.Module:
    name = opt["decoder"]
    mapping = {
        "TransformerDecoder": lambda: TransformerDecoder(opt, name="decoder"),
        "TwoStageTransformerDecoder":
            lambda: TwoStageTransformerDecoder(opt, name="decoder"),
        "SingleLayerRNNDecoder":
            lambda: SingleLayerRNNDecoder(opt, name="decoder"),
        "VOERNNDecoder": lambda: VOERNNDecoder(opt),
        "TopDownAttentionRNNDecoder":
            lambda: TopDownAttentionRNNDecoder(opt, name="decoder"),
    }
    if name not in mapping:
        raise ValueError(f"unknown decoder `{name}`")
    return mapping[name]()
