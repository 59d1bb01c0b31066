"""Transformer sublayers and encoder/decoder layers.

Parity targets: reference ``models/components/SubLayers.py`` (MultiHead
Attention with post-/pre-LN, PositionwiseFeedForward, Compositional
variants) and ``models/components/Layers.py`` (EncoderLayer, DecoderLayer
with the attr-attention placement grid and the hybrid-attention-bias length
computation).

TPU-first deltas:
* attention is a fused ``dot_product_attention`` (optionally the Pallas
  flash kernel) instead of separate matmul/masked_fill/softmax ops;
* every attention module exposes ``project_kv`` so decode loops can
  precompute cross-attention K/V once and keep a self-attention KV cache in
  HBM (the reference recomputes the whole prefix per beam step,
  ``models/Translator.py:111-133`` — the main single-chip speed lever);
* masks are additive f32 biases (0 / -1e9), never boolean masked_fill.
"""

from typing import Optional, Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from care_tpu.models.common import Dense, get_activation, CompositionalLinear
from care_tpu.models.embeddings import RelativePositionBias
from care_tpu.ops.attention import dot_product_attention, NEG_INF


def split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


class MultiHeadAttention(nn.Module):
    """Attention sublayer: SDPA + output dense + dropout + residual + LN.

    ``hybrid_length`` > 0 adds a learned per-head bias over the key axis
    (the "HA" of CARE's LSG, reference ``Attention.py:47-51,109-111``).
    """
    dim_hidden: int
    num_attention_heads: int = 1
    dim_key: Optional[int] = None
    dim_value: Optional[int] = None
    attention_probs_dropout_prob: float = 0.0
    hidden_dropout_prob: float = 0.5
    layer_norm_eps: float = 1e-12
    exclude_bias: bool = False
    has_ln: bool = True
    pre_ln: bool = False
    skip_connection: bool = True
    have_relative_position_bias: bool = False
    max_relative_position: Optional[int] = None
    attend_to_video: bool = False
    add_hybrid_attention_bias: bool = False
    hybrid_length: int = 0
    # semantic-composition (CompositionalMHA) variant
    compositional: bool = False
    dim_semantic: int = 500
    dim_factor_scale: int = 2
    use_flash: bool = False

    def setup(self):
        use_bias = not self.exclude_bias
        if self.compositional:
            dim_factor = self.dim_hidden // self.dim_factor_scale
            mk = lambda dim_in, name: CompositionalLinear(
                self.dim_hidden, dim_factor, self.dim_semantic, dim_in, name=name)
            self.query = mk(self.dim_hidden, "query")
            self.key = mk(self.dim_key or self.dim_hidden, "key")
            self.value = mk(self.dim_value or self.dim_hidden, "value")
            self.dense = mk(self.dim_hidden, "dense")
        else:
            self.query = Dense(self.dim_hidden, use_bias=use_bias, name="query")
            self.key = Dense(self.dim_hidden, use_bias=use_bias, name="key")
            self.value = Dense(self.dim_hidden, use_bias=use_bias, name="value")
            self.dense = Dense(self.dim_hidden, name="dense")

        if self.have_relative_position_bias:
            assert self.max_relative_position is not None
            self.rpe = RelativePositionBias(
                max_relative_position=self.max_relative_position,
                num_heads=self.num_attention_heads,
                attend_to_video=self.attend_to_video)

        if self.add_hybrid_attention_bias:
            assert self.attend_to_video and self.hybrid_length
            self.hybrid_bias = self.param(
                "hybrid_bias", nn.initializers.zeros,
                (self.num_attention_heads, self.hybrid_length))

        if self.has_ln:
            self.LayerNorm = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.attn_dropout = nn.Dropout(self.attention_probs_dropout_prob)
        self.out_dropout = nn.Dropout(self.hidden_dropout_prob)

    # ----- projection helpers (used by KV-cached decode) -------------------
    def project_kv(self, k_input, v_input=None, preds_attr=None):
        """Project keys/values to head form [B, H, L, Dh]."""
        if v_input is None:
            v_input = k_input
        if self.compositional:
            k = self.key(k_input, preds_attr)
            v = self.value(v_input, preds_attr)
        else:
            k = self.key(k_input)
            v = self.value(v_input)
        h = self.num_attention_heads
        return split_heads(k, h), split_heads(v, h)

    def project_q(self, q_input, preds_attr=None):
        if self.compositional:
            q = self.query(q_input, preds_attr)
        else:
            q = self.query(q_input)
        return split_heads(q, self.num_attention_heads)

    def project_qkv(self, x, preds_attr=None):
        """Fused self-attention q/k/v projection for the serial decode
        step: one [D, 3D] matmul instead of three [D, D] launches.  Each
        output element is the same dot product over the same contraction
        axis, so results are identical to the separate projections; the
        kernel concat is loop-invariant and hoisted by XLA.  Returns
        (q, (k, v)) in head form."""
        if self.compositional:
            return (self.project_q(x, preds_attr),
                    self.project_kv(x, preds_attr=preds_attr))
        pq = self.query.variables["params"]
        pk = self.key.variables["params"]
        pv = self.value.variables["params"]
        w = jnp.concatenate([pq["kernel"], pk["kernel"], pv["kernel"]],
                            axis=1).astype(x.dtype)
        out = x @ w
        if "bias" in pq:
            out = out + jnp.concatenate(
                [pq["bias"], pk["bias"], pv["bias"]]).astype(out.dtype)
        q, k, v = jnp.split(out, 3, axis=-1)
        h = self.num_attention_heads
        return split_heads(q, h), (split_heads(k, h), split_heads(v, h))

    def _make_bias(self, attention_mask, length_q, length_k, decoding_type,
                   n_frames, rpe_query_position=None, rpe_total_q=None):
        """Combine pad/causal mask, RPE and hybrid bias into one additive bias.

        ``rpe_query_position`` (scalar, KV-cached decode): the relative-
        position table is computed for the FULL query range
        (``rpe_total_q``) and the single row at the current position is
        selected — computing it with length_q=1 would wrongly anchor every
        step at position 0.
        """
        bias = None
        if attention_mask is not None:
            bias = attention_mask  # already additive 0/-1e9, [B,1,Lq,Lk]

        if self.have_relative_position_bias:
            lq = rpe_total_q if rpe_query_position is not None else length_q
            if self.attend_to_video:
                rpe_bias = self.rpe(lq, n_frames, bidirectional=True,
                                    tile_to=length_k)
            else:
                rpe_bias = self.rpe(lq, length_k,
                                    bidirectional=(decoding_type == "NARFormer"))
            if rpe_query_position is not None:
                # [1, H, Lq_full, Lk] -> [1, H, 1, Lk] row at the position
                rpe_bias = jax.lax.dynamic_slice_in_dim(
                    rpe_bias, rpe_query_position, 1, axis=2)
            bias = rpe_bias if bias is None else bias + rpe_bias

        if self.add_hybrid_attention_bias:
            hb = self.hybrid_bias[None, :, None, :]
            bias = hb if bias is None else bias + hb
        return bias

    def attend(self, q, k, v, bias, input_tensor, deterministic=True,
               use_sigmoid=False, return_probs=True, preds_attr=None,
               early_return=False):
        """Core attention given pre-projected q/k/v (head form).

        Beam-grouped cross attention: when the query batch is a multiple of
        the K/V batch (q ``[B*beam, H, 1, Dh]`` vs k/v ``[B, H, Lk, Dh]``,
        rows instance-major as ``auto_enlarge`` lays them out), the beam is
        folded into the query-length axis so the K/V rows stream from HBM
        once per *instance* per step instead of once per *beam row* — the
        dominant decode-traffic term (cross-K/V re-reads) shrinks by the
        beam factor, and the per-step QK^T matmul gets beam-times fatter
        rows. The bias must be batch-broadcastable (decode cross biases are
        ``[1, H, 1, Lk]``: hybrid bias / RPE rows, identical across beams).
        """
        bq, nh, lq, dh = q.shape
        bk = k.shape[0]
        grouped = bk != bq
        if grouped:
            assert lq == 1 and bq % bk == 0, (q.shape, k.shape)
            assert bias is None or bias.shape[0] in (1, bk), bias.shape
            group = bq // bk
            q = q.reshape(bk, group, nh, dh).transpose(0, 2, 1, 3)
        context_h, probs = dot_product_attention(
            q, k, v, bias=bias,
            use_sigmoid=use_sigmoid,
            return_probs=return_probs,
            dropout_rng=(self.make_rng("dropout")
                         if (not deterministic and
                             self.attention_probs_dropout_prob > 0) else None),
            dropout_rate=self.attention_probs_dropout_prob,
            deterministic=deterministic,
            use_flash=self.use_flash,
        )
        if grouped:
            # [bk, H, group, Dh] -> [B*beam, H, 1, Dh]
            context_h = context_h.transpose(0, 2, 1, 3).reshape(bq, nh, 1, dh)
            if probs is not None:
                probs = probs.transpose(0, 2, 1, 3).reshape(
                    bq, nh, 1, probs.shape[-1])
        merged = merge_heads(context_h)
        if self.compositional:
            context = self.dense(merged, preds_attr)
        else:
            context = self.dense(merged)
        context = self.out_dropout(context, deterministic=deterministic)

        if early_return:
            return context, probs, context

        hidden_states = context + input_tensor if self.skip_connection else context
        if not self.pre_ln and self.has_ln:
            hidden_states = self.LayerNorm(hidden_states)
        return hidden_states, probs, context

    def __call__(self, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, input_tensor=None,
                 q=None, k=None, v=None,
                 deterministic: bool = True,
                 decoding_type: str = "ARFormer",
                 n_frames: int = 0,
                 use_sigmoid: bool = False,
                 return_probs: bool = True,
                 preds_attr=None,
                 early_return: bool = False):
        if input_tensor is None:
            input_tensor = hidden_states
        if self.pre_ln and self.has_ln:
            hidden_states = self.LayerNorm(hidden_states)

        if q is None:
            if encoder_hidden_states is None:
                q_in = k_in = v_in = hidden_states
            else:
                q_in = hidden_states
                k_in = v_in = encoder_hidden_states
        else:
            q_in, k_in, v_in = q, k, v

        qh = self.project_q(q_in, preds_attr)
        kh, vh = self.project_kv(k_in, v_in, preds_attr)
        bias = self._make_bias(attention_mask, qh.shape[2], kh.shape[2],
                               decoding_type, n_frames)
        return self.attend(qh, kh, vh, bias, input_tensor,
                           deterministic=deterministic,
                           use_sigmoid=use_sigmoid, return_probs=return_probs,
                           preds_attr=preds_attr, early_return=early_return)


class GatedMultiHeadAttention(nn.Module):
    """Sigmoid-gated residual variant (reference ``SubLayers.py:84-105``)."""
    dim_hidden: int
    scalar_gate: bool = False
    mha_kwargs: Dict[str, Any] = None

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True, **kwargs):
        mha = MultiHeadAttention(dim_hidden=self.dim_hidden,
                                 **(self.mha_kwargs or {}), name="mha")
        context, probs, _ = mha(hidden_states, deterministic=deterministic,
                                early_return=True, **kwargs)
        gate_in = jnp.concatenate([hidden_states, context], axis=-1)
        gate = nn.sigmoid(
            Dense(1 if self.scalar_gate else self.dim_hidden, name="gate")(gate_in))
        out = hidden_states + gate * context
        if not mha.pre_ln:
            out = nn.LayerNorm(epsilon=mha.layer_norm_eps, name="LayerNorm")(out)
        return out, (probs, gate), context


class PositionwiseFeedForward(nn.Module):
    """2-layer FFN with residual + pre/post LN (reference ``SubLayers.py:108-152``)."""
    dim_hidden: int
    dim_intermediate: int
    hidden_act: str = "relu"
    hidden_dropout_prob: float = 0.5
    layer_norm_eps: float = 1e-12
    pre_ln: bool = False
    compositional: bool = False
    dim_semantic: int = 500
    dim_factor_scale: int = 2

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True, preds_attr=None):
        input_tensor = hidden_states
        ln = nn.LayerNorm(epsilon=self.layer_norm_eps, name="LayerNorm")
        if self.pre_ln:
            hidden_states = ln(hidden_states)

        if self.compositional:
            dim_factor = self.dim_hidden // self.dim_factor_scale
            d1 = CompositionalLinear(self.dim_intermediate, dim_factor,
                                     self.dim_semantic, self.dim_hidden,
                                     name="dense1")
            d2 = CompositionalLinear(self.dim_hidden, dim_factor,
                                     self.dim_semantic, self.dim_intermediate,
                                     name="dense2")
            hidden_states = d1(hidden_states, preds_attr)
            hidden_states = get_activation(self.hidden_act)(hidden_states)
            hidden_states = d2(hidden_states, preds_attr)
        else:
            hidden_states = Dense(self.dim_intermediate, name="dense1")(hidden_states)
            hidden_states = get_activation(self.hidden_act)(hidden_states)
            hidden_states = Dense(self.dim_hidden, name="dense2")(hidden_states)

        hidden_states = nn.Dropout(self.hidden_dropout_prob)(
            hidden_states, deterministic=deterministic)
        hidden_states = hidden_states + input_tensor
        if not self.pre_ln:
            hidden_states = ln(hidden_states)
        return hidden_states


def compute_hybrid_length(opt: dict) -> int:
    """Length of the cross-attention key axis for the hybrid bias
    (reference ``Layers.py:85-90``)."""
    modality = opt.get("modality_for_decoder") or opt["modality"]
    hybrid_length = opt["n_frames"] * len(modality) + opt.get("use_attr_topk", 30)
    if opt.get("feats") == "SwinBERTDense" and "m" in modality:
        hybrid_length = hybrid_length - opt["n_frames"] + 1568
    if "r" in modality:
        hybrid_length += opt["retrieval_topk"] - opt["n_frames"]
    return hybrid_length


def _mha_common(opt):
    return dict(
        dim_hidden=opt["dim_hidden"],
        num_attention_heads=opt["num_attention_heads"],
        attention_probs_dropout_prob=opt["attention_probs_dropout_prob"],
        hidden_dropout_prob=opt["hidden_dropout_prob"],
        layer_norm_eps=opt["layer_norm_eps"],
        exclude_bias=opt.get("mha_exclude_bias", False),
        pre_ln=opt.get("transformer_pre_ln", False),
    )


class EncoderLayer(nn.Module):
    """Self-attention + FFN (reference ``Layers.py:16-52``)."""
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        self.intra_attention = MultiHeadAttention(**_mha_common(opt),
                                                  name="intra_attention")
        self.ffn = PositionwiseFeedForward(
            dim_hidden=opt["dim_hidden"],
            dim_intermediate=opt["intermediate_size"],
            hidden_act=opt["hidden_act"],
            hidden_dropout_prob=opt["hidden_dropout_prob"],
            layer_norm_eps=opt["layer_norm_eps"],
            pre_ln=opt.get("transformer_pre_ln", False),
            name="ffn")

    def __call__(self, hidden_states, attention_mask=None,
                 deterministic: bool = True):
        hidden_states, probs, context = self.intra_attention(
            hidden_states, attention_mask=attention_mask,
            deterministic=deterministic)
        hidden_states = self.ffn(hidden_states, deterministic=deterministic)
        return hidden_states, probs, context


class DecoderLayer(nn.Module):
    """Decoder layer: self-attn -> {attr-attn placement} -> cross-attn -> FFN.

    Mirrors the attr-attention placement grid of reference
    ``Layers.py:55-228`` (``attr2cross`` / ``cross2attr`` / ``parallel``) and
    supports a KV-cached single-step mode for AR decoding.
    """
    opt: Dict[str, Any]
    is_last: bool = False

    def setup(self):
        opt = self.opt
        self.attr_layer_pos = opt.get("attr_layer_pos", "cross2attr")
        assert self.attr_layer_pos in ("attr2cross", "cross2attr", "parallel")

        common = _mha_common(opt)
        comp = dict(dim_semantic=opt.get("attribute_prediction_k", 500),
                    dim_factor_scale=opt.get("dim_factor_scale", 2))

        self.intra_attention = MultiHeadAttention(
            **common, **comp,
            have_relative_position_bias=opt.get("RPE", False),
            max_relative_position=opt.get("max_relative_position", None),
            attend_to_video=False,
            compositional=opt.get("compositional_intra", False),
            name="intra_attention")

        if opt.get("fusion", "temporal_concat") == "channel_concat":
            dim_key = dim_value = opt["dim_hidden"] * len(opt["modality"])
        else:
            dim_key = dim_value = opt["dim_hidden"]

        hybrid_length = compute_hybrid_length(opt)
        # pallas flash attention pays off once the key axis is long (e.g.
        # SwinBERT dense patches, Lk≈1600); for the usual ~100-key streams
        # the fused XLA path wins
        upa = opt.get("use_pallas_attention", "auto")
        use_flash = (upa is True) or (upa == "auto" and hybrid_length >= 512)
        parallel = self.attr_layer_pos == "parallel"
        self.inter_attention = MultiHeadAttention(
            **common, **comp,
            dim_key=dim_key, dim_value=dim_value,
            have_relative_position_bias=opt.get("RPE", False),
            max_relative_position=opt.get("max_relative_position", None),
            attend_to_video=True,
            has_ln=not parallel,
            skip_connection=not parallel,
            add_hybrid_attention_bias=opt.get("add_hybrid_attention_bias", False),
            hybrid_length=hybrid_length,
            compositional=opt.get("compositional_inter", False),
            use_flash=use_flash,
            name="inter_attention")

        self.has_attr_attention = (opt.get("use_attr", False)
                                   and "att" in (opt.get("use_attr_type") or ""))
        if self.has_attr_attention:
            # a separate attention sublayer over the concept slots (a deep
            # copy of inter_attention in the reference, Layers.py:117-119)
            self.attr_attention = MultiHeadAttention(
                **common, **comp,
                dim_key=dim_key, dim_value=dim_value,
                have_relative_position_bias=opt.get("RPE", False),
                max_relative_position=opt.get("max_relative_position", None),
                attend_to_video=True,
                has_ln=not parallel,
                skip_connection=not parallel,
                add_hybrid_attention_bias=opt.get("add_hybrid_attention_bias", False),
                hybrid_length=hybrid_length,
                compositional=opt.get("compositional_inter", False),
                name="attr_attention")

        if parallel:
            self.parallel_ln = nn.LayerNorm(epsilon=opt["layer_norm_eps"],
                                            name="LayerNorm")

        self.ffn = PositionwiseFeedForward(
            dim_hidden=opt["dim_hidden"],
            dim_intermediate=opt["intermediate_size"],
            hidden_act=opt["hidden_act"],
            hidden_dropout_prob=opt["hidden_dropout_prob"],
            layer_norm_eps=opt["layer_norm_eps"],
            pre_ln=opt.get("transformer_pre_ln", False),
            compositional=opt.get("compositional_ffn", False),
            **comp,
            name="ffn")

    def _run_attr(self, hidden_states, semantic_embs, deterministic, preds_attr):
        # reference forward_attr_attention: attends over the concept-slot
        # embeddings, no mask, attend_to_video=False (so hybrid bias applies
        # only when shapes line up -- the reference copies inter_attention's
        # hybrid bias but calls with attend_to_video=False over concept keys)
        return self.attr_attention(
            hidden_states, encoder_hidden_states=semantic_embs,
            attention_mask=None, deterministic=deterministic,
            preds_attr=preds_attr)

    def __call__(self, hidden_states, encoder_hidden_states,
                 attention_mask=None, encoder_attention_mask=None,
                 semantic_embs=None, preds_attr=None,
                 deterministic: bool = True,
                 decoding_type: str = "ARFormer",
                 n_frames: int = 0) -> Tuple[jnp.ndarray, tuple, tuple, tuple]:
        attention_probs: tuple = ()
        contexts: tuple = ()
        embs: tuple = ()

        hidden_states, intra_probs, text_context = self.intra_attention(
            hidden_states, attention_mask=attention_mask,
            deterministic=deterministic, decoding_type=decoding_type,
            preds_attr=preds_attr)
        attention_probs += (intra_probs,)
        contexts += (text_context,)
        embs += (hidden_states,)

        if self.has_attr_attention and self.attr_layer_pos == "attr2cross":
            hidden_states, attr_probs, attr_context = self._run_attr(
                hidden_states, semantic_embs, deterministic, preds_attr)
            attention_probs += (attr_probs,)
            contexts += (attr_context,)
            embs += (hidden_states,)

        if self.has_attr_attention and self.attr_layer_pos == "parallel":
            _, inter_probs, inter_context = self.inter_attention(
                hidden_states, encoder_hidden_states=encoder_hidden_states,
                attention_mask=encoder_attention_mask,
                deterministic=deterministic, decoding_type=decoding_type,
                n_frames=n_frames, preds_attr=preds_attr)
            _, attr_probs, attr_context = self._run_attr(
                hidden_states, semantic_embs, deterministic, preds_attr)
            hidden_states = self.parallel_ln(
                hidden_states + inter_context + attr_context)
            attention_probs += (inter_probs, attr_probs)
            contexts += (inter_context, attr_context)
            embs += (hidden_states,)
        else:
            hidden_states, inter_probs, context = self.inter_attention(
                hidden_states, encoder_hidden_states=encoder_hidden_states,
                attention_mask=encoder_attention_mask,
                deterministic=deterministic, decoding_type=decoding_type,
                n_frames=n_frames, preds_attr=preds_attr)
            attention_probs += (inter_probs,)
            contexts += (context,)
            embs += (hidden_states,)

        if self.has_attr_attention and self.attr_layer_pos == "cross2attr":
            hidden_states, attr_probs, attr_context = self._run_attr(
                hidden_states, semantic_embs, deterministic, preds_attr)
            attention_probs += (attr_probs,)
            contexts += (attr_context,)
            embs += (hidden_states,)

        hidden_states = self.ffn(hidden_states, deterministic=deterministic,
                                 preds_attr=preds_attr)
        return hidden_states, attention_probs, contexts, embs

    # ------------------------------------------------------------------
    # KV-cached single-step decode
    # ------------------------------------------------------------------
    def init_step(self, encoder_hidden_states, semantic_embs=None,
                  preds_attr=None):
        """Precompute cross-attention (and attr-attention) K/V."""
        inter_kv = self.inter_attention.project_kv(encoder_hidden_states,
                                                   preds_attr=preds_attr)
        attr_kv = None
        if self.has_attr_attention:
            attr_kv = self.attr_attention.project_kv(semantic_embs,
                                                     preds_attr=preds_attr)
        return inter_kv, attr_kv

    def prefill_self_kv(self, token_embs, preds_attr=None):
        """Project self-attention K/V for a block of already-known tokens
        (e.g. the G-LSG concept prefix)."""
        return self.intra_attention.project_kv(token_embs, preds_attr=preds_attr)

    def self_qkv(self, token_embs, preds_attr=None):
        """Fused q + k/v self-attention projection for the decode step
        (one matmul launch; see ``MultiHeadAttention.project_qkv``)."""
        return self.intra_attention.project_qkv(token_embs,
                                                preds_attr=preds_attr)

    def step(self, x, position, self_kv, inter_kv, attr_kv=None,
             self_bias=None, cross_bias=None, preds_attr=None,
             n_frames: int = 0, q=None):
        """One decode step. x: [B, 1, D]; self_kv: (k, v) [B, H, Lmax, Dh]
        already containing this step's K/V at ``position``.

        ``self_bias``: additive [B, 1, 1, Lmax] masking future positions.
        ``q``: optionally the pre-projected self-attention query (from the
        fused ``project_qkv``). Returns new hidden state [B, 1, D].
        """
        # self attention over the cache; `position` is the query's index
        # in the full (prefix + words) sequence for RPE row selection
        cache_len = self_kv[0].shape[2]
        if q is None:
            q = self.intra_attention.project_q(x, preds_attr)
        bias = self.intra_attention._make_bias(
            self_bias, 1, cache_len, "ARFormer", n_frames,
            rpe_query_position=position, rpe_total_q=cache_len)
        h, _, _ = self.intra_attention.attend(
            q, self_kv[0], self_kv[1], bias, x, deterministic=True,
            return_probs=False, preds_attr=preds_attr)

        if self.has_attr_attention and self.attr_layer_pos == "attr2cross":
            qa = self.attr_attention.project_q(h, preds_attr)
            h, _, _ = self.attr_attention.attend(
                qa, attr_kv[0], attr_kv[1],
                self.attr_attention._make_bias(None, 1, attr_kv[0].shape[2],
                                               "ARFormer", 0),
                h, deterministic=True, return_probs=False,
                preds_attr=preds_attr)

        if self.has_attr_attention and self.attr_layer_pos == "parallel":
            qc = self.inter_attention.project_q(h, preds_attr)
            cbias = self.inter_attention._make_bias(
                cross_bias, 1, inter_kv[0].shape[2], "ARFormer", n_frames,
                rpe_query_position=position, rpe_total_q=cache_len)
            _, _, inter_context = self.inter_attention.attend(
                qc, inter_kv[0], inter_kv[1], cbias, h, deterministic=True,
                return_probs=False, preds_attr=preds_attr)
            qa = self.attr_attention.project_q(h, preds_attr)
            _, _, attr_context = self.attr_attention.attend(
                qa, attr_kv[0], attr_kv[1],
                self.attr_attention._make_bias(None, 1, attr_kv[0].shape[2],
                                               "ARFormer", 0),
                h, deterministic=True, return_probs=False,
                preds_attr=preds_attr)
            h = self.parallel_ln(h + inter_context + attr_context)
        else:
            qc = self.inter_attention.project_q(h, preds_attr)
            cbias = self.inter_attention._make_bias(
                cross_bias, 1, inter_kv[0].shape[2], "ARFormer", n_frames,
                rpe_query_position=position, rpe_total_q=cache_len)
            h, _, _ = self.inter_attention.attend(
                qc, inter_kv[0], inter_kv[1], cbias, h, deterministic=True,
                return_probs=False, preds_attr=preds_attr)

        if self.has_attr_attention and self.attr_layer_pos == "cross2attr":
            qa = self.attr_attention.project_q(h, preds_attr)
            h, _, _ = self.attr_attention.attend(
                qa, attr_kv[0], attr_kv[1],
                self.attr_attention._make_bias(None, 1, attr_kv[0].shape[2],
                                               "ARFormer", 0),
                h, deterministic=True, return_probs=False,
                preds_attr=preds_attr)

        h = self.ffn(h, deterministic=True, preds_attr=preds_attr)
        return h


class EncoderStack(nn.Module):
    """Stack of encoder layers (reference ``Layers.py:231-239``)."""
    opt: Dict[str, Any]
    num_layers: int

    @nn.compact
    def __call__(self, hidden_states, attention_mask=None,
                 deterministic: bool = True):
        for i in range(self.num_layers):
            hidden_states, _, _ = EncoderLayer(self.opt, name=f"layer_{i}")(
                hidden_states, attention_mask, deterministic=deterministic)
        return hidden_states


class CrossLayer(nn.Module):
    """Cross-attention-only layer (reference ``Layers.py:242-298``)."""
    opt: Dict[str, Any]

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states,
                 encoder_attention_mask=None, deterministic: bool = True):
        opt = self.opt
        if opt.get("fusion", "temporal_concat") == "channel_concat":
            dim_key = dim_value = opt["dim_hidden"] * len(opt["modality"])
        else:
            dim_key = dim_value = opt["dim_hidden"]
        inter = MultiHeadAttention(
            **_mha_common(opt), dim_key=dim_key, dim_value=dim_value,
            have_relative_position_bias=opt.get("RPE", False),
            max_relative_position=opt.get("max_relative_position", None),
            attend_to_video=True, name="inter_attention")
        hidden_states, probs, context = inter(
            hidden_states, encoder_hidden_states=encoder_hidden_states,
            attention_mask=encoder_attention_mask,
            deterministic=deterministic, n_frames=opt["n_frames"])
        cross_embs = hidden_states
        if not opt.get("crosslayer_no_ffn", False):
            hidden_states = PositionwiseFeedForward(
                dim_hidden=opt["dim_hidden"],
                dim_intermediate=opt["intermediate_size"],
                hidden_act=opt["hidden_act"],
                hidden_dropout_prob=opt["hidden_dropout_prob"],
                layer_norm_eps=opt["layer_norm_eps"],
                pre_ln=opt.get("transformer_pre_ln", False), name="ffn")(
                    hidden_states, deterministic=deterministic)
        return hidden_states, (None, probs), (None, context), (None, cross_embs)
