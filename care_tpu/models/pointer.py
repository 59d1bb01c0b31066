"""Pointer-generator copy head over retrieved captions.

Parity target: reference ``models/Pointer.py:18-74`` — 1-head attention of
decoder states over retrieved-caption token embeddings, sigmoid copy gate
``p_copy = copy_scale * sigmoid(Wq h + Wc ctx)``, scatter-add of copy
probabilities onto the vocabulary, mean over retrievals; the resulting
``probs`` replaces softmax(logits) downstream.

TPU note: the scatter-add is a vmapped ``.at[].add`` (one XLA scatter), not a
python loop.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from care_tpu import constants
from care_tpu.models.common import Dense
from care_tpu.models.layers import MultiHeadAttention


def _scatter_add_rows(base, idx, src):
    """base [N, V], idx [N, S] int, src [N, S] -> base with src added at idx."""
    def one(p, i, s):
        return p.at[i].add(s)
    return jax.vmap(one)(base, idx, src)


class Pointer(nn.Module):
    opt: Dict[str, Any]

    def setup(self):
        opt = self.opt
        self.attention = MultiHeadAttention(
            dim_hidden=opt["dim_hidden"],
            num_attention_heads=1,
            attention_probs_dropout_prob=opt["attention_probs_dropout_prob"],
            has_ln=False, skip_connection=False,
            name="attention")
        self.Wq = Dense(1, name="Wq")
        self.Wc = Dense(1, name="Wc")
        self.copy_scale = opt.get("copy_scale", 1)

    def __call__(self, hidden_states, ret_text_embs, ret_input_ids, logits,
                 last_time_step_logits: bool = False,
                 deterministic: bool = True, **kwargs) -> Dict[str, Any]:
        if last_time_step_logits:
            hidden_states = hidden_states[:, -1:, :]

        assert ret_input_ids.ndim == 3, ret_input_ids.shape
        assert ret_text_embs.ndim == 4, ret_text_embs.shape
        bsz, n_retrieval, seq_len = ret_input_ids.shape
        T = hidden_states.shape[1]
        d = hidden_states.shape[-1]

        hs = jnp.broadcast_to(hidden_states[:, None],
                              (bsz, n_retrieval, T, d))
        hs = hs.reshape(bsz * n_retrieval, T, d)
        embs = ret_text_embs.reshape(bsz * n_retrieval, seq_len, -1)

        ids_flat = ret_input_ids.reshape(bsz * n_retrieval, seq_len)
        pad_bias = jnp.where(ids_flat == constants.PAD, -1e9, 0.0)
        pad_bias = pad_bias[:, None, None, :].astype(jnp.float32)

        # core SDPA only (no output dense in the reference Pointer; it uses
        # a bare ScaledDotProductAttention): project q/k/v + attend
        q = self.attention.project_q(hs)
        k, v = self.attention.project_kv(embs)
        from care_tpu.ops.attention import dot_product_attention
        ctx_h, probs = dot_product_attention(q, k, v, bias=pad_bias,
                                             return_probs=True)
        from care_tpu.models.layers import merge_heads
        context = merge_heads(ctx_h)                    # [B*R, T, D]

        p_copy = self.copy_scale * nn.sigmoid(self.Wq(hs) + self.Wc(context))
        p_copy = p_copy.reshape(bsz, n_retrieval, T, 1)

        attn = probs.mean(axis=1).reshape(bsz, n_retrieval, T, seq_len)
        ret_probs = p_copy * attn                       # [B, R, T, S]

        if last_time_step_logits:
            base = logits[:, None, None, :]
        else:
            base = logits[:, None, :, :]
        vocab = logits.shape[-1]
        gen = (1 - p_copy) * jnp.broadcast_to(
            jax.nn.softmax(base, axis=-1), (bsz, n_retrieval, T, vocab))

        ids = jnp.broadcast_to(ret_input_ids[:, :, None, :],
                               (bsz, n_retrieval, T, seq_len))
        flat_gen = gen.reshape(bsz * n_retrieval * T, vocab)
        flat_ids = ids.reshape(bsz * n_retrieval * T, seq_len)
        flat_src = ret_probs.reshape(bsz * n_retrieval * T, seq_len)
        out = _scatter_add_rows(flat_gen, flat_ids, flat_src)
        out = out.reshape(bsz, n_retrieval, T, vocab).mean(axis=1)
        if last_time_step_logits:
            out = out[:, 0]
        return {"probs": out}


def get_pointer(opt: dict):
    name = opt.get("pointer", None)
    if name is None:
        return None
    if name != "Pointer":
        raise ValueError(f"unknown pointer `{name}`")
    return Pointer(opt, name="pointer")
