"""Fused vocab-projection + cross-entropy statistics for TRAINING.

The language criterion needs, per token position, only four statistics
of the vocab logits ``h @ W + b``: the log-sum-exp (for the NLL), the
label logit, the logit sum (label smoothing's ``mean(-logprobs)`` =
``lse - sum/V``) and the argmax (word-accuracy recorder).  Computing
them through materialised ``[B, L, V]`` logits costs a logits write +
log_softmax passes + a ``[B, L, V]`` gradient tensor on the way back —
the train step's largest activation term (flagship: 64x29x11000 f32 =
81 MB each way).

``vocab_xent_stats`` streams the vocab in chunks (lax.scan) and never
materialises logits; a custom VJP recomputes each chunk's logits in the
backward (flash-style) and folds the three gradient terms

    dlogits = g_lse * softmax + g_label * onehot + g_sum

into ``dh``, ``dW``, ``db`` chunk by chunk.

Numerics: lse uses the online (max, sumexp) recurrence — same <=1-ulp
summation-order caveat as ``ops/fused_head_topk``; the backward
recompute uses the forward's final lse, which is mathematically exact
softmax recomputation.  Argmax ties resolve first-occurrence
(lowest index), matching ``jnp.argmax`` over the full row.
"""

import functools

import jax
import jax.numpy as jnp

from care_tpu.ops.fused_head_topk import _pad_wb as _pad_wb_typed


def _pad_wb(W, b, chunk_size):
    """Shared vocab padding (ops/fused_head_topk.py): pad columns carry a
    -1e30 bias that underflows exp() to exactly 0 and never wins
    max/argmax."""
    return _pad_wb_typed(W, b, W.dtype, chunk_size)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def vocab_xent_stats(h, W, b, labels, chunk_size=2048):
    """h: [..., H] hidden states; W: [H, V]; b: [V] or None;
    labels: [...] int.  Returns (lse, label_logit, sum_logits, argmax),
    each shaped like ``labels``; differentiable in h/W/b (argmax carries
    no gradient).  Equivalent to::

        logits = h @ W + b
        (logsumexp(logits, -1), take_along_axis(logits, labels),
         logits.sum(-1), logits.argmax(-1))
    """
    out, _ = _fwd(h, W, b, labels, chunk_size)
    return out


def _fwd(h, W, b, labels, chunk_size):
    lead = h.shape[:-1]
    H = h.shape[-1]
    V = W.shape[1]
    hf = h.reshape(-1, H)
    lf = labels.reshape(-1)
    rows = hf.shape[0]
    Wp, bp, C = _pad_wb(W, b, chunk_size)
    Wc = Wp.reshape(H, C, chunk_size).transpose(1, 0, 2)
    bc = bp.reshape(C, chunk_size)

    def body(carry, wb):
        m, s, lab, tot, amax_v, amax_i, c = carry
        w, bias = wb
        logits = (hf @ w + bias[None, :]).astype(jnp.float32)
        ids = c * chunk_size + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        mc = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, mc)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1)
        lab = lab + jnp.sum(
            jnp.where(ids == lf[:, None], logits, 0.0), axis=-1)
        # mask pad columns in-chunk: their -1e30 bias would otherwise
        # destroy the real sum's f32 precision (catastrophic cancellation)
        tot = tot + jnp.sum(jnp.where(ids < V, logits, 0.0), axis=-1)
        # running argmax, first-occurrence: strict > keeps the earlier
        # (lower-index) winner on ties; within the chunk argmax is
        # first-occurrence already
        ci = jnp.argmax(logits, axis=-1)
        cv = jnp.max(logits, axis=-1)
        better = cv > amax_v
        amax_v = jnp.where(better, cv, amax_v)
        amax_i = jnp.where(better, c * chunk_size + ci, amax_i)
        return (m_new, s, lab, tot, amax_v, amax_i, c + 1), None

    init = (jnp.full((rows,), -jnp.inf, jnp.float32),
            jnp.zeros((rows,), jnp.float32),
            jnp.zeros((rows,), jnp.float32),
            jnp.zeros((rows,), jnp.float32),
            jnp.full((rows,), -jnp.inf, jnp.float32),
            jnp.zeros((rows,), jnp.int32),
            jnp.asarray(0, jnp.int32))
    (m, s, lab, tot, _, amax_i, _), _ = jax.lax.scan(body, init, (Wc, bc))
    lse = m + jnp.log(s)
    out = (lse.reshape(lead), lab.reshape(lead), tot.reshape(lead),
           amax_i.reshape(lead))
    return out, (h, W, b, labels, lse)


def _bwd(chunk_size, res, grads):
    h, W, b, labels, lse = res
    g_lse, g_label, g_sum, _ = grads
    lead = h.shape[:-1]
    H = h.shape[-1]
    V = W.shape[1]
    hf = h.reshape(-1, H)
    lf = labels.reshape(-1)
    gl = g_lse.reshape(-1).astype(jnp.float32)
    gb = g_label.reshape(-1).astype(jnp.float32)
    gs = g_sum.reshape(-1).astype(jnp.float32)
    Wp, bp, C = _pad_wb(W, b, chunk_size)
    Wc = Wp.reshape(H, C, chunk_size).transpose(1, 0, 2)
    bc = bp.reshape(C, chunk_size)

    def body(carry, wb):
        dh, c = carry
        w, bias = wb
        logits = (hf @ w + bias[None, :]).astype(jnp.float32)
        p = jnp.exp(logits - lse[:, None])        # exact softmax recompute
        ids = c * chunk_size + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        dlogits = (gl[:, None] * p
                   + jnp.where(ids == lf[:, None], gb[:, None], 0.0)
                   + gs[:, None])
        dlogits = dlogits.astype(h.dtype)
        dh = dh + dlogits @ w.T
        dw = hf.T @ dlogits
        db = jnp.sum(dlogits, axis=0)
        return (dh, c + 1), (dw, db)

    init = (jnp.zeros_like(hf), jnp.asarray(0, jnp.int32))
    (dh, _), (dws, dbs) = jax.lax.scan(body, init, (Wc, bc))
    dW = dws.transpose(1, 0, 2).reshape(H, C * chunk_size)[:, :V]
    dW = dW.astype(W.dtype)
    db = (dbs.reshape(C * chunk_size)[:V].astype(W.dtype)
          if b is not None else None)
    return dh.reshape(h.shape), dW, db, None


vocab_xent_stats.defvjp(_fwd, _bwd)
