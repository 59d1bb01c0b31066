"""Fused vocab-projection + beam top-k: the [rows, V] logits never live
in HBM as a whole.

The beam hot loop's final stage was (round 4): ``logits = h @ W`` (matmul
output materialised), ``log_softmax`` (two more passes), ``scores +
logp`` and the chunked single-pass top-k cache build — the largest
remaining HBM traffic term after the beam-grouped KV redesign (DESIGN.md
§11; reference counterpart: ``models/Head.py:26-49`` +
``models/Translator.py:111-133``, which materialises the full
``[rows, V]`` probabilities every step).

This op streams the vocab in chunks: per chunk it computes
``h @ W[:, c]``, folds the chunk straight into an online-softmax
``(max, sumexp)`` pair AND a per-chunk top-``K`` candidate list, then
resolves the beam top-k over the ``K*C*K`` candidates. HBM traffic per
step drops from ``~4 x rows x V x 4B`` (logits write + softmax reads +
cache-build read) to the unavoidable ``W`` read plus a few KB of
candidates.

Numerics mirror the unfused path op-for-op: per-element log-prob is
``(x - max) - log(sumexp)`` (the ``jax.nn.log_softmax`` association),
clamped to the finite ``DEAD`` before score accumulation; matmul runs in
the inputs' dtype (bf16 serving keeps its precision behavior) and is
cast to f32 at the softmax boundary, like ``decode_step``. The only
deviation is the summation ORDER inside ``sumexp`` (chunked online
accumulation vs one flat XLA reduction): a <=1-ulp difference in
``log(s)`` that tests bound at token-identical beams.

Tie semantics equal ``lax.top_k`` over the flat ``[N, K*V]`` scores:
within a chunk first-occurrence argmax keeps lowest-index-first, the
candidate list is (beam, chunk, rank)-ordered so equal values keep
global index order, and the final ``lax.top_k`` over candidates prefers
the lowest candidate position.
"""

import functools

import jax
import jax.numpy as jnp

from care_tpu.ops.topk import _iterative_top_k

DEAD = -1e20
# finite stand-in for -inf on vocab-padding columns: underflows exp() to
# exactly 0 (no NaN through max/sub), stays below any real logit, and the
# DEAD clamp lifts the resulting candidates to the same value the unfused
# path assigns impossible tokens
_PAD_LOGIT = -1e30


@functools.partial(jax.jit, static_argnames=("beam_k", "chunk_size"))
def fused_head_beam_topk(h, W, b, scores, eos_row, beam_k: int,
                         chunk_size: int = 2048):
    """h: [N*K, H] decoder hidden states; W: [H, V] vocab kernel; b: [V]
    bias or None; scores: [N, K] cumulative beam scores; eos_row: [N, K]
    rows already finished. Returns (best_scores [N, K], best_ids [N, K])
    with ids indexing the flat k*V + v space — exactly like

        logp  = log_softmax((h @ W + b).astype(f32))
        lk    = scores[:, :, None] + maximum(logp, DEAD).reshape(N, K, V)
        lk    = where(eos_row[:, :, None], DEAD, lk)
        hierarchical_top_k(lk.reshape(N, K * V), K)
    """
    rows, H = h.shape
    V = W.shape[1]
    N, Kb = scores.shape
    assert rows == N * Kb, (rows, N, Kb)
    C = -(-V // chunk_size)
    pad = C * chunk_size - V

    if b is None:
        b = jnp.zeros((V,), h.dtype)
    if pad:
        W = jnp.pad(W, ((0, 0), (0, pad)))
        b = jnp.pad(b, (0, pad), constant_values=_PAD_LOGIT)
    Wc = W.reshape(H, C, chunk_size).transpose(1, 0, 2)   # [C, H, chunk]
    bc = b.reshape(C, chunk_size)

    def chunk_body(carry, wb):
        m, s = carry                                       # [rows], [rows]
        w, bias = wb
        logits = (h @ w + bias[None, :]).astype(jnp.float32)
        mc = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, mc)
        s_new = (s * jnp.exp(m - m_new)
                 + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=-1))
        vals, args = _iterative_top_k(logits, beam_k, assume_finite=True)
        return (m_new, s_new), (vals, args)

    init = (jnp.full((rows,), -jnp.inf, jnp.float32),
            jnp.zeros((rows,), jnp.float32))
    (m, s), (cv, ca) = jax.lax.scan(chunk_body, init, (Wc, bc))
    # cv/ca: [C, rows, K] -> candidate lists ordered (chunk, rank) per row
    cv = jnp.moveaxis(cv, 0, 1)                            # [rows, C, K]
    ids = jnp.moveaxis(ca, 0, 1) + (
        jnp.arange(C) * chunk_size)[None, :, None]         # global v idx
    n_cand = C * beam_k
    cv = cv.reshape(rows, n_cand)
    ids = ids.reshape(rows, n_cand)

    # log_softmax association: (x - max) - log(sumexp), then the DEAD
    # clamp, then the beam-score add — op-for-op the unfused path
    logp = (cv - m[:, None]) - jnp.log(s)[:, None]
    logp = jnp.maximum(logp, DEAD)
    lk = scores[:, :, None] + logp.reshape(N, Kb, n_cand)
    lk = jnp.where(eos_row[:, :, None], DEAD, lk)

    flat_val = lk.reshape(N, Kb * n_cand)
    flat_idx = (jnp.arange(Kb)[None, :, None] * V
                + ids.reshape(N, Kb, n_cand)).reshape(N, Kb * n_cand)
    best, sel = jax.lax.top_k(flat_val, beam_k)
    best_ids = jnp.take_along_axis(flat_idx, sel, axis=-1)
    return best, best_ids
