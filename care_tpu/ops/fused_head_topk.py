"""Fused vocab-projection + beam top-k: the [rows, V] logits never live
in HBM as a whole.

The beam hot loop's final stage was (round 4): ``logits = h @ W`` (matmul
output materialised), ``log_softmax`` (two more passes), ``scores +
logp`` and the chunked single-pass top-k cache build — the largest
remaining HBM traffic term after the beam-grouped KV redesign (DESIGN.md
§11; reference counterpart: ``models/Head.py:26-49`` +
``models/Translator.py:111-133``, which materialises the full
``[rows, V]`` probabilities every step).

Two backends behind one interface:

* **xla** — a ``lax.scan`` over vocab chunks: per chunk ``h @ W[:, c]``
  folds into an online-softmax ``(max, sumexp)`` pair and a per-chunk
  top-``K`` candidate list (XLA decides how much of the chunk pipeline
  stays in VMEM);
* **pallas** — one TPU kernel, grid ``(row_blocks, vocab_chunks)``: the
  logits block never leaves VMEM; scratch carries the online softmax
  stats AND a running top-``K`` (merged per chunk with reduction-only
  ops — no gathers), so HBM sees only ``W`` once plus a few KB of
  stats/candidates per row block.

Numerics mirror the unfused path op-for-op: per-element log-prob is
``(x - max) - log(sumexp)`` (the ``jax.nn.log_softmax`` association),
clamped to the finite ``DEAD`` before score accumulation; the matmul
result is rounded to the inputs' dtype before the f32 softmax boundary,
like ``decode_step``'s Dense. The only deviation is the summation ORDER
inside ``sumexp`` (chunked online accumulation vs one flat XLA
reduction): a <=1-ulp difference in ``log(s)`` that tests bound at
token-identical beams.

Tie semantics equal ``lax.top_k`` over the flat ``[N, K*V]`` scores:
first-occurrence argmax keeps lowest-index-first inside a chunk, running
candidates (earlier chunks, lower global ids) sit before chunk entries
in the pallas merge, the candidate lists keep (beam, chunk/rank) order,
and the final ``lax.top_k`` over candidates prefers the lowest candidate
position.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from care_tpu.ops.topk import _iterative_top_k

DEAD = -1e20
# finite stand-in for -inf on vocab-padding columns: underflows exp() to
# exactly 0 (no NaN through max/sub), stays below any real logit, and the
# DEAD clamp lifts the resulting candidates to the same value the unfused
# path assigns impossible tokens
_PAD_LOGIT = -1e30
_RUN_INIT = -1e38          # running top-k init: below even _PAD_LOGIT


def _finalize(cv, ids, m, s, scores, eos_row, beam_k, V):
    """(per-row raw-logit candidates, online-softmax stats) -> beam
    top-k. cv/ids: [rows, n_cand] in a global-index-stable tie order."""
    N, Kb = scores.shape
    n_cand = cv.shape[1]
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


def resolve_backend(backend: str) -> str:
    """'auto' -> 'pallas' on TPU-like platforms, 'xla' on cpu.  Resolves
    from the EFFECTIVE compute platform: a session can hold a live TPU
    backend while computations are pinned to CPU via jax_default_device
    (the conftest pattern).  jax_default_device may also be a platform
    STRING."""
    if backend != "auto":
        return backend
    dev = jax.config.jax_default_device
    if isinstance(dev, str):
        platform = dev
    elif dev is not None:
        platform = getattr(dev, "platform", None)
    else:
        platform = jax.default_backend()
    return "pallas" if platform not in ("cpu",) else "xla"


def _clamp_chunk(V: int, chunk_size: int) -> int:
    """Never use a chunk wider than the (lane-aligned) vocab itself —
    small-vocab configs would otherwise matmul mostly padding."""
    return min(chunk_size, max(128, -(-V // 128) * 128))


def _pad_wb(W, b, dtype, chunk_size):
    H, V = W.shape
    C = -(-V // chunk_size)
    pad = C * chunk_size - V
    if b is None:
        b = jnp.zeros((V,), dtype)
    if pad:
        W = jnp.pad(W, ((0, 0), (0, pad)))
        b = jnp.pad(b, (0, pad), constant_values=_PAD_LOGIT)
    return W, b, C


# ---------------------------------------------------------------------------
# XLA backend
# ---------------------------------------------------------------------------

def _stats_xla(h, W, b, beam_k, chunk_size):
    rows, H = h.shape
    W, b, C = _pad_wb(W, b, h.dtype, chunk_size)
    Wc = W.reshape(H, C, chunk_size).transpose(1, 0, 2)    # [C, H, chunk]
    bc = b.reshape(C, chunk_size)

    def chunk_body(carry, wb):
        m, s = carry                                        # [rows], [rows]
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
    # cv/ca: [C, rows, K] -> candidates ordered (chunk, rank) per row
    cv = jnp.moveaxis(cv, 0, 1).reshape(rows, C * beam_k)
    ids = (jnp.moveaxis(ca, 0, 1)
           + (jnp.arange(C) * chunk_size)[None, :, None]
           ).reshape(rows, C * beam_k)
    return cv, ids, m, s


# ---------------------------------------------------------------------------
# Pallas backend
# ---------------------------------------------------------------------------

def _fused_kernel(h_ref, w_ref, b_ref, mv_ref, sv_ref, cv_ref, ci_ref,
                  m_scr, s_scr, v_scr, i_scr,
                  *, beam_k: int, chunk_size: int, cand_pad: int,
                  round_dtype):
    c = pl.program_id(1)
    num_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)
        v_scr[:] = jnp.full_like(v_scr, _RUN_INIT)
        i_scr[:] = jnp.zeros_like(i_scr)

    h = h_ref[:]                                     # [bm, H]
    w = w_ref[:]                                     # [H, chunk]
    logits = jax.lax.dot_general(
        h, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if round_dtype is not None:
        # mirror the unfused Dense: a bf16 matmul rounds its result to
        # bf16 before the f32 softmax boundary
        logits = logits.astype(round_dtype)
    logits = (logits + b_ref[:]).astype(jnp.float32)  # [bm, chunk]

    m_prev = m_scr[:]                                 # [bm, 1]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    s_scr[:] = (s_scr[:] * jnp.exp(m_prev - m_new)
                + jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True))
    m_scr[:] = m_new

    # merge the chunk into the running top-K without any lane-dim concat
    # (mosaic dislikes non-128-aligned concats): each of the K picks
    # compares the running list's max against the chunk's max, prefers
    # the RUNNING side on ties (earlier chunks = lower global ids, stored
    # rank-major — preserving lax.top_k's lowest-index tie order), and
    # extracts the winner's id by a masked sum.  Reduction-only: no
    # per-row gathers.
    run_v = v_scr[:, :cand_pad]                       # whole scratch block
    run_i = i_scr[:, :cand_pad]
    ch_v = logits
    ch_i = (c * chunk_size
            + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1))
    pos_r = jax.lax.broadcasted_iota(jnp.int32, run_v.shape, 1)
    pos_c = jax.lax.broadcasted_iota(jnp.int32, ch_v.shape, 1)
    # first-occurrence pick via min-position-of-max (f32 positions are
    # exact up to 2^24): mosaic rejects argmax over the bool mask
    # (`jnp.argmax(x == xmax)`) with "Only float32 is supported"
    posf_r = pos_r.astype(jnp.float32)
    posf_c = pos_c.astype(jnp.float32)
    _FAR = 3.0e8
    picked_v, picked_i = [], []
    for _ in range(beam_k):
        rmax = jnp.max(run_v, axis=-1, keepdims=True)
        cmax = jnp.max(ch_v, axis=-1, keepdims=True)
        r_first = jnp.min(jnp.where(run_v == rmax, posf_r, _FAR),
                          axis=-1, keepdims=True)
        c_first = jnp.min(jnp.where(ch_v == cmax, posf_c, _FAR),
                          axis=-1, keepdims=True)
        r_pick = posf_r == r_first
        c_pick = posf_c == c_first
        r_id = jnp.sum(jnp.where(r_pick, run_i, 0), axis=-1,
                       keepdims=True)
        c_id = jnp.sum(jnp.where(c_pick, ch_i, 0), axis=-1,
                       keepdims=True)
        from_run = rmax >= cmax
        picked_v.append(jnp.where(from_run, rmax, cmax))
        picked_i.append(jnp.where(from_run, r_id, c_id))
        run_v = jnp.where(from_run & r_pick, _RUN_INIT, run_v)
        ch_v = jnp.where(jnp.logical_not(from_run) & c_pick, _RUN_INIT,
                         ch_v)
    for t in range(beam_k):
        v_scr[:, t:t + 1] = picked_v[t]
        i_scr[:, t:t + 1] = picked_i[t]

    @pl.when(c == num_c - 1)
    def _out():
        mv_ref[:] = m_scr[:]
        sv_ref[:] = s_scr[:]
        cv_ref[:] = v_scr[:]
        ci_ref[:] = i_scr[:]


def _stats_pallas(h, W, b, beam_k, chunk_size, block_rows, interpret):
    rows, H = h.shape
    # the unfused Dense computes in the PROMOTED dtype (bf16 h with an
    # f32 kernel — the decode_head_f32 serving flag — promotes to f32, no
    # rounding); mirror that exactly, and feed the kernel same-dtype
    # operands so mosaic sees a clean dot
    dtype = jnp.promote_types(h.dtype, W.dtype)
    h = h.astype(dtype)
    W = W.astype(dtype)
    W, bpad, C = _pad_wb(W, b, dtype, chunk_size)
    rows_pad = -(-rows // block_rows) * block_rows
    if rows_pad != rows:
        h = jnp.pad(h, ((0, rows_pad - rows), (0, 0)))
    cand_pad = max(beam_k, 128)   # lane-aligned candidate blocks
    # round-to-compute-dtype only when the unfused matmul would (bf16 in)
    round_dtype = dtype if dtype != jnp.float32 else None

    kernel = functools.partial(
        _fused_kernel, beam_k=beam_k, chunk_size=chunk_size,
        cand_pad=cand_pad, round_dtype=round_dtype)
    grid = (rows_pad // block_rows, C)

    m, s, cv, ids = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((block_rows, H), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, chunk_size), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_size), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, 1), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cand_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cand_pad), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, cand_pad), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, cand_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_rows, 1), jnp.float32),
            pltpu.VMEM((block_rows, 1), jnp.float32),
            pltpu.VMEM((block_rows, cand_pad), jnp.float32),
            pltpu.VMEM((block_rows, cand_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * H * W.shape[1],
            bytes_accessed=W.size * W.dtype.itemsize
            + h.size * h.dtype.itemsize,
            transcendentals=rows_pad * W.shape[1],
        ),
    )(h, W, bpad[None, :].astype(dtype))

    return (cv[:rows, :beam_k], ids[:rows, :beam_k],
            m[:rows, 0], s[:rows, 0])


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _argmax_lse_kernel(h_ref, w_ref, b_ref, t_ref, ai_ref, av_ref,
                       lse_ref, tok_ref, tot_ref,
                       m_scr, s_scr, av_scr, ai_scr, tok_scr, tot_scr,
                       *, chunk_size: int, has_tokens: bool, round_dtype,
                       want_sum: bool, v_real: int):
    c = pl.program_id(1)
    num_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)
        av_scr[:] = jnp.full_like(av_scr, -jnp.inf)
        ai_scr[:] = jnp.zeros_like(ai_scr)
        tok_scr[:] = jnp.zeros_like(tok_scr)
        tot_scr[:] = jnp.zeros_like(tot_scr)

    h = h_ref[:]
    w = w_ref[:]
    logits = jax.lax.dot_general(
        h, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if round_dtype is not None:
        logits = logits.astype(round_dtype)
    logits = (logits + b_ref[:]).astype(jnp.float32)
    ids = (c * chunk_size
           + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1))

    m_prev = m_scr[:]
    mc = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, mc)
    s_scr[:] = (s_scr[:] * jnp.exp(m_prev - m_new)
                + jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True))
    m_scr[:] = m_new

    ci = jnp.argmax(logits, axis=-1)[:, None]
    better = mc > av_scr[:]           # strict: lowest index keeps ties
    av_scr[:] = jnp.where(better, mc, av_scr[:])
    ai_scr[:] = jnp.where(better, c * chunk_size + ci, ai_scr[:])
    if has_tokens:
        tok_scr[:] = tok_scr[:] + jnp.sum(
            jnp.where(ids == t_ref[:], logits, 0.0), axis=-1,
            keepdims=True)
    if want_sum:
        # mask pad columns: their -1e30 bias would destroy f32 precision
        tot_scr[:] = tot_scr[:] + jnp.sum(
            jnp.where(ids < v_real, logits, 0.0), axis=-1, keepdims=True)

    @pl.when(c == num_c - 1)
    def _out():
        ai_ref[:] = ai_scr[:]
        av_ref[:] = av_scr[:]
        lse_ref[:] = m_scr[:] + jnp.log(s_scr[:])
        tok_ref[:] = tok_scr[:]
        tot_ref[:] = tot_scr[:]


def _argmax_lse_pallas(hf, W, b, tf, chunk_size, block_rows, interpret,
                       want_sum=False):
    rows, H = hf.shape
    V = W.shape[1]
    dtype = jnp.promote_types(hf.dtype, W.dtype)
    hf = hf.astype(dtype)
    Wp, bp, C = _pad_wb(W.astype(dtype), b, dtype, chunk_size)
    rows_pad = -(-rows // block_rows) * block_rows
    if rows_pad != rows:
        hf = jnp.pad(hf, ((0, rows_pad - rows), (0, 0)))
    has_tokens = tf is not None
    tcol = (jnp.pad(tf, (0, rows_pad - rows))[:, None].astype(jnp.int32)
            if has_tokens else jnp.zeros((rows_pad, 1), jnp.int32))
    round_dtype = dtype if dtype != jnp.float32 else None

    kernel = functools.partial(
        _argmax_lse_kernel, chunk_size=chunk_size, has_tokens=has_tokens,
        round_dtype=round_dtype, want_sum=want_sum, v_real=V)
    grid = (rows_pad // block_rows, C)
    col = lambda i, c: (i, 0)
    ai, av, lse, tok, tot = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((block_rows, H), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, chunk_size), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_size), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), col, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((block_rows, 1), col,
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_rows, 1), jnp.float32),
                        pltpu.VMEM((block_rows, 1), jnp.float32),
                        pltpu.VMEM((block_rows, 1), jnp.float32),
                        pltpu.VMEM((block_rows, 1), jnp.int32),
                        pltpu.VMEM((block_rows, 1), jnp.float32),
                        pltpu.VMEM((block_rows, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * H * Wp.shape[1],
            bytes_accessed=Wp.size * Wp.dtype.itemsize
            + hf.size * hf.dtype.itemsize,
            transcendentals=rows_pad * Wp.shape[1],
        ),
    )(hf, Wp, bp[None, :].astype(dtype), tcol)
    out = (ai[:rows, 0], av[:rows, 0], lse[:rows, 0])
    if has_tokens:
        out = out + (tok[:rows, 0],)
    if want_sum:
        out = out + (tot[:rows, 0],)
    return out


@functools.partial(jax.jit, static_argnames=("chunk_size", "backend",
                                             "block_rows", "interpret"))
def vocab_argmax_lse(h, W, b, token_ids=None, chunk_size: int = 1024,
                     backend: str = "auto", block_rows: int = 256,
                     interpret: bool = False):
    """Chunked (argmax, max-logit, logsumexp[, token-logit]) of
    ``h @ W + b`` over the vocab axis — the NAR decode loop's needs
    (argmax token + its softmax prob = ``exp(max - lse)``; teacher
    rescoring's per-token prob = ``exp(tok - lse)``) without ever
    materialising ``[..., V]`` logits/probs in HBM (reference
    counterpart: ``misc/Decoding/na_algorithms.py:6-14`` which builds
    the full softmax).  Serving-only (no VJP).

    h: [..., H]; W: [H, V]; b: [V] or None; token_ids: [...] int or
    None.  Returns (argmax [..., int32], max_logit, lse[, tok_logit]).
    Argmax ties resolve lowest-index-first like ``jnp.argmax``.
    """
    lead = h.shape[:-1]
    H = h.shape[-1]
    V = W.shape[1]
    hf = h.reshape(-1, H)
    rows = hf.shape[0]
    tf = token_ids.reshape(-1) if token_ids is not None else None
    chunk_size = _clamp_chunk(V, chunk_size)

    backend = resolve_backend(backend)
    if backend == "pallas":
        out = _argmax_lse_pallas(hf, W, b, tf, chunk_size, block_rows,
                                 interpret)
        return tuple(o.reshape(lead) for o in out)

    Wp, bp, C = _pad_wb(W, b, h.dtype, chunk_size)
    Wc = Wp.reshape(H, C, chunk_size).transpose(1, 0, 2)
    bc = bp.reshape(C, chunk_size)

    def body(carry, wb):
        m, s, av, ai, tok, c = carry
        w, bias = wb
        logits = (hf @ w + bias[None, :]).astype(jnp.float32)
        ids = c * chunk_size + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        mc = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, mc)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1)
        ci = jnp.argmax(logits, axis=-1)
        better = mc > av                     # strict: lowest index wins ties
        av = jnp.where(better, mc, av)
        ai = jnp.where(better, c * chunk_size + ci, ai)
        if tf is not None:
            tok = tok + jnp.sum(
                jnp.where(ids == tf[:, None], logits, 0.0), axis=-1)
        return (m_new, s, av, ai, tok, c + 1), None

    init = (jnp.full((rows,), -jnp.inf, jnp.float32),
            jnp.zeros((rows,), jnp.float32),
            jnp.full((rows,), -jnp.inf, jnp.float32),
            jnp.zeros((rows,), jnp.int32),
            jnp.zeros((rows,), jnp.float32),
            jnp.asarray(0, jnp.int32))
    (m, s, av, ai, tok, _), _ = jax.lax.scan(body, init, (Wc, bc))
    lse = (m + jnp.log(s)).reshape(lead)
    out = (ai.reshape(lead), av.reshape(lead), lse)
    if token_ids is not None:
        out = out + (tok.reshape(lead),)
    return out


@functools.partial(jax.jit, static_argnames=("beam_k", "chunk_size",
                                             "backend", "block_rows",
                                             "interpret"))
def fused_head_beam_topk(h, W, b, scores, eos_row, beam_k: int,
                         chunk_size: int = 1024, backend: str = "auto",
                         block_rows: int = 256, interpret: bool = False):
    """h: [N*K, H] decoder hidden states; W: [H, V] vocab kernel; b: [V]
    bias or None; scores: [N, K] cumulative beam scores; eos_row: [N, K]
    rows already finished. Returns (best_scores [N, K], best_ids [N, K])
    with ids indexing the flat k*V + v space — exactly like

        logp  = log_softmax((h @ W + b).astype(f32))
        lk    = scores[:, :, None] + maximum(logp, DEAD).reshape(N, K, V)
        lk    = where(eos_row[:, :, None], DEAD, lk)
        hierarchical_top_k(lk.reshape(N, K * V), K)

    ``backend='auto'`` uses the pallas kernel on TPU backends and the
    lax.scan form elsewhere.
    """
    rows, H = h.shape
    V = W.shape[1]
    N, Kb = scores.shape
    assert rows == N * Kb, (rows, N, Kb)
    chunk_size = _clamp_chunk(V, chunk_size)

    backend = resolve_backend(backend)
    if backend == "pallas":
        cv, ids, m, s = _stats_pallas(h, W, b, beam_k, chunk_size,
                                      block_rows, interpret)
    else:
        cv, ids, m, s = _stats_xla(h, W, b, beam_k, chunk_size)
    return _finalize(cv, ids, m, s, scores, eos_row, beam_k, V)
