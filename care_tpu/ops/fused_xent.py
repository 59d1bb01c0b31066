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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from care_tpu.ops.fused_head_topk import (_pad_wb as _pad_wb_typed,
                                          _argmax_lse_pallas,
                                          resolve_backend as
                                          _resolve_backend)


def _pad_wb(W, b, chunk_size):
    """Shared vocab padding (ops/fused_head_topk.py): pad columns carry a
    -1e30 bias that underflows exp() to exactly 0 and never wins
    max/argmax."""
    return _pad_wb_typed(W, b, W.dtype, chunk_size)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def vocab_xent_stats(h, W, b, labels, chunk_size=1024, backend="auto",
                     block_rows=256, interpret=False):
    """h: [..., H] hidden states; W: [H, V]; b: [V] or None;
    labels: [...] int.  Returns (lse, label_logit, sum_logits, argmax),
    each shaped like ``labels``; differentiable in h/W/b (argmax carries
    no gradient).  Equivalent to::

        logits = h @ W + b
        (logsumexp(logits, -1), take_along_axis(logits, labels),
         logits.sum(-1), logits.argmax(-1))

    ``backend='auto'`` uses pallas kernels on TPU (forward stats kernel +
    flash-style recompute backward: a dh kernel and a dW/db kernel) and
    the lax.scan form elsewhere.
    """
    out, _ = _fwd(h, W, b, labels, chunk_size, backend, block_rows,
                  interpret)
    return out


def _fwd(h, W, b, labels, chunk_size, backend="auto", block_rows=256,
         interpret=False):
    lead = h.shape[:-1]
    H = h.shape[-1]
    V = W.shape[1]
    hf = h.reshape(-1, H)
    lf = labels.reshape(-1)
    rows = hf.shape[0]
    from care_tpu.ops.fused_head_topk import _clamp_chunk
    chunk_size = _clamp_chunk(V, chunk_size)

    if _resolve_backend(backend) == "pallas":
        amax_i, _, lse, lab, tot = _argmax_lse_pallas(
            hf, W, b, lf, chunk_size, block_rows, interpret,
            want_sum=True)
        out = (lse.reshape(lead), lab.reshape(lead), tot.reshape(lead),
               amax_i.reshape(lead))
        return out, (h, W, b, labels, lse)      # residual lse stays flat

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


def _dlogits_block(h, w, bias, lse, gl, gb, lab, gs, c, chunk_size,
                   round_dtype):
    """Recompute one chunk's logits and fold the three cotangent terms:
    ``gl * softmax + gb * onehot(label) + gs`` (flash-style recompute —
    lse is the forward's exact normaliser)."""
    logits = jax.lax.dot_general(
        h, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if round_dtype is not None:
        logits = logits.astype(round_dtype)
    logits = (logits + bias).astype(jnp.float32)
    p = jnp.exp(logits - lse)
    ids = (c * chunk_size
           + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1))
    return gl * p + jnp.where(ids == lab, gb, 0.0) + gs


def _bwd_dh_kernel(h_ref, w_ref, b_ref, lse_ref, gl_ref, gb_ref, gs_ref,
                   lab_ref, dh_ref, dh_scr,
                   *, chunk_size, round_dtype, out_dtype):
    c = pl.program_id(1)
    num_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    dlogits = _dlogits_block(h_ref[:], w_ref[:], b_ref[:], lse_ref[:],
                             gl_ref[:], gb_ref[:], lab_ref[:], gs_ref[:],
                             c, chunk_size, round_dtype)
    dh_scr[:] = dh_scr[:] + jax.lax.dot_general(
        dlogits.astype(out_dtype), w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(c == num_c - 1)
    def _out():
        dh_ref[:] = dh_scr[:].astype(dh_ref.dtype)


def _bwd_dw_kernel(h_ref, w_ref, b_ref, lse_ref, gl_ref, gb_ref, gs_ref,
                   lab_ref, dw_ref, db_ref, dw_scr, db_scr,
                   *, chunk_size, round_dtype, out_dtype):
    rb = pl.program_id(1)
    num_rb = pl.num_programs(1)

    @pl.when(rb == 0)
    def _init():
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    c = pl.program_id(0)
    h = h_ref[:]
    dlogits = _dlogits_block(h, w_ref[:], b_ref[:], lse_ref[:],
                             gl_ref[:], gb_ref[:], lab_ref[:], gs_ref[:],
                             c, chunk_size, round_dtype)
    dlogits = dlogits.astype(out_dtype)
    dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
        h, dlogits, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_scr[:] = db_scr[:] + jnp.sum(dlogits.astype(jnp.float32), axis=0,
                                    keepdims=True)

    @pl.when(rb == num_rb - 1)
    def _out():
        dw_ref[:] = dw_scr[:].astype(dw_ref.dtype)
        db_ref[:] = db_scr[:].astype(db_ref.dtype)


def _bwd_pallas(hf, W, b, lf, lse, gl, gb, gs, chunk_size, block_rows,
                interpret):
    rows, H = hf.shape
    V = W.shape[1]
    dtype = jnp.promote_types(hf.dtype, W.dtype)
    hp = hf.astype(dtype)
    Wp, bp, C = _pad_wb_typed(W.astype(dtype), b, dtype, chunk_size)
    rows_pad = -(-rows // block_rows) * block_rows
    pad_r = rows_pad - rows
    if pad_r:
        hp = jnp.pad(hp, ((0, pad_r), (0, 0)))
        # pad rows carry zero cotangents AND a huge lse so the softmax
        # recompute exp(logit - lse) underflows to exactly 0 — a small
        # lse could overflow p to inf and 0*inf = NaN would poison the
        # dW/db sums over row blocks
        lse = jnp.pad(lse, (0, pad_r), constant_values=1e30)
        gl = jnp.pad(gl, (0, pad_r))
        gb = jnp.pad(gb, (0, pad_r))
        gs = jnp.pad(gs, (0, pad_r))
        lf = jnp.pad(lf, (0, pad_r))
    cols = lambda x: x[:, None].astype(jnp.float32)
    round_dtype = dtype if dtype != jnp.float32 else None
    RB = rows_pad // block_rows
    col = lambda i, c: (i, 0)
    row_args = (hp, Wp, bp[None, :].astype(dtype), cols(lse),
                cols(gl), cols(gb), cols(gs),
                lf[:, None].astype(jnp.int32))
    common_specs = [
        pl.BlockSpec((H, chunk_size), lambda i, c: (0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk_size), lambda i, c: (0, c),
                     memory_space=pltpu.VMEM),
    ]
    small = [pl.BlockSpec((block_rows, 1), col, memory_space=pltpu.VMEM)
             ] * 5
    dh = pl.pallas_call(
        functools.partial(_bwd_dh_kernel, chunk_size=chunk_size,
                          round_dtype=round_dtype, out_dtype=dtype),
        grid=(RB, C),
        interpret=interpret,
        in_specs=[pl.BlockSpec((block_rows, H), col,
                               memory_space=pltpu.VMEM)]
        + common_specs + small,
        out_specs=pl.BlockSpec((block_rows, H), col,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, H), hf.dtype),
        scratch_shapes=[pltpu.VMEM((block_rows, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_pad * H * Wp.shape[1],
            bytes_accessed=Wp.size * Wp.dtype.itemsize * 2,
            transcendentals=rows_pad * Wp.shape[1]),
    )(*row_args)

    dw_specs = [
        pl.BlockSpec((block_rows, H), lambda c, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, chunk_size), lambda c, i: (0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk_size), lambda c, i: (0, c),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((block_rows, 1), lambda c, i: (i, 0),
                      memory_space=pltpu.VMEM)] * 5
    dW, db = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, chunk_size=chunk_size,
                          round_dtype=round_dtype, out_dtype=dtype),
        grid=(C, RB),
        interpret=interpret,
        in_specs=dw_specs,
        out_specs=[
            pl.BlockSpec((H, chunk_size), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk_size), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, Wp.shape[1]), W.dtype),
            jax.ShapeDtypeStruct((1, Wp.shape[1]), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((H, chunk_size), jnp.float32),
                        pltpu.VMEM((1, chunk_size), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * rows_pad * H * Wp.shape[1],
            bytes_accessed=Wp.size * Wp.dtype.itemsize * 2,
            transcendentals=rows_pad * Wp.shape[1]),
    )(*row_args)
    return dh[:rows], dW[:, :V], db[0, :V]


def _bwd(chunk_size, backend, block_rows, interpret, res, grads):
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
    from care_tpu.ops.fused_head_topk import _clamp_chunk
    chunk_size = _clamp_chunk(V, chunk_size)

    if _resolve_backend(backend) == "pallas":
        dh, dW, db = _bwd_pallas(hf, W, b, lf, lse, gl, gb, gs,
                                 chunk_size, block_rows, interpret)
        return (dh.reshape(h.shape).astype(h.dtype), dW.astype(W.dtype),
                db.astype(W.dtype) if b is not None else None, None)

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
