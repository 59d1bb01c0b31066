"""Pallas TPU flash-attention (forward) kernel.

Blockwise softmax-attention that never materialises the full ``[Lq, Lk]``
score matrix in HBM: for each query block it streams key/value blocks through
VMEM, keeping a running max / running sum (the standard online-softmax
recurrence). Used for long key axes (retrieval-augmented and dense-patch
configs reach Lk≈1568, reference ``models/components/Layers.py:87-88``) and
sized so the MXU sees (128, 128) tiles.

Supports an additive bias term (pad/causal mask folded to 0/-1e9 plus the
learned hybrid-attention bias), which is how the surrounding model passes all
masking (reference ``Attention.py:104-111``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                      m_scratch, l_scratch, acc_scratch,
                      *, block_k: int, kv_len: int, scale: float,
                      has_bias: bool):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]                          # [block_q, dh]
    k = k_ref[0]                          # [block_k, dh]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                             # [block_q, block_k]

    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)

    # mask out-of-range keys of the (padded) last block
    k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(k_pos < kv_len, s, NEG_INF)

    m_prev = m_scratch[:]                 # [block_q, 1]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp(s - m_new)                # [block_q, block_k]
    alpha = jnp.exp(m_prev - m_new)       # [block_q, 1]
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0]                          # [block_k, dh]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[:] = acc_scratch[:] * alpha + pv
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        l = l_scratch[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / safe_l).astype(o_ref.dtype)
        # log-sum-exp per query row, saved for the backward recompute;
        # fully-masked (padding) rows get +BIG so exp(s - lse) == 0 there
        lse = m_scratch[:] + jnp.log(safe_l)
        lse_ref[0] = jnp.where(l == 0.0, 1e9, lse)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_fwd_impl(query, key, value, bias, block_q: int, block_k: int,
                    interpret: bool):
    """Forward pallas launch (blocks already resolved)."""
    b, h, lq, dh = query.shape
    lk = key.shape[2]
    scale = 1.0 / (dh ** 0.5)

    lq_pad = _ceil_to(lq, block_q)
    lk_pad = _ceil_to(lk, block_k)
    if lq_pad != lq:
        query = jnp.pad(query, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        key = jnp.pad(key, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
        value = jnp.pad(value, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))

    has_bias = bias is not None
    if has_bias:
        bias = jnp.broadcast_to(bias, (b, h, lq, lk)).astype(jnp.float32)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, lq_pad - lq), (0, lk_pad - lk)))

    bh = b * h
    q = query.reshape(bh, lq_pad, dh)
    k = key.reshape(bh, lk_pad, dh)
    v = value.reshape(bh, lk_pad, dh)

    grid = (bh, lq_pad // block_q, lk_pad // block_k)

    in_specs = [
        pl.BlockSpec((1, block_q, dh), lambda i, j, t: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, dh), lambda i, j, t: (i, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, dh), lambda i, j, t: (i, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, block_q, block_k), lambda i, j, t: (i, j, t),
                         memory_space=pltpu.VMEM))
        args.append(bias.reshape(bh, lq_pad, lk_pad))
    else:
        in_specs.append(
            pl.BlockSpec((1, 1, 1), lambda i, j, t: (0, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1, 1), jnp.float32))

    kernel = functools.partial(
        _flash_fwd_kernel, block_k=block_k, kv_len=lk, scale=scale,
        has_bias=has_bias)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq_pad, dh), query.dtype),
            jax.ShapeDtypeStruct((bh, lq_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * lq_pad * lk_pad * dh,
            bytes_accessed=(q.size + k.size + v.size) * 4,
            transcendentals=bh * lq_pad * lk_pad,
        ),
    )(*args)

    out = out.reshape(b, h, lq_pad, dh)
    return out[:, :, :lq, :], lse


# ---------------------------------------------------------------------------
# differentiable wrapper: flash forward + recompute backward
# ---------------------------------------------------------------------------

def _attention_reference(q, k, v, bias, scale):
    """Plain attention used ONLY to derive gradients in the backward pass
    (standard flash recipe: recompute instead of storing probabilities).
    Softmax in f32 like the kernel's online recurrence."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref,
                         delta_ref, dq_ref, dq_scratch,
                         *, block_k: int, kv_len: int, scale: float,
                         has_bias: bool):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(k_pos < kv_len, s, NEG_INF)

    p = jnp.exp(s - lse_ref[0])                        # [bq, bk]
    do = do_ref[0]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [bq, bk]
    g = p * (dp - delta_ref[0])                        # dL/ds_total
    dq_scratch[:] += jax.lax.dot_general(
        g.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, do_ref,
                          delta_ref, dk_ref, dv_ref, dbias_ref,
                          dk_scratch, dv_scratch, dbias_scratch,
                          *, block_k: int, kv_len: int, scale: float,
                          has_bias: bool):
    q_idx = pl.program_id(2)
    num_q = pl.num_programs(2)
    kv_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)
        dbias_scratch[:] = jnp.zeros_like(dbias_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # [bq, bk]
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    k_pos = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(k_pos < kv_len, s, NEG_INF)

    # padded q rows contribute nothing: their do/delta are zero-padded,
    # so g == 0 there
    p = jnp.exp(s - lse_ref[0])
    do = do_ref[0]
    dv_scratch[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [bk, dh]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    g = p * (dp - delta_ref[0])
    dk_scratch[:] += jax.lax.dot_general(
        g.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # [bk, dh]
    dbias_scratch[:] += jnp.sum(g, axis=0, keepdims=True)  # [1, bk]

    @pl.when(q_idx == num_q - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)
        dbias_ref[0] = dbias_scratch[:].astype(dbias_ref.dtype)


def _unbroadcast(grad, shape):
    """Sum ``grad`` down to ``shape`` (reverse of broadcasting), handling
    a lower-rank target (leading broadcast dims)."""
    while grad.ndim > len(shape):
        grad = grad.sum(axis=0)
    axes = tuple(i for i, (g, s) in enumerate(zip(grad.shape, shape))
                 if s == 1 and g != 1)
    if axes:
        grad = grad.sum(axis=axes, keepdims=True)
    return grad.reshape(shape)


# memory threshold for the auto backward choice: the XLA recompute rule
# stores the [bh, lq, lk] probabilities between its forward and backward
# (fastest on v5e: 4.1 vs 5.6 ms at the SwinBERTDense shape — the pallas
# kernels redo the score matmuls); above this many bytes the pallas
# kernels take over so nothing [Lq, Lk]-sized is ever materialised
_BWD_PALLAS_MIN_BYTES = 2e9


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(query, key, value, bias, block_q, block_k, interpret, backward):
    out, _ = _flash_fwd_impl(query, key, value, bias, block_q, block_k,
                             interpret)
    return out


def _flash_fwd_rule(query, key, value, bias, block_q, block_k, interpret,
                    backward):
    out, lse = _flash_fwd_impl(query, key, value, bias, block_q, block_k,
                               interpret)
    return out, (query, key, value, bias, out, lse)


def _flash_bwd_rule(block_q, block_k, interpret, backward, res, do):
    """Backward dispatch (``backward``: 'auto' | 'pallas' | 'xla'):

    * ``xla`` — differentiate a plain-attention recompute; XLA stores the
      [Lq, Lk] probabilities between its forward and backward.  Fastest on
      v5e (measured 4.1 vs 5.6 ms full-grad at [4,8,1568,64]) because the
      pallas kernels below must redo the score matmuls.
    * ``pallas`` — dq and dk/dv/dbias kernels recompute probabilities
      blockwise from the forward's saved log-sum-exp: nothing [Lq, Lk] is
      ever materialised.  The memory-bound choice.
    * ``auto`` — pallas once the probability tensor would exceed
      ``_BWD_PALLAS_MIN_BYTES``, else xla.

    A bias with a real query extent (RPE tables) needs the full [Lq, Lk]
    bias gradient, so that case always uses the xla rule."""
    query, key, value, bias, out, lse = res
    scale = 1.0 / (query.shape[-1] ** 0.5)

    b, h, lq, dh = query.shape
    lk = key.shape[2]
    p_bytes = b * h * lq * lk * 4
    use_pallas = (backward == "pallas"
                  or (backward == "auto"
                      and p_bytes > _BWD_PALLAS_MIN_BYTES))
    if bias is not None and bias.ndim >= 2 and bias.shape[-2] != 1:
        use_pallas = False
    if not use_pallas:
        if bias is None:
            _, vjp = jax.vjp(
                lambda q, k, v: _attention_reference(q, k, v, None, scale),
                query, key, value)
            dq, dk, dv = vjp(do)
            return dq, dk, dv, None
        _, vjp = jax.vjp(
            lambda q, k, v, b_: _attention_reference(q, k, v, b_, scale),
            query, key, value, bias)
        dq, dk, dv, db = vjp(do)
        return dq, dk, dv, db

    lq_pad = _ceil_to(lq, block_q)
    lk_pad = _ceil_to(lk, block_k)
    bh = b * h

    pad_q = ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0))
    q3 = jnp.pad(query, pad_q).reshape(bh, lq_pad, dh)
    do3 = jnp.pad(do, pad_q).reshape(bh, lq_pad, dh)
    o3 = jnp.pad(out, pad_q).reshape(bh, lq_pad, dh)
    pad_k = ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0))
    k3 = jnp.pad(key, pad_k).reshape(bh, lk_pad, dh)
    v3 = jnp.pad(value, pad_k).reshape(bh, lk_pad, dh)

    has_bias = bias is not None
    if has_bias:
        # lq extent is 1 here (checked above): ship the bias as
        # [bh, 1, lk_pad] and let the kernels broadcast over query rows —
        # never materialise an [Lq, Lk] bias
        bias_b = jnp.broadcast_to(bias, (b, h, 1, lk)).astype(jnp.float32)
        bias3 = jnp.pad(bias_b, ((0, 0), (0, 0), (0, 0),
                                 (0, lk_pad - lk))).reshape(bh, 1, lk_pad)
    else:
        bias3 = jnp.zeros((1, 1, 1), jnp.float32)

    delta = jnp.sum(do3.astype(jnp.float32) * o3.astype(jnp.float32),
                    axis=-1, keepdims=True)            # [bh, lq_pad, 1]

    grid_q = (bh, lq_pad // block_q, lk_pad // block_k)
    bias_spec = (pl.BlockSpec((1, 1, block_k),
                              lambda i, j, t: (i, 0, t),
                              memory_space=pltpu.VMEM) if has_bias else
                 pl.BlockSpec((1, 1, 1), lambda i, j, t: (0, 0, 0),
                              memory_space=pltpu.VMEM))
    dq3 = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k,
                          kv_len=lk, scale=scale, has_bias=has_bias),
        grid=grid_q,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda i, j, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda i, j, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
            pl.BlockSpec((1, block_q, 1), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dh), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda i, j, t: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, dh), query.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dh), jnp.float32)],
    )(q3, k3, v3, bias3, lse, do3, delta)

    grid_kv = (bh, lk_pad // block_k, lq_pad // block_q)
    bias_spec_kv = (pl.BlockSpec((1, 1, block_k),
                                 lambda i, j, t: (i, 0, j),
                                 memory_space=pltpu.VMEM) if has_bias else
                    pl.BlockSpec((1, 1, 1), lambda i, j, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    dk3, dv3, dbias_row = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_k=block_k,
                          kv_len=lk, scale=scale, has_bias=has_bias),
        grid=grid_kv,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
            bias_spec_kv,
            pl.BlockSpec((1, block_q, 1), lambda i, j, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dh), lambda i, j, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dh), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda i, j, t: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda i, j, t: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk_pad, dh), key.dtype),
            jax.ShapeDtypeStruct((bh, lk_pad, dh), value.dtype),
            jax.ShapeDtypeStruct((bh, 1, lk_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dh), jnp.float32),
            pltpu.VMEM((block_k, dh), jnp.float32),
            pltpu.VMEM((1, block_k), jnp.float32),
        ],
    )(q3, k3, v3, bias3, lse, do3, delta)

    dq = dq3.reshape(b, h, lq_pad, dh)[:, :, :lq, :]
    dk = dk3.reshape(b, h, lk_pad, dh)[:, :, :lk, :]
    dv = dv3.reshape(b, h, lk_pad, dh)[:, :, :lk, :]
    if not has_bias:
        return dq, dk, dv, None
    db_full = dbias_row.reshape(b, h, 1, lk_pad)[:, :, :, :lk]
    db = _unbroadcast(db_full, bias.shape).astype(bias.dtype)
    return dq, dk, dv, db


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret", "backward"))
def flash_attention(query, key, value, bias=None, block_q: int = None,
                    block_k: int = None, interpret: bool = False,
                    backward: str = "auto"):
    """Flash attention. query/key/value: [B, H, L, Dh]; bias broadcastable
    to [B, H, Lq, Lk] (already includes masks).

    Default blocks are auto-tuned (measured on v5e at the SwinBERTDense
    shape [4,8,1568,64]): ``block_q=256`` with a SINGLE KV block when the
    key axis fits VMEM comfortably (<=2048) runs 2.3-9x faster than both
    the naive 128x128 blocking and the fused XLA attention (0.13-0.64 ms
    vs 1.2-1.7 ms device time, floor-subtracted chained measurement);
    longer key axes stream 512-wide KV blocks (128-divisible, as the bias
    BlockSpec lowering requires).

    DIFFERENTIABLE (round 4): gradients (incl. the additive-bias path
    feeding the learned hybrid bias / RPE tables) are exact w.r.t. plain
    attention; ``backward`` picks between the XLA rule (stores the [Lq,Lk]
    probabilities; fastest on v5e) and blockwise pallas kernels that
    recompute from the saved log-sum-exp (nothing [Lq,Lk] materialised;
    the long-sequence memory choice) — 'auto' switches on tensor size.
    Grad parity for both rules is locked by
    ``tests/test_flash_attention.py``.  NOTE for training at moderate
    lengths, plain XLA attention end-to-end measured faster than
    flash-fwd + any backward (the model's auto dispatch uses flash only
    for inference)."""
    lq, lk = query.shape[2], key.shape[2]
    if block_q is None:
        block_q = min(256, _ceil_to(lq, 8))
    if block_k is None:
        block_k = _ceil_to(lk, 8) if lk <= 2048 else 512
    return _flash(query, key, value, bias, block_q, block_k, interpret,
                  backward)
