"""Attention math: XLA fused path + Pallas flash kernel dispatch.

The reference computes attention as plain torch matmuls
(``models/components/Attention.py:69-131``: scores -> /sqrt(dh) -> +rpe ->
masked_fill(-1e9) -> +hybrid bias -> softmax/sigmoid -> @ value). Here the
same math is expressed once as a pure function over ``[B, H, L, Dh]`` arrays;
XLA fuses the elementwise chain into the matmuls on TPU. For long key axes
(e.g. SwinBERT dense patches, 1568 keys) a Pallas flash-attention kernel
avoids materialising the ``[B, H, Lq, Lk]`` score tensor in HBM.
"""

import logging

import jax
import jax.numpy as jnp

NEG_INF = -1e9

_logger = logging.getLogger(__name__)
_flash_fallback_logged = False


def dot_product_attention(
    query,                      # [B, H, Lq, Dh]
    key,                        # [B, H, Lk, Dh]
    value,                      # [B, H, Lk, Dh]
    bias=None,                  # additive bias broadcastable to [B, H, Lq, Lk]
    use_sigmoid: bool = False,
    sigmoid_normalize: bool = False,
    return_probs: bool = True,
    dropout_rng=None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    use_flash: bool = False,
):
    """Compute attention; returns (context [B,H,Lq,Dh], probs or None).

    ``bias`` carries *all* additive terms (pad/causal mask as 0/-1e9, relative
    position bias, hybrid attention bias), matching the reference ordering of
    mask-then-bias.
    """
    # flash serves INFERENCE only (deterministic=True): for training,
    # plain XLA attention measured faster end-to-end than flash-forward +
    # any backward at the model's key lengths (the flash custom-VJP
    # remains correct if a caller differentiates through it directly)
    if (use_flash and deterministic and not use_sigmoid
            and not return_probs):
        try:
            from care_tpu.ops.pallas.flash_attention import flash_attention
            return flash_attention(query, key, value, bias=bias), None
        except Exception as e:
            # fall through to the XLA path, but never silently: a broken
            # kernel hiding behind auto-dispatch would otherwise look like
            # a perf regression instead of an error
            global _flash_fallback_logged
            if not _flash_fallback_logged:
                _flash_fallback_logged = True
                _logger.warning(
                    "pallas flash_attention failed (%s: %s); falling back "
                    "to the fused XLA attention path", type(e).__name__, e)

    dh = query.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    # scores in f32 for numerics (softmax over small logits)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", query, key,
        preferred_element_type=jnp.float32,
    ) * scale

    if bias is not None:
        scores = scores + bias.astype(scores.dtype)

    if use_sigmoid:
        probs = jax.nn.sigmoid(scores)
        if sigmoid_normalize:
            probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    else:
        probs = jax.nn.softmax(scores, axis=-1)

    if not deterministic and dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        dropped = probs * keep.astype(probs.dtype) / (1.0 - dropout_rate)
    else:
        dropped = probs

    context = jnp.einsum(
        "bhqk,bhkd->bhqd", dropped.astype(value.dtype), value,
        preferred_element_type=jnp.float32,
    ).astype(value.dtype)

    return context, (probs if return_probs else None)


def relative_position_index(length_q: int, length_k: int, max_len: int,
                            bidirectional: bool = True):
    """Index matrix into a relative-position embedding table of size 2*max_len+1."""
    rq = jnp.arange(length_q)[:, None]
    rk = jnp.arange(length_k)[None, :]
    dist = rk - rq
    hi = max_len if bidirectional else 0
    return jnp.clip(dist, -max_len, hi) + max_len
