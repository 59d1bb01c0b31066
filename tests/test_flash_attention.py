"""Pallas flash-attention forward == XLA attention (interpret mode on CPU).

The kernel (`care_tpu/ops/pallas/flash_attention.py`) streams K/V blocks
through VMEM with an online softmax; this locks its numerics — including
ragged (non-block-multiple) lengths and additive masks — against the plain
XLA path used everywhere else.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from care_tpu.ops.attention import dot_product_attention
from care_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("lq,lk", [(128, 128), (100, 200), (37, 1568)])
def test_flash_matches_xla(lq, lk):
    rs = np.random.RandomState(0)
    b, h, dh = 2, 2, 32
    q = jnp.asarray(rs.randn(b, h, lq, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, lk, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, lk, dh), jnp.float32)

    # additive bias: pad mask on the last quarter of keys + a learned-bias
    # style smooth term, exactly how the model folds masking
    bias = rs.randn(1, h, 1, lk).astype(np.float32) * 0.5
    bias[..., -lk // 4:] = -1e9
    bias = jnp.asarray(np.broadcast_to(bias, (b, h, lq, lk)))

    ref, _ = dot_product_attention(q, k, v, bias=bias,
                                          return_probs=False)
    out = flash_attention(q, k, v, bias=bias, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_no_bias():
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(1, 4, 64, 16), jnp.float32)
    k = jnp.asarray(rs.randn(1, 4, 96, 16), jnp.float32)
    v = jnp.asarray(rs.randn(1, 4, 96, 16), jnp.float32)
    ref, _ = dot_product_attention(q, k, v, return_probs=False)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
