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


def _tpu_device():
    import jax
    for d in jax.devices():
        if d.platform not in ("cpu",):
            return d
    return None


def test_flash_compiled_on_tpu_matches_xla():
    """COMPILED-mode (not interpret) equivalence on real TPU silicon, tiny
    shapes to keep tunnel compiles short.  The CPU suite pins
    JAX_PLATFORMS=cpu so this skips there; run with JAX_PLATFORMS='' on a
    TPU host (bench.py also exercises the compiled kernel every round and
    records the measured diff in its detail dict)."""
    dev = _tpu_device()
    if dev is None:
        pytest.skip("no TPU visible (suite runs pinned to CPU)")
    import jax

    rs = np.random.RandomState(0)
    B, H, Lq, Lk, Dh = 2, 4, 8, 300, 64
    q = jnp.asarray(rs.randn(B, H, Lq, Dh).astype(np.float32))
    k = jnp.asarray(rs.randn(B, H, Lk, Dh).astype(np.float32))
    v = jnp.asarray(rs.randn(B, H, Lk, Dh).astype(np.float32))
    lens = rs.randint(100, Lk, (B,))
    bias = np.where(np.arange(Lk)[None, None, None, :]
                    < lens[:, None, None, None], 0.0, -1e9).astype(np.float32)
    bias = jnp.asarray(np.broadcast_to(bias, (B, 1, 1, Lk)))

    with jax.default_device(dev):
        out_f = np.asarray(jax.jit(
            lambda q, k, v, b: flash_attention(q, k, v, bias=b))(q, k, v,
                                                                 bias))
        out_x = np.asarray(jax.jit(
            lambda q, k, v, b: dot_product_attention(
                q, k, v, bias=b, return_probs=False)[0])(q, k, v, bias))
    # bf16 matmul passes on TPU give ~5e-3 relative; measured 8e-4 abs
    np.testing.assert_allclose(out_f, out_x, atol=1e-2)


def test_flash_gradients_match_xla():
    """Differentiable flash (round 4): grads of sum(attention) w.r.t.
    q/k/v AND the additive bias (the learned-hybrid-bias path) match the
    plain XLA attention — training can take the flash forward."""
    import jax

    rs = np.random.RandomState(3)
    b, h, lq, lk, dh = 2, 2, 24, 40, 16
    q = jnp.asarray(rs.randn(b, h, lq, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, lk, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, lk, dh), jnp.float32)
    bias = jnp.asarray(rs.randn(1, h, 1, lk).astype(np.float32) * 0.3)

    def loss_flash(q, k, v, bias):
        return (flash_attention(q, k, v, bias=bias, interpret=True,
                                backward="pallas")
                * jnp.arange(dh)).sum()

    def loss_xla(q, k, v, bias):
        out, _ = dot_product_attention(q, k, v, bias=bias,
                                       return_probs=False)
        return (out * jnp.arange(dh)).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(gf, gx):
        assert a.shape == b_.shape   # incl. unbroadcast bias grad shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=1e-4)


def test_flash_gradients_no_bias():
    import jax

    rs = np.random.RandomState(4)
    q = jnp.asarray(rs.randn(1, 2, 16, 8), jnp.float32)
    k = jnp.asarray(rs.randn(1, 2, 24, 8), jnp.float32)
    v = jnp.asarray(rs.randn(1, 2, 24, 8), jnp.float32)

    gf = jax.grad(lambda q: flash_attention(q, k, v, interpret=True,
                                            backward="pallas").sum())(q)
    gx = jax.grad(lambda q: dot_product_attention(q, k, v,
                                                  return_probs=False)[0]
                  .sum())(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               atol=3e-5, rtol=1e-4)


def test_flash_gradients_full_lq_bias_fallback():
    """A bias with real query extent (RPE tables) takes the XLA-recompute
    fallback; grads still match plain attention."""
    import jax

    rs = np.random.RandomState(5)
    b, h, lq, lk, dh = 1, 2, 12, 20, 8
    q = jnp.asarray(rs.randn(b, h, lq, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, lk, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, lk, dh), jnp.float32)
    bias = jnp.asarray(rs.randn(1, h, lq, lk).astype(np.float32) * 0.3)

    gf = jax.grad(lambda bias: flash_attention(
        q, k, v, bias=bias, interpret=True).sum(), )(bias)
    gx = jax.grad(lambda bias: dot_product_attention(
        q, k, v, bias=bias, return_probs=False)[0].sum())(bias)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               atol=3e-5, rtol=1e-4)


def test_flash_gradients_batch_bias_pallas_path():
    """Pad-mask-shaped bias ([B,1,1,Lk], lq extent 1): the pallas backward
    kernels produce q/k/v/bias grads matching plain attention, including
    the unbroadcast over heads."""
    import jax

    rs = np.random.RandomState(6)
    b, h, lq, lk, dh = 2, 2, 40, 72, 16
    q = jnp.asarray(rs.randn(b, h, lq, dh), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, lk, dh), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, lk, dh), jnp.float32)
    bias = jnp.asarray(rs.randn(b, 1, 1, lk).astype(np.float32))

    def loss(fn):
        def inner(q, k, v, bias):
            return (fn(q, k, v, bias) * jnp.arange(dh)).sum()
        return inner

    gf = jax.grad(loss(lambda q, k, v, b_: flash_attention(
        q, k, v, bias=b_, block_q=16, block_k=32, interpret=True,
        backward="pallas")),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss(lambda q, k, v, b_: dot_product_attention(
        q, k, v, bias=b_, return_probs=False)[0]),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(gf, gx):
        assert a.shape == b_.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=1e-4)


def test_flash_backward_xla_rule_matches():
    """The default/auto backward (XLA rule at small sizes) also matches."""
    import jax

    rs = np.random.RandomState(7)
    q = jnp.asarray(rs.randn(1, 2, 16, 8), jnp.float32)
    k = jnp.asarray(rs.randn(1, 2, 24, 8), jnp.float32)
    v = jnp.asarray(rs.randn(1, 2, 24, 8), jnp.float32)
    bias = jnp.asarray(rs.randn(1, 2, 1, 24), jnp.float32)

    g_auto = jax.grad(lambda q, b: flash_attention(
        q, k, v, bias=b, interpret=True).sum(), argnums=(0, 1))(q, bias)
    g_pallas = jax.grad(lambda q, b: flash_attention(
        q, k, v, bias=b, interpret=True, backward="pallas").sum(),
        argnums=(0, 1))(q, bias)
    g_ref = jax.grad(lambda q, b: dot_product_attention(
        q, k, v, bias=b, return_probs=False)[0].sum(),
        argnums=(0, 1))(q, bias)
    for a, b_ in zip(g_auto, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=1e-4)
    for a, b_ in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=1e-4)
