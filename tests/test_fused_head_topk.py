"""fused_head_beam_topk == unfused head + log_softmax + hierarchical
top-k (round-5, VERDICT r4 #4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from care_tpu.ops.fused_head_topk import fused_head_beam_topk, DEAD
from care_tpu.ops.topk import hierarchical_top_k


def _reference(h, W, b, scores, eos_row, K):
    logits = h @ W
    if b is not None:
        logits = logits + b
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    N, Kb = scores.shape
    V = W.shape[1]
    logp = jnp.maximum(logp.reshape(N, Kb, V), DEAD)
    lk = scores[:, :, None] + logp
    lk = jnp.where(eos_row[:, :, None], DEAD, lk)
    return hierarchical_top_k(lk.reshape(N, Kb * V), K, assume_finite=True)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("V,chunk", [(300, 128), (1000, 256), (1031, 256)])
@pytest.mark.parametrize("with_bias", [False, True])
def test_matches_reference(V, chunk, with_bias, backend):
    rng = np.random.RandomState(0)
    N, Kb, H = 3, 4, 32
    h = jnp.asarray(rng.randn(N * Kb, H), jnp.float32)
    W = jnp.asarray(rng.randn(H, V) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(V) * 0.1, jnp.float32) if with_bias else None
    scores = jnp.asarray(rng.randn(N, Kb), jnp.float32)
    scores = scores.at[:, 2].set(DEAD)          # a dead-score beam row
    eos_row = jnp.zeros((N, Kb), bool).at[1, 0].set(True)

    want_v, want_i = _reference(h, W, b, scores, eos_row, Kb)
    got_v, got_i = fused_head_beam_topk(
        h, W, b, scores, eos_row, Kb, chunk_size=chunk, backend=backend,
        block_rows=8, interpret=backend == "pallas")
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=0, atol=1e-5)


def test_pallas_tie_order_matches_lax_top_k():
    """Duplicate logit values within and across chunks: the running-merge
    tie order must still equal lax.top_k's lowest-global-index-first."""
    N, Kb, H, V = 1, 2, 8, 260
    rng = np.random.RandomState(3)
    h = jnp.asarray(np.ones((N * Kb, H)), jnp.float32)
    # W columns engineered so many logits collide exactly
    Wcols = rng.randint(0, 5, size=(V,)).astype(np.float32) / 8.0
    W = jnp.asarray(np.tile(Wcols[None, :], (H, 1)) / H, jnp.float32)
    scores = jnp.zeros((N, Kb), jnp.float32)
    eos_row = jnp.zeros((N, Kb), bool)
    want_v, want_i = _reference(h, W, None, scores, eos_row, Kb)
    for backend in ("xla", "pallas"):
        got_v, got_i = fused_head_beam_topk(
            h, W, None, scores, eos_row, Kb, chunk_size=128,
            backend=backend, block_rows=8, interpret=backend == "pallas")
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=0, atol=1e-6)


def test_all_rows_eos_dead_ties_are_harmless():
    """With every beam row EOS-killed all candidates tie at DEAD; picks
    may differ from the unfused path's flat-index order but values match
    and ids stay in-range/distinct (see beam_search: such picks never
    reach a finished buffer as valid hypotheses)."""
    rng = np.random.RandomState(1)
    N, Kb, H, V = 2, 3, 16, 500
    h = jnp.asarray(rng.randn(N * Kb, H), jnp.float32)
    W = jnp.asarray(rng.randn(H, V) * 0.1, jnp.float32)
    scores = jnp.asarray(rng.randn(N, Kb), jnp.float32)
    eos_row = jnp.ones((N, Kb), bool)
    got_v, got_i = fused_head_beam_topk(h, W, None, scores, eos_row, Kb,
                                        chunk_size=128)
    assert np.all(np.asarray(got_v) == DEAD)
    gi = np.asarray(got_i)
    assert np.all((gi >= 0) & (gi < Kb * V))
    for n in range(N):
        assert len(set(gi[n])) == Kb


def test_bf16_inputs_f32_softmax_boundary():
    """bf16 h/W: matmul in bf16, softmax+scores in f32 — mirrors the
    unfused decode's dtype path."""
    rng = np.random.RandomState(2)
    N, Kb, H, V = 2, 3, 32, 700
    h32 = rng.randn(N * Kb, H).astype(np.float32)
    W32 = (rng.randn(H, V) * 0.1).astype(np.float32)
    h = jnp.asarray(h32, jnp.bfloat16)
    W = jnp.asarray(W32, jnp.bfloat16)
    scores = jnp.asarray(rng.randn(N, Kb), jnp.float32)
    eos_row = jnp.zeros((N, Kb), bool)
    want_v, want_i = _reference(h, W, None, scores, eos_row, Kb)
    got_v, got_i = fused_head_beam_topk(h, W, None, scores, eos_row, Kb,
                                        chunk_size=256)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=0, atol=1e-4)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_vocab_argmax_lse_matches_dense(backend):
    from care_tpu.ops.fused_head_topk import vocab_argmax_lse
    rng = np.random.RandomState(5)
    B, L, H, V = 2, 6, 16, 333
    h = jnp.asarray(rng.randn(B, L, H), jnp.float32)
    W = jnp.asarray(rng.randn(H, V) * 0.2, jnp.float32)
    toks = jnp.asarray(rng.randint(0, V, (B, L)), jnp.int32)
    kw = dict(chunk_size=128, backend=backend, block_rows=8,
              interpret=backend == "pallas")

    logits = (h @ W).astype(jnp.float32)
    idx, mx, lse, tokl = vocab_argmax_lse(h, W, None, token_ids=toks, **kw)
    np.testing.assert_array_equal(idx, logits.argmax(-1))
    np.testing.assert_allclose(mx, logits.max(-1), atol=1e-5, rtol=0)
    np.testing.assert_allclose(
        lse, jax.scipy.special.logsumexp(logits, axis=-1), atol=1e-5,
        rtol=0)
    np.testing.assert_allclose(
        tokl, jnp.take_along_axis(logits, toks[..., None], -1)[..., 0],
        atol=1e-5, rtol=0)
    # 3-tuple form without token_ids
    out3 = vocab_argmax_lse(h, W, None, **kw)
    assert len(out3) == 3
    np.testing.assert_array_equal(out3[0], idx)


def test_nar_fused_stats_decode_equals_dense():
    """NAR translate with the fused statistics forward == the dense
    logits path: token-identical hypotheses, lprobs to softmax-order
    noise. Covers student argmax/probs AND teacher per-token rescoring."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import tiny_opt, tiny_model_and_batch
    from care_tpu.decoding import get_translator

    base = tiny_opt(method="NAB", vocab_size=40)
    base["masking_decision"] = True      # exercises teacher_score
    model, variables, _ = tiny_model_and_batch(base, batch_size=3)
    batch = {"feats": tiny_model_and_batch(base, batch_size=3, seed=2)[2][
        "feats"]}
    models = [(model, variables)]
    teacher = (model, variables)

    outs = {}
    for fused in (False, True):
        opt = dict(base)
        opt["fused_head_topk"] = fused
        tr = get_translator(opt)
        outs[fused] = tr.translate_batch(models, batch, teacher=teacher)
    hyp_d, lp_d = outs[False]
    hyp_f, lp_f = outs[True]
    assert hyp_f == hyp_d
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_d),
                               atol=1e-5, rtol=0)


@pytest.mark.parametrize("mode", ["f32", "bf16", "bf16_f32head"])
def test_beam_decode_fused_equals_unfused(mode):
    """Full beam decode, fused head on vs off, across serving dtype
    modes (incl. decode_head_f32, whose f32 kernel must NOT be rounded
    by the fused path — round-5 review finding)."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import tiny_opt, tiny_model_and_batch
    from care_tpu.decoding import get_translator

    base = tiny_opt(vocab_size=48, beam_size=3, topk=2)
    if mode != "f32":
        base["compute_dtype_decode"] = "bfloat16"
    if mode == "bf16_f32head":
        base["decode_head_f32"] = True
    model, variables, _ = tiny_model_and_batch(base, batch_size=4)
    batch = {"feats": tiny_model_and_batch(base, batch_size=4, seed=3)[2][
        "feats"]}
    models = [(model, variables)]

    outs = {}
    for fused in (False, True):
        opt = dict(base)
        opt["fused_head_topk"] = fused
        outs[fused] = get_translator(opt).translate_batch(models, batch)
    hyp_d, sc_d = outs[False]
    hyp_f, sc_f = outs[True]
    assert hyp_f == hyp_d
    # pure-bf16 serving accumulates the chunked matmul in a different
    # layout than the dense head — scores agree at bf16 precision there,
    # and to f32 rounding in the f32-logit modes
    tol = 5e-3 if mode == "bf16" else 2e-5
    for a, b in zip(sc_f, sc_d):
        np.testing.assert_allclose(a, b, atol=tol, rtol=0)


def test_beam_decode_pallas_kernel_inside_while_loop(monkeypatch):
    """The pallas kernel must trace/execute INSIDE the beam while_loop
    program (interpret mode on CPU) and reproduce the xla-backend
    decode."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import tiny_opt, tiny_model_and_batch
    from care_tpu.decoding import get_translator
    import care_tpu.ops.fused_head_topk as F

    opt = tiny_opt(vocab_size=48, beam_size=3)
    model, variables, _ = tiny_model_and_batch(opt, batch_size=2)
    batch = {"feats": tiny_model_and_batch(opt, batch_size=2, seed=4)[2][
        "feats"]}
    models = [(model, variables)]

    want = get_translator(opt).translate_batch(models, batch)

    orig = F.fused_head_beam_topk

    def forced_pallas(h, W, b, scores, eos, k, chunk_size=2048, **kw):
        return orig(h, W, b, scores, eos, k, chunk_size=chunk_size,
                    backend="pallas", block_rows=8, interpret=True)

    monkeypatch.setattr(F, "fused_head_beam_topk", forced_pallas)
    got = get_translator(opt).translate_batch(models, batch)
    assert got[0] == want[0]
    for a, b2 in zip(got[1], want[1]):
        np.testing.assert_allclose(a, b2, atol=2e-5, rtol=0)


def test_grad_free_shapes_and_v_not_multiple_of_chunk():
    got_v, got_i = fused_head_beam_topk(
        jnp.ones((4, 8)), jnp.ones((8, 130)), None,
        jnp.zeros((2, 2)), jnp.zeros((2, 2), bool), 2, chunk_size=64)
    assert got_v.shape == (2, 2) and got_i.shape == (2, 2)
    # padding columns (130 -> 192) must never be picked
    assert np.all(np.asarray(got_i) % 130 < 130)
    assert np.all(np.asarray(got_i) < 2 * 130)


def test_opt_fused_head_backend_reaches_the_op(monkeypatch):
    """opt['fused_head_backend'] must thread translator -> beam_search ->
    fused_head_beam_topk (bench pins 'xla' when mosaic rejects the pallas
    kernel on a chip), and the xla-pinned decode must equal the default."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import tiny_opt, tiny_model_and_batch
    from care_tpu.decoding import get_translator
    import care_tpu.ops.fused_head_topk as F

    opt = tiny_opt(vocab_size=48, beam_size=3)
    model, variables, _ = tiny_model_and_batch(opt, batch_size=2)
    batch = {"feats": tiny_model_and_batch(opt, batch_size=2, seed=4)[2][
        "feats"]}
    models = [(model, variables)]

    want = get_translator(opt).translate_batch(models, batch)

    seen = []
    orig = F.fused_head_beam_topk

    def recording(h, W, b, scores, eos, k, chunk_size=2048,
                  backend="auto", **kw):
        seen.append(backend)
        return orig(h, W, b, scores, eos, k, chunk_size=chunk_size,
                    backend=backend, **kw)

    monkeypatch.setattr(F, "fused_head_beam_topk", recording)
    opt_x = dict(opt)
    opt_x["fused_head_backend"] = "xla"
    got = get_translator(opt_x).translate_batch(models, batch)
    assert seen and all(b == "xla" for b in seen)
    assert got[0] == want[0]
    for a, b2 in zip(got[1], want[1]):
        np.testing.assert_allclose(a, b2, atol=2e-5, rtol=0)
