"""Pipelined decode == sequential decode (AR beam + NAR refinement).

``Translator.translate_batches`` keeps several fused programs in flight
(hides the runtime's per-call dispatch overhead); outputs must be
byte-identical and in input order vs per-batch ``translate_batch``.
"""

import numpy as np

from care_tpu.decoding import get_translator
from helpers import tiny_opt, tiny_model_and_batch


def _batches(opt, n, batch_size=3):
    out = []
    for seed in range(n):
        _, _, batch = tiny_model_and_batch(opt, batch_size=batch_size,
                                           seed=seed + 1)
        out.append({"feats": batch["feats"]})
    return out


def test_ar_pipelined_equals_sequential():
    opt = tiny_opt(vocab_size=40, beam_size=3, topk=2)
    model, variables, _ = tiny_model_and_batch(opt)
    tr = get_translator(opt)
    batches = _batches(opt, 5)
    models = [(model, variables)]

    seq = [tr.translate_batch(models, b) for b in batches]
    piped = list(tr.translate_batches(models, iter(batches), depth=2))
    assert len(piped) == len(seq)
    for (b_in, got), b_orig, want in zip(piped, batches, seq):
        assert b_in is b_orig  # order preserved
        assert got == want


def test_ar_fused_k_batches_equals_sequential():
    """translate_batches_fused: K stacked batches through ONE lax.map
    program == per-batch translate_batch (the sync dispatch-floor
    amortisation path)."""
    opt = tiny_opt(vocab_size=40, beam_size=3, topk=2)
    model, variables, _ = tiny_model_and_batch(opt)
    tr = get_translator(opt)
    batches = _batches(opt, 3)
    models = [(model, variables)]

    seq = [tr.translate_batch(models, b) for b in batches]
    fused = tr.translate_batches_fused(models, batches)
    assert fused == seq


def test_nar_fused_k_batches_equals_sequential():
    """NAR translate_batches_fused == per-batch translate_batch."""
    opt = tiny_opt(method="NAB", vocab_size=40)
    model, variables, _ = tiny_model_and_batch(opt)
    tr = get_translator(opt)
    batches = _batches(opt, 2)
    models = [(model, variables)]

    seq = [tr.translate_batch(models, b) for b in batches]
    fused = tr.translate_batches_fused(models, batches)
    assert fused == seq


def test_nar_pipelined_equals_sequential():
    opt = tiny_opt(method="NAB", vocab_size=40)
    assert opt["decoding_type"] == "NARFormer"
    model, variables, _ = tiny_model_and_batch(opt)
    tr = get_translator(opt)
    batches = _batches(opt, 4)
    models = [(model, variables)]

    seq = [tr.translate_batch(models, b) for b in batches]
    piped = list(tr.translate_batches(models, iter(batches), depth=3))
    for (_, got), want in zip(piped, seq):
        assert got == want


def test_trainer_validate_pipelined(tmp_path):
    """validate() produces the same scores as before the pipelining."""
    from care_tpu.data import get_loader
    from care_tpu.training.trainer import Trainer
    from test_train_e2e import make_synthetic_env

    opt, corpus, refs = make_synthetic_env(tmp_path, extra={"epochs": 1})
    train_loader = get_loader(opt, "train")
    val_loader = get_loader(opt, "validate", is_validation=True,
                            not_shuffle=True)
    trainer = Trainer(opt, train_loader=train_loader, val_loader=val_loader,
                      references=refs, vocab=corpus["info"]["itow"])
    trainer.init_model(next(iter(train_loader)))
    trainer._build_tx(len(train_loader))

    scores_a = trainer.validate(0)          # fused-K default path
    trainer.opt["eval_fused_k"] = 1
    scores_p = trainer.validate(0)          # pipelined fallback path
    trainer.opt["eval_fused_k"] = 4
    # sequential per-batch path through translate_step
    preds = {}
    for batch in val_loader:
        preds.update(trainer.translate_step(batch))
    from care_tpu.metrics import COCOScorer
    scores_b, _ = COCOScorer().score(refs, preds, list(preds.keys()))
    for k in ("Bleu_4", "CIDEr", "ROUGE_L", "METEOR"):
        assert abs(scores_a[k] - scores_b[k]) < 1e-9, (k, scores_a, scores_b)
        assert abs(scores_p[k] - scores_b[k]) < 1e-9, (k, scores_p, scores_b)


def test_run_eval_fused_k_matches_pipelined(tmp_path):
    """translate.run_eval with --fused_k grouping (incl. ragged-tail
    fallback) produces identical predictions/scores to the pipelined
    path."""
    import jax
    import jax.numpy as jnp
    from test_train_e2e import make_synthetic_env
    from care_tpu.data import get_loader
    from care_tpu.models import build_captioner
    import translate as T

    opt, corpus, refs = make_synthetic_env(tmp_path,
                                           extra={"batch_size": 2})
    itow = corpus["info"]["itow"]
    model = build_captioner(opt)
    loader0 = get_loader(opt, "test", not_shuffle=True)
    first = next(iter(loader0))
    batch0 = {"feats": [jnp.asarray(np.asarray(f)) for f in first["feats"]],
              "input_ids": jnp.ones((np.asarray(first["feats"][0]).shape[0],
                                     opt["max_len"] - 1), jnp.int32)}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng,
                            "sampling": rng}, batch0, deterministic=True)
    models = [(model, variables)]

    s1, _, p1, _, n1 = T.run_eval(
        models, opt, get_loader(opt, "test", not_shuffle=True), refs, itow)
    s2, _, p2, _, n2 = T.run_eval(
        models, opt, get_loader(opt, "test", not_shuffle=True), refs, itow,
        fused_k=2)
    assert n1 == n2
    assert p1 == p2
    assert s1 == s2


def test_grouped_decode_splits_on_aux_mismatch():
    """Batches with identical feats shapes but different aux key sets
    (a stray `category` array the model itself ignores, picked up by
    ``_batch_inputs``) must start a new fused group rather than fail at
    jnp.stack, and grouped results must equal per-batch decode."""
    import jax.numpy as jnp
    opt = tiny_opt(vocab_size=40, beam_size=3)
    model, variables, _ = tiny_model_and_batch(opt, batch_size=3)
    tr = get_translator(opt)
    models = [(model, variables)]

    stream = _batches(opt, 3)
    stream[2] = {**stream[2],
                 "category": jnp.zeros((3, 1), jnp.int32)}  # stray aux

    seq = [tr.translate_batch(models, b) for b in stream]
    tagged = ((i, b) for i, b in enumerate(stream))
    grouped = list(tr.translate_batches_grouped(models, tagged, fused_k=2))
    assert [tag for tag, _ in grouped] == [0, 1, 2]
    assert [out for _, out in grouped] == seq


def _assert_decode_equal(got, want, tol=1e-5):
    """Token-identical hypotheses; scores to ``tol`` (a batch decoded
    through the GROUP-shape program vs its own-shape program can differ in
    f32 reduction order at ~1e-7, which never flips beam picks)."""
    assert len(got) == len(want)
    for (g_h, g_s), (w_h, w_s) in zip(got, want):
        assert g_h == w_h
        assert len(g_s) == len(w_s)
        for a, b in zip(g_s, w_s):
            np.testing.assert_allclose(a, b, atol=tol, rtol=0)


def test_grouped_decode_ragged_tail_row_padded():
    """A short last batch (the dataset tail) must be row-padded into the
    SAME fused program — token-identical results to per-batch decode, no
    new compile surface for the short shape (round-5, VERDICT r4 #5)."""
    opt = tiny_opt(vocab_size=40, beam_size=3, topk=2)
    model, variables, _ = tiny_model_and_batch(opt, batch_size=3)
    tr = get_translator(opt)
    models = [(model, variables)]

    stream = _batches(opt, 4) + _batches(opt, 1, batch_size=2)  # short tail
    seq = [tr.translate_batch(models, b) for b in stream]
    n_compiles = len(tr._jit_cache)

    tagged = ((i, b) for i, b in enumerate(stream))
    grouped = list(tr.translate_batches_grouped(models, tagged, fused_k=2))
    assert [tag for tag, _ in grouped] == [0, 1, 2, 3, 4]
    _assert_decode_equal([out for _, out in grouped], seq)
    # one fused program serves the full batches AND the padded tail
    assert len(tr._jit_cache) == n_compiles + 1


def test_grouped_decode_ragged_tail_row_padded_nar():
    """NAR grouped path: same row-padding contract."""
    opt = tiny_opt(method="NAB", vocab_size=40)
    model, variables, _ = tiny_model_and_batch(opt, batch_size=3)
    tr = get_translator(opt)
    models = [(model, variables)]

    stream = _batches(opt, 2) + _batches(opt, 1, batch_size=1)
    seq = [tr.translate_batch(models, b) for b in stream]
    tagged = ((i, b) for i, b in enumerate(stream))
    grouped = list(tr.translate_batches_grouped(models, tagged, fused_k=2))
    got = [out for _, out in grouped]
    assert len(got) == len(seq)
    for (g_h, g_s), (w_h, w_s) in zip(got, seq):
        assert g_h == w_h
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(w_s),
                                   atol=1e-5, rtol=0)


def test_grouped_decode_mixed_rows_interleaved():
    """Short batches INSIDE the stream (not just the tail) stay in the
    group; a LARGER batch starts a new group."""
    opt = tiny_opt(vocab_size=40, beam_size=3)
    model, variables, _ = tiny_model_and_batch(opt, batch_size=3)
    tr = get_translator(opt)
    models = [(model, variables)]

    b3 = _batches(opt, 2, batch_size=3)
    b2 = _batches(opt, 2, batch_size=2)
    b4 = _batches(opt, 1, batch_size=4)
    stream = [b3[0], b2[0], b3[1], b2[1], b4[0]]
    seq = [tr.translate_batch(models, b) for b in stream]
    tagged = ((i, b) for i, b in enumerate(stream))
    grouped = list(tr.translate_batches_grouped(models, tagged, fused_k=2))
    assert [tag for tag, _ in grouped] == [0, 1, 2, 3, 4]
    _assert_decode_equal([out for _, out in grouped], seq)


def test_nar_vocab_mapping_not_cached_across_mappings():
    """Two dispatches with DIFFERENT vocab mappings must compile two
    programs (the mapping is baked into the closure); identity mapping
    must equal no mapping."""
    import numpy as np
    opt = tiny_opt(method="NAB", vocab_size=40)
    opt["masking_decision"] = True
    model, variables, _ = tiny_model_and_batch(opt)
    tr = get_translator(opt)
    batch = _batches(opt, 1)[0]
    models = [(model, variables)]
    teacher = (model, variables)

    vm_id = np.arange(40, dtype=np.int64)
    vm_perm = np.concatenate([np.arange(6), 6 + np.random.RandomState(0)
                              .permutation(34)]).astype(np.int64)

    out_plain = tr.translate_batch(models, batch, teacher=teacher)
    n0 = len(tr._jit_cache)
    out_id = tr.translate_batch(models, batch, teacher=teacher,
                                vocab_mapping=vm_id)
    assert len(tr._jit_cache) == n0 + 1
    out_perm = tr.translate_batch(models, batch, teacher=teacher,
                                  vocab_mapping=vm_perm)
    assert len(tr._jit_cache) == n0 + 2  # the round-3 cache-key fix
    assert out_id == out_plain  # identity mapping is a semantic no-op
    assert out_perm != out_id   # permuted mapping changes teacher scores


def test_bf16_decode_string_dtype_and_f32_head():
    """CLI-facing serving knobs: ``compute_dtype_decode`` given as the
    STRING 'bfloat16' (as argparse delivers it) and ``decode_head_f32``
    both produce well-formed captions; the f32-head variant agrees with
    plain bf16 on sharp logits."""
    opt = tiny_opt(vocab_size=40, beam_size=3)
    model, variables, _ = tiny_model_and_batch(opt)
    batch = _batches(opt, 1)[0]
    models = [(model, variables)]

    tr_s = get_translator({**opt, "compute_dtype_decode": "bfloat16"})
    hyps_s, scores_s = tr_s.translate_batch(models, batch)
    assert len(hyps_s) == 3
    toks = [t for row in hyps_s for t in row[0]]
    assert all(0 <= t < opt["vocab_size"] for t in toks)

    tr_h = get_translator({**opt, "compute_dtype_decode": "bfloat16",
                           "decode_head_f32": True})
    hyps_h, _ = tr_h.translate_batch(models, batch)
    assert len(hyps_h) == 3
    toks_h = [t for row in hyps_h for t in row[0]]
    assert all(0 <= t < opt["vocab_size"] for t in toks_h)


def test_nar_bf16_decode_runs():
    """compute_dtype_decode=bfloat16 on the NAR path (params/activations
    bf16, probs/argmax f32): runs through refinement incl. the teacher
    closure and yields well-formed captions."""
    import jax.numpy as jnp
    from care_tpu import constants
    opt = tiny_opt(method="NAB", vocab_size=40)
    model, variables, _ = tiny_model_and_batch(opt)
    batch = _batches(opt, 1)[0]
    models = [(model, variables)]

    tr16 = get_translator({**opt, "compute_dtype_decode": jnp.bfloat16,
                           "masking_decision": True})
    hyps, lprobs = tr16.translate_batch(models, batch,
                                        teacher=(model, variables))
    assert len(hyps) == 3 and len(hyps[0][0]) == opt["max_len"]
    toks = [t for row in hyps for t in row[0]]
    assert all(0 <= t < opt["vocab_size"] for t in toks)
    assert all(np.isfinite(np.asarray(lp, np.float64)).all()
               for lp in lprobs)
