"""Decode-level equivalence against the ACTUAL reference engines.

Two layers of locking, both with reference code (not a re-implementation)
as the comparator:

1. **Exact search semantics** — the reference ``Translator_ARFormer`` +
   ``Beam`` (``/root/reference/models/Translator.py:22-220``,
   ``misc/Decoding/Beam.py``) and the reference NAR algorithms
   (``misc/Decoding/na_algorithms.py:146-329``) are run on a *table-driven
   fake model* whose logits are pure gathers+adds — bit-identical between
   torch and XLA. Our fixed-shape ``beam_search`` / ``nar`` algorithms
   consume the same tables; captions and scores must match exactly.
   This removes float noise, so any mismatch is a semantics bug.

2. **End-to-end transplanted decode** — the reference translators run on
   the real reference torch model; our translators run on the transplanted
   flax model. Matmul accumulation-order noise (~1e-4 on logits) can flip
   near-tied beam candidates of an untrained model, so these tests are
   pinned to seeds where all instances agree; deterministic CPU execution
   keeps them stable, and any semantics regression breaks them loudly.
   (The pins are for the CPU XLA backend the test suite runs on — other
   backends have different accumulation noise and may flip a near-tie.)
"""

import numpy as np
import pytest

from test_reference_parity import _ref_opt, _our_opt
from reference_adapter import (import_reference,
                               transplant_transformer_weights,
                               transplant_salstm_weights,
                               transplant_highwaybn_encoder)


# ---------------------------------------------------------------------------
# layer 1: exact search-semantics equivalence via table-driven logits
# ---------------------------------------------------------------------------

def _make_tables(V, max_len, B, seed):
    rs = np.random.RandomState(seed)
    L = rs.uniform(-4, 4, (V, V)).astype(np.float32)       # last-token table
    P = rs.uniform(-4, 4, (max_len + 1, V)).astype(np.float32)  # position
    I = rs.uniform(-4, 4, (B, V)).astype(np.float32)       # instance
    return L, P, I


class _FakeRefModel:
    """Duck-typed reference captioner: logits are gathers+adds of fixed
    tables, so torch and XLA produce bit-identical values. The instance id
    rides inside ``encoder_hidden_states`` so it survives the reference's
    auto_enlarge / active-set compaction."""

    def __init__(self, torch, tables):
        self.torch = torch
        self.L, self.P, self.I = [torch.from_numpy(t) for t in tables]

    def encoding_phase(self, feats):
        B = feats[0].shape[0]
        ehs = self.torch.arange(B, dtype=self.torch.float32).view(B, 1, 1)
        return {"encoder_hidden_states": ehs}

    def prepare_inputs_for_decoder(self, encoding_phase_outputs, batch):
        return {"encoder_hidden_states":
                encoding_phase_outputs["encoder_hidden_states"]}

    def decoding_phase(self, input_ids, inputs_for_decoder,
                       decoder_rnn_hidden_states=None,
                       last_time_step_logits=False, **kw):
        inst = inputs_for_decoder["encoder_hidden_states"][:, 0, 0].long()
        if last_time_step_logits:                   # AR beam step
            last = input_ids[:, -1]
            pos = input_ids.shape[1] - 1
            logits = (self.L[last] + self.P[pos].unsqueeze(0)) + self.I[inst]
        else:                                       # NAR full canvas
            T = input_ids.shape[1]
            logits = ((self.L[input_ids] + self.P[:T].unsqueeze(0))
                      + self.I[inst].unsqueeze(1))
        return {"logits": logits}


@pytest.mark.parametrize("alpha,topk,beam", [(1.0, 1, 3), (1.35, 3, 3),
                                             (0.8, 5, 3)])
def test_ar_beam_semantics_match_reference_exactly(alpha, topk, beam):
    """The reference's python Beam bookkeeping vs our lax.while_loop beam
    on identical log-prob streams: identical captions, scores to 1e-5."""
    torch = pytest.importorskip("torch")
    import_reference()
    from models.Translator import get_translator as ref_get_translator

    import jax
    import jax.numpy as jnp
    from care_tpu.decoding.beam_search import beam_search

    V, max_len, B = 24, 10, 6
    tables = _make_tables(V, max_len, B, seed=13)
    fake = _FakeRefModel(torch, tables)

    ref_tr = ref_get_translator({
        "decoding_type": "ARFormer", "beam_size": beam, "topk": topk,
        "beam_alpha": alpha, "max_len": max_len})
    feats = [torch.zeros(B, 2, 2)]
    with torch.no_grad():
        ref_hyps, ref_scores = ref_tr.translate_batch([fake],
                                                      {"feats": feats})

    Lj, Pj, Ij = [jnp.asarray(t) for t in tables]

    def step_fn(tokens, position, carry):
        inst = carry[0]
        logits = (Lj[tokens] + Pj[position][None]) + Ij[inst]
        return jax.nn.log_softmax(logits, axis=-1), carry

    inst_rows = jnp.repeat(jnp.arange(B, dtype=jnp.int32), beam)
    hyp_tokens, hyp_scores, hyp_lengths, hyp_valid = jax.jit(
        lambda c: beam_search(step_fn, (c,), batch_size=B, vocab_size=V,
                              beam_size=beam, max_len=max_len,
                              beam_alpha=alpha, topk=topk))(inst_rows)

    hyp_tokens = np.asarray(hyp_tokens)
    hyp_scores = np.asarray(hyp_scores)
    hyp_lengths = np.asarray(hyp_lengths)
    hyp_valid = np.asarray(hyp_valid)

    n_best = topk   # reference's stateful n_best shrinkage (Translator.py:215)
    for n in range(B):
        ours = [hyp_tokens[n, k, :hyp_lengths[n, k]].tolist()
                for k in range(hyp_tokens.shape[1]) if hyp_valid[n, k]]
        n_best = min(n_best, len(ours))
        ours = ours[:n_best]
        assert len(ref_hyps[n]) == len(ours), (n, ref_hyps[n], ours)
        for k, (r, o) in enumerate(zip(ref_hyps[n], ours)):
            assert list(r) == list(o), (n, k, r, o)
        np.testing.assert_allclose(
            np.asarray(ref_scores[n]),
            np.asarray([hyp_scores[n, k]
                        for k in range(hyp_scores.shape[1])
                        if hyp_valid[n, k]][:n_best]),
            atol=1e-5, err_msg=str(n))


@pytest.mark.parametrize("paradigm,use_ct", [("mp", False), ("mp", True),
                                             ("l2r", False), ("ef", False)])
def test_nar_algorithms_match_reference_exactly(paradigm, use_ct):
    """Reference MaskPredict / Left2Right / EasyFirst vs our vectorized
    fixed-shape versions on identical logit tables."""
    torch = pytest.importorskip("torch")
    import_reference()
    from misc.Decoding.na_algorithms import MaskPredict, Left2Right, EasyFirst

    import jax.numpy as jnp
    from care_tpu import constants
    from care_tpu.decoding import nar

    V, T, rows = 24, 9, 8
    tables = _make_tables(V, T, rows, seed=29)
    # suppress special-token ids (PAD..VIS = 0..5): a trained model never
    # argmaxes them during NAR generation, and if the fake model predicts
    # MASK itself the reference's `tgt_tokens.eq(MASK)` conflates it with
    # an uncommitted slot and stalls into its dead-loop guard
    # (na_algorithms.py:305-307) — pathological-input behaviour we don't
    # reproduce bit-for-bit.
    tables = tuple(t.copy() for t in tables)
    tables[0][:, :6] -= 50.0
    fake = _FakeRefModel(torch, tables)

    # canvases of varying lengths (MASK body, PAD tail) like the NARFormer
    lengths = np.array([4, 5, 6, 7, 8, 9, 5, 7])
    canvas = np.where(np.arange(T)[None, :] < lengths[:, None],
                      constants.MASK, constants.PAD).astype(np.int64)

    opt = {"masking_decision": False, "no_candidate_decision": False,
           "algorithm_print_sent": False, "use_ct": use_ct,
           "iterations": 3, "q": 2, "q_iterations": 2}
    itow = {i: "w%d" % i for i in range(V)}
    ref_cls = {"mp": MaskPredict, "l2r": Left2Right, "ef": EasyFirst}[paradigm]
    algo = ref_cls(opt, None, itow)
    if paradigm in ("l2r", "ef"):
        # latent reference bug: Left2Right/EasyFirst never call prepare(),
        # so generate_non_autoregressive crashes on the unset self.eos_mask
        # (na_algorithms.py:80) — only 'mp' is reachable from shipped
        # configs. Pre-set the mask (no EOS in NARFormer canvases) so the
        # reference code path can run as ground truth.
        algo.eos_mask = torch.from_numpy(np.zeros_like(canvas, dtype=bool))
    inputs = {"encoder_hidden_states":
              torch.arange(rows, dtype=torch.float32).view(rows, 1, 1)}
    with torch.no_grad():
        ref_tokens, ref_lprobs = algo.generate(
            fake, None, inputs, None, torch.from_numpy(canvas.copy()))

    Lj, Pj, Ij = [jnp.asarray(t) for t in tables]
    inst = jnp.arange(rows, dtype=jnp.int32)

    def forward_logits(tokens):
        n = tokens.shape[1]
        return (Lj[tokens] + Pj[:n][None]) + Ij[inst][:, None, :]

    kwargs = (dict(iterations=opt["iterations"], use_ct=use_ct)
              if paradigm == "mp"
              else dict(q=opt["q"], q_iterations=opt["q_iterations"],
                        use_ct=use_ct))
    our_tokens, our_lprobs = nar.ALGORITHMS[paradigm](
        jnp.asarray(canvas.astype(np.int32)), forward_logits, **kwargs)

    np.testing.assert_array_equal(np.asarray(our_tokens),
                                  ref_tokens.numpy())
    np.testing.assert_allclose(np.asarray(our_lprobs), ref_lprobs.numpy(),
                               atol=1e-5)


class _FakeRefProbsModel(_FakeRefModel):
    """Variant exposing the pointer-style ``probs`` output: the reference's
    ``predict_word`` must take ``torch.log(probs)`` instead of
    ``log_softmax(logits)`` (``Translator.py:124-127``)."""

    def decoding_phase(self, *args, **kw):
        out = super().decoding_phase(*args, **kw)
        logits = out.pop("logits")
        out["probs"] = self.torch.softmax(logits, dim=-1)
        return out


def _make_vocab_mapping(V, V_teacher, seed):
    """Identity on the 6 special ids, a permutation into the teacher id
    space elsewhere (reference ``get_vocab_mapping``,
    ``Translator.py:321-339`` — asserts mapping[PAD] == PAD)."""
    rs = np.random.RandomState(seed)
    vm = np.zeros(V, dtype=np.int64)
    vm[:6] = np.arange(6)
    vm[6:] = rs.choice(np.arange(6, V_teacher), size=V - 6, replace=False)
    return vm


@pytest.mark.parametrize(
    "use_ct,masking_decision,no_candidate_decision",
    [(False, True, False), (True, True, False),
     (True, True, True), (False, False, False)])
def test_nar_teacher_rescoring_matches_reference_exactly(
        use_ct, masking_decision, no_candidate_decision):
    """AR-teacher rescoring + vocab mapping through the reference
    ``MaskPredict`` (``na_algorithms.py:92-126``: ``scoring_by_teacher``
    BOS shift, token mapping, pad/eos overrides, masking/candidate
    decision gates) vs our ``nar.mask_predict`` with a ``teacher_score``
    closure mirroring ``translator.py``'s — exact tokens, lprobs to 1e-5."""
    torch = pytest.importorskip("torch")
    import_reference()
    from misc.Decoding.na_algorithms import MaskPredict

    import jax
    import jax.numpy as jnp
    from care_tpu import constants
    from care_tpu.decoding import nar

    V, Vt, T, rows = 24, 32, 9, 8
    tables = _make_tables(V, T, rows, seed=47)
    tables = tuple(t.copy() for t in tables)
    tables[0][:, :6] -= 50.0            # see NAR test above
    t_tables = _make_tables(Vt, T, rows, seed=53)
    vm = _make_vocab_mapping(V, Vt, seed=5)

    fake = _FakeRefModel(torch, tables)
    fake_teacher = _FakeRefModel(torch, t_tables)

    lengths = np.array([4, 5, 6, 7, 8, 9, 5, 7])
    canvas = np.where(np.arange(T)[None, :] < lengths[:, None],
                      constants.MASK, constants.PAD).astype(np.int64)

    opt = {"masking_decision": masking_decision,
           "no_candidate_decision": no_candidate_decision,
           "algorithm_print_sent": False, "use_ct": use_ct,
           "iterations": 3}
    itow = {i: "w%d" % i for i in range(V)}
    algo = MaskPredict(opt, torch.from_numpy(vm), itow)
    inputs = {"encoder_hidden_states":
              torch.arange(rows, dtype=torch.float32).view(rows, 1, 1)}
    with torch.no_grad():
        ref_tokens, ref_lprobs = algo.generate(
            fake, fake_teacher, inputs, dict(inputs),
            torch.from_numpy(canvas.copy()))

    Lj, Pj, Ij = [jnp.asarray(t) for t in tables]
    Ltj, Ptj, Itj = [jnp.asarray(t) for t in t_tables]
    vmj = jnp.asarray(vm)
    inst = jnp.arange(rows, dtype=jnp.int32)
    pad_mask = jnp.asarray(canvas == constants.PAD)
    eos_mask = jnp.asarray(canvas == constants.EOS)

    def forward_logits(tokens):
        n = tokens.shape[1]
        return (Lj[tokens] + Pj[:n][None]) + Ij[inst][:, None, :]

    def teacher_score(tokens, is_last):
        # mirrors decoding/translator.py `teacher_score` exactly
        if is_last and no_candidate_decision:
            return jnp.ones_like(tokens, dtype=jnp.float32)
        if not is_last and not masking_decision:
            return jnp.ones_like(tokens, dtype=jnp.float32)
        toks = jnp.take(vmj, tokens, axis=0)
        with_bos = jnp.concatenate(
            [jnp.full((toks.shape[0], 1), constants.BOS, toks.dtype), toks],
            axis=1)[:, :-1]
        logits = (Ltj[with_bos] + Ptj[:T][None]) + Itj[inst][:, None, :]
        probs = jax.nn.softmax(logits, axis=-1)
        p = jnp.take_along_axis(probs, toks[:, :, None], axis=2)[:, :, 0]
        p = jnp.where(pad_mask, 1.0, p)
        if not is_last:
            p = jnp.where(eos_mask, 1.0, p)
        return p

    our_tokens, our_lprobs = nar.ALGORITHMS["mp"](
        jnp.asarray(canvas.astype(np.int32)), forward_logits,
        iterations=opt["iterations"], use_ct=use_ct,
        teacher_score=teacher_score)

    np.testing.assert_array_equal(np.asarray(our_tokens),
                                  ref_tokens.numpy())
    np.testing.assert_allclose(np.asarray(our_lprobs), ref_lprobs.numpy(),
                               atol=1e-5)


@pytest.mark.parametrize("probs_second", [False, True])
def test_ensemble_beam_semantics_match_reference_exactly(probs_second):
    """2-model ensemble averaging (``Translator.py:111-133``): per-model
    ``log_softmax(logits)`` — or ``log(probs)`` for a probs-emitting model
    — stacked and averaged equally before the beam advances. The reference
    engine runs both fakes; ours replicates the averaging in ``step_fn``
    exactly like ``decoding/translator.py:150-170``."""
    torch = pytest.importorskip("torch")
    import_reference()
    from models.Translator import get_translator as ref_get_translator

    import jax
    import jax.numpy as jnp
    from care_tpu.decoding.beam_search import beam_search

    V, max_len, B, beam, topk = 24, 10, 6, 3, 2
    tables1 = _make_tables(V, max_len, B, seed=61)
    tables2 = _make_tables(V, max_len, B, seed=67)
    fake1 = _FakeRefModel(torch, tables1)
    fake2 = (_FakeRefProbsModel if probs_second else _FakeRefModel)(
        torch, tables2)

    ref_tr = ref_get_translator({
        "decoding_type": "ARFormer", "beam_size": beam, "topk": topk,
        "beam_alpha": 1.0, "max_len": max_len})
    feats = [torch.zeros(B, 2, 2)]
    with torch.no_grad():
        ref_hyps, ref_scores = ref_tr.translate_batch(
            [fake1, fake2], {"feats": feats})

    L1, P1, I1 = [jnp.asarray(t) for t in tables1]
    L2, P2, I2 = [jnp.asarray(t) for t in tables2]

    def step_fn(tokens, position, carry):
        inst = carry[0]
        lp1 = jax.nn.log_softmax(
            (L1[tokens] + P1[position][None]) + I1[inst], axis=-1)
        logits2 = (L2[tokens] + P2[position][None]) + I2[inst]
        lp2 = (jnp.log(jax.nn.softmax(logits2, axis=-1)) if probs_second
               else jax.nn.log_softmax(logits2, axis=-1))
        return jnp.mean(jnp.stack([lp1, lp2], axis=0), axis=0), carry

    inst_rows = jnp.repeat(jnp.arange(B, dtype=jnp.int32), beam)
    hyp_tokens, hyp_scores, hyp_lengths, hyp_valid = jax.jit(
        lambda c: beam_search(step_fn, (c,), batch_size=B, vocab_size=V,
                              beam_size=beam, max_len=max_len,
                              beam_alpha=1.0, topk=topk))(inst_rows)

    hyp_tokens = np.asarray(hyp_tokens)
    hyp_scores = np.asarray(hyp_scores)
    hyp_lengths = np.asarray(hyp_lengths)
    hyp_valid = np.asarray(hyp_valid)

    n_best = topk
    for n in range(B):
        ours = [hyp_tokens[n, k, :hyp_lengths[n, k]].tolist()
                for k in range(hyp_tokens.shape[1]) if hyp_valid[n, k]]
        n_best = min(n_best, len(ours))
        ours = ours[:n_best]
        assert len(ref_hyps[n]) == len(ours), (n, ref_hyps[n], ours)
        for k, (r, o) in enumerate(zip(ref_hyps[n], ours)):
            assert list(r) == list(o), (n, k, r, o)
        np.testing.assert_allclose(
            np.asarray(ref_scores[n]),
            np.asarray([hyp_scores[n, k]
                        for k in range(hyp_scores.shape[1])
                        if hyp_valid[n, k]][:n_best]),
            atol=1e-5, err_msg=str(n))


# ---------------------------------------------------------------------------
# layer 2: end-to-end transplanted decode (pinned seeds, see module docstring)
# ---------------------------------------------------------------------------

def _build_pair(ref_opt, torch, seed=0, batch_seed=7, B=4):
    """Instantiate the reference torch model + our flax model with the same
    weights; return (ref_model, our_model, our_variables, feats_np, opt)."""
    import jax
    import jax.numpy as jnp
    from care_tpu.models import build_captioner

    get_framework = import_reference()
    torch.manual_seed(seed)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    rs = np.random.RandomState(batch_seed)
    feats_np = [rs.randn(B, ref_opt["n_frames"],
                         ref_opt[f"dim_{c}"]).astype(np.float32)
                for c in ref_opt["modality"]]

    opt = _our_opt(ref_opt)
    model = build_captioner(opt)
    batch = {"feats": [jnp.asarray(f) for f in feats_np],
             "input_ids": jnp.ones((B, ref_opt["max_len"] - 1), jnp.int32)}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng,
                            "sampling": rng}, batch, deterministic=True)
    variables = jax.tree.map(np.asarray, variables)
    return ref_model, model, variables, feats_np, opt


def _run_both_ar(ref_opt, ref_model, model, variables, feats_np, opt, torch):
    from models.Translator import get_translator as ref_get_translator
    ref_tr = ref_get_translator({**ref_opt, "decoding_type": "ARFormer"})
    with torch.no_grad():
        ref_hyps, ref_scores = ref_tr.translate_batch(
            [ref_model], {"feats": [torch.from_numpy(f) for f in feats_np]})

    import jax.numpy as jnp
    from care_tpu.decoding.translator import get_translator
    tr = get_translator(opt)
    our_hyps, our_scores = tr.translate_batch(
        [(model, variables)], {"feats": [jnp.asarray(f) for f in feats_np]})
    return ref_hyps, ref_scores, our_hyps, our_scores


def _assert_decode_equal(ref_hyps, ref_scores, our_hyps, our_scores,
                         score_atol=5e-3):
    assert len(ref_hyps) == len(our_hyps)
    for n, (rh, oh) in enumerate(zip(ref_hyps, our_hyps)):
        assert len(rh) == len(oh), (n, rh, oh)
        for k, (r, o) in enumerate(zip(rh, oh)):
            assert list(r) == list(o), (n, k, r, o)
    for n, (rs_, os_) in enumerate(zip(ref_scores, our_scores)):
        np.testing.assert_allclose(np.asarray(rs_, np.float64),
                                   np.asarray(os_, np.float64),
                                   atol=score_atol, err_msg=str(n))


@pytest.mark.parametrize("care,batch_seed", [(False, 31), (True, 37)])
def test_ar_beam_captions_match_reference_e2e(care, batch_seed):
    torch = pytest.importorskip("torch")
    ref_opt = _ref_opt(care=care)
    ref_opt.update({"beam_size": 3, "topk": 2, "beam_alpha": 1.0})
    ref_model, model, variables, feats_np, opt = _build_pair(
        ref_opt, torch, batch_seed=batch_seed)
    variables["params"] = transplant_transformer_weights(
        ref_model.state_dict(), variables["params"], ref_opt)
    _assert_decode_equal(*_run_both_ar(ref_opt, ref_model, model, variables,
                                       feats_np, opt, torch),
                         score_atol=1.5e-2)


def test_ar_beam_rnn_captions_match_reference_e2e():
    torch = pytest.importorskip("torch")
    ref_opt = _ref_opt()
    ref_opt.update({"decoder": "SingleLayerRNNDecoder", "rnn_type": "lstm",
                    "scheduled_sampling_start": -1, "max_len": 9,
                    "beam_size": 3, "topk": 1, "beam_alpha": 1.0})
    ref_model, model, variables, feats_np, opt = _build_pair(
        ref_opt, torch, seed=2, batch_seed=9, B=3)
    variables["params"] = transplant_salstm_weights(
        ref_model.state_dict(), variables["params"], ref_opt)
    # LSTM transcendentals (sigmoid/tanh) differ at ulp level between torch
    # and XLA and compound through the recurrence — tokens identical, scores
    # drift up to ~5e-2 over 8 steps
    _assert_decode_equal(*_run_both_ar(ref_opt, ref_model, model, variables,
                                       feats_np, opt, torch),
                         score_atol=6e-2)


def test_ensemble_beam_captions_match_reference_e2e():
    """2-model homogeneous ensemble through the REAL engines: the reference
    ``Translator_ARFormer`` on [ref1, ref2] vs our ``TranslatorARFormer``
    on [(model, v1), (model, v2)] — exercises the per-model encode +
    log-prob averaging loop in ``decoding/translator.py:150-170``."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from care_tpu.models import build_captioner

    ref_opt = _ref_opt()
    ref_opt.update({"beam_size": 3, "topk": 2, "beam_alpha": 1.0})
    get_framework = import_reference()

    # pinned seed (module docstring): averaging two UNTRAINED models packs
    # beam candidates within ~1e-3, so most seeds hit a near-tie that ulp
    # noise flips; 109/121/133 were verified tie-free on this backend
    rs = np.random.RandomState(109)
    B = 4
    feats_np = [rs.randn(B, ref_opt["n_frames"],
                         ref_opt[f"dim_{c}"]).astype(np.float32)
                for c in ref_opt["modality"]]

    opt = _our_opt(ref_opt)
    model = build_captioner(opt)
    batch = {"feats": [jnp.asarray(f) for f in feats_np],
             "input_ids": jnp.ones((B, ref_opt["max_len"] - 1), jnp.int32)}
    rng = jax.random.PRNGKey(0)

    ref_models, our_variables = [], []
    for seed in (0, 5):
        torch.manual_seed(seed)
        ref_m = get_framework(dict(ref_opt))
        ref_m.eval()
        ref_models.append(ref_m)
        variables = jax.tree.map(np.asarray, model.init(
            {"params": rng, "dropout": rng, "sampling": rng}, batch,
            deterministic=True))
        variables["params"] = transplant_transformer_weights(
            ref_m.state_dict(), variables["params"], ref_opt)
        our_variables.append(variables)

    from models.Translator import get_translator as ref_get_translator
    ref_tr = ref_get_translator({**ref_opt, "decoding_type": "ARFormer"})
    with torch.no_grad():
        ref_hyps, ref_scores = ref_tr.translate_batch(
            ref_models, {"feats": [torch.from_numpy(f) for f in feats_np]})

    from care_tpu.decoding.translator import get_translator
    tr = get_translator(opt)
    our_hyps, our_scores = tr.translate_batch(
        [(model, v) for v in our_variables],
        {"feats": [jnp.asarray(f) for f in feats_np]})
    _assert_decode_equal(ref_hyps, ref_scores, our_hyps, our_scores,
                         score_atol=1.5e-2)


def test_pointer_probs_beam_matches_reference_e2e():
    """PointerGen decode: beam search over the pointer's ``probs`` output
    (reference ``Translator.py:124-127`` takes ``log(probs)`` instead of
    ``log_softmax(logits)``) — copy-gate attention over retrieved captions,
    scatter-add, retrieval-mean — through both real engines."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from care_tpu.models import build_captioner
    from reference_adapter import transplant_pointer_weights

    ref_opt = _ref_opt()
    ref_opt.update({
        "modality": "mit", "pointer": "Pointer", "retrieval": True,
        "retrieval_topk": 3, "copy_scale": 1.0, "exclude_eos": True,
        "has_retrieval_embs": False, "has_retrieval_rnn": False,
        "beam_size": 3, "topk": 2, "beam_alpha": 1.0})
    get_framework = import_reference()
    torch.manual_seed(1)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()

    rs = np.random.RandomState(23)
    B, R, S = 3, 3, 7
    dense = [rs.randn(B, ref_opt["n_frames"],
                      ref_opt[f"dim_{c}"]).astype(np.float32)
             for c in "mi"]
    ret_lens = rs.randint(3, S + 1, (B, R))
    ret_ids = np.where(np.arange(S)[None, None, :] < ret_lens[:, :, None],
                       rs.randint(6, ref_opt["vocab_size"], (B, R, S)),
                       0).astype(np.int64)
    feats_np = dense + [ret_ids]

    opt = _our_opt(ref_opt)
    model = build_captioner(opt)
    to_j = lambda f: jnp.asarray(
        f.astype(np.int32) if f.dtype == np.int64 else f)
    batch = {"feats": [to_j(f) for f in feats_np],
             "input_ids": jnp.ones((B, ref_opt["max_len"] - 1), jnp.int32)}
    rng = jax.random.PRNGKey(0)
    variables = jax.tree.map(np.asarray, model.init(
        {"params": rng, "dropout": rng, "sampling": rng}, batch,
        deterministic=True))
    variables["params"] = transplant_transformer_weights(
        ref_model.state_dict(), variables["params"],
        {**ref_opt, "modality": "mi"})
    variables["params"] = transplant_pointer_weights(
        ref_model.state_dict(), variables["params"])

    from models.Translator import get_translator as ref_get_translator
    ref_tr = ref_get_translator({**ref_opt, "decoding_type": "ARFormer"})
    to_t = lambda f: torch.from_numpy(f)
    with torch.no_grad():
        ref_hyps, ref_scores = ref_tr.translate_batch(
            [ref_model], {"feats": [to_t(f) for f in feats_np]})

    from care_tpu.decoding.translator import get_translator
    tr = get_translator(opt)
    our_hyps, our_scores = tr.translate_batch(
        [(model, variables)], {"feats": batch["feats"]})
    _assert_decode_equal(ref_hyps, ref_scores, our_hyps, our_scores,
                         score_atol=1.5e-2)


def test_nacf_teacher_rescoring_matches_reference_e2e(tmp_path):
    """NACF (TwoStage decoder, CT templates) + AR-teacher rescoring with a
    DIFFERENT teacher vocabulary: the full chain — ``get_vocab_mapping``
    from info_corpus pickles, token mapping, BOS-shifted teacher forward,
    masking decisions — through both real engines
    (reference ``Translator.py:239-265,321-339`` +
    ``na_algorithms.py:92-126``)."""
    torch = pytest.importorskip("torch")
    import pickle
    import types as _types
    import jax
    import jax.numpy as jnp
    from care_tpu.models import build_captioner

    get_framework = import_reference()

    V, Vt = 40, 48
    words = {i: w for i, w in enumerate(
        ["<pad>", "<unk>", "<bos>", "<eos>", "<mask>", "<vis>"])}
    itow = dict(words)
    for i in range(6, V):
        itow[i] = "w%d" % i
    rs = np.random.RandomState(3)
    teacher_itow = dict(words)
    # teacher vocab: all student words (shuffled positions) + extras
    shuffled = ["w%d" % i for i in range(6, V)] + \
               ["x%d" % i for i in range(Vt - V)]
    rs.shuffle(shuffled)
    for j, w in enumerate(shuffled):
        teacher_itow[6 + j] = w

    student_pkl = tmp_path / "info_student.pkl"
    teacher_pkl = tmp_path / "info_teacher.pkl"
    with open(student_pkl, "wb") as f:
        pickle.dump({"info": {"itow": itow}}, f)
    with open(teacher_pkl, "wb") as f:
        pickle.dump({"info": {"itow": teacher_itow}}, f)

    ref_opt = _ref_opt()
    ref_opt.update({"encoder": "EncoderWithHighWayBN",
                    "decoder": "TwoStageTransformerDecoder",
                    "decoding_type": "NARFormer", "enhance_input": 2,
                    "paradigm": "mp", "iterations": 3,
                    "visual_word_generation": True, "use_ct": True,
                    "demand": ["VERB", "NOUN"], "nv_weights": [0.8, 1.0],
                    "masking_decision": True, "no_candidate_decision": False,
                    "length_beam_size": 4, "na_length_range": [5, 9],
                    "beam_alpha": 1.0, "info_corpus": str(student_pkl)})
    teacher_ref_opt = _ref_opt()
    teacher_ref_opt.update({"vocab_size": Vt,
                            "info_corpus": str(teacher_pkl)})

    torch.manual_seed(0)
    ref_model = get_framework(dict(ref_opt))
    ref_model.eval()
    torch.manual_seed(4)
    ref_teacher = get_framework(dict(teacher_ref_opt))
    ref_teacher.eval()

    rs2 = np.random.RandomState(19)
    B = 4
    feats_np = [rs2.randn(B, ref_opt["n_frames"],
                          ref_opt[f"dim_{c}"]).astype(np.float32)
                for c in ref_opt["modality"]]

    # ---- our transplanted pair ----------------------------------------
    opt = _our_opt(ref_opt)
    model = build_captioner(opt)
    batch = {"feats": [jnp.asarray(f) for f in feats_np],
             "input_ids": jnp.ones((B, ref_opt["max_len"] - 1), jnp.int32)}
    rng = jax.random.PRNGKey(0)
    variables = jax.tree.map(np.asarray, model.init(
        {"params": rng, "dropout": rng, "sampling": rng}, batch,
        deterministic=True))
    variables = transplant_highwaybn_encoder(ref_model.state_dict(),
                                             variables, ref_opt)
    variables["params"] = transplant_transformer_weights(
        ref_model.state_dict(), variables["params"],
        {**ref_opt, "modality": ""})

    teacher_opt = _our_opt(teacher_ref_opt)
    teacher_model = build_captioner(teacher_opt)
    t_variables = jax.tree.map(np.asarray, teacher_model.init(
        {"params": rng, "dropout": rng, "sampling": rng}, batch,
        deterministic=True))
    t_variables["params"] = transplant_transformer_weights(
        ref_teacher.state_dict(), t_variables["params"], teacher_ref_opt)

    # ---- reference decode ---------------------------------------------
    from models.Translator import get_translator as ref_get_translator
    wrapper = _types.SimpleNamespace(captioner=ref_teacher,
                                     get_opt=lambda: dict(teacher_ref_opt))
    ref_tr = ref_get_translator(dict(ref_opt))
    with torch.no_grad():
        ref_hyps, _ = ref_tr.translate_batch(
            [ref_model], {"feats": [torch.from_numpy(f) for f in feats_np]},
            teacher_model_wrapper=wrapper, vocab=itow)
    assert ref_tr.vocab_mapping is not None  # the remap actually engaged

    # ---- our decode ----------------------------------------------------
    from care_tpu import constants
    from care_tpu.models.loading import get_vocab_mapping
    from care_tpu.decoding.translator import get_translator
    vm = get_vocab_mapping(opt, teacher_opt)
    np.testing.assert_array_equal(np.asarray(vm),
                                  ref_tr.vocab_mapping.numpy())
    tr = get_translator(opt)
    our_hyps, _ = tr.translate_batch(
        [(model, variables)], {"feats": batch["feats"]},
        teacher=(teacher_model, t_variables), vocab_mapping=vm)

    def strip(rows):
        return [[int(t) for t in row[0] if int(t) != constants.PAD]
                for row in rows]

    assert strip(ref_hyps) == strip(our_hyps)


def test_nar_captions_match_reference_e2e():
    """NARFormer translate_batch end to end (NAB config, fallback length
    range): length beam, canvases, MaskPredict, re-ranking."""
    torch = pytest.importorskip("torch")
    ref_opt = _ref_opt()
    ref_opt.update({"encoder": "EncoderWithHighWayBN",
                    "decoding_type": "NARFormer", "enhance_input": 2,
                    "paradigm": "mp", "iterations": 3,
                    "length_beam_size": 4, "na_length_range": [5, 9],
                    "beam_alpha": 1.0, "use_ct": False})
    ref_model, model, variables, feats_np, opt = _build_pair(
        ref_opt, torch, batch_seed=11)
    variables = transplant_highwaybn_encoder(ref_model.state_dict(),
                                             variables, ref_opt)
    variables["params"] = transplant_transformer_weights(
        ref_model.state_dict(), variables["params"],
        {**ref_opt, "modality": ""})

    from models.Translator import get_translator as ref_get_translator
    itow = {i: "w%d" % i for i in range(ref_opt["vocab_size"])}
    ref_tr = ref_get_translator(dict(ref_opt))
    with torch.no_grad():
        ref_hyps, _ = ref_tr.translate_batch(
            [ref_model], {"feats": [torch.from_numpy(f) for f in feats_np]},
            teacher_model_wrapper=None, vocab=itow)

    import jax.numpy as jnp
    from care_tpu import constants
    from care_tpu.decoding.translator import get_translator
    tr = get_translator(opt)
    our_hyps, _ = tr.translate_batch(
        [(model, variables)], {"feats": [jnp.asarray(f) for f in feats_np]})

    def strip(rows):
        return [[int(t) for t in row[0] if int(t) != constants.PAD]
                for row in rows]

    assert strip(ref_hyps) == strip(our_hyps)
