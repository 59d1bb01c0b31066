"""Translators: batch caption generation (AR beam search / NAR refinement).

API parity with reference ``models/Translator.py``: ``get_translator(opt)``
returns an object whose ``translate_batch(models, batch, ...)`` yields
per-instance hypothesis token lists + scores. ``models`` is a list of
``(captioner_module, variables)`` pairs — ensembling averages per-step log
probabilities exactly like ``Translator.py:111-133``.

TPU-first: the whole decode (encode once -> enlarge by beam -> KV-cache
while_loop -> ranking) is one jitted program per (model, shape) signature;
results come back as fixed-shape arrays and only the final id->sentence
conversion happens on host.
"""

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from care_tpu import constants
from care_tpu.decoding.beam_search import beam_search
from care_tpu.decoding import nar
from care_tpu.models.framework import Captioner


def get_translator(opt: dict):
    if opt["decoding_type"] == "ARFormer":
        return TranslatorARFormer(opt)
    if opt["decoding_type"] == "NARFormer":
        return TranslatorNARFormer(opt)
    raise ValueError(opt["decoding_type"])


def auto_enlarge(tree, beam_size: int):
    """Repeat every array instance-major along axis 0 (reference
    ``misc/utils.py:261-279``): row n*K+k belongs to instance n."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, beam_size, axis=0) if x is not None else None,
        tree, is_leaf=lambda x: x is None)


def _cast_variables(variables, compute_dtype, keep_head_f32: bool):
    """Cast a variables pytree to the serving dtype; with
    ``keep_head_f32`` the vocab-projection (``cls_head``) params keep f32
    so the final logits matmul runs at full precision."""
    cast = lambda x: (x.astype(compute_dtype)
                      if hasattr(x, "dtype")
                      and jnp.issubdtype(x.dtype, jnp.floating) else x)
    out = jax.tree.map(cast, variables)
    if keep_head_f32 and isinstance(variables, dict) \
            and "cls_head" in variables.get("params", {}):
        out = dict(out)
        out["params"] = dict(out["params"])
        out["params"]["cls_head"] = variables["params"]["cls_head"]
    return out


def _naive_head_kernel(variables):
    """The bias-free NaiveHead projection kernel [H, V], or None when the
    variables carry any other head structure (MLPHead has a pre-dense +
    bias) — the static eligibility check of the fused head paths."""
    try:
        ch = variables["params"]["cls_head"]
        if (set(ch.keys()) == {"tgt_word_prj"}
                and set(ch["tgt_word_prj"].keys()) == {"kernel"}):
            return ch["tgt_word_prj"]["kernel"]
    except Exception:
        pass
    return None


def _vm_fingerprint(vm):
    """Cache-key component for a vocab-mapping array: the mapping is baked
    into the compiled closure, so two different mappings must never share a
    cache entry.  Call with the HOST-side array (before any jnp.asarray):
    fingerprinting a device array would add a device->host fetch (~26 ms
    dispatch floor on the axon runtime) to every NAR dispatch."""
    if vm is None:
        return None
    arr = np.asarray(vm)
    return (arr.shape, hash(arr.tobytes()))


class Translator:
    def __init__(self, opt: dict):
        self.opt = opt
        self._jit_cache: Dict[Any, Any] = {}

    def _batch_inputs(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        keep = ("category", "category_embs")
        return {k: batch[k] for k in keep if k in batch}

    def translate_batches(self, models, batches, depth: int = 2, **kwargs):
        """Pipelined decode over an iterable of batches: keeps up to
        ``depth`` decode programs in flight so device work overlaps host
        post-processing and the runtime's fixed per-call dispatch overhead
        (measured ~50-90 ms on the axon runtime; see bench.py).  Yields
        ``(batch, (hyps, scores))`` in input order — identical results to
        calling :meth:`translate_batch` per batch."""
        from collections import deque
        pending = deque()
        for batch in batches:
            pending.append((batch, self.dispatch(models, batch, **kwargs)))
            while len(pending) > depth:
                b, out = pending.popleft()
                yield b, self.collect(out)
        while pending:
            b, out = pending.popleft()
            yield b, self.collect(out)

    def translate_batches_grouped(self, models, tagged_batches,
                                  fused_k: int, **kwargs):
        """Decode an iterable of ``(tag, device_batch)`` pairs in groups of
        ``fused_k`` batches, each group as ONE device program
        (``translate_batches_fused``).

        Raggedness never leaves the fused program (round-5 upgrade):

        * a batch with FEWER ROWS than the group's first batch (the short
          dataset tail) is row-padded to the group's row count by
          repeating its first row; padded rows decode as dead weight and
          are sliced off before hypothesis collection, so hypotheses are
          token-identical to a per-batch decode of the short batch
          (scores agree to f32 reduction-order noise, ~1e-7: the rows run
          through the group-shape program instead of a short-shape one);
        * only a genuinely different signature (trailing feat dims, aux
          key set/trailing dims, or MORE rows) starts a new group — each
          distinct signature is a fresh multi-minute tunnel compile;
        * a partial group (fewer than ``fused_k`` batches) is padded to
          ``fused_k`` by repeating the last batch, extras discarded.

        Yields ``(tag, (hyps, scores))`` in input order — identical
        results to per-batch ``translate_batch``."""
        group = []  # [(tag, row-padded batch, n_real_rows)]

        def sig_of(b):
            def rec(f):
                return (tuple(rec(x) for x in f)
                        if isinstance(f, (list, tuple)) else f.shape[1:])
            aux = self._batch_inputs(b)
            return (rec(b["feats"]),
                    tuple(sorted((k, v.shape[1:]) for k, v in aux.items())))

        def rows_of(b):
            f = b["feats"]
            while isinstance(f, (list, tuple)):
                f = f[0]
            return int(f.shape[0])

        def pad_rows(b, rows):
            n = rows_of(b)
            if n == rows:
                return b

            def pad(x):
                return jnp.concatenate(
                    [jnp.asarray(x),
                     jnp.repeat(jnp.asarray(x)[:1], rows - n, axis=0)],
                    axis=0)
            out = {"feats": jax.tree.map(pad, b["feats"])}
            for k, v in self._batch_inputs(b).items():
                out[k] = pad(v)
            return out

        def flush():
            if not group:
                return
            n = len(group)
            batches = [b for _, b, _ in group]
            n_rows = [r for _, _, r in group]
            if n < fused_k:
                print(f"- fused decode: ragged group of {n} padded to "
                      f"{fused_k} ({fused_k - n} wasted batch decodes)")
            batches += [batches[-1]] * (fused_k - n)
            outs = self.translate_batches_fused(models, batches,
                                                n_rows=n_rows + [None] *
                                                (fused_k - n), **kwargs)
            for (tag, _, _), out in zip(group, outs[:n]):
                yield tag, out
            group.clear()

        group_sig, group_rows = None, None
        for tag, b in tagged_batches:
            sig, rows = sig_of(b), rows_of(b)
            if group and not (sig == group_sig and rows <= group_rows):
                yield from flush()
            if not group:
                group_sig, group_rows = sig, rows
            if rows < group_rows:
                print(f"- fused decode: short batch of {rows} rows "
                      f"row-padded to {group_rows} (outputs sliced)")
                b = pad_rows(b, group_rows)
            group.append((tag, b, rows))
            if len(group) == fused_k:
                yield from flush()
        yield from flush()


class TranslatorARFormer(Translator):
    """Batched beam search with KV cache (replaces ``Translator_ARFormer``)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.beam_size = opt.get("beam_size", 5)
        self.beam_alpha = opt.get("beam_alpha", 1.0)
        self.topk = opt.get("topk", 1)
        self.max_len = opt.get("max_len", 30)

    def _make_run(self, models, is_rnn: bool):
        """The pure decode body (encode -> enlarge -> KV-cache beam), shared
        by the per-batch jit and the K-batch fused program."""
        opt = self.opt
        beam_size, max_len = self.beam_size, self.max_len
        topk, alpha = self.topk, self.beam_alpha
        vocab = opt["vocab_size"]

        compute_dtype = opt.get("compute_dtype_decode", None)
        keep_head_f32 = opt.get("decode_head_f32", False)

        # fused vocab-projection + top-k (ops/fused_head_topk.py): the
        # decode loop's [rows, V] logits never materialise in HBM.  Valid
        # exactly when ONE model projects hidden states through a plain
        # linear head (no pointer/copy probs, no ensemble logp averaging,
        # no RNN is_prob variations) — the flagship serving shape.
        fuse_head = (opt.get("fused_head_topk", True)
                     and len(models) == 1 and not is_rnn
                     and not opt.get("pointer")
                     and opt.get("cls_head") == "NaiveHead")
        fused_chunk = int(opt.get("fused_head_chunk", 1024))
        # 'auto' = pallas on TPU; a host that rejects the mosaic lowering
        # (bench probes for this) can pin the portable lax.scan form with
        # fused_head_backend='xla' and keep the no-[rows,V]-logits fusion
        fused_backend = str(opt.get("fused_head_backend", "auto"))

        def run(all_variables, feats, batch_aux):
            if compute_dtype is not None:
                # half-precision decode: params + activations in bf16, beam
                # scores and softmax stay f32 (cast at the logits boundary).
                # decode_head_f32: optional f32 vocab-projection kernel —
                # measured on the trained flagship to change NO beam picks
                # (the bf16 rounding that flips captions lives in the
                # decoder hidden states, not the final matmul) at ~4%
                # throughput cost, hence off by default.
                all_variables = [_cast_variables(v, compute_dtype,
                                                 keep_head_f32)
                                 for v in all_variables]
                cast = lambda x: (x.astype(compute_dtype)
                                  if hasattr(x, "dtype")
                                  and jnp.issubdtype(x.dtype, jnp.floating)
                                  else x)
                feats = jax.tree.map(cast, feats)
            # feats: list of arrays shared by all models, OR (heterogeneous
            # ensembles) a list with one feats-list per model (reference
            # ModelEnsemble.preprocess_batch_before_translate_step)
            per_model = isinstance(feats[0], (list, tuple))
            N = (feats[0][0] if per_model else feats[0]).shape[0]
            carries = []
            all_inputs = []
            for idx, ((model, _), variables) in enumerate(
                    zip(models, all_variables)):
                model_feats = feats[idx] if per_model else feats
                enc = model.apply(variables, model_feats,
                                  method=Captioner.encoding_phase)
                inputs_raw = model.apply(
                    variables, enc, batch_aux,
                    method=Captioner.prepare_inputs_for_decoder)
                inputs = auto_enlarge(inputs_raw, beam_size)
                all_inputs.append(inputs)
                if is_rnn:
                    carry = model.apply(
                        variables, inputs, method=Captioner.init_rnn_carry)
                else:
                    # cache init from UN-enlarged inputs: cross/attr K/V
                    # stay [B] (beams share them — attend folds the beam
                    # into the query rows); only self KV is [B*beam]
                    carry = model.apply(
                        variables, inputs_raw, max_len, beam_size,
                        method=Captioner.init_decode_state)
                carries.append(carry)

            def gather_carry(carry_tuple, row_idx):
                """Reorder only the per-row-evolving state (self-attn KV /
                RNN state). Cross-attention and attr K/V are enlarged
                per-beam but identical within an instance, and the beam
                permutation never crosses instances -- gathering them is a
                semantic no-op, so skip the bandwidth."""
                new = []
                for carry in carry_tuple:
                    if is_rnn:
                        new.append(jax.tree.map(
                            lambda x: jnp.take(x, row_idx, axis=0), carry))
                    else:
                        layers = []
                        for st in carry["layers"]:
                            layers.append({
                                **st,
                                "self_k": jnp.take(st["self_k"], row_idx,
                                                   axis=0),
                                "self_v": jnp.take(st["self_v"], row_idx,
                                                   axis=0),
                            })
                        new.append({**carry, "layers": layers})
                return tuple(new)

            if fuse_head:
                model, variables = models[0][0], all_variables[0]
                head_W = variables["params"]["cls_head"]["tgt_word_prj"][
                    "kernel"]

                def step_fn(tokens, position, carry_tuple):
                    h, new_carry = model.apply(
                        variables, tokens, position, carry_tuple[0],
                        method=Captioner.decode_step_hidden)
                    return h, (new_carry,)

                return beam_search(
                    step_fn, tuple(carries), batch_size=N, vocab_size=vocab,
                    beam_size=beam_size, max_len=max_len, beam_alpha=alpha,
                    topk=topk, gather_carry=gather_carry,
                    fused_head=(head_W, None, fused_chunk, fused_backend))

            def step_fn(tokens, position, carry_tuple):
                logps = []
                new_carries = []
                for (model, _), variables, inputs, carry in zip(
                        models, all_variables, all_inputs, carry_tuple):
                    if is_rnn:
                        logits, new_carry = model.apply(
                            variables, tokens, carry, inputs,
                            method=Captioner.rnn_decode_step)
                        logps.append(jax.nn.log_softmax(
                            logits.astype(jnp.float32), axis=-1))
                    else:
                        out, new_carry, is_prob = model.apply(
                            variables, tokens, position, carry, inputs,
                            method=Captioner.decode_step)
                        out = out.astype(jnp.float32)
                        logps.append(out if is_prob
                                     else jax.nn.log_softmax(out, axis=-1))
                    new_carries.append(new_carry)
                logp = jnp.mean(jnp.stack(logps, axis=0), axis=0)
                return logp, tuple(new_carries)

            return beam_search(
                step_fn, tuple(carries), batch_size=N, vocab_size=vocab,
                beam_size=beam_size, max_len=max_len, beam_alpha=alpha,
                topk=topk, gather_carry=gather_carry)

        return run

    def _build_fn(self, models, batch_keys, is_rnn: bool):
        return jax.jit(self._make_run(models, is_rnn))

    def _build_fused_fn(self, models, batch_keys, is_rnn: bool):
        """ONE jitted program decoding K stacked same-shape batches via
        ``lax.map``: the runtime's fixed per-program dispatch cost (the
        measured ~50-90 ms floor on the axon runtime, see bench.py) is paid
        once per K batches even on the synchronous path, while the working
        set stays that of a single batch (map is sequential, unlike a K-fold
        megabatch concat)."""
        run = self._make_run(models, is_rnn)

        def run_many(all_variables, stacked_feats, stacked_aux):
            return jax.lax.map(
                lambda fa: run(all_variables, fa[0], fa[1]),
                (stacked_feats, stacked_aux))

        return jax.jit(run_many)

    def dispatch(self, models, batch: Dict[str, Any], **kwargs):
        """Enqueue one fused decode program; returns device output handles
        (async — pair with :meth:`collect`)."""
        if not isinstance(models, list):
            models = [models]
        is_rnn = "rnn" in self.opt["decoder"].lower()
        batch_aux = self._batch_inputs(batch)
        key = (tuple(id(m) for m, _ in models),
               tuple(sorted(batch_aux.keys())), is_rnn)
        if key not in self._jit_cache:
            # keep strong refs to the models: id() keys of garbage-collected
            # modules can be recycled and would serve a stale compiled fn
            self._jit_cache[key] = (
                self._build_fn(models, tuple(sorted(batch_aux)), is_rnn),
                [m for m, _ in models])
        fn = self._jit_cache[key][0]
        all_variables = [v for _, v in models]
        return fn(all_variables, batch["feats"], batch_aux)

    def translate_batch(self, models, batch: Dict[str, Any], *args, **kwargs
                        ) -> Tuple[List[List[List[int]]], List[List[float]]]:
        """models: list of (captioner, variables). Returns (hyps, scores)
        shaped like the reference: hyps[n] = list of topk token-id lists."""
        return self.collect(self.dispatch(models, batch))

    def dispatch_fused(self, models, batches: List[Dict[str, Any]]):
        """Enqueue ONE device program decoding K same-shape batches
        (``_build_fused_fn``); returns stacked output handles."""
        if not isinstance(models, list):
            models = [models]
        K = len(batches)
        is_rnn = "rnn" in self.opt["decoder"].lower()
        aux_list = [self._batch_inputs(b) for b in batches]
        key = (tuple(id(m) for m, _ in models),
               tuple(sorted(aux_list[0].keys())), is_rnn, "fused", K)
        if key not in self._jit_cache:
            self._jit_cache[key] = (
                self._build_fused_fn(models, tuple(sorted(aux_list[0])),
                                     is_rnn),
                [m for m, _ in models])
        fn = self._jit_cache[key][0]
        all_variables = [v for _, v in models]
        stacked_feats = jax.tree.map(lambda *xs: jnp.stack(xs),
                                     *[b["feats"] for b in batches])
        stacked_aux = (jax.tree.map(lambda *xs: jnp.stack(xs), *aux_list)
                       if aux_list[0] else {})
        return fn(all_variables, stacked_feats, stacked_aux)

    def translate_batches_fused(self, models, batches: List[Dict[str, Any]],
                                n_rows: Optional[List[Optional[int]]] = None,
                                **kwargs):
        """Decode K same-shape batches in one program; returns a list of
        per-batch (hyps, scores) — identical to per-batch translate_batch,
        with the per-call dispatch floor paid once.  ``n_rows[k]`` (when
        given) slices batch k's outputs to its first ``n_rows[k]``
        instances BEFORE hypothesis collection, so row-padded ragged
        batches collect exactly like the unpadded batch would (the
        reference's n_best coupling in ``collect`` must never see pad
        rows).  Extra kwargs (teacher etc.) are ignored like in
        ``translate_batch``."""
        out = self.dispatch_fused(models, batches)
        arrays = [np.asarray(o) for o in out]
        rows = n_rows or [None] * len(batches)
        return [self.collect(tuple(a[k][:rows[k]] for a in arrays))
                for k in range(len(batches))]

    def collect(self, out):
        """Host side of one decode: fetch + reference-shaped hypothesis
        collection (the np.asarray calls are the true sync point)."""
        hyp_tokens, hyp_scores, hyp_lengths, hyp_valid = out

        hyp_tokens = np.asarray(hyp_tokens)
        hyp_scores = np.asarray(hyp_scores)
        hyp_lengths = np.asarray(hyp_lengths)
        hyp_valid = np.asarray(hyp_valid)

        all_hyp, all_scores = [], []
        # the reference's collect_hypothesis_and_scores reassigns
        # n_best = min(n_best, len(scores)) INSIDE the instance loop
        # (Translator.py:211-220), so one under-filled beam caps every
        # later instance's hypothesis count — reproduced for parity
        n_best = self.topk
        for n in range(hyp_tokens.shape[0]):
            hyps, scores = [], []
            for k in range(hyp_tokens.shape[1]):
                if not hyp_valid[n, k]:
                    continue
                L = int(hyp_lengths[n, k])
                hyps.append(hyp_tokens[n, k, :L].tolist())
                scores.append(float(hyp_scores[n, k]))
            n_best = min(n_best, len(hyps))
            all_hyp.append(hyps[:n_best])
            all_scores.append(scores[:n_best])
        return all_hyp, all_scores


class TranslatorNARFormer(Translator):
    """Length-beam NAR refinement (replaces ``Translator_NARFormer``)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.paradigm = opt.get("paradigm", "mp")
        assert self.paradigm in ("mp", "l2r", "ef")
        self.max_len = opt["max_len"]
        self.length_beam_size = opt["length_beam_size"]
        self.beam_alpha = opt.get("beam_alpha", 1.0)
        self.length_bias = opt.get("length_bias", 0)

    def _make_run(self, model, vocab_mapping):
        opt = self.opt
        max_len = self.max_len
        paradigm = self.paradigm
        compute_dtype = opt.get("compute_dtype_decode", None)
        keep_head_f32 = opt.get("decode_head_f32", False)

        def run(variables, feats, batch_aux, teacher_variables):
            if compute_dtype is not None:
                # half-precision NAR decode (like the AR path): params +
                # activations bf16, logits cast back to f32 at the
                # softmax/argmax boundary inside the algorithms
                cast = lambda x: (x.astype(compute_dtype)
                                  if hasattr(x, "dtype")
                                  and jnp.issubdtype(x.dtype, jnp.floating)
                                  else x)
                variables = _cast_variables(variables, compute_dtype,
                                            keep_head_f32)
                feats = jax.tree.map(cast, feats)
                teacher_variables = _cast_variables(
                    teacher_variables, compute_dtype, keep_head_f32)
            N = feats[0].shape[0]
            model_obj, teacher_obj = model
            enc = model_obj.apply(variables, feats,
                                  method=Captioner.encoding_phase)

            # length beam (reference Translator.py:307-318)
            if "preds_length" in enc:
                lbs = self.length_beam_size
                _, beam = jax.lax.top_k(enc["preds_length"], lbs)
                beam = beam + self.length_bias
                beam = jnp.clip(beam, 4, max_len)
            else:
                lo, hi = opt.get("na_length_range", [5, 11])
                # reference adapts length_beam_size to the range length
                # (Translator.py:272: self.length_beam_size = beam.shape[1])
                lbs = hi - lo
                beam = jnp.broadcast_to(jnp.arange(lo, hi)[None, :], (N, lbs))

            inputs = model_obj.apply(variables, enc, batch_aux,
                                     method=Captioner.prepare_inputs_for_decoder)
            inputs = auto_enlarge(inputs, lbs)

            lengths = beam.reshape(N * lbs)                 # [N*lbs]
            pos = jnp.arange(max_len)[None, :]
            canvas = jnp.where(pos < lengths[:, None],
                               constants.MASK, constants.PAD).astype(jnp.int32)

            def forward_logits(tokens):
                out = model_obj.apply(
                    variables, tokens, inputs,
                    method=Captioner.decoding_phase,
                    collect_aux=False)
                logits = out["logits"]
                if isinstance(logits, list):
                    logits = logits[-1]
                # softmax/argmax/probs comparisons stay f32 under
                # half-precision decode
                return logits.astype(jnp.float32)

            # fused statistics forward (ops/fused_head_topk.py
            # vocab_argmax_lse): the NAR loop only consumes (argmax, its
            # softmax prob), so the [N*lbs, L, V] logits/probs need never
            # materialise.  Structural fallback: pointer configs come back
            # with "logits" and take the dense path.
            forward_stats = None
            if (opt.get("fused_head_topk", True)
                    and opt.get("cls_head") == "NaiveHead"
                    and not opt.get("pointer")):
                from care_tpu.ops.fused_head_topk import vocab_argmax_lse
                head_W = variables["params"]["cls_head"]["tgt_word_prj"][
                    "kernel"]
                chunk = int(opt.get("fused_head_chunk", 1024))

                def forward_stats(tokens):
                    out = model_obj.apply(
                        variables, tokens, inputs,
                        method=Captioner.decoding_phase,
                        collect_aux=False, compute_logits=False)
                    if "logits" in out:          # static fallback
                        logits = out["logits"]
                        if isinstance(logits, list):
                            logits = logits[-1]
                        toks, probs, _ = nar.generate_step_with_prob(
                            logits.astype(jnp.float32))
                        return toks, probs
                    hs = out["hidden_states"]
                    if isinstance(hs, list):
                        hs = hs[-1]
                    idx, mx, lse = vocab_argmax_lse(
                        hs, head_W, None, chunk_size=chunk,
                        backend=str(opt.get("fused_head_backend", "auto")))
                    return idx, jnp.exp(mx - lse)

            teacher_score = None
            if teacher_obj is not None:
                t_enc = teacher_obj.apply(teacher_variables, feats,
                                          method=Captioner.encoding_phase)
                t_inputs = teacher_obj.apply(
                    teacher_variables, t_enc, batch_aux,
                    method=Captioner.prepare_inputs_for_decoder)
                t_inputs = auto_enlarge(t_inputs, lbs)
                pad_mask = canvas == constants.PAD
                eos_mask = canvas == constants.EOS

                def teacher_score(tokens, is_last):
                    if is_last and opt.get("no_candidate_decision", False):
                        return jnp.ones_like(tokens, dtype=jnp.float32)
                    if not is_last and not opt.get("masking_decision", False):
                        return jnp.ones_like(tokens, dtype=jnp.float32)
                    toks = tokens
                    if vocab_mapping is not None:
                        toks = jnp.take(vocab_mapping, tokens, axis=0)
                    with_bos = jnp.concatenate(
                        [jnp.full((toks.shape[0], 1), constants.BOS,
                                  toks.dtype), toks], axis=1)
                    t_kernel = _naive_head_kernel(teacher_variables)
                    if (opt.get("fused_head_topk", True)
                            and t_kernel is not None):
                        # fused: per-token prob = exp(tok_logit - lse)
                        # without the [N, L, V] softmax
                        out = teacher_obj.apply(
                            teacher_variables, with_bos[:, :-1], t_inputs,
                            method=Captioner.decoding_phase,
                            collect_aux=False, compute_logits=False)
                    else:
                        out = teacher_obj.apply(
                            teacher_variables, with_bos[:, :-1], t_inputs,
                            method=Captioner.decoding_phase,
                            collect_aux=False)
                    if "logits" not in out:
                        from care_tpu.ops.fused_head_topk import \
                            vocab_argmax_lse
                        hs = out["hidden_states"]
                        if isinstance(hs, list):
                            hs = hs[-1]
                        _, _, lse, tokl = vocab_argmax_lse(
                            hs, t_kernel, None, token_ids=toks,
                            chunk_size=int(opt.get("fused_head_chunk",
                                                   1024)),
                            backend=str(opt.get("fused_head_backend",
                                                "auto")))
                        p = jnp.exp(tokl - lse)
                    else:
                        probs = jax.nn.softmax(
                            out["logits"].astype(jnp.float32), axis=-1)
                        p = jnp.take_along_axis(probs, toks[:, :, None],
                                                axis=2)[:, :, 0]
                    p = jnp.where(pad_mask, 1.0, p)
                    if not is_last:
                        p = jnp.where(eos_mask, 1.0, p)
                    return p

            algo_kwargs = {}
            if paradigm == "mp":
                algo_kwargs = dict(iterations=opt.get("iterations", 5),
                                   use_ct=opt.get("use_ct", False))
            else:
                algo_kwargs = dict(q=opt.get("q", 1),
                                   q_iterations=opt.get("q_iterations", 1),
                                   use_ct=opt.get("use_ct", False))
            hypotheses, lprobs = nar.ALGORITHMS[paradigm](
                canvas, forward_logits, teacher_score=teacher_score,
                forward_stats=forward_stats, **algo_kwargs)

            hypotheses = hypotheses.reshape(N, lbs, max_len)
            lprobs = lprobs.reshape(N, lbs, max_len)
            tgt_lengths = lengths.reshape(N, lbs).astype(jnp.float32)
            avg_log_prob = lprobs.sum(-1) / (tgt_lengths ** self.beam_alpha)
            best = jnp.argmax(avg_log_prob, axis=-1)        # [N]
            hyp = jnp.take_along_axis(hypotheses, best[:, None, None], axis=1)
            lp = jnp.take_along_axis(lprobs, best[:, None, None], axis=1)
            # shape [N, 1, max_len], matching the reference's output layout
            return hyp, lp

        return run

    def _build_fn(self, model, variables_teacher, vocab_mapping):
        return jax.jit(self._make_run(model, vocab_mapping))

    def _build_fused_fn(self, model, vocab_mapping):
        """K stacked same-shape batches in one program (see the AR
        counterpart): dispatch floor paid once per K, single-batch
        working set."""
        run = self._make_run(model, vocab_mapping)

        def run_many(variables, stacked_feats, stacked_aux,
                     teacher_variables):
            return jax.lax.map(
                lambda fa: run(variables, fa[0], fa[1], teacher_variables),
                (stacked_feats, stacked_aux))

        return jax.jit(run_many)

    def dispatch(self, models, batch: Dict[str, Any],
                 teacher=None, vocab_mapping=None, **kwargs):
        """Enqueue one NAR refinement program (async; see ``collect``)."""
        if isinstance(models, list):
            assert len(models) == 1
            model, variables = models[0]
        else:
            model, variables = models
        teacher_obj, teacher_vars = (teacher if teacher is not None
                                     else (None, None))
        vm_host = (np.asarray(vocab_mapping) if vocab_mapping is not None
                   else None)
        vm = jnp.asarray(vm_host) if vm_host is not None else None
        key = (id(model), id(teacher_obj), self.paradigm,
               _vm_fingerprint(vm_host))
        if key not in self._jit_cache:
            # strong refs: see TranslatorARFormer.dispatch
            self._jit_cache[key] = (
                self._build_fn((model, teacher_obj), teacher_vars, vm),
                (model, teacher_obj))
        fn = self._jit_cache[key][0]
        batch_aux = self._batch_inputs(batch)
        return fn(variables, batch["feats"], batch_aux,
                  teacher_vars if teacher_vars is not None else {})

    def collect(self, out):
        hyp, lp = out
        return np.asarray(hyp).tolist(), np.asarray(lp).tolist()

    def translate_batch(self, models, batch: Dict[str, Any],
                        teacher=None, vocab_mapping=None, **kwargs):
        """models: list with one (captioner, variables) pair; ``teacher``:
        optional (captioner, variables) AR teacher for rescoring."""
        return self.collect(self.dispatch(models, batch, teacher=teacher,
                                          vocab_mapping=vocab_mapping))

    def dispatch_fused(self, models, batches: List[Dict[str, Any]],
                       teacher=None, vocab_mapping=None):
        if isinstance(models, list):
            assert len(models) == 1
            model, variables = models[0]
        else:
            model, variables = models
        teacher_obj, teacher_vars = (teacher if teacher is not None
                                     else (None, None))
        vm_host = (np.asarray(vocab_mapping) if vocab_mapping is not None
                   else None)
        vm = jnp.asarray(vm_host) if vm_host is not None else None
        K = len(batches)
        key = (id(model), id(teacher_obj), self.paradigm, "fused", K,
               _vm_fingerprint(vm_host))
        if key not in self._jit_cache:
            self._jit_cache[key] = (
                self._build_fused_fn((model, teacher_obj), vm),
                (model, teacher_obj))
        fn = self._jit_cache[key][0]
        aux_list = [self._batch_inputs(b) for b in batches]
        stacked_feats = jax.tree.map(lambda *xs: jnp.stack(xs),
                                     *[b["feats"] for b in batches])
        stacked_aux = (jax.tree.map(lambda *xs: jnp.stack(xs), *aux_list)
                       if aux_list[0] else {})
        return fn(variables, stacked_feats, stacked_aux,
                  teacher_vars if teacher_vars is not None else {})

    def translate_batches_fused(self, models, batches, teacher=None,
                                vocab_mapping=None, n_rows=None):
        hyp, lp = self.dispatch_fused(models, batches, teacher=teacher,
                                      vocab_mapping=vocab_mapping)
        hyp, lp = np.asarray(hyp), np.asarray(lp)
        rows = n_rows or [None] * len(batches)
        return [self.collect((hyp[k][:rows[k]], lp[k][:rows[k]]))
                for k in range(len(batches))]
