"""Fixed-shape batched beam search.

Replaces the reference's python-object beam engine (per-instance ``Beam``
objects, active-set compaction, full-prefix recomputation each step --
``models/Translator.py:22-220`` + ``misc/Decoding/Beam.py``) with a single
``lax.while_loop`` over static shapes:

* all `batch x beam` rows live in one ``[N*K, ...]`` tensor; "inactive"
  instances are masked, never compacted;
* the model is driven through a ``step_fn`` that consumes ONE token per row
  and a carry (the HBM-resident KV cache for transformers / the recurrent
  state for RNNs), so each step is O(L) attention instead of O(L^2)
  recomputation;
* finished-hypothesis bookkeeping reproduces the reference ``Beam``
  semantics exactly: rows whose last token is EOS are killed with -1e20
  before expansion, each newly-EOS'd row is appended to a finished buffer
  (capacity ``max(beam, topk)``; admission in beam order), at ``max_len`` a
  never-finished instance force-finishes with all current rows, and final
  ranking is ``score / timestep**alpha``;
* ``prev_k = flat_id // vocab`` integer semantics included.

Early exit: the while_loop terminates as soon as every instance has filled
its finished buffer, matching the reference's active-list break.
"""

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from care_tpu import constants
from care_tpu.ops.topk import hierarchical_top_k

DEAD = -1e20


class BeamState(NamedTuple):
    t: jnp.ndarray             # scalar int32: next position to generate (1-based)
    tokens: jnp.ndarray        # [N, K, max_len] int32 (tokens[..., 0] = BOS)
    scores: jnp.ndarray        # [N, K] f32 cumulative log-probs
    last_tokens: jnp.ndarray   # [N, K] int32
    fin_scores: jnp.ndarray    # [N, F] f32 (raw, un-normalised)
    fin_lengths: jnp.ndarray   # [N, F] int32 (timestep incl. the EOS token)
    fin_tokens: jnp.ndarray    # [N, F, max_len] int32 (generated tokens, no BOS)
    fin_count: jnp.ndarray     # [N] int32
    carry: Any                 # model carry (KV cache / RNN state), leading dim N*K


def beam_search(
    step_fn: Callable[[jnp.ndarray, jnp.ndarray, Any], Tuple[jnp.ndarray, Any]],
    init_carry: Any,
    batch_size: int,
    vocab_size: int,
    beam_size: int = 5,
    max_len: int = 30,
    beam_alpha: float = 1.0,
    topk: int = 1,
    bos_id: int = constants.BOS,
    eos_id: int = constants.EOS,
    gather_carry: Callable[[Any, jnp.ndarray], Any] = None,
    fused_head: Optional[Tuple[Any, Any, int]] = None,
):
    """Run beam search; returns (hyp_tokens [N, topk, max_len],
    hyp_scores [N, topk], hyp_lengths [N, topk]).

    ``step_fn(last_tokens [N*K] int32, position int32, carry)`` must return
    ``(log_probs [N*K, V] f32, new_carry)``; ``position`` is the 0-based index
    of ``last_tokens`` in the generated sequence (BOS = position 0 is fed at
    the first call). ``gather_carry(carry, row_idx [N*K])`` reorders the
    carry after beam reshuffling (default: tree-map take along axis 0).

    Non-finite log-probs (e.g. a caller masking banned tokens with -inf)
    are clamped to the finite ``DEAD`` score before accumulation: the exact
    top-k runs in its ``assume_finite`` fast path, whose distinct-index
    guarantee requires every input > -inf.

    ``fused_head=(W, b, chunk_size[, backend])`` switches the expansion to
    ``ops/fused_head_topk.fused_head_beam_topk``: ``step_fn`` must then
    return decoder HIDDEN states ``[N*K, H]`` (pre vocab projection) and
    the ``[rows, V]`` logits are never materialised — the projection
    streams in vocab chunks straight into the online-softmax + candidate
    cache (the single largest HBM term of the decode loop, DESIGN.md §11).
    """
    N, K, V = batch_size, beam_size, vocab_size
    F = max(K, topk)

    if gather_carry is None:
        def gather_carry(carry, idx):
            return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), carry)

    init = BeamState(
        t=jnp.asarray(1, jnp.int32),
        tokens=jnp.zeros((N, K, max_len), jnp.int32)
                  .at[:, :, 0].set(bos_id),
        # only beam row 0 is live at the first expansion (reference
        # Beam.advance uses word_prob[0] when prev_ks is empty)
        scores=jnp.where(jnp.arange(K)[None, :] == 0, 0.0, DEAD)
                  .astype(jnp.float32).repeat(N, axis=0).reshape(N, K),
        last_tokens=jnp.full((N, K), bos_id, jnp.int32),
        fin_scores=jnp.full((N, F), DEAD, jnp.float32),
        fin_lengths=jnp.ones((N, F), jnp.int32),
        fin_tokens=jnp.zeros((N, F, max_len), jnp.int32),
        fin_count=jnp.zeros((N,), jnp.int32),
        carry=init_carry,
    )

    def cond(state: BeamState):
        return (state.t < max_len) & jnp.any(state.fin_count < F)

    def body(state: BeamState) -> BeamState:
        t = state.t
        out, carry = step_fn(state.last_tokens.reshape(N * K), t - 1,
                             state.carry)
        eos_row = state.last_tokens == eos_id
        if fused_head is not None:
            from care_tpu.ops.fused_head_topk import fused_head_beam_topk
            W, bias, chunk = fused_head[:3]
            backend = fused_head[3] if len(fused_head) > 3 else "auto"
            best_scores, best_ids = fused_head_beam_topk(
                out, W, bias, state.scores, eos_row, K, chunk_size=chunk,
                backend=backend)
        else:
            # clamp -inf masks to the finite DEAD score: the assume_finite
            # top-k below would silently return duplicate indices otherwise
            logp = jnp.maximum(out.reshape(N, K, V), DEAD)
            # kill rows that already emitted EOS
            beam_lk = state.scores[:, :, None] + logp
            beam_lk = jnp.where(eos_row[:, :, None], DEAD, beam_lk)

            flat = beam_lk.reshape(N, K * V)
            # exact two-stage top-k: lax.top_k over 55k-wide axes is a
            # compile-time and runtime hazard on TPU (see ops/topk.py).
            # assume_finite holds: scores are finite (DEAD = -1e20, not
            # -inf) and log_softmax/log(probs+eps) of finite inputs never
            # yields -inf
            best_scores, best_ids = hierarchical_top_k(
                flat, K, assume_finite=True)                  # [N, K]
        prev_k = best_ids // V
        new_tok = best_ids - prev_k * V

        # reorder token history + append the new token at position t
        tokens = jnp.take_along_axis(state.tokens, prev_k[:, :, None], axis=1)
        tokens = tokens.at[:, :, t].set(new_tok)

        # reorder the model carry: flat row index = n*K + prev_k
        row_idx = (jnp.arange(N)[:, None] * K + prev_k).reshape(N * K)
        carry = gather_carry(carry, row_idx)

        # ---- finished bookkeeping -------------------------------------
        is_eos = new_tok == eos_id                           # [N, K]
        offs = jnp.cumsum(is_eos, axis=1) - is_eos.astype(jnp.int32)
        slot = state.fin_count[:, None] + offs               # tentative slots
        admit = is_eos & (slot < F)
        slot_c = jnp.clip(slot, 0, F - 1)

        fin_scores, fin_lengths, fin_tokens = (
            state.fin_scores, state.fin_lengths, state.fin_tokens)
        rows = jnp.arange(N)
        for k in range(K):
            a = admit[:, k]
            s = slot_c[:, k]
            fin_scores = fin_scores.at[rows, s].set(
                jnp.where(a, best_scores[:, k], fin_scores[rows, s]))
            fin_lengths = fin_lengths.at[rows, s].set(
                jnp.where(a, t, fin_lengths[rows, s]))
            # generated tokens: positions 1..t of the history (BOS excluded)
            gen = jnp.concatenate(
                [tokens[:, k, 1:], jnp.zeros((N, 1), jnp.int32)], axis=1)
            fin_tokens = fin_tokens.at[rows, s].set(
                jnp.where(a[:, None], gen, fin_tokens[rows, s]))

        fin_count = jnp.minimum(
            state.fin_count + jnp.sum(admit, axis=1), F)

        return BeamState(
            t=t + 1, tokens=tokens, scores=best_scores, last_tokens=new_tok,
            fin_scores=fin_scores, fin_lengths=fin_lengths,
            fin_tokens=fin_tokens, fin_count=fin_count, carry=carry)

    state = jax.lax.while_loop(cond, body, init)

    # forced finish for instances that never emitted EOS (reference
    # Beam.advance, the `len(next_ys) == max_len` branch): append all rows
    never = state.fin_count == 0                              # [N]
    gen_all = jnp.concatenate(
        [state.tokens[:, :, 1:], jnp.zeros((N, K, 1), jnp.int32)], axis=2)
    forced_len = jnp.full((N, K), max_len - 1, jnp.int32)
    fin_scores = jnp.where(never[:, None],
                           jnp.pad(state.scores, ((0, 0), (0, F - K)),
                                   constant_values=DEAD),
                           state.fin_scores)
    fin_lengths = jnp.where(never[:, None],
                            jnp.pad(forced_len, ((0, 0), (0, F - K)),
                                    constant_values=1),
                            state.fin_lengths)
    fin_tokens = jnp.where(never[:, None, None],
                           jnp.pad(gen_all, ((0, 0), (0, F - K), (0, 0))),
                           state.fin_tokens)

    # length-normalised ranking: score / timestep**alpha
    norm = fin_scores / (fin_lengths.astype(jnp.float32) ** beam_alpha)
    order = jnp.argsort(-norm, axis=1)[:, :topk]              # [N, topk]
    hyp_scores = jnp.take_along_axis(norm, order, axis=1)
    hyp_lengths = jnp.take_along_axis(fin_lengths, order, axis=1)
    hyp_tokens = jnp.take_along_axis(fin_tokens, order[:, :, None], axis=1)
    # unfilled finished slots (instance ran out of EOS hypotheses at
    # max_len) are invalid — the reference returns min(topk, n_finished)
    hyp_valid = jnp.take_along_axis(fin_scores, order, axis=1) > DEAD / 2

    # zero out positions past each hypothesis length (tokens up to and
    # including EOS are kept)
    pos = jnp.arange(max_len)[None, None, :]
    hyp_tokens = jnp.where(pos < hyp_lengths[:, :, None], hyp_tokens, 0)
    return hyp_tokens, hyp_scores, hyp_lengths, hyp_valid
