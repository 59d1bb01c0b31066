"""Non-autoregressive decoding algorithms: MaskPredict / Left2Right / EasyFirst.

Parity target: reference ``misc/Decoding/na_algorithms.py``. Every iteration
is a full-width decoder forward (already TPU-shaped); the per-row
``select_worst`` top-k loop is vectorised via a double argsort (rank) and
per-row thresholds.

All functions are pure and fixed-shape: canvases are [N*lbs, max_len]; PAD
positions carry probability 1.0 so they are never re-masked.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from care_tpu import constants


def generate_step_with_prob(logits, zero_ids=()):
    """argmax + its probability (reference ``na_algorithms.py:6-14``)."""
    probs = jax.nn.softmax(logits, axis=-1)
    for wid in zero_ids:
        probs = probs.at[..., wid].set(0.0)
    idx = jnp.argmax(probs, axis=-1)
    max_probs = jnp.max(probs, axis=-1)
    return idx.astype(jnp.int32), max_probs, probs


def select_worst(token_probs, num_mask):
    """Mask the ``num_mask[i]`` least-confident positions per row
    (vectorised reference ``na_algorithms.py:128-137``)."""
    rank = jnp.argsort(jnp.argsort(token_probs, axis=1), axis=1)
    return rank < jnp.maximum(num_mask, 1)[:, None]


def _apply_pad_semantics(tgt_tokens, token_probs, pad_mask, eos_mask):
    tgt_tokens = jnp.where(pad_mask, constants.PAD, tgt_tokens)
    token_probs = jnp.where(pad_mask, 1.0, token_probs)
    token_probs = jnp.where(eos_mask, 1.0, token_probs)
    tgt_tokens = jnp.where(eos_mask, constants.EOS, tgt_tokens)
    return tgt_tokens, token_probs


def make_generate_fn(forward_logits: Callable, pad_mask, eos_mask):
    """Wrap a full decoder forward into the reference's
    ``generate_non_autoregressive`` semantics."""
    def generate(tgt_tokens):
        logits = forward_logits(tgt_tokens)
        toks, probs, _ = generate_step_with_prob(logits)
        return _apply_pad_semantics(toks, probs, pad_mask, eos_mask)
    return generate


def make_generate_fn_from_stats(forward_stats: Callable, pad_mask,
                                eos_mask):
    """Like :func:`make_generate_fn` but from a fused statistics forward
    ``tokens -> (argmax_ids, max_probs)`` (ops/fused_head_topk.py
    ``vocab_argmax_lse``): the ``[N, L, V]`` logits/probs never
    materialise."""
    def generate(tgt_tokens):
        toks, probs = forward_stats(tgt_tokens)
        return _apply_pad_semantics(toks.astype(jnp.int32), probs,
                                    pad_mask, eos_mask)
    return generate


def mask_predict(
    tgt_tokens,                    # [N, L] canvas of MASK/PAD
    forward_logits: Callable,      # tokens -> logits [N, L, V]
    iterations: int = 5,
    use_ct: bool = False,
    teacher_score: Optional[Callable] = None,  # (tokens, is_last) -> probs
    forward_stats: Optional[Callable] = None,  # tokens -> (ids, max_probs)
):
    """MaskPredict (reference ``na_algorithms.py:146-197``); optional
    coarse-grained-template first pass replacing MASK with <vis>."""
    pad_mask = tgt_tokens == constants.PAD
    eos_mask = tgt_tokens == constants.EOS
    seq_lens = tgt_tokens.shape[1] - pad_mask.sum(axis=1)
    generate = (make_generate_fn_from_stats(forward_stats, pad_mask,
                                            eos_mask)
                if forward_stats is not None
                else make_generate_fn(forward_logits, pad_mask, eos_mask))

    if teacher_score is None:
        teacher_score = lambda tokens, is_last: jnp.ones_like(
            tokens, dtype=jnp.float32)

    if use_ct:
        vis_canvas = jnp.where(tgt_tokens == constants.MASK,
                               constants.VIS, tgt_tokens)
        tgt_tokens, token_probs = generate(vis_canvas)
        token_probs = jnp.where(tgt_tokens == constants.MASK, 0.0, token_probs)
        ct_mask = tgt_tokens == constants.MASK
    else:
        tgt_tokens, token_probs = generate(tgt_tokens)
        ct_mask = None

    T = iterations + 1 if use_ct else iterations
    for counter in range(1, T):
        corresponding = teacher_score(tgt_tokens, False)
        if use_ct and counter == 1:
            mask_ind = ct_mask
        else:
            ratio = 1.0 - counter / T
            num_mask = (seq_lens.astype(jnp.float32) * ratio).astype(jnp.int32)
            mask_ind = select_worst(token_probs * corresponding, num_mask)
            # never re-mask PAD/EOS positions (their prob is pinned to 1.0,
            # but guard explicitly for tiny lengths)
            mask_ind = mask_ind & ~pad_mask & ~eos_mask

        masked = jnp.where(mask_ind, constants.MASK, tgt_tokens)
        new_tokens, new_probs = generate(masked)
        tgt_tokens = jnp.where(mask_ind, new_tokens, tgt_tokens)
        token_probs = jnp.where(mask_ind, new_probs, token_probs)

    corresponding = teacher_score(tgt_tokens, True)
    lprobs = jnp.log(token_probs * corresponding + 1e-20)
    return tgt_tokens, lprobs


def left2right(tgt_tokens, forward_logits, q: int = 1, q_iterations: int = 1,
               use_ct: bool = False, teacher_score=None,
               forward_stats=None):
    """Left-to-right uncovering (reference ``na_algorithms.py:200-263``)."""
    pad_mask = tgt_tokens == constants.PAD
    eos_mask = tgt_tokens == constants.EOS
    seq_len = tgt_tokens.shape[1]
    seq_lens = seq_len - pad_mask.sum(axis=1)
    generate = (make_generate_fn_from_stats(forward_stats, pad_mask,
                                            eos_mask)
                if forward_stats is not None
                else make_generate_fn(forward_logits, pad_mask, eos_mask))
    if teacher_score is None:
        teacher_score = lambda tokens, is_last: jnp.ones_like(
            tokens, dtype=jnp.float32)

    if use_ct:
        vis_canvas = jnp.where(tgt_tokens == constants.MASK,
                               constants.VIS, tgt_tokens)
        tgt_tokens, token_probs = generate(vis_canvas)
        token_probs = jnp.where(tgt_tokens == constants.MASK, 0.0, token_probs)
        visual_mask = (tgt_tokens != constants.MASK) & ~pad_mask
    else:
        token_probs = jnp.where(pad_mask, 1.0, 0.0)
        visual_mask = None

    # the reference collects the MASK indices ONCE from the initial canvas
    # (na_algorithms.py:219-233) and uncovers them left-to-right in chunks
    # of q; ranks therefore come from the initial mask layout
    is_mask0 = tgt_tokens == constants.MASK
    mask_rank0 = jnp.cumsum(is_mask0, axis=1) - is_mask0.astype(jnp.int32)
    for start in range(0, seq_len, q):
        sel = is_mask0 & (mask_rank0 >= start) & (mask_rank0 < start + q)
        new_tokens, new_probs = generate(tgt_tokens)
        tgt_tokens = jnp.where(sel, new_tokens, tgt_tokens)
        token_probs = jnp.where(sel, new_probs, token_probs)

    for i in range(q_iterations):
        if i == 0 and use_ct:
            mask_ind = visual_mask
        else:
            refine_ratio = 0.4 * (1.0 - i / q_iterations)
            num_mask = (seq_lens.astype(jnp.float32)
                        * refine_ratio).astype(jnp.int32)
            mask_ind = select_worst(token_probs, num_mask) & ~pad_mask
        masked = jnp.where(mask_ind, constants.MASK, tgt_tokens)
        new_tokens, new_probs = generate(masked)
        tgt_tokens = jnp.where(mask_ind, new_tokens, tgt_tokens)
        token_probs = jnp.where(mask_ind, new_probs, token_probs)

    corresponding = teacher_score(tgt_tokens, True)
    lprobs = jnp.log(token_probs * corresponding + 1e-20)
    return tgt_tokens, lprobs


def easy_first(tgt_tokens, forward_logits, q: int = 1, q_iterations: int = 1,
               use_ct: bool = False, teacher_score=None,
               forward_stats=None):
    """Most-confident-first uncovering (reference ``na_algorithms.py:266-329``).

    The reference loops until no MASK remains; the maximum number of rounds
    is ceil(max_len / q), so we run that statically with no-op rounds once a
    row is complete.
    """
    pad_mask = tgt_tokens == constants.PAD
    eos_mask = tgt_tokens == constants.EOS
    seq_len = tgt_tokens.shape[1]
    seq_lens = seq_len - pad_mask.sum(axis=1)
    generate = (make_generate_fn_from_stats(forward_stats, pad_mask,
                                            eos_mask)
                if forward_stats is not None
                else make_generate_fn(forward_logits, pad_mask, eos_mask))
    if teacher_score is None:
        teacher_score = lambda tokens, is_last: jnp.ones_like(
            tokens, dtype=jnp.float32)

    if use_ct:
        vis_canvas = jnp.where(tgt_tokens == constants.MASK,
                               constants.VIS, tgt_tokens)
        tgt_tokens, token_probs = generate(vis_canvas)
        token_probs = jnp.where(tgt_tokens == constants.MASK, 0.0, token_probs)
        visual_mask = (tgt_tokens != constants.MASK) & ~pad_mask
    else:
        token_probs = jnp.where(pad_mask, 1.0, 0.0)
        visual_mask = None

    rounds = -(-seq_len // q)
    for _ in range(rounds):
        mask_ind = tgt_tokens == constants.MASK
        new_tokens, new_probs = generate(tgt_tokens)
        cand = jnp.where(mask_ind, new_probs, -1.0)
        rank = jnp.argsort(jnp.argsort(-cand, axis=1), axis=1)
        take = mask_ind & (rank < q)
        tgt_tokens = jnp.where(take, new_tokens, tgt_tokens)
        token_probs = jnp.where(take, new_probs, token_probs)

    for i in range(q_iterations):
        if i == 0 and use_ct:
            mask_ind = visual_mask
        else:
            refine_ratio = 0.4 * (1.0 - i / q_iterations)
            num_mask = (seq_lens.astype(jnp.float32)
                        * refine_ratio).astype(jnp.int32)
            mask_ind = select_worst(token_probs, num_mask) & ~pad_mask
        masked = jnp.where(mask_ind, constants.MASK, tgt_tokens)
        new_tokens, new_probs = generate(masked)
        tgt_tokens = jnp.where(mask_ind, new_tokens, tgt_tokens)
        token_probs = jnp.where(mask_ind, new_probs, token_probs)

    corresponding = teacher_score(tgt_tokens, True)
    lprobs = jnp.log(token_probs * corresponding + 1e-20)
    return tgt_tokens, lprobs


ALGORITHMS = {"mp": mask_predict, "l2r": left2right, "ef": easy_first}
