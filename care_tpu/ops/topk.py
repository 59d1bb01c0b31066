"""Exact top-k over wide axes, tuned for the TPU beam-search hot loop.

``jax.lax.top_k`` over a very wide axis (beam*vocab ~ 55k) lowers to a huge
sorting network on TPU — pathological compile time and slow per-step cost in
the beam-search while_loop. Two exact alternatives:

* **iterative argmax** (small k): k sequential (argmax, mask) passes — pure
  vector-unit reductions, ~k*2 streaming passes over the row instead of a
  sort. Measured in the real fused decode program on v5e: 60.5 ms/batch vs
  101.7 ms with the chunked path at k=5, V=55k — a 40% end-to-end decode
  cut with bit-identical outputs. First-occurrence argmax reproduces
  ``lax.top_k``'s lowest-index-first tie order.
* **chunked two-stage** (larger k): top-k per fixed-width chunk, then top-k
  over the (C*k) candidates. Exact, because every global top-k element is
  necessarily in its own chunk's top-k; candidates keep global index order.
"""

import jax
import jax.numpy as jnp

NEG = -jnp.inf

# iterative argmax wins while k*(passes) beats the chunked sort; measured
# crossover is well above the beam sizes this framework uses
_ITERATIVE_MAX_K = 8


def _iterative_top_k(x, k: int, assume_finite: bool = False):
    """k sequential max-reduction passes; exact lax.top_k semantics —
    lowest-index-first ties AND distinct indices even when a row has fewer
    than k entries above -inf (an explicit ``used`` mask disambiguates
    already-picked -inf entries from never-picked ones, where a plain
    argmax-and-mask loop would return duplicate index 0).

    ``assume_finite=True`` drops the used-mask bookkeeping (2 fewer
    streaming passes per pick, ~6% of the whole fused decode call): valid
    only when every input is > -inf, so a picked entry masked to -inf can
    never tie an original value. The beam-search caller guarantees this
    (dead rows are masked with a finite -1e20)."""
    V = x.shape[-1]
    ar = jnp.arange(V)
    vals, idxs = [], []
    if assume_finite:
        cur = x
        for _ in range(k):
            i = jnp.argmax(cur, axis=-1)
            vals.append(jnp.take_along_axis(cur, i[..., None], axis=-1))
            idxs.append(i[..., None])
            cur = jnp.where(ar == i[..., None], NEG, cur)
    else:
        used = jnp.zeros(x.shape, dtype=bool)
        for _ in range(k):
            cur = jnp.where(used, NEG, x)
            m = jnp.max(cur, axis=-1, keepdims=True)
            cand = (cur == m) & ~used
            i = jnp.argmin(jnp.where(cand, ar, V), axis=-1)
            vals.append(jnp.take_along_axis(cur, i[..., None], axis=-1))
            idxs.append(i[..., None])
            used = used | (ar == i[..., None])
    return (jnp.concatenate(vals, axis=-1),
            jnp.concatenate(idxs, axis=-1))


def _chunked_iterative_top_k(x, k: int, chunk_size: int = 512):
    """Single-wide-pass exact top-k (requires finite inputs).

    The plain iterative argmax streams the full [*, V] row ~2 passes per
    pick (argmax + mask): at V=55k, k=5 that is the beam loop's dominant
    HBM term after the logits write.  This variant reads the wide array
    ONCE to build a per-chunk (max, argmax) cache [*, C], then each pick
    works on small arrays only: argmax over the C chunk maxima, gather of
    the winning chunk's ``chunk_size`` entries, re-max of that chunk with
    all previous picks that landed in it masked (<= k tiny masks).

    Exact ``lax.top_k`` semantics: first-occurrence argmax everywhere
    means ties resolve lowest-global-index-first (chunk maxima keep their
    chunk's lowest tied index; the cross-chunk argmax picks the lowest
    chunk), and picked entries are masked so indices stay distinct.
    Finite inputs only: a picked entry is masked to -inf inside its
    chunk, which must never tie an original value."""
    *lead, V = x.shape
    C = -(-V // chunk_size)
    pad = C * chunk_size - V
    if pad:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)],
                    constant_values=-jnp.finfo(x.dtype).max)
    xc = x.reshape(*lead, C, chunk_size)
    cmax = jnp.max(xc, axis=-1)                     # [*, C]
    carg = jnp.argmax(xc, axis=-1)                  # [*, C]
    ar_c = jnp.arange(chunk_size)
    ar_C = jnp.arange(C)
    vals, idxs, picks = [], [], []
    for _ in range(k):
        c = jnp.argmax(cmax, axis=-1)[..., None]    # [*, 1]
        v = jnp.take_along_axis(cmax, c, axis=-1)   # [*, 1]
        w = jnp.take_along_axis(carg, c, axis=-1)   # [*, 1]
        vals.append(v)
        idxs.append(c * chunk_size + w)
        picks.append((c, w))
        # next-best of the winning chunk: re-scan its chunk_size entries
        # with every pick that fell in this chunk masked out
        row = jnp.take_along_axis(xc, c[..., None], axis=-2)  # [*, 1, ch]
        row = jnp.squeeze(row, axis=-2)                       # [*, ch]
        for pc, pw in picks:
            row = jnp.where((pc == c) & (ar_c == pw), NEG, row)
        cmax = jnp.where(ar_C == c, jnp.max(row, axis=-1, keepdims=True),
                         cmax)
        carg = jnp.where(ar_C == c, jnp.argmax(row, axis=-1, keepdims=True),
                         carg)
    return (jnp.concatenate(vals, axis=-1),
            jnp.concatenate(idxs, axis=-1))


def hierarchical_top_k(x, k: int, chunk_size: int = 1024,
                       assume_finite: bool = False):
    """x: [..., V] -> (values [..., k], indices [..., k]); exact.
    ``assume_finite``: caller guarantees x > -inf everywhere (see
    ``_iterative_top_k``)."""
    *lead, V = x.shape
    if V <= max(chunk_size, 4 * k):
        return jax.lax.top_k(x, k)
    if k <= _ITERATIVE_MAX_K:
        if assume_finite:
            return _chunked_iterative_top_k(x, k)
        return _iterative_top_k(x, k, assume_finite=assume_finite)

    C = -(-V // chunk_size)
    pad = C * chunk_size - V
    if pad:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)],
                    constant_values=-jnp.finfo(x.dtype).max)
    xc = x.reshape(*lead, C, chunk_size)
    v, i = jax.lax.top_k(xc, k)                      # [..., C, k]
    base = (jnp.arange(C) * chunk_size)[:, None]     # [C, 1]
    gi = (i + base).reshape(*lead, C * k)
    v = v.reshape(*lead, C * k)
    v2, sel = jax.lax.top_k(v, k)
    idx = jnp.take_along_axis(gi, sel, axis=-1)
    return v2, idx
