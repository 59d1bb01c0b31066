"""Exact hierarchical top-k.

``jax.lax.top_k`` over a very wide axis (beam*vocab ~ 55k) lowers to a huge
sorting network on TPU — pathological compile time and slow per-step cost in
the beam-search while_loop. The standard fix: top-k per fixed-width chunk,
then top-k over the (C*k) candidates. Exact, because every global top-k
element is necessarily in its own chunk's top-k; tie-breaking stays
lowest-index-first like ``lax.top_k`` (candidates keep global index order).
"""

import jax
import jax.numpy as jnp

NEG = -jnp.inf


def hierarchical_top_k(x, k: int, chunk_size: int = 1024):
    """x: [..., V] -> (values [..., k], indices [..., k]); exact."""
    *lead, V = x.shape
    if V <= max(chunk_size, 4 * k):
        return jax.lax.top_k(x, k)

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
