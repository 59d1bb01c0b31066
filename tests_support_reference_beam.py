"""Reference-execution-model decoder used as the benchmark baseline.

Reproduces the algorithmic strategy of the reference beam search
(``models/Translator.py:91-133`` + ``misc/Decoding/Beam.py``): at every step
the FULL decoder re-runs over the whole prefix and only the last position's
logits are used; beams are per-instance python objects advanced on host.
Run on the same chip as the optimised path, this isolates the speedup of
the KV-cache/while_loop execution model from hardware differences.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from care_tpu import constants
from care_tpu.models.framework import Captioner
from care_tpu.decoding.translator import auto_enlarge


def reference_style_decode(model, variables, feats, opt, beam_size=5,
                           n_warm=1, n_iter=2):
    """Returns seconds per batch for the reference execution model."""
    max_len = opt["max_len"]
    vocab = opt["vocab_size"]

    @jax.jit
    def encode(variables, feats):
        enc = model.apply(variables, feats, method=Captioner.encoding_phase)
        inputs = model.apply(variables, enc, {},
                             method=Captioner.prepare_inputs_for_decoder)
        return auto_enlarge(inputs, beam_size)

    from functools import partial

    @partial(jax.jit, static_argnames=("pos",))
    def step_logits(variables, input_ids, inputs, pos):
        out = model.apply(variables, input_ids, inputs,
                          method=Captioner.decoding_phase,
                          collect_aux=False)
        return jax.nn.log_softmax(out["logits"][:, pos, :], axis=-1)

    N = feats[0].shape[0]
    K = beam_size

    def bucket(t):
        b = 8
        while b < t:
            b *= 2
        return min(b, max_len)

    def run_once():
        inputs = jax.tree.map(lambda x: x, encode(variables, feats))
        # python Beam objects, like the reference
        scores = np.zeros((N, K))
        tokens = np.full((N, K, 1), constants.BOS, dtype=np.int64)
        done = np.zeros(N, dtype=bool)
        for t in range(1, max_len):
            # pad the prefix to a length bucket so the jitted full-forward
            # recompute (the reference's execution model) compiles O(log L)
            # times instead of once per step; PAD keys are masked out so
            # the position t-1 logits are identical to the unpadded run
            b = bucket(t)
            flat = np.full((N * K, b), constants.PAD, dtype=np.int64)
            flat[:, :t] = tokens.reshape(N * K, t)
            logp = np.asarray(step_logits(variables, jnp.asarray(flat),
                                          inputs, t - 1))
            logp = logp.reshape(N, K, vocab)
            new_tokens = np.zeros((N, K, t + 1), dtype=np.int64)
            for n in range(N):          # host-side per-instance loop
                if done[n]:
                    new_tokens[n, :, :-1] = tokens[n]
                    continue
                if t == 1:
                    beam_lk = logp[n, 0:1]
                else:
                    beam_lk = logp[n] + scores[n][:, None]
                    for k in range(K):
                        if tokens[n, k, -1] == constants.EOS:
                            beam_lk[k] = -1e20
                flatk = beam_lk.reshape(-1)
                best = np.argpartition(-flatk, K)[:K]
                best = best[np.argsort(-flatk[best])]
                prev_k = (best // vocab if t > 1
                          else np.zeros(K, np.int64))
                tok = best % vocab
                for k in range(K):
                    new_tokens[n, k, :-1] = tokens[n, prev_k[k]]
                    new_tokens[n, k, -1] = tok[k]
                scores[n] = flatk[best]
                if np.all(new_tokens[n, :, -1] == constants.EOS):
                    done[n] = True
            tokens = new_tokens
            if done.all():
                break
        return tokens

    for _ in range(n_warm):
        run_once()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        run_once()
    return (time.perf_counter() - t0) / n_iter
