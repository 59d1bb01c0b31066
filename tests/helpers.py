"""Shared test utilities: tiny configs, models, and a python-reference beam.

The python beam re-implements the *semantics* of the reference's
``misc/Decoding/Beam.py`` bookkeeping (scores, EOS kill rows, finished list
with capacity, forced finish, score/len^alpha ranking) directly from its
documented behaviour, to lock our fixed-shape beam against it.
"""

import numpy as np
import jax
import jax.numpy as jnp

from care_tpu import constants
from care_tpu.config import get_opt
from care_tpu.models import build_captioner


def tiny_opt(**overrides):
    base = {
        "dataset": "MSRVTT", "method": "Transformer", "task": "Base",
        "feats": "ViT", "modality": "mi", "vocab_size": 60, "max_len": 10,
        "n_frames": 6, "num_hidden_layers_decoder": 1,
        "beam_size": 5, "topk": 1,
    }
    base.update(overrides)
    opt = get_opt(base, read_vocab=False, resolve_paths=False)
    opt.setdefault("dim_m", 24)
    opt.setdefault("dim_i", 16)
    if "dim_m" in overrides:
        opt["dim_m"] = overrides["dim_m"]
    if "dim_i" in overrides:
        opt["dim_i"] = overrides["dim_i"]
    return opt


def tiny_model_and_batch(opt, batch_size=2, seed=0):
    model = build_captioner(opt)
    rs = np.random.RandomState(seed)
    feats = []
    for char in opt["modality"]:
        if char == "t":
            feats.append(jnp.asarray(
                rs.randint(0, opt["vocab_size"],
                           (batch_size, opt.get("retrieval_topk", 20),
                            opt["max_len"])), jnp.int32))
        else:
            feats.append(jnp.asarray(
                rs.randn(batch_size, opt["n_frames"], opt[f"dim_{char}"]),
                jnp.float32))
    seq = opt["max_len"] - 1
    input_ids = jnp.asarray(
        rs.randint(6, opt["vocab_size"], (batch_size, seq)), jnp.int32)
    batch = {"feats": feats, "input_ids": input_ids}
    if opt.get("with_category"):
        batch["category"] = jnp.asarray(
            rs.randint(0, opt.get("num_category", 20), (batch_size, 1)),
            jnp.int32)
    rng = jax.random.PRNGKey(seed)
    variables = model.init({"params": rng, "dropout": rng, "sampling": rng},
                           batch)
    return model, variables, batch


def python_reference_beam(step_logprobs_fn, batch_size, beam_size, max_len,
                          vocab_size, alpha=1.0, topk=1,
                          bos=constants.BOS, eos=constants.EOS):
    """Per-instance python beam with the reference ``Beam`` semantics.

    ``step_logprobs_fn(tokens [N*K, t])`` -> log-probs [N*K, V] for the next
    token given each row's full prefix.
    """
    N, K = batch_size, beam_size
    F = max(K, topk)

    scores = np.zeros((N, K))
    tokens = np.full((N, K, 1), bos, dtype=np.int64)
    finished = [[] for _ in range(N)]          # (raw_score, timestep, tokens)
    done = [False] * N

    for t in range(1, max_len):
        logp = np.asarray(step_logprobs_fn(tokens.reshape(N * K, -1)))
        logp = logp.reshape(N, K, vocab_size)
        new_tokens = np.zeros((N, K, t + 1), dtype=np.int64)
        for n in range(N):
            if done[n]:
                new_tokens[n, :, :-1] = tokens[n]
                continue
            if t == 1:
                beam_lk = logp[n, 0:1]               # only row 0
            else:
                beam_lk = logp[n] + scores[n][:, None]
                for k in range(K):
                    if tokens[n, k, -1] == eos:
                        beam_lk[k] = -1e20
            flat = beam_lk.reshape(-1)
            best = np.argsort(-flat, kind="stable")[:K]
            best_scores = flat[best]
            prev_k = best // vocab_size if t > 1 else np.zeros(K, np.int64)
            tok = best % vocab_size
            for k in range(K):
                new_tokens[n, k, :-1] = tokens[n, prev_k[k]]
                new_tokens[n, k, -1] = tok[k]
            scores[n] = best_scores
            for k in range(K):
                if tok[k] == eos and len(finished[n]) < F:
                    finished[n].append((best_scores[k], t,
                                        new_tokens[n, k, 1:].tolist()))
                    if len(finished[n]) >= F:
                        done[n] = True
                        break
        tokens = new_tokens
        if all(done):
            break

    hyps, hscores = [], []
    for n in range(N):
        if not finished[n]:
            for k in range(K):
                finished[n].append((scores[n][k], max_len - 1,
                                    tokens[n, k, 1:].tolist()))
        ranked = sorted(finished[n],
                        key=lambda it: -(it[0] / it[1] ** alpha))[:topk]
        hyps.append([it[2][:it[1]] for it in ranked])
        hscores.append([it[0] / it[1] ** alpha for it in ranked])
    return hyps, hscores


def cpu_subprocess_env(extra=None):
    """Environment for CLI subprocesses that must NEVER touch the TPU
    tunnel: unsetting PALLAS_AXON_POOL_IPS stops the axon sitecustomize
    from registering the PJRT plugin (each registration opens its OWN
    tunnel session and can block for minutes behind the parent's lease —
    the source of intermittent multi-minute CLI-test hangs), and
    JAX_PLATFORMS=cpu covers ordinary platforms."""
    import os
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    if extra:
        env.update(extra)
    return env
