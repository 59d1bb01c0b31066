"""Tune + A/B the fused head+top-k kernel on the real TPU.

Chained timing (CLAUDE.md: sub-ms kernels MUST be timed as N dependent
applications inside one program, minus the ~26 ms dispatch floor —
one-shot timings measure the floor).  Sweeps backend x chunk_size x
block_rows on the flagship serving shapes and writes
``.bench_fused_head_tune.json``; run once per chip generation and set
``fused_head_chunk`` / ``fused_head_backend`` from the winner if it
differs from the defaults.

Run:  nohup python scripts/tune_fused_head.py > /tmp/tune_fused.log 2>&1 &
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".bench_fused_head_tune.json")

N_CHAIN = 20


def time_chained(fn, args, floor_s):
    """One program applying fn N_CHAIN times with a data dependency."""
    def prog(h, *rest):
        def body(carry, _):
            v, i = fn(carry, *rest)
            # fold the result back into h so applications are dependent
            bump = (v.sum() * 0.0 + i.sum().astype(jnp.float32) * 0.0)
            return carry + bump.astype(carry.dtype), None
        out, _ = jax.lax.scan(body, h, None, length=N_CHAIN)
        return out
    jitted = jax.jit(prog)
    np.asarray(jitted(*args))[:1]           # compile + warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        np.asarray(jitted(*args))[:1]
    total = (time.perf_counter() - t0) / reps
    return max(total - floor_s, 1e-9) / N_CHAIN


def main():
    from care_tpu.ops.fused_head_topk import fused_head_beam_topk, DEAD
    from care_tpu.ops.topk import hierarchical_top_k

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    trivial = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    np.asarray(trivial(z))
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(trivial(z))
    floor_s = (time.perf_counter() - t0) / 10
    print(f"dispatch floor: {floor_s*1e3:.1f} ms", flush=True)

    H, V, K = 512, 11000, 5
    rng = np.random.RandomState(0)
    W32 = (rng.randn(H, V) * 0.05).astype(np.float32)
    results = []
    for rows, dt in ((320, jnp.float32), (2560, jnp.bfloat16)):
        N = rows // K
        h = jax.device_put(jnp.asarray(rng.randn(rows, H), dt))
        W = jax.device_put(jnp.asarray(W32, dt))
        scores = jax.device_put(jnp.asarray(rng.randn(N, K), jnp.float32))
        eos = jax.device_put(jnp.zeros((N, K), bool))

        def unfused(hh, WW):
            logp = jax.nn.log_softmax((hh @ WW).astype(jnp.float32), -1)
            lk = scores[:, :, None] + jnp.maximum(logp.reshape(N, K, V),
                                                  DEAD)
            lk = jnp.where(eos[:, :, None], DEAD, lk)
            return hierarchical_top_k(lk.reshape(N, K * V), K,
                                      assume_finite=True)

        t_un = time_chained(lambda hh, WW: unfused(hh, WW), (h, W), floor_s)
        results.append({"rows": rows, "dtype": str(dt.__name__),
                        "config": "unfused", "ms": round(t_un * 1e3, 3)})
        print(results[-1], flush=True)

        for backend, chunk, bm in itertools.product(
                ("xla", "pallas"), (1024, 2048, 4096), (128, 256)):
            if backend == "xla" and bm != 128:
                continue                     # block_rows is pallas-only
            try:
                t = time_chained(
                    lambda hh, WW, _b=backend, _c=chunk, _m=bm:
                        fused_head_beam_topk(hh, WW, None, scores, eos, K,
                                             chunk_size=_c, backend=_b,
                                             block_rows=_m),
                    (h, W), floor_s)
                row = {"rows": rows, "dtype": str(dt.__name__),
                       "config": f"{backend}/chunk{chunk}/bm{bm}",
                       "ms": round(t * 1e3, 3),
                       "speedup_vs_unfused": round(t_un / t, 2)}
            except Exception as e:
                row = {"rows": rows, "dtype": str(dt.__name__),
                       "config": f"{backend}/chunk{chunk}/bm{bm}",
                       "error": f"{type(e).__name__}: {e}"}
            results.append(row)
            print(row, flush=True)

    # ---- fused-xent (training CE) fwd+bwd at the flagship train shape --
    from care_tpu.ops.fused_xent import vocab_xent_stats
    B, L = 64, 29
    h_t = jax.device_put(jnp.asarray(rng.randn(B, L, H), jnp.float32))
    W_t = jax.device_put(jnp.asarray(W32, jnp.float32))
    labels = jax.device_put(jnp.asarray(
        rng.randint(0, V, (B, L)), jnp.int32))

    def dense_ce(hh, WW):
        logits = (hh @ WW).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        return jnp.sum(0.9 * nll + 0.1 * (-logp.mean(-1)))

    def fused_ce(hh, WW, backend, chunk):
        lse, lab, tot, _ = vocab_xent_stats(hh, WW, None, labels, chunk,
                                            backend)
        return jnp.sum(0.9 * (lse - lab) + 0.1 * (lse - tot / V))

    for name, fn in (
            ("xent_dense_grad", lambda hh, WW: jax.grad(dense_ce)(hh, WW)),
            ("xent_xla_grad",
             lambda hh, WW: jax.grad(
                 lambda a: fused_ce(a, WW, "xla", 1024))(hh)),
            ("xent_pallas_grad",
             lambda hh, WW: jax.grad(
                 lambda a: fused_ce(a, WW, "pallas", 1024))(hh))):
        try:
            t = time_chained(
                lambda hh, WW, _f=fn: (lambda g: (g.sum()[None],
                                                  g.sum()[None].astype(
                                                      jnp.int32)))(
                    _f(hh, WW)),
                (h_t, W_t), floor_s)
            row = {"config": name, "ms": round(t * 1e3, 3)}
        except Exception as e:
            row = {"config": name, "error": f"{type(e).__name__}: {e}"}
        results.append(row)
        print(row, flush=True)

    out = {"device": str(dev), "floor_ms": round(floor_s * 1e3, 2),
           "n_chain": N_CHAIN, "results": results,
           "measured_at": time.strftime("%Y-%m-%d %H:%M:%S")}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("->", OUT, flush=True)


if __name__ == "__main__":
    main()
