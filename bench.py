"""Benchmark: captions/sec at beam=5 on the flagship CARE model, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against the *reference execution model* measured on
the SAME chip: the reference's ``Translator_ARFormer`` recomputes the full
prefix every beam step with per-instance python ``Beam`` objects
(``models/Translator.py:91-133``, no KV cache); we time that exact strategy
(full-forward-per-step + host-side beam bookkeeping) against our fused
fixed-shape KV-cache beam. This is the honest apples-to-apples ratio of the
two execution models; the reference publishes no absolute numbers
(BASELINE.md).

The baseline measurement is expensive to compile (the TPU tunnel makes
every XLA compile minutes-slow), so its result is cached in
``.bench_baseline.json`` after the first successful run; delete that file
(or set BENCH_REMEASURE_BASELINE=1) to re-measure.
"""

import json
import os
import time

# persistent compilation cache (helps when compiles run locally)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

_BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_baseline.json")


def main():
    from __graft_entry__ import _flagship_opt, _synthetic_batch
    from care_tpu.models import build_captioner
    from care_tpu.decoding import get_translator

    BATCH = 64
    BEAM = 5
    N_WARM = 2
    N_ITER = 5

    opt = _flagship_opt()
    opt["beam_size"] = BEAM
    model = build_captioner(opt)
    batch = _synthetic_batch(opt, batch_size=BATCH)
    rng = jax.random.PRNGKey(0)
    # init with batch size 1: params are batch-independent and the B=1
    # init program compiles far faster than B=64
    small = {"feats": [f[:1] for f in batch["feats"]],
             "input_ids": batch["input_ids"][:1]}
    variables = model.init({"params": rng, "dropout": rng}, small,
                           deterministic=True)

    translator = get_translator(opt)

    def run_ours():
        hyps, scores = translator.translate_batch([(model, variables)],
                                                  {"feats": batch["feats"]})
        return hyps

    for _ in range(N_WARM):
        run_ours()
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        run_ours()
    ours_time = (time.perf_counter() - t0) / N_ITER
    ours_cps = BATCH / ours_time

    # ---- reference execution model on the same chip -------------------
    device_name = str(jax.devices()[0])
    ref_cps = None
    baseline_source = "measured"
    if (os.path.exists(_BASELINE_CACHE)
            and not os.environ.get("BENCH_REMEASURE_BASELINE")):
        try:
            with open(_BASELINE_CACHE) as f:
                cached = json.load(f)
            if cached.get("device") == device_name:
                ref_cps = cached["caps_per_s"]
                baseline_source = "cached"
        except Exception:
            ref_cps = None

    if ref_cps is None:
        from tests_support_reference_beam import reference_style_decode
        ref_batch = 8
        small_feats = [f[:ref_batch] for f in batch["feats"]]
        t_ref = reference_style_decode(model, variables, small_feats, opt,
                                       beam_size=BEAM, n_warm=1, n_iter=2)
        ref_cps = ref_batch / t_ref
        try:
            with open(_BASELINE_CACHE, "w") as f:
                json.dump({"caps_per_s": ref_cps, "device": device_name,
                           "batch": ref_batch, "beam": BEAM}, f)
        except Exception:
            pass

    result = {
        "metric": "captions_per_sec_beam5",
        "value": round(ours_cps, 2),
        "unit": "captions/s/chip",
        "vs_baseline": round(ours_cps / ref_cps, 2),
        "detail": {
            "batch": BATCH, "beam": BEAM,
            "ours_s_per_batch": round(ours_time, 4),
            "reference_execution_model_caps_per_s": round(ref_cps, 2),
            "baseline_source": baseline_source,
            "device": device_name,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
