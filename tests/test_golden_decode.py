"""Golden decode regression: fixed-seed model + inputs -> frozen outputs.

Guards against silent behavioral drift across rounds (mask changes, layer
re-wiring, beam bookkeeping edits). Regenerate deliberately with:
    python -m pytest tests/test_golden_decode.py --regen-golden
after verifying the change is intended (reference-parity tests must pass).
"""

import json
import os

import numpy as np
import pytest

from care_tpu.decoding import get_translator
from helpers import tiny_opt, tiny_model_and_batch

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "decode_golden.json")


def _produce():
    opt = tiny_opt(beam_size=3, topk=2, vocab_size=50,
                   num_hidden_layers_decoder=2)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=3,
                                                   seed=123)
    tr = get_translator(opt)
    hyps, scores = tr.translate_batch([(model, variables)], batch)
    return {"hyps": hyps,
            "scores": [[round(s, 4) for s in row] for row in scores]}


def test_golden_decode(request):
    regen = request.config.getoption("--regen-golden", default=False)
    got = _produce()
    if regen or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1)
        if not regen:
            pytest.skip("golden file created; rerun to compare")
        return
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    assert got["hyps"] == want["hyps"]
    for grow, wrow in zip(got["scores"], want["scores"]):
        for g, w in zip(grow, wrow):
            assert g == pytest.approx(w, abs=2e-3)
