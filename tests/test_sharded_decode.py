"""Multi-device decoding: the beam-search program runs with batch-sharded
inputs on a data mesh and reproduces single-device outputs (multi-chip
serving path)."""

import numpy as np
import pytest
import jax

from care_tpu.parallel import make_mesh, shard_batch, shard_params, DATA_AXIS
from care_tpu.decoding import get_translator

from helpers import tiny_opt, tiny_model_and_batch


def test_beam_search_on_data_mesh():
    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs virtual CPU devices")
    mesh = make_mesh({DATA_AXIS: 4}, devices=devices[:4])

    opt = tiny_opt(vocab_size=40, beam_size=3)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=8, seed=3)

    tr = get_translator(opt)
    single, sscores = tr.translate_batch([(model, variables)],
                                         {"feats": batch["feats"]})

    vs = shard_params(variables, mesh)
    feats = shard_batch({"feats": batch["feats"]}, mesh)["feats"]
    tr2 = get_translator(opt)
    with mesh:
        sharded, shscores = tr2.translate_batch([(model, vs)],
                                                {"feats": feats})
    assert sharded == single
    for a, b in zip(sscores, shscores):
        np.testing.assert_allclose(a, b, atol=1e-4)
