"""Multi-device decoding: the beam-search program runs with batch-sharded
inputs on a data mesh — and with Megatron model-axis-sharded params on a
``(data, model)`` mesh — and reproduces single-device outputs (multi-chip
serving path)."""

import numpy as np
import pytest
import jax

from care_tpu.parallel import (make_mesh, shard_batch, shard_params,
                               DATA_AXIS, MODEL_AXIS)
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


def test_beam_search_with_tensor_parallel_params():
    """Beam search on a ``(data, model)`` mesh with Megatron-sharded params
    (attention/FFN/vocab kernels split over the model axis): tokens must
    equal the single-device decode, scores to float tolerance (the
    row-parallel all-reduce changes f32 summation order)."""
    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs virtual CPU devices")
    mesh = make_mesh({DATA_AXIS: 2, MODEL_AXIS: 2}, devices=devices[:4])

    # head/FFN dims divisible by model=2 so the TP rules actually apply
    opt = tiny_opt(vocab_size=40, beam_size=3, topk=2, dim_hidden=32,
                   num_attention_heads=4, intermediate_size=64)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=4, seed=7)

    tr = get_translator(opt)
    single, sscores = tr.translate_batch([(model, variables)],
                                         {"feats": batch["feats"]})

    vs = shard_params(variables, mesh)
    # the TP rules must have sharded at least the decoder QKV/FFN kernels
    from flax import traverse_util
    flat = traverse_util.flatten_dict(vs, sep="/")
    tp_leaves = [k for k, v in flat.items()
                 if MODEL_AXIS in jax.tree.leaves(
                     tuple(getattr(v.sharding, "spec", ())))]
    assert tp_leaves, "no parameter was model-axis sharded"

    feats = shard_batch({"feats": batch["feats"]}, mesh)["feats"]
    tr2 = get_translator(opt)
    with mesh:
        sharded, shscores = tr2.translate_batch([(model, vs)],
                                                {"feats": feats})
    assert sharded == single
    for a, b in zip(sscores, shscores):
        np.testing.assert_allclose(a, b, atol=1e-4)
