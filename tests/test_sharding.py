"""Multi-device sharding tests on the 8-virtual-CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from care_tpu.parallel import (make_mesh, shard_batch, shard_params,
                               DATA_AXIS, MODEL_AXIS)

from helpers import tiny_opt, tiny_model_and_batch


@pytest.fixture(scope="module")
def devices():
    d = jax.devices("cpu")
    if len(d) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return d[:8]


def test_data_parallel_forward_matches_single(devices):
    opt = tiny_opt()
    model, variables, batch = tiny_model_and_batch(opt, batch_size=8)

    single = model.apply(variables, batch, deterministic=True,
                         collect_aux=False)["logits"]

    mesh = make_mesh({DATA_AXIS: 8}, devices=devices)
    vs = shard_params(variables, mesh)
    b = shard_batch(batch, mesh)
    with mesh:
        sharded = jax.jit(lambda v, x: model.apply(
            v, x, deterministic=True, collect_aux=False)["logits"])(vs, b)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=2e-5)


def test_tensor_parallel_forward_matches_single(devices):
    opt = tiny_opt(dim_hidden=64, num_attention_heads=4,
                   intermediate_size=128)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=4)
    single = model.apply(variables, batch, deterministic=True,
                         collect_aux=False)["logits"]

    mesh = make_mesh({DATA_AXIS: 2, MODEL_AXIS: 4}, devices=devices)
    vs = shard_params(variables, mesh)
    b = shard_batch(batch, mesh)
    with mesh:
        sharded = jax.jit(lambda v, x: model.apply(
            v, x, deterministic=True, collect_aux=False)["logits"])(vs, b)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=2e-4)


def test_tp_rules_shard_attention_kernels(devices):
    opt = tiny_opt(dim_hidden=64, num_attention_heads=4)
    model, variables, batch = tiny_model_and_batch(opt, batch_size=2)
    mesh = make_mesh({DATA_AXIS: 2, MODEL_AXIS: 4}, devices=devices)
    vs = shard_params(variables, mesh)
    from flax import traverse_util
    flat = traverse_util.flatten_dict(vs, sep="/")
    sharded_kernels = [k for k, v in flat.items()
                       if "query/kernel" in k
                       and MODEL_AXIS in str(v.sharding)]
    assert sharded_kernels, "no attention kernels were model-sharded"


def test_dryrun_multichip_entry():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
