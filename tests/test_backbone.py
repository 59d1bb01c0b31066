"""End-to-end CNN backbones inside the Captioner (reference
``models/Backbone.py``: wrap any pretrainedmodels CNN for the image stream;
we support the same CNN family plus flax CLIP-ViT)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from helpers import tiny_opt
from care_tpu.models.framework import Captioner
from care_tpu.models.backbone import maybe_load_backbone_weights


def _raw_frame_batch(opt, batch_size=2, hw=64, seed=0):
    rs = np.random.RandomState(seed)
    feats = [
        jnp.asarray(rs.randn(batch_size, opt["n_frames"], opt["dim_m"]),
                    jnp.float32),
        jnp.asarray(rs.randn(batch_size, opt["n_frames"], hw, hw, 3),
                    jnp.float32),
    ]
    input_ids = jnp.asarray(
        rs.randint(6, opt["vocab_size"], (batch_size, opt["max_len"] - 1)),
        jnp.int32)
    return {"feats": feats, "input_ids": input_ids}


def _cnn_opt(**kw):
    opt = tiny_opt(with_backbones=["", "resnet18"], **kw)
    opt["dim_i"] = 512  # resnet18 pooled feature dim
    return opt


def test_cnn_backbone_forward_and_grads():
    opt = _cnn_opt()
    model = Captioner(opt)
    batch = _raw_frame_batch(opt)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "sampling": rng},
                           batch)
    assert "Backbone_I" in variables["params"]["backbone"]
    assert "batch_stats" in variables  # frozen-BN stats collection

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, deterministic=False,
            rngs={"dropout": rng, "sampling": rng}, mutable=["batch_stats"])
        return jnp.mean(out["logits"] ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree.leaves(grads["backbone"]))
    assert gnorm > 0  # backbone is trainable end-to-end


def test_backbone_weight_loading_matches_standalone():
    from tests.torch_cnn_mirror import TorchResNet
    from tests.test_cnn import _randomize_bn_stats
    from care_tpu.models.cnn import convert_cnn_state_dict, create_cnn

    opt = _cnn_opt()
    model = Captioner(opt)
    batch = _raw_frame_batch(opt)
    rng = jax.random.PRNGKey(1)
    variables = model.init({"params": rng, "dropout": rng, "sampling": rng},
                           batch)

    torch.manual_seed(3)
    tm = _randomize_bn_stats(TorchResNet(depth=18).eval(), seed=3)
    sd_path = "/tmp/test_backbone_resnet18.pth"
    torch.save(tm.state_dict(), sd_path)

    opt2 = dict(opt, backbone_weights=["", sd_path])
    loaded = maybe_load_backbone_weights(variables, opt2)

    # the in-model backbone now reproduces the standalone converted CNN
    frames = np.asarray(batch["feats"][1][0])  # [F, H, W, 3]
    standalone = create_cnn("resnet18").apply(
        convert_cnn_state_dict(
            {k: v.numpy() for k, v in tm.state_dict().items()}, "resnet18"),
        jnp.asarray(frames))
    sub_vars = {
        "params": loaded["params"]["backbone"]["Backbone_I"],
        "batch_stats": loaded["batch_stats"]["backbone"]["Backbone_I"]}
    in_model = create_cnn("resnet18").apply(sub_vars, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(in_model), np.asarray(standalone),
                               atol=1e-6)


def test_unsupported_backbone_name_raises():
    opt = tiny_opt(with_backbones=["", "vgg19"])
    model = Captioner(opt)
    batch = _raw_frame_batch(opt)
    rng = jax.random.PRNGKey(0)
    with pytest.raises(AssertionError):
        model.init({"params": rng, "dropout": rng, "sampling": rng}, batch)
