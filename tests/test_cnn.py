"""Flax CNN (ResNet / InceptionResNetV2) parity vs torch mirrors.

Validates both the flax modules and the torch-state_dict converters of
``care_tpu/models/cnn.py`` against mirrors using the public torchvision /
pretrainedmodels layer naming (the reference's feature extractors,
``/root/reference/pretreatment/extract_image_feats_from_frames.py``, use
those packages).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from care_tpu.models.cnn import (create_cnn, convert_cnn_state_dict,
                                 preprocess_cnn_images, encode_images,
                                 CNN_SPECS)
from tests.torch_cnn_mirror import TorchResNet, TorchInceptionResNetV2


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0, 0.2, generator=g)
    return model


@pytest.mark.parametrize("depth,logits", [(18, False), (50, True)])
def test_resnet_matches_torch(depth, logits):
    torch.manual_seed(0)
    tm = _randomize_bn_stats(TorchResNet(depth=depth).eval())
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_cnn_state_dict(sd, f"resnet{depth}")

    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 with_logits=logits).numpy()
    ours = np.asarray(create_cnn(f"resnet{depth}").apply(
        variables, jnp.asarray(x), with_logits=logits))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_inceptionresnetv2_matches_torch():
    torch.manual_seed(1)
    tm = _randomize_bn_stats(TorchInceptionResNetV2().eval(), seed=1)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_cnn_state_dict(sd, "inceptionresnetv2")

    x = np.random.RandomState(1).randn(1, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(create_cnn("inceptionresnetv2").apply(
        variables, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 1536)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    # logits head (1001-way 'imagenet+background')
    with torch.no_grad():
        ref_l = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   with_logits=True).numpy()
    ours_l = np.asarray(create_cnn("inceptionresnetv2").apply(
        variables, jnp.asarray(x), with_logits=True))
    assert ours_l.shape == (1, 1001)
    np.testing.assert_allclose(ours_l, ref_l, atol=5e-4, rtol=1e-3)


def test_preprocess_and_encode_roundtrip():
    imgs = (np.random.RandomState(2).rand(3, 100, 80, 3) * 255).astype(
        np.uint8)
    pre = preprocess_cnn_images(imgs, "resnet18")
    assert pre.shape == (3, 224, 224, 3)
    # normalized with imagenet stats -> roughly centered
    assert abs(float(pre.mean())) < 2.0

    tm = _randomize_bn_stats(TorchResNet(depth=18).eval())
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_cnn_state_dict(sd, "resnet18")
    feats = encode_images(variables, pre[:, :64, :64], create_cnn("resnet18"),
                          batch_size=2)
    assert feats.shape == (3, CNN_SPECS["resnet18"][4])
    assert np.isfinite(feats).all()
