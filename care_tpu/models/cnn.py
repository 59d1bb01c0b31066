"""ImageNet CNN encoders in Flax: torchvision-style ResNets + InceptionResNetV2.

Parity targets:
* reference ``pretreatment/extract_image_feats_from_frames.py`` — extracts
  per-frame image features with ``pretrainedmodels`` CNNs (resnet18/34/101/
  152, inceptionresnetv2), optionally keeping the classifier for logits;
* reference ``models/Backbone.py:27-33`` — wraps the same CNNs as in-model
  backbones for end-to-end training.

TPU-first design notes: inference/fine-tuning runs as one jitted batched
program (frames x videos fold into the batch axis feeding the MXU);
BatchNorm always uses the converted running statistics
(``use_running_average=True``) — the standard frozen-BN recipe for
fine-tuning, which also keeps the forward free of cross-replica stat syncs
on a mesh.  Weights are converted from local torch state_dicts
(torchvision / pretrainedmodels naming); no downloads.
"""

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import traverse_util
from jax import lax


def _pair(v):
    return v if isinstance(v, (tuple, list)) else (v, v)


class ConvBN(nn.Module):
    """Conv2d(bias=False) + frozen BatchNorm + optional ReLU
    (= torchvision ``conv+bn`` pairs / pretrainedmodels ``BasicConv2d``)."""
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    eps: float = 1e-5
    act: bool = True

    @nn.compact
    def __call__(self, x):
        ph, pw = _pair(self.padding)
        x = nn.Conv(self.features, _pair(self.kernel),
                    strides=_pair(self.strides),
                    padding=((ph, ph), (pw, pw)), use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=self.eps,
                         name="bn")(x)
        return nn.relu(x) if self.act else x


def _max_pool(x, k=3, s=2, p=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (p, p), (p, p), (0, 0)))


def _avg_pool_excl_pad(x, k=3, s=1, p=1):
    """AvgPool2d(count_include_pad=False): window sum / valid-element count."""
    dims, strides = (1, k, k, 1), (1, s, s, 1)
    pads = ((0, 0), (p, p), (p, p), (0, 0))
    total = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    count = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return total / count


# ---------------------------------------------------------------------------
# ResNet (torchvision semantics: stride on the 3x3 conv of Bottleneck)
# ---------------------------------------------------------------------------

class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        idt = x
        y = ConvBN(self.planes, 3, self.stride, 1, name="conv1")(x)
        y = ConvBN(self.planes, 3, 1, 1, act=False, name="conv2")(y)
        if self.downsample:
            idt = ConvBN(self.planes, 1, self.stride, 0, act=False,
                         name="downsample")(x)
        return nn.relu(y + idt)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        idt = x
        y = ConvBN(self.planes, 1, 1, 0, name="conv1")(x)
        y = ConvBN(self.planes, 3, self.stride, 1, name="conv2")(y)
        y = ConvBN(self.planes * 4, 1, 1, 0, act=False, name="conv3")(y)
        if self.downsample:
            idt = ConvBN(self.planes * 4, 1, self.stride, 0, act=False,
                         name="downsample")(x)
        return nn.relu(y + idt)


RESNET_CFGS = {
    18: (BasicBlock, 1, [2, 2, 2, 2]),
    34: (BasicBlock, 1, [3, 4, 6, 3]),
    50: (Bottleneck, 4, [3, 4, 6, 3]),
    101: (Bottleneck, 4, [3, 4, 23, 3]),
    152: (Bottleneck, 4, [3, 8, 36, 3]),
}


class ResNet(nn.Module):
    """images [B, H, W, 3] (normalized) -> pooled features [B, 512*exp]
    (or ImageNet logits with ``with_logits=True``)."""
    depth: int = 101
    num_classes: int = 1000

    @nn.compact
    def __call__(self, images, with_logits: bool = False):
        block, expansion, layers = RESNET_CFGS[self.depth]
        x = ConvBN(64, 7, 2, 3, name="stem")(images)
        x = _max_pool(x, 3, 2, 1)
        planes, inplanes = 64, 64
        for li, n_blocks in enumerate(layers):
            stride = 1 if li == 0 else 2
            for b in range(n_blocks):
                ds = b == 0 and (stride != 1 or inplanes != planes * expansion)
                x = block(planes, stride if b == 0 else 1, ds,
                          name=f"layer{li + 1}_{b}")(x)
                inplanes = planes * expansion
            planes *= 2
        feats = x.mean(axis=(1, 2))
        if with_logits:
            return nn.Dense(self.num_classes, name="fc")(feats)
        return feats


# ---------------------------------------------------------------------------
# InceptionResNetV2 (pretrainedmodels semantics; BN eps = 1e-3)
# ---------------------------------------------------------------------------

def _bc(features, kernel, strides=1, padding=0, name=None):
    return ConvBN(features, kernel, strides, padding, eps=1e-3, name=name)


class Mixed5b(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = _bc(96, 1, name="branch0")(x)
        b1 = _bc(64, 5, padding=2, name="branch1_1")(
            _bc(48, 1, name="branch1_0")(x))
        b2 = _bc(96, 3, padding=1, name="branch2_2")(
            _bc(96, 3, padding=1, name="branch2_1")(
                _bc(64, 1, name="branch2_0")(x)))
        b3 = _bc(64, 1, name="branch3_1")(_avg_pool_excl_pad(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class Block35(nn.Module):
    scale: float = 0.17

    @nn.compact
    def __call__(self, x):
        b0 = _bc(32, 1, name="branch0")(x)
        b1 = _bc(32, 3, padding=1, name="branch1_1")(
            _bc(32, 1, name="branch1_0")(x))
        b2 = _bc(64, 3, padding=1, name="branch2_2")(
            _bc(48, 3, padding=1, name="branch2_1")(
                _bc(32, 1, name="branch2_0")(x)))
        y = jnp.concatenate([b0, b1, b2], axis=-1)
        y = nn.Conv(320, (1, 1), padding="VALID", name="conv2d")(y)
        return nn.relu(x + self.scale * y)


class Mixed6a(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = _bc(384, 3, strides=2, name="branch0")(x)
        b1 = _bc(384, 3, strides=2, name="branch1_2")(
            _bc(256, 3, padding=1, name="branch1_1")(
                _bc(256, 1, name="branch1_0")(x)))
        b2 = _max_pool(x, 3, 2, 0)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Block17(nn.Module):
    scale: float = 0.10

    @nn.compact
    def __call__(self, x):
        b0 = _bc(192, 1, name="branch0")(x)
        b1 = _bc(192, (7, 1), padding=(3, 0), name="branch1_2")(
            _bc(160, (1, 7), padding=(0, 3), name="branch1_1")(
                _bc(128, 1, name="branch1_0")(x)))
        y = jnp.concatenate([b0, b1], axis=-1)
        y = nn.Conv(1088, (1, 1), padding="VALID", name="conv2d")(y)
        return nn.relu(x + self.scale * y)


class Mixed7a(nn.Module):
    @nn.compact
    def __call__(self, x):
        b0 = _bc(384, 3, strides=2, name="branch0_1")(
            _bc(256, 1, name="branch0_0")(x))
        b1 = _bc(288, 3, strides=2, name="branch1_1")(
            _bc(256, 1, name="branch1_0")(x))
        b2 = _bc(320, 3, strides=2, name="branch2_2")(
            _bc(288, 3, padding=1, name="branch2_1")(
                _bc(256, 1, name="branch2_0")(x)))
        b3 = _max_pool(x, 3, 2, 0)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class Block8(nn.Module):
    scale: float = 0.20
    no_relu: bool = False

    @nn.compact
    def __call__(self, x):
        b0 = _bc(192, 1, name="branch0")(x)
        b1 = _bc(256, (3, 1), padding=(1, 0), name="branch1_2")(
            _bc(224, (1, 3), padding=(0, 1), name="branch1_1")(
                _bc(192, 1, name="branch1_0")(x)))
        y = jnp.concatenate([b0, b1], axis=-1)
        y = nn.Conv(2080, (1, 1), padding="VALID", name="conv2d")(y)
        y = x + self.scale * y
        return y if self.no_relu else nn.relu(y)


class InceptionResNetV2(nn.Module):
    """images [B, H, W, 3] -> pooled features [B, 1536] (or 1001-way
    'imagenet+background' logits with ``with_logits=True``)."""
    num_classes: int = 1001

    @nn.compact
    def __call__(self, images, with_logits: bool = False):
        x = _bc(32, 3, strides=2, name="conv2d_1a")(images)
        x = _bc(32, 3, name="conv2d_2a")(x)
        x = _bc(64, 3, padding=1, name="conv2d_2b")(x)
        x = _max_pool(x, 3, 2, 0)
        x = _bc(80, 1, name="conv2d_3b")(x)
        x = _bc(192, 3, name="conv2d_4a")(x)
        x = _max_pool(x, 3, 2, 0)
        x = Mixed5b(name="mixed_5b")(x)
        for i in range(10):
            x = Block35(name=f"repeat_{i}")(x)
        x = Mixed6a(name="mixed_6a")(x)
        for i in range(20):
            x = Block17(name=f"repeat_1_{i}")(x)
        x = Mixed7a(name="mixed_7a")(x)
        for i in range(9):
            x = Block8(name=f"repeat_2_{i}")(x)
        x = Block8(scale=1.0, no_relu=True, name="block8")(x)
        x = _bc(1536, 1, name="conv2d_7b")(x)
        feats = x.mean(axis=(1, 2))  # avgpool_1a (global at 299 input)
        if with_logits:
            return nn.Dense(self.num_classes, name="last_linear")(feats)
        return feats


# ---------------------------------------------------------------------------
# torch state_dict conversion (torchvision / pretrainedmodels naming)
# ---------------------------------------------------------------------------

def _t_conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


class _TreeBuilder:
    def __init__(self, sd):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params, self.stats = {}, {}

    def convbn(self, flax_path, conv_key, bn_key=None):
        bn_key = bn_key or conv_key
        self.params[flax_path + ("conv", "kernel")] = \
            _t_conv(self.sd[conv_key + ".weight"])
        self.params[flax_path + ("bn", "scale")] = self.sd[bn_key + ".weight"]
        self.params[flax_path + ("bn", "bias")] = self.sd[bn_key + ".bias"]
        self.stats[flax_path + ("bn", "mean")] = \
            self.sd[bn_key + ".running_mean"]
        self.stats[flax_path + ("bn", "var")] = self.sd[bn_key + ".running_var"]

    def conv_bias(self, flax_path, key):
        self.params[flax_path + ("kernel",)] = _t_conv(self.sd[key + ".weight"])
        self.params[flax_path + ("bias",)] = self.sd[key + ".bias"]

    def linear(self, flax_path, key):
        self.params[flax_path + ("kernel",)] = self.sd[key + ".weight"].T
        self.params[flax_path + ("bias",)] = self.sd[key + ".bias"]

    def variables(self):
        return {"params": traverse_util.unflatten_dict(self.params),
                "batch_stats": traverse_util.unflatten_dict(self.stats)}


def convert_torch_resnet_state_dict(sd: Dict[str, Any],
                                    depth: int) -> Dict[str, Any]:
    """torchvision/pretrainedmodels ResNet state_dict -> flax variables."""
    tb = _TreeBuilder(sd)
    tb.convbn(("stem",), "conv1", "bn1")
    block, expansion, layers = RESNET_CFGS[depth]
    n_convs = 2 if block is BasicBlock else 3
    for li, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            pre = f"layer{li + 1}.{b}"
            flax_pre = (f"layer{li + 1}_{b}",)
            for c in range(1, n_convs + 1):
                tb.convbn(flax_pre + (f"conv{c}",), f"{pre}.conv{c}",
                          f"{pre}.bn{c}")
            if f"{pre}.downsample.0.weight" in tb.sd:
                tb.convbn(flax_pre + ("downsample",), f"{pre}.downsample.0",
                          f"{pre}.downsample.1")
    fc = "fc" if "fc.weight" in tb.sd else "last_linear"
    if fc + ".weight" in tb.sd:
        tb.linear(("fc",), fc)
    return tb.variables()


def convert_torch_inceptionresnetv2_state_dict(
        sd: Dict[str, Any]) -> Dict[str, Any]:
    """pretrainedmodels InceptionResNetV2 state_dict -> flax variables."""
    tb = _TreeBuilder(sd)

    def bc(flax_path, key):
        tb.convbn(flax_path, key + ".conv", key + ".bn")

    for name in ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b",
                 "conv2d_4a", "conv2d_7b"):
        bc((name,), name)

    # mixed_5b: branch3 holds (AvgPool, BasicConv2d) -> torch key branch3.1
    for b, n in (("branch0", 0), ("branch1", 2), ("branch2", 3),
                 ("branch3", None)):
        if n is None:
            bc(("mixed_5b", "branch3_1"), "mixed_5b.branch3.1")
        elif n == 0:
            bc(("mixed_5b", b), f"mixed_5b.{b}")
        else:
            for j in range(n):
                bc(("mixed_5b", f"{b}_{j}"), f"mixed_5b.{b}.{j}")

    def residual_block(flax_name, torch_name, branch_sizes):
        for b, n in branch_sizes:
            if n == 0:
                bc((flax_name, b), f"{torch_name}.{b}")
            else:
                for j in range(n):
                    bc((flax_name, f"{b}_{j}"), f"{torch_name}.{b}.{j}")
        tb.conv_bias((flax_name, "conv2d"), f"{torch_name}.conv2d")

    for i in range(10):
        residual_block(f"repeat_{i}", f"repeat.{i}",
                       [("branch0", 0), ("branch1", 2), ("branch2", 3)])
    for b, n in (("branch0", 0), ("branch1", 3)):
        if n == 0:
            bc(("mixed_6a", b), f"mixed_6a.{b}")
        else:
            for j in range(n):
                bc(("mixed_6a", f"{b}_{j}"), f"mixed_6a.{b}.{j}")
    for i in range(20):
        residual_block(f"repeat_1_{i}", f"repeat_1.{i}",
                       [("branch0", 0), ("branch1", 3)])
    for b, n in (("branch0", 2), ("branch1", 2), ("branch2", 3)):
        for j in range(n):
            bc(("mixed_7a", f"{b}_{j}"), f"mixed_7a.{b}.{j}")
    for i in range(9):
        residual_block(f"repeat_2_{i}", f"repeat_2.{i}",
                       [("branch0", 0), ("branch1", 3)])
    residual_block("block8", "block8", [("branch0", 0), ("branch1", 3)])
    if "last_linear.weight" in tb.sd:
        tb.linear(("last_linear",), "last_linear")
    return tb.variables()


# ---------------------------------------------------------------------------
# factory + preprocessing + batched extraction
# ---------------------------------------------------------------------------

CNN_SPECS = {
    # name -> (module ctor, input size, mean, std, feature dim)
    "resnet18": (lambda: ResNet(depth=18), 224,
                 (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), 512),
    "resnet34": (lambda: ResNet(depth=34), 224,
                 (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), 512),
    "resnet50": (lambda: ResNet(depth=50), 224,
                 (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), 2048),
    "resnet101": (lambda: ResNet(depth=101), 224,
                  (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), 2048),
    "resnet152": (lambda: ResNet(depth=152), 224,
                  (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), 2048),
    "inceptionresnetv2": (lambda: InceptionResNetV2(), 299,
                          (0.5, 0.5, 0.5), (0.5, 0.5, 0.5), 1536),
}


def create_cnn(name: str):
    assert name in CNN_SPECS, \
        f"unknown CNN `{name}` (have {sorted(CNN_SPECS)})"
    return CNN_SPECS[name][0]()


def convert_cnn_state_dict(sd: Dict[str, Any], name: str) -> Dict[str, Any]:
    if name.startswith("resnet"):
        return convert_torch_resnet_state_dict(sd, int(name[6:]))
    return convert_torch_inceptionresnetv2_state_dict(sd)


def preprocess_cnn_images(images: np.ndarray, name: str) -> np.ndarray:
    """uint8 [N, H, W, 3] (already resized+center-cropped to the model's
    input size by the caller, or any size — resized here) -> normalized
    float32, following pretrainedmodels ``TransformImage`` (resize shorter
    side to size/0.875, center crop, scale to [0,1], normalize)."""
    from PIL import Image
    _, size, mean, std, _ = CNN_SPECS[name]
    resize = int(size / 0.875)
    out = np.empty((len(images), size, size, 3), np.float32)
    for i, img in enumerate(images):
        pil = Image.fromarray(np.asarray(img, np.uint8))
        w, h = pil.size
        if w < h:
            nw, nh = resize, int(round(h * resize / w))
        else:
            nw, nh = int(round(w * resize / h)), resize
        pil = pil.resize((nw, nh), Image.BILINEAR)
        left, top = (nw - size) // 2, (nh - size) // 2
        out[i] = np.asarray(
            pil.crop((left, top, left + size, top + size)), np.float32) / 255.0
    return (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def encode_images(variables, images, model, with_logits=False,
                  batch_size: int = 64):
    """Batched jitted inference over [N, H, W, 3] normalized images."""
    fn = jax.jit(lambda v, x: model.apply(v, x, with_logits=with_logits))
    outs = []
    n = images.shape[0]
    for s in range(0, n, batch_size):
        chunk = images[s:s + batch_size]
        pad = 0
        if chunk.shape[0] < batch_size and n > batch_size:
            pad = batch_size - chunk.shape[0]
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        o = np.asarray(fn(variables, jnp.asarray(chunk)))
        outs.append(o[:o.shape[0] - pad] if pad else o)
    return np.concatenate(outs, axis=0)
