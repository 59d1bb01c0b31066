"""Multi-stream feature encoders.

Parity targets: reference ``models/Encoder.py`` — the ``MultipleStreams``
base (one sub-encoder per modality character, fusion in
{temporal_concat, addition, none, channel_concat}, per-component modality
views for predictor vs decoder) and its variants ``Embedder``,
``ReLUEmbedder``, ``Identity``, ``EncoderWithHighWayBN``,
``MultiTransformerEncoder``, ``TransformerEncoder``, ``VOE``.

The retrieved-text stream ('t') is embedded by the framework (it needs the
decoder's word embeddings); encoders here only see dense feature streams.

TPU notes: all streams are fixed-shape [B, n_frames, dim_char]; per-stream
projections are independent matmuls that XLA fuses/batches; the fusion ops
are pure concats (no python-object plumbing at trace time).
"""

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from care_tpu.models.common import Dense, xavier
from care_tpu.models.embeddings import PositionalEmbedding
from care_tpu.models.layers import EncoderLayer


class HighWay(nn.Module):
    """Gated highway block (reference ``Encoder.py:210-226``)."""
    hidden_size: int
    with_gate: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.tanh(Dense(self.hidden_size, name="w1")(x))
        if self.with_gate:
            gate = nn.sigmoid(Dense(self.hidden_size, name="w2")(x))
            return gate * x + (1 - gate) * y
        return x + y


class _TorchBatchNorm(nn.Module):
    """BatchNorm with EXACT torch.nn.BatchNorm1d train-mode semantics:
    normalisation uses the biased batch variance, but the running variance
    is updated with the UNBIASED one (``n/(n-1)``) — flax's ``nn.BatchNorm``
    stores the biased variance, a ~``1/(n-1)`` per-update drift that would
    surface as eval-time logit mismatch after training.  torch
    ``momentum=0.1`` convention: ``new = (1-m)*old + m*batch``."""
    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = x.mean(axis=0)
            var = ((x - mean) ** 2).mean(axis=0)     # biased, for normalising
            n = x.shape[0]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class BN1d(nn.Module):
    """BatchNorm over the channel axis, stats across (batch*time)
    (reference ``Encoder.py:229-241``; torch-exact running-stat updates)."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shape = x.shape
        flat = x.reshape(-1, self.hidden_size)
        out = _TorchBatchNorm(self.hidden_size, name="bn")(
            flat, use_running_average=deterministic)
        return out.reshape(shape)


class TransformerEncoderBase(nn.Module):
    """PE + LN + dropout + N self-attention encoder layers
    (reference ``Encoder.py:244-298``)."""
    opt: Dict[str, Any]

    @nn.compact
    def __call__(self, input_feats, deterministic: bool = True,
                 only_return_encoder_hidden_states: bool = True):
        opt = self.opt
        if not isinstance(input_feats, (list, tuple)):
            input_feats = [input_feats]

        n_frames = input_feats[0].shape[1]
        pos = PositionalEmbedding(max_len=opt["n_frames"],
                                  dim_hidden=opt["dim_hidden"],
                                  trainable=opt.get("trainable_pe", False),
                                  name="position_embeddings")(
            jnp.arange(n_frames)[None, :])

        hidden_states = jnp.concatenate([f + pos for f in input_feats], axis=1)
        hidden_states = nn.LayerNorm(epsilon=opt["layer_norm_eps"],
                                     name="LayerNorm")(hidden_states)
        hidden_states = nn.Dropout(opt["hidden_dropout_prob"])(
            hidden_states, deterministic=deterministic)

        all_states = [hidden_states]
        all_attn = ()
        for i in range(opt["num_hidden_layers_encoder"]):
            hidden_states, probs, _ = EncoderLayer(opt, name=f"layer_{i}")(
                all_states[-1], deterministic=deterministic)
            all_states.append(hidden_states)
            all_attn += (probs,)

        if only_return_encoder_hidden_states:
            return all_states[-1]
        return {"encoder_hidden_states": all_states[-1],
                "all_encoder_hidden_states": all_states,
                "all_encoder_intra_attentions": all_attn}


# ---------------------------------------------------------------------------
# per-stream sub-encoders
# ---------------------------------------------------------------------------

class _LinearLNDrop(nn.Module):
    dim_out: int
    dropout: float
    eps: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.dim_out, name="linear")(x)
        x = nn.LayerNorm(epsilon=self.eps, name="ln")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class _LinearReLUDrop(nn.Module):
    dim_out: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.relu(Dense(self.dim_out, name="linear")(x))
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class _IdentityStream(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return x


class _HighWayBNStream(nn.Module):
    dim_out: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.dim_out, name="linear")(x)
        x = HighWay(self.dim_out, name="highway")(x)
        x = BN1d(self.dim_out, name="bn")(x, deterministic=deterministic)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class _LinearTransformerStream(nn.Module):
    dim_out: int
    opt: Dict[str, Any]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.dim_out, name="linear")(x)
        return TransformerEncoderBase(self.opt, name="backbone")(
            x, deterministic=deterministic)


class _LinearStream(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return Dense(self.dim_out, name="linear")(x)


# ---------------------------------------------------------------------------
# multi-stream base
# ---------------------------------------------------------------------------

def fuse(encoder_hidden_states, fusion_type: str):
    """Fuse per-modality states (reference ``Encoder.py:140-153``)."""
    if fusion_type == "none":
        return encoder_hidden_states
    if not isinstance(encoder_hidden_states, (list, tuple)):
        encoder_hidden_states = [encoder_hidden_states]
    if fusion_type == "addition":
        return jnp.mean(jnp.stack(encoder_hidden_states, axis=0), axis=0)
    if fusion_type == "temporal_concat":
        return jnp.concatenate(encoder_hidden_states, axis=1)
    if fusion_type == "channel_concat":
        return jnp.concatenate(encoder_hidden_states, axis=2)
    raise ValueError(f"unsupported fusion `{fusion_type}`")


class MultipleStreams(nn.Module):
    """One sub-encoder per (non-'t') modality char + fusion + component views."""
    opt: Dict[str, Any]
    stream_kind: str  # 'embedder' | 'relu' | 'identity' | 'highwaybn' | 'multitransformer' | 'transformer'

    def setup(self):
        opt = self.opt
        modality = [c for c in opt["modality"].lower() if c != "t"]
        self.dense_modality = "".join(modality)
        streams = []
        for char in modality:
            dim_in = opt.get("dim_" + char)
            assert dim_in is not None, f"dim_{char} missing from opt"
            dim_out = opt.get("dim_hidden", 512)
            dropout = opt.get("encoder_dropout_prob", 0.5)
            kind = self.stream_kind
            name = f"Encoder_{char.upper()}"
            if kind == "embedder":
                streams.append(_LinearLNDrop(dim_out, dropout,
                                             opt["layer_norm_eps"], name=name))
            elif kind == "relu":
                streams.append(_LinearReLUDrop(dim_out, dropout, name=name))
            elif kind == "identity":
                streams.append(_IdentityStream(name=name))
            elif kind == "highwaybn":
                streams.append(_HighWayBNStream(dim_out, dropout, name=name))
            elif kind == "multitransformer":
                streams.append(_LinearTransformerStream(dim_out, opt, name=name))
            elif kind == "transformer":
                streams.append(_LinearStream(dim_out, name=name))
            else:
                raise ValueError(kind)
        self.streams = streams

        if self.stream_kind == "transformer":
            self.backbone = TransformerEncoderBase(opt, name="backbone")

        self.fusion_type = opt.get("fusion", "temporal_concat")

    def post_processing(self, encoder_hidden_states, deterministic=True):
        if self.stream_kind == "transformer":
            return self.backbone(encoder_hidden_states,
                                 deterministic=deterministic,
                                 only_return_encoder_hidden_states=False)
        return {"encoder_hidden_states": fuse(encoder_hidden_states,
                                              self.fusion_type)}

    def _component_view(self, per_modality: Dict[str, list],
                        component_modality: str, deterministic) -> Dict[str, Any]:
        keep = [i for i, c in enumerate(self.dense_modality)
                if c in component_modality]
        view = {k: [v[i] for i in keep] for k, v in per_modality.items()}
        out = dict(view)
        out.update(self.post_processing(view["encoder_hidden_states"],
                                        deterministic=deterministic))
        return out

    def __call__(self, input_feats: List[jnp.ndarray],
                 deterministic: bool = True) -> Dict[str, Any]:
        assert len(input_feats) == len(self.streams), \
            (len(input_feats), len(self.streams))

        states = [enc(f, deterministic=deterministic)
                  for enc, f in zip(self.streams, input_feats)]

        data: Dict[str, Any] = {"encoder_hidden_states": states,
                                "mean_encoder_hidden_states":
                                    [s.mean(axis=1) for s in states]}

        opt = self.opt
        mod = self.dense_modality
        per_modality = {k: list(v) for k, v in data.items()}
        for key_name, comp_mod in [
                ("inputs_for_predictor", opt.get("modality_for_predictor")),
                ("inputs_for_decoder", opt.get("modality_for_decoder"))]:
            comp_mod = (comp_mod or "").replace("t", "")
            if comp_mod and comp_mod != mod:
                data[key_name] = self._component_view(per_modality, comp_mod,
                                                      deterministic)

        data.update(self.post_processing(data["encoder_hidden_states"],
                                         deterministic=deterministic))
        return data


class VOE(nn.Module):
    """Chained per-modality GRUs (reference ``Encoder.py:379-412``)."""
    opt: Dict[str, Any]

    @nn.compact
    def __call__(self, input_feats, deterministic: bool = True):
        opt = self.opt
        modality = [c for c in opt["modality"] if c != "t"]
        assert len(input_feats) == len(modality)

        dropout = nn.Dropout(opt.get("encoder_dropout_prob", 0.5))
        rnn_outputs = None
        carry = None
        for i, char in enumerate(modality):
            if i:
                inputs = jnp.concatenate(
                    [dropout(rnn_outputs, deterministic=deterministic),
                     input_feats[i]], axis=2)
            else:
                inputs = input_feats[i]
            cell = nn.GRUCell(features=opt["dim_hidden"], name=f"RNN_{char}")
            rnn = nn.RNN(cell, return_carry=True, name=f"RNNwrap_{char}")
            carry, rnn_outputs = rnn(
                inputs, initial_carry=carry) if carry is not None else rnn(inputs)

        rnn_outputs = BN1d(opt["dim_hidden"], name="bn")(
            rnn_outputs, deterministic=deterministic)
        return {"encoder_hidden_states": rnn_outputs,
                "mean_encoder_hidden_states": [rnn_outputs.mean(axis=1)]}


class LightCNN(nn.Module):
    """Small conv stack over per-frame 7x7 patch grids (dense-patch
    experiments, reference ``Encoder.py:301-323``). Input
    [B, n_frames, ch*res*res] -> [B, n_frames, chs[-1]]."""
    chs: tuple = (12, 32, 128, 512)
    resolution: int = 7
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert x.ndim == 3
        bsz, n_frames, _ = x.shape
        r = self.resolution
        h = x.reshape(bsz * n_frames, self.chs[0], r, r)
        h = jnp.transpose(h, (0, 2, 3, 1))        # NHWC
        for i, ch in enumerate(self.chs[1:]):
            h = nn.Conv(ch, (3, 3), padding="VALID", name=f"conv{i+1}")(h)
            h = nn.BatchNorm(use_running_average=deterministic,
                             name=f"bn{i+1}")(h)
            h = nn.relu(h)
        h = h.reshape(bsz, n_frames, -1)
        return nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)


class POSLayer(nn.Module):
    """Learned positional bias over per-frame patch positions
    (reference ``Encoder.py:326-338``)."""
    resolution: int = 7

    @nn.compact
    def __call__(self, x):
        assert x.ndim == 3
        bsz, n_frames, _ = x.shape
        r2 = self.resolution ** 2
        bias = self.param("pos_bias", nn.initializers.zeros, (r2,))
        h = x.reshape(bsz * n_frames, -1, r2) + bias
        return h.reshape(bsz, n_frames, -1)


class SingleStreamEmbedder(nn.Module):
    """Channel-concat all modalities, then one Linear+LN+Dropout encoder
    (reference ``SingleStream``/``SingleStreamEmbedder``,
    ``Encoder.py:29-48,159-162``)."""
    opt: Dict[str, Any]

    @nn.compact
    def __call__(self, input_feats, deterministic: bool = True):
        opt = self.opt
        x = jnp.concatenate(input_feats, axis=-1)
        x = _LinearLNDrop(opt.get("dim_hidden", 512),
                          opt.get("encoder_dropout_prob", 0.5),
                          opt["layer_norm_eps"], name="encoder")(
            x, deterministic=deterministic)
        return {"encoder_hidden_states": x,
                "mean_encoder_hidden_states": [x.mean(axis=1)]}


class CNNPatchEncoder(nn.Module):
    """Dense-patch 3D-conv encoder (reference ``models/Att_Encoder.py:6-99``,
    ``CNNBase``/``CNN1``/``CNN2``/``CNN3``).

    Input is a 4-D patch-feature tensor [B, n_frames, n_layers, n_patches]
    (n_patches a perfect square); layers are mean-pooled, frames/patches are
    reshaped to a [B, F, ws, ws, 1] volume and pushed through three
    Conv3d+BN+ReLU blocks with frame-axis average pooling, then flattened
    (channel-major, matching the torch ``view``) into one [B, 1, H] token.

    Reachable in the reference via ``--encoder CNN1`` (``Encoder.py:19-23``
    resolves ``globals()``, and ``Att_Encoder`` is star-imported), though no
    shipped config uses it. TPU note: convs are NDHWC so XLA lowers them
    straight to the conv MXU path; all shapes static.
    """
    opt: Dict[str, Any]
    kernel_size: tuple = (3, 3, 3)
    padding: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, input_feats, deterministic: bool = True):
        opt = self.opt
        x = input_feats[0] if isinstance(input_feats, (list, tuple)) \
            else input_feats
        n_patches = x.shape[-1]
        ws = int(n_patches ** 0.5)
        assert ws * ws == n_patches, n_patches
        n_frames = x.shape[1]
        bsz = x.shape[0]

        x = x.mean(axis=2)  # [B, F, P]
        x = x.reshape(bsz, n_frames, ws, ws, 1)  # NDHWC

        def block(x, features, ksize, pad):
            x = nn.Conv(features, kernel_size=ksize,
                        padding=[(p, p) for p in pad], use_bias=True)(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5)(x)
            return nn.relu(x)

        k, p = self.kernel_size, self.padding
        x = block(x, 2, k, p)
        x = nn.avg_pool(x, (2, 1, 1), strides=(2, 1, 1))
        x = block(x, 4, k, p)
        x = nn.avg_pool(x, (2, 1, 1), strides=(2, 1, 1))
        # final block collapses the frame axis: kernel depth F//4, no pad
        x = block(x, 8, (n_frames // 4,) + tuple(k[1:]),
                  (0,) + tuple(p[1:]))  # [B, 1, ws, ws, 8]

        # channel-major flatten to match torch's view on NCDHW
        x = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(bsz, 1, -1)
        x = Dense(opt.get("dim_hidden", 512), name="net")(x)
        x = nn.LayerNorm(epsilon=opt["layer_norm_eps"], name="LN")(x)
        return {"encoder_hidden_states": x,
                "mean_encoder_hidden_states": [x.mean(axis=1)]}


_CNN_VARIANTS = {
    "CNN1": ((3, 3, 3), (1, 1, 1)),
    "CNN2": ((7, 3, 3), (3, 1, 1)),
    "CNN3": ((7, 5, 5), (3, 2, 2)),
}

_STREAM_KINDS = {
    "Embedder": "embedder",
    "ReLUEmbedder": "relu",
    "Identity": "identity",
    "EncoderWithHighWayBN": "highwaybn",
    "MultiTransformerEncoder": "multitransformer",
    "TransformerEncoder": "transformer",
}


def get_encoder(opt: dict) -> nn.Module:
    name = opt["encoder"]
    if name == "VOE":
        return VOE(opt, name="encoder")
    if name == "SingleStreamEmbedder":
        return SingleStreamEmbedder(opt, name="encoder")
    if name in _CNN_VARIANTS:
        k, p = _CNN_VARIANTS[name]
        return CNNPatchEncoder(opt, kernel_size=k, padding=p, name="encoder")
    if name not in _STREAM_KINDS:
        raise ValueError(f"unknown encoder `{name}`")
    return MultipleStreams(opt, _STREAM_KINDS[name], name="encoder")
