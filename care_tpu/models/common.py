"""Shared building blocks: inits, dense/LN conventions, activations.

Weight-init parity with the reference (``models/Framework.py:115-134``):
xavier-uniform for every Linear kernel and Embedding table, zero biases,
LayerNorm gamma=1/beta=0, and the PAD embedding row zeroed.
"""

import jax.numpy as jnp
import flax.linen as nn

from care_tpu import constants

xavier = nn.initializers.xavier_uniform


def embedding_init_with_zero_pad(key, shape, dtype=jnp.float32):
    """Xavier-uniform embedding table with the PAD row zeroed."""
    table = xavier()(key, shape, dtype)
    return table.at[constants.PAD].set(0.0)


def Dense(features: int, use_bias: bool = True, name=None, dtype=None):
    return nn.Dense(features, use_bias=use_bias, kernel_init=xavier(),
                    bias_init=nn.initializers.zeros, name=name, dtype=dtype)


ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "tanh": nn.tanh,
    "linear": lambda x: x,
    "sigmoid": nn.sigmoid,
    "leakyrelu": nn.leaky_relu,
}


def get_activation(name: str):
    if name not in ACTIVATIONS:
        raise ValueError(f"unknown activation `{name}`")
    return ACTIVATIONS[name]


class CompositionalLinear(nn.Module):
    """Low-rank semantic-conditioned linear map ``A(B(sem) * C(x)) + b``.

    Mirrors reference ``models/components/basic.py:4-19``; used by the
    "semantic composition" GSG ablation (CompositionalMHA/FFN).
    """
    dim_hidden: int
    dim_factor: int
    dim_semantic: int
    dim_input: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, semantic_input):
        out_b = Dense(self.dim_factor, use_bias=False, name="linear_b")(semantic_input)
        if x.ndim == 3 and out_b.ndim == 2:
            out_b = out_b[:, None, :]
        out_c = Dense(self.dim_factor, use_bias=False, name="linear_c")(x)
        out = Dense(self.dim_hidden, use_bias=False, name="linear_a")(out_b * out_c)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.dim_hidden,))
            out = out + bias
        return out
