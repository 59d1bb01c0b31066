"""Device-mesh parallelism: data + tensor sharding via ``jax.sharding``.

The reference trains on exactly 0 or 1 GPU (``opts.py:102-103``) with no
distributed code; scaling here is new TPU-first capability, not a port:

* a ``Mesh`` with axes ``('data', 'model')`` laid out over ICI;
* batches sharded over ``data`` (pure data parallelism; grads all-reduced by
  XLA-inserted ``psum`` during jit);
* attention/FFN/vocab-head kernels optionally sharded over ``model``
  (Megatron-style column->row parallel pairs: the q/k/v and FFN-in kernels
  split their output dim, the attention-out and FFN-out kernels split their
  input dim, so each layer pair needs a single all-reduce that XLA inserts
  automatically from the shardings);
* everything is expressed as ``NamedSharding`` placement + jit — no hand
  collectives, so the same program runs on 1 chip, one pod slice, or a CPU
  mesh in tests.
"""

import re
from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from flax import traverse_util

DATA_AXIS = "data"
MODEL_AXIS = "model"

# regex on '/'-joined param path -> PartitionSpec
_TP_RULES = [
    # attention projections: column parallel (split heads)
    (re.compile(r".*/(query|key|value)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*/(query|key|value)/bias$"), P(MODEL_AXIS)),
    # attention output dense: row parallel
    (re.compile(r".*attention/dense/kernel$"), P(MODEL_AXIS, None)),
    # FFN: column then row parallel
    (re.compile(r".*/ffn/dense1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*/ffn/dense1/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*/ffn/dense2/kernel$"), P(MODEL_AXIS, None)),
    # vocab head: column parallel over the vocabulary
    (re.compile(r".*/tgt_word_prj/kernel$"), P(None, MODEL_AXIS)),
    # concept-detector heads
    (re.compile(r".*/attribute_heads/.*/kernel$"), P(None, MODEL_AXIS)),
]


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Build a Mesh. ``shape`` e.g. {'data': 4, 'model': 2}; default: all
    devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = {DATA_AXIS: len(devices)}
    axis_names = list(shape.keys())
    sizes = [shape[a] for a in axis_names]
    n = int(np.prod(sizes))
    assert n <= len(devices), (shape, len(devices))
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, axis_names)


def param_pspec(path: str, value, mesh: Mesh) -> P:
    if MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] <= 1:
        return P()
    for pattern, spec in _TP_RULES:
        if not pattern.match(path):
            continue
        dims = tuple(spec)
        if len(dims) > value.ndim:
            return P()
        for axis_idx, axis_name in enumerate(dims):
            if axis_name is not None \
                    and value.shape[axis_idx] % mesh.shape[axis_name] != 0:
                return P()
        return spec
    return P()  # replicated


def shard_params(variables, mesh: Mesh):
    """Place a variables pytree on the mesh per the TP rules (replicated
    when no rule matches)."""
    flat = traverse_util.flatten_dict(variables, sep="/")
    placed = {}
    for path, value in flat.items():
        spec = param_pspec(path, value, mesh)
        placed[path] = jax.device_put(value, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(placed, sep="/")


def shard_batch(batch, mesh: Mesh):
    """Shard every array's leading (batch) dim over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 \
                and x.shape[0] % mesh.shape[DATA_AXIS] == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, batch)
