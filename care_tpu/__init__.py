"""CARE-TPU: a TPU-native (JAX/XLA/Pallas) video-captioning framework.

Re-implements the capability surface of the CARE video-captioning framework
(reference: yangbang18/CARE, "Concept-Aware Video Captioning", TIP 2023) with a
TPU-first execution model:

* fixed-shape, jit-compiled programs (no dynamic python hot loops),
* batched beam search with an HBM-resident KV cache (``care_tpu.decoding``),
* multi-stream encoders / concept predictors / transformer & RNN decoders as
  Flax modules (``care_tpu.models``),
* Pallas kernels for the attention hot path (``care_tpu.ops``),
* pjit/`jax.sharding` data+tensor parallelism over a device mesh
  (``care_tpu.parallel``),
* a Lightning-free training runtime with Orbax checkpoints
  (``care_tpu.training``),
* pure-Python COCO caption metrics (``care_tpu.metrics``).

The ambient configuration is a plain dict (``opt``) using the same key space
as the reference (see reference ``opts.py``), produced by
``care_tpu.config.get_opt``.
"""

__version__ = "0.1.0"

from care_tpu import constants  # noqa: F401
