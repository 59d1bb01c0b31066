"""Multi-host input feeding: per-process loading -> global device arrays.

The reference is strictly single-process (``opts.py:102-103``); on a TPU pod
slice each host only drives its local chips and must feed its shard of the
global batch.  The TPU-native recipe (SURVEY §7.9):

* every process computes the SAME deterministic global index order per epoch
  and takes a disjoint contiguous slice of each global batch
  (:class:`HostShardedBatches`),
* per-process numpy batches become one global ``jax.Array`` via
  ``jax.make_array_from_process_local_data`` with the mesh's ``data``-axis
  sharding (:func:`global_batch_from_local`), so the jitted train step is
  identical to the single-host program — XLA only sees globally-shaped,
  ``NamedSharding``-placed arrays.

Single-process meshes (tests, one chip, the 8-virtual-CPU-device suite) are
the degenerate case: the local slice IS the global batch, and the result
equals :func:`care_tpu.parallel.shard_batch`.
"""

from typing import Any, Dict, Iterator

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from care_tpu.parallel.mesh import DATA_AXIS


def process_slice(global_batch_size: int,
                  process_index: int = None,
                  process_count: int = None) -> slice:
    """The contiguous rows of each global batch this process loads."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch_size % pc == 0, (global_batch_size, pc)
    per = global_batch_size // pc
    return slice(pi * per, (pi + 1) * per)


def global_batch_from_local(local_batch: Dict[str, Any], mesh: Mesh,
                            global_batch_size: int = None) -> Dict[str, Any]:
    """Assemble per-process numpy arrays into global, data-sharded
    ``jax.Array``s.  Arrays whose leading dim is not the local batch
    (scalars, per-batch constants) are replicated."""
    pc = jax.process_count()

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and (global_batch_size is None
                            or x.shape[0] * pc == global_batch_size):
            gshape = (x.shape[0] * pc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(DATA_AXIS)), x, gshape)
        return jax.device_put(x, NamedSharding(mesh, P()))

    def rec(v):
        if isinstance(v, dict):
            return {k: rec(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return type(v)(rec(x) for x in v)
        return place(v)

    return rec(local_batch)


class HostShardedBatches:
    """Wrap a loader so each process yields only its slice of every global
    batch, then assembles global arrays on the mesh.

    ``loader`` must iterate numpy batches of the FULL global batch size in a
    deterministic order shared by all processes (our loaders seed shuffling
    by ``(seed, epoch)``, so this holds by construction); each process then
    keeps rows ``process_slice(B)``.  For true pod-scale input loading the
    slice can be pushed down into the dataset sampler so each host only
    reads its own rows from disk — the assembly contract here stays the
    same either way.
    """

    def __init__(self, loader, mesh: Mesh):
        self.loader = loader
        self.mesh = mesh

    def set_epoch(self, epoch: int):
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for batch in self.loader:
            sizes = [np.asarray(v).shape[0] for v in jax.tree.leaves(batch)
                     if getattr(v, "ndim", 0) >= 1]
            gbs = max(sizes) if sizes else 0
            sl = process_slice(gbs)

            def take(x):
                x = np.asarray(x)
                return x[sl] if (x.ndim >= 1 and x.shape[0] == gbs) else x

            local = jax.tree.map(take, batch)
            yield global_batch_from_local(local, self.mesh,
                                          global_batch_size=gbs)
