from care_tpu.parallel.mesh import (
    make_mesh, shard_batch, shard_params, param_pspec, DATA_AXIS, MODEL_AXIS)
from care_tpu.parallel.input import (
    process_slice, global_batch_from_local, HostShardedBatches)

__all__ = ["make_mesh", "shard_batch", "shard_params", "param_pspec",
           "DATA_AXIS", "MODEL_AXIS", "process_slice",
           "global_batch_from_local", "HostShardedBatches"]
