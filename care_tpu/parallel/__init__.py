from care_tpu.parallel.mesh import (
    make_mesh, shard_batch, shard_params, param_pspec, DATA_AXIS, MODEL_AXIS)

__all__ = ["make_mesh", "shard_batch", "shard_params", "param_pspec",
           "DATA_AXIS", "MODEL_AXIS"]
