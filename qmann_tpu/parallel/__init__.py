from qmann_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from qmann_tpu.parallel.sharding import (
    axis_if_divisible, param_shardings, batch_shardings, shard_params,
    shard_batch, make_sharded_train_step, make_sharded_eval_step,
    shard_prepared, make_sharded_prepared_infer,
)
from qmann_tpu.parallel.distributed import memory_sharded_attention_read
from qmann_tpu.parallel.explicit import make_explicit_train_step

__all__ = [
    "make_mesh", "DATA_AXIS", "MODEL_AXIS",
    "axis_if_divisible",
    "param_shardings", "batch_shardings", "shard_params", "shard_batch",
    "make_sharded_train_step", "make_sharded_eval_step",
    "shard_prepared", "make_sharded_prepared_infer",
    "memory_sharded_attention_read", "make_explicit_train_step",
]
