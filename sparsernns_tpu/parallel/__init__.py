from sparsernns_tpu.parallel.mesh import (MeshConfig, make_mesh,
                                          local_data_shard_info)
from sparsernns_tpu.parallel.sharding import (batch_sharding, param_sharding,
                                              shard_batch, shard_train_state)

__all__ = [
    "MeshConfig", "make_mesh", "local_data_shard_info",
    "param_sharding", "batch_sharding", "shard_batch", "shard_train_state",
]
