from sapcu_tpu.parallel.mesh import (
    data_parallel_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
    pad_to_multiple,
)

__all__ = [
    "data_parallel_mesh", "batch_sharding", "replicated", "shard_batch",
    "replicate_tree", "pad_to_multiple",
]
