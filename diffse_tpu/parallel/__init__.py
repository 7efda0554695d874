from .mesh import (
    make_mesh,
    batch_sharding,
    microbatch_sharding,
    stacked_batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    initialize_distributed,
)
from .sequence import (
    make_seq_mesh,
    spec_seq_sharding,
    constrain_frames,
)
from .model_sharding import (
    make_2d_mesh,
    leaf_partition_spec,
    tree_shardings,
    shard_tree,
    shard_state,
    shard_variables,
    state_shardings,
    variables_shardings,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "microbatch_sharding",
    "stacked_batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "initialize_distributed",
    "make_seq_mesh",
    "spec_seq_sharding",
    "constrain_frames",
    "make_2d_mesh",
    "leaf_partition_spec",
    "tree_shardings",
    "shard_tree",
    "shard_state",
    "shard_variables",
    "state_shardings",
    "variables_shardings",
]
