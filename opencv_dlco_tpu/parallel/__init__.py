from .mesh import make_mesh, data_axis, model_axis
from .distributed import distributed_init, host_info, is_primary
from .sharding import (
    distance_sharding,
    replicated,
    shard_distance_matrix,
    pr_train_chunk_sharded,
    pj_train_chunk_sharded,
    ring_distances_sharded,
)
from .sweep import run_pr_sweep, run_pj_sweep

__all__ = [
    "distributed_init", "host_info", "is_primary",
    "make_mesh",
    "data_axis",
    "model_axis",
    "distance_sharding",
    "replicated",
    "shard_distance_matrix",
    "pr_train_chunk_sharded",
    "pj_train_chunk_sharded",
    "ring_distances_sharded",
    "run_pr_sweep",
    "run_pj_sweep",
]
