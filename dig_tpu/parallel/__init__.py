"""Multi-chip parallelism: device meshes, data-parallel sharding, and the
partitioned large-graph path (METIS-style partition + halo exchange over
ICI collectives).

The reference has no distributed backend at all (SURVEY.md §2.10): its only
"scale" machinery is dig/lsgraph's single-GPU historical-embedding cache
with host<->device cudaMemcpyAsync (``dig/lsgraph/method/GraphFMOB/csrc/``).
Here that role is played by XLA collectives over a ``jax.sharding.Mesh``:

* ``mesh``        — mesh construction + NamedSharding helpers + DP batching.
* ``partition``   — host-side graph partitioner (greedy BFS / C++ METIS-style
                    refinement) replacing ``torch.ops.torch_sparse.partition``.
* ``halo``        — shard_map halo exchange: each shard owns a node range,
                    aggregates local edges, and all-to-alls boundary features
                    over ICI, overlapped with local segment-sum.
"""
from .mesh import (
    make_mesh,
    shard_graph_batch,
    replicate,
    data_parallel_sharding,
    concat_local_shards,
)
from .partition import partition_graph, PartitionedGraph, build_partitions
from .halo import (halo_exchange_sum, halo_exchange_sum_ring,
                   partitioned_spmm, build_exchange_plan, build_ring_plan)
from .dp import make_dp_train_step, make_dp_eval_step
from .gp import (GPGraph, prepare_gp_graph, slab_layout,
                 make_gp_train_step, make_gp_engine,
                 GPLocalGraph, unslab_layout)
from .tp import (make_tp_train_step, make_tp_eval_step, tp_param_specs,
                 tp_shard)
from .pp import make_pp_train_step, pipeline_apply, pp_shard_params
from .ep import (make_ep_moe, init_moe_params, ep_shard_params,
                 moe_dense_reference)

__all__ = [
    "make_mesh", "shard_graph_batch", "replicate", "data_parallel_sharding",
    "concat_local_shards",
    "partition_graph", "PartitionedGraph", "build_partitions",
    "halo_exchange_sum", "halo_exchange_sum_ring", "partitioned_spmm",
    "build_exchange_plan", "build_ring_plan",
    "make_dp_train_step", "make_dp_eval_step",
    "GPGraph", "prepare_gp_graph", "slab_layout", "make_gp_train_step",
    "make_gp_engine", "GPLocalGraph", "unslab_layout",
    "make_tp_train_step", "make_tp_eval_step", "tp_param_specs", "tp_shard",
    "make_pp_train_step", "pipeline_apply", "pp_shard_params",
    "make_ep_moe", "init_moe_params", "ep_shard_params",
    "moe_dense_reference",
]
