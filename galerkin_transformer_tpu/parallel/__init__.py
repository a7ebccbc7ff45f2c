from .mesh import (make_mesh, batch_sharding, replicate, shard_batch,
                   init_distributed)
from .galerkin import seq_sharded_galerkin_attention

__all__ = ["make_mesh", "batch_sharding", "replicate", "shard_batch",
           "init_distributed",
           "seq_sharded_galerkin_attention"]
