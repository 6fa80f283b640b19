from posendf_tpu.parallel.mesh import (
    P,
    data_sharding,
    init_distributed,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["P", "data_sharding", "init_distributed", "make_mesh",
           "replicated", "shard_batch"]
