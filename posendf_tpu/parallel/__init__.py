from posendf_tpu.parallel.mesh import (
    P,
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["P", "data_sharding", "make_mesh", "replicated", "shard_batch"]
