from followmyhold_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    parse_mesh_shape,
    replicate,
    shard_model_params,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "parse_mesh_shape",
    "replicate",
    "shard_model_params",
]
