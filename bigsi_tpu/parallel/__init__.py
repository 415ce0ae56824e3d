from bigsi_tpu.parallel.sharding import (
    AXIS_BATCH,
    AXIS_KMERS,
    AXIS_SAMPLES,
    factor_devices,
    make_mesh,
    make_sharded_query_step,
    shard_matrix,
)

__all__ = [
    "AXIS_BATCH",
    "AXIS_KMERS",
    "AXIS_SAMPLES",
    "factor_devices",
    "make_mesh",
    "make_sharded_query_step",
    "shard_matrix",
]
