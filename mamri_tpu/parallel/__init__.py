from mamri_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    sharded_batched_pipeline,
)

__all__ = ["make_mesh", "batch_sharding", "sharded_batched_pipeline"]
