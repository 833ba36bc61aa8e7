"""Multi-device execution: meshes, shardings, collective Gauss-Newton."""

from dynamicfuion_python_tpu.parallel.spmd import (
    fusion_mesh,
    replicate,
    shard_pixel_rows,
    shard_blocks,
    distributed_fit_step,
)

__all__ = [
    "fusion_mesh",
    "replicate",
    "shard_pixel_rows",
    "shard_blocks",
    "distributed_fit_step",
]
