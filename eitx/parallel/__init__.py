from .mesh import make_device_mesh
from .shard import (
    shard_batch,
    shard_params_fsdp,
    sharded_eit_monitoring,
    sharded_segment_labels,
)

__all__ = [
    "make_device_mesh",
    "shard_batch",
    "shard_params_fsdp",
    "sharded_eit_monitoring",
    "sharded_segment_labels",
]
