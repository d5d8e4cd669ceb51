"""Parallelism: device mesh + sharding rules (SURVEY.md §2 parallelism
table, §5 'Distributed communication backend')."""

from samplernn_pase_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
)
