from lanedetection_end2end_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    data_axes,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
