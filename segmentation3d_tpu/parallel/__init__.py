from segmentation3d_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, data_sharding, make_global_batch,
)
