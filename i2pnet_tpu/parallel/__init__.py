from i2pnet_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    replicate_spec,
    batch_spec,
    shard_train_step,
    shard_train_step_spatial,
    shard_batch,
    shard_batch_spatial,
    spatial_batch_specs,
)
from i2pnet_tpu.parallel.distributed import (
    maybe_initialize_distributed,
    process_info,
    host_batch_slice,
    make_global_batch,
)
