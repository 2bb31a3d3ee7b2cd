from i2pnet_tpu.parallel.mesh import (
    make_mesh,
    replicate_spec,
    batch_spec,
    shard_train_step,
    shard_batch,
)
from i2pnet_tpu.parallel.distributed import (
    maybe_initialize_distributed,
    process_info,
    host_batch_slice,
    make_global_batch,
)
