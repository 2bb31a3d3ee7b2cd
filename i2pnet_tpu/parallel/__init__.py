from i2pnet_tpu.parallel.mesh import (
    make_mesh,
    replicate_spec,
    batch_spec,
    shard_train_step,
    shard_batch,
)
