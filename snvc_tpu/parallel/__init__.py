from snvc_tpu.parallel.api import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_instance_batch,
)
