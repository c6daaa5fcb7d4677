from mug_diffusion_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
