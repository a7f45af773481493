from popnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from popnet_tpu.parallel.distributed import initialize, global_data_mesh  # noqa: F401
