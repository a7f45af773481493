from popnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from popnet_tpu.parallel.distributed import initialize, global_data_mesh  # noqa: F401
from popnet_tpu.parallel.tensor import (  # noqa: F401
    jit_step_tensor_parallel,
    make_mesh_2d,
    shard_state,
    state_shardings,
)
from popnet_tpu.parallel.spatial import (  # noqa: F401
    jit_forward_spatial,
    jit_step_spatial,
    make_spatial_mesh,
    replicate_state,
    shard_batch_spatial,
)
