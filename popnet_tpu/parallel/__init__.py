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
