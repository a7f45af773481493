"""Tensor-parallel (2-D data x model mesh) train-step parity tests.

The reference has no model parallelism (DataParallel only); this pins the
TPU-native channel-sharded layout (parallel/tensor.py): the SAME train step
run (a) data-parallel on a 1-D 8-device mesh and (b) on a (4, 2)
data x model mesh with conv kernels output-channel-sharded and optimizer
moments sharded alike, must produce the same losses and the same updated
parameters — GSPMD collectives are an implementation detail, not a
numerics change.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from popnet_tpu.models import PopNet
from popnet_tpu.parallel.mesh import make_mesh, shard_batch
from popnet_tpu.parallel.tensor import (
    jit_step_tensor_parallel,
    make_mesh_2d,
    shard_state,
    state_shardings,
)
from popnet_tpu.train.state import create_train_state
from popnet_tpu.train.steps import jit_step_over_mesh, make_popnet_train_step

from tests.test_train_step import make_batch


def _fresh_state():
    return create_train_state(
        PopNet(), jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)),
        learning_rate=0.05,
    )


def test_tensor_parallel_matches_data_parallel():
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    step = make_popnet_train_step()

    # (a) 1-D data-parallel reference run
    mesh1 = make_mesh()
    state_dp = _fresh_state()
    step_dp = jit_step_over_mesh(step, mesh1)
    state_dp, logs_dp = step_dp(state_dp, shard_batch(batch, mesh1))
    loss_dp = float(logs_dp["loss"])

    # (b) (4, 2) data x model mesh, channel-sharded params + moments
    mesh2 = make_mesh_2d(n_model=2)
    state_tp = shard_state(_fresh_state(), mesh2)
    # the sharding rule must actually shard something: at least one conv
    # kernel carries "model" on its trailing (output-channel) dim
    specs = jax.tree_util.tree_leaves(
        jax.tree.map(lambda s: s.spec, state_shardings(state_tp, mesh2))
    )
    assert any(spec and spec[-1] == "model" for spec in specs)
    step_tp = jit_step_tensor_parallel(step, mesh2, state_tp)
    batch_tp = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(mesh2, P("data"))
        ),
        batch,
    )
    state_tp, logs_tp = step_tp(state_tp, batch_tp)
    loss_tp = float(logs_tp["loss"])

    assert np.isfinite(loss_dp)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)

    # updated parameters agree leaf-by-leaf (gather the sharded ones)
    flat_dp = jax.tree_util.tree_flatten_with_path(state_dp.params)[0]
    flat_tp = jax.tree_util.tree_flatten_with_path(state_tp.params)[0]
    assert len(flat_dp) == len(flat_tp)
    for (path_d, leaf_d), (path_t, leaf_t) in zip(flat_dp, flat_tp):
        assert path_d == path_t
        np.testing.assert_allclose(
            np.asarray(leaf_d), np.asarray(leaf_t), atol=2e-5,
            err_msg=jax.tree_util.keystr(path_d),
        )

    # conv kernels really live sharded on device after the update
    sharded = [
        l for l in jax.tree_util.tree_leaves(state_tp.params)
        if getattr(l.sharding, "spec", P()) and l.sharding.spec[-1] == "model"
    ]
    assert sharded, "no parameter ended up model-sharded"


def test_second_step_runs_and_descends():
    rng = np.random.default_rng(4)
    batch = make_batch(rng)
    mesh2 = make_mesh_2d(n_model=2)
    state = shard_state(_fresh_state(), mesh2)
    step = jit_step_tensor_parallel(make_popnet_train_step(), mesh2, state)
    batch = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(mesh2, P("data"))
        ),
        batch,
    )
    state, logs0 = step(state, batch)
    state, logs1 = step(state, batch)
    assert float(logs1["loss"]) < float(logs0["loss"])
