"""Tensor-parallel (channel-sharded) training over a 2-D ("data", "model") mesh.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference: train_rtpose_light3d_kdh3d.py:310); it has no model-parallel
story at all. The TPU-native extension here is GSPMD tensor parallelism:

- every large conv kernel's *output-channel* dimension is sharded over the
  "model" mesh axis (``PartitionSpec(..., "model")`` on the trailing dim);
- XLA/GSPMD propagates: activations become channel-sharded, the next conv
  contracts over the sharded input-channel dim and XLA inserts the
  reduce-scatter / all-gather over ICI — no hand-written collectives;
- optimizer moments (SGD trace / Adam mu,nu) have the same shapes as the
  params, so the same per-leaf rule shards them identically: optimizer
  state memory scales down with the model axis (ZeRO-style), for free;
- the batch stays sharded over "data", gradients are all-reduced over the
  "data" axis by XLA exactly as in the 1-D DP path (train/steps.py).

Use a 2-D mesh when a model's activations are too large for one chip's HBM
at the target batch (RGB trunks at high resolution), or to scale serving
latency down; for the <15 M-param depth models pure DP is usually optimal
— this module exists so the same train step runs under either layout
unchanged (tests/test_tensor_parallel.py pins DP == TP loss parity).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_model: int = 2, devices=None,
                 axis_names=("data", "model")) -> Mesh:
    """2-D mesh: all (or the given) devices reshaped to (n_devices/n_model,
    n_model). The "model" axis should map to the fastest ICI links; on a
    v5e pod slice that is the innermost torus dimension, which is also the
    trailing dimension of jax.devices() order."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_model:
        raise ValueError(f"{n} devices not divisible by n_model={n_model}")
    return Mesh(np.array(devices).reshape(n // n_model, n_model), axis_names)


def _leaf_spec(leaf, n_model: int, model_axis: str, min_size: int) -> P:
    """Shard the trailing (feature/output-channel) dim over the model axis
    when it divides evenly and the leaf is big enough to be worth it.

    The rule is shape-based so it applies identically to params and to the
    optimizer moments that mirror them; small leaves (biases, BN scales,
    running stats, scalar hyperparams) stay replicated — GSPMD handles the
    mixed layout.
    """
    shape = getattr(leaf, "shape", ())
    size = int(np.prod(shape)) if shape else 1
    if len(shape) >= 1 and shape[-1] % n_model == 0 and size >= min_size:
        return P(*([None] * (len(shape) - 1) + [model_axis]))
    return P()


def state_shardings(state, mesh: Mesh, model_axis: str = "model",
                    min_size: int = 8192):
    """Per-leaf NamedSharding pytree for a TrainState (params, batch stats,
    optimizer moments, scalars) under the channel-sharding rule."""
    n_model = mesh.shape[model_axis]
    return jax.tree.map(
        lambda l: NamedSharding(
            mesh, _leaf_spec(l, n_model, model_axis, min_size)
        ),
        state,
    )


def jit_step_tensor_parallel(step, mesh: Mesh, state,
                             data_axis: str = "data",
                             model_axis: str = "model",
                             min_size: int = 8192):
    """Jit a train step with channel-sharded params/moments and a
    data-sharded batch. In/out state shardings are identical so the input
    state buffer is donated."""
    st_sh = state_shardings(state, mesh, model_axis, min_size)
    batch_sh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(st_sh, batch_sh),
        out_shardings=(st_sh, repl),
        donate_argnums=(0,),
    )


def shard_state(state, mesh: Mesh, model_axis: str = "model",
                min_size: int = 8192):
    """Device-put a TrainState onto the mesh under the channel-sharding
    rule (the host-side twin of jit_step_tensor_parallel's in_shardings)."""
    sh = state_shardings(state, mesh, model_axis, min_size)
    return jax.tree.map(jax.device_put, state, sh)
