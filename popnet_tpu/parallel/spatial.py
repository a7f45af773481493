"""Spatial (height-sharded) partitioning over a ("data", "spatial") mesh.

The reference has no story for frames that exceed one accelerator's memory
— it downsamples 512x480 Kinect frames to 224x224 before the CNN ever sees
them (reference: train_rtpose_light3d_kdh3d.py:298-305). The analogous
"long-context" axis of this workload is *spatial extent* (SURVEY §2.6/§5):
if full-resolution 512x480 maps (or larger mosaics) must flow through the
CNNs, the TPU-native answer is GSPMD spatial partitioning, not tiling on
the host.

Mechanism — all XLA, no hand-written halo code:

- the NHWC image batch is laid out with the batch dim sharded over "data"
  and the *height* dim sharded over "spatial"
  (``PartitionSpec("data", "spatial")``);
- XLA/GSPMD propagates that layout through the conv stack and inserts the
  halo exchanges (collective-permutes of kernel-overlap rows over ICI) that
  SAME/explicit-padded and strided convs need at shard boundaries;
- BatchNorm in inference mode is elementwise (running stats), so it shards
  for free; in train mode XLA turns the batch/spatial reductions of the
  statistics into cross-replica reductions automatically;
- dense-map outputs are gathered back to data-only sharding at the jit
  boundary (the decode stack is batch-parallel).

Sharding is layout, not semantics: the spatially-partitioned program
computes the same values as the unsharded one
(tests/test_spatial_parallel.py pins forward parity and DP == SP train-step
loss parity on the virtual CPU mesh).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(n_spatial: int = 2, devices=None,
                      axis_names=("data", "spatial")) -> Mesh:
    """2-D mesh (n_devices/n_spatial, n_spatial). Like the tensor-parallel
    mesh, the "spatial" axis should map to the fastest ICI links (halo
    exchanges are neighbor traffic): the trailing dim of jax.devices()."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_spatial:
        raise ValueError(f"{n} devices not divisible by n_spatial={n_spatial}")
    return Mesh(np.array(devices).reshape(n // n_spatial, n_spatial), axis_names)


def _batch_spec(leaf, n_spatial: int, data_axis: str, spatial_axis: str) -> P:
    """NHWC image/map leaves get (data, spatial) on (batch, height); every
    other batch leaf is sharded over data only. Divisibility-gated so
    GSPMD never pads a ragged height shard."""
    shape = getattr(leaf, "shape", ())
    if len(shape) == 4 and shape[1] % n_spatial == 0:
        return P(data_axis, spatial_axis)
    return P(data_axis)


def shard_batch_spatial(batch, mesh: Mesh, data_axis: str = "data",
                        spatial_axis: str = "spatial"):
    """Device-put a pytree of (B, ...) arrays with images height-sharded."""
    n_spatial = mesh.shape[spatial_axis]
    return jax.tree.map(
        lambda x: jax.device_put(
            x,
            NamedSharding(mesh, _batch_spec(x, n_spatial, data_axis, spatial_axis)),
        ),
        batch,
    )


def jit_forward_spatial(apply_fn, mesh: Mesh, data_axis: str = "data",
                        spatial_axis: str = "spatial"):
    """Jit ``apply_fn(image)`` with the NHWC input height-sharded.

    GSPMD keeps the conv stack spatially partitioned (each device holds a
    horizontal band of every activation) and the outputs are gathered to
    data-only sharding for the batch-parallel decode stack.
    """
    in_sh = NamedSharding(mesh, P(data_axis, spatial_axis))
    out_sh = NamedSharding(mesh, P(data_axis))
    return jax.jit(apply_fn, in_shardings=(in_sh,), out_shardings=out_sh)


def replicate_state(state, mesh: Mesh):
    """Device-put every array leaf of a train state replicated on the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), state)


def jit_step_spatial(step, mesh: Mesh):
    """Jit a train step (state, batch) -> (state, logs) whose inputs carry
    their shardings: pair with replicate_state (params/opt replicated) and
    shard_batch_spatial (image/map leaves height-sharded — a mixed-spec
    pytree, so placement rides the arrays instead of an in_shardings tree).
    Drop-in alternative to train.steps.jit_step_over_mesh when one chip
    cannot hold the full-resolution activations."""
    repl = NamedSharding(mesh, P())
    return jax.jit(step, out_shardings=(repl, repl), donate_argnums=(0,))
