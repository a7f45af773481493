"""Device mesh + sharding helpers.

The reference's entire distributed story is single-process
torch.nn.DataParallel (reference: train_rtpose_light3d_kdh3d.py:310,
lib/config/default.py:16). The TPU-native replacement is a
jax.sharding.Mesh with batch-sharded inputs and replicated parameters:
XLA inserts the ICI all-reduce for gradients, so there is no hand-written
communication layer at all.

Axes: "data" (batch parallelism). Models here are <15 M params, so tensor /
pipeline axes are unnecessary; the helpers still accept an arbitrary mesh
shape so a ("data", "model") mesh can be formed when wanted.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of (B, ...) arrays batch-sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
