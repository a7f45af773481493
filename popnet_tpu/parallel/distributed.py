"""Multi-host initialization for DCN-spanning meshes.

The reference has no multi-node story (SURVEY §2.6: single-process
DataParallel only). The TPU-native equivalent is jax.distributed +
a mesh over all global devices; XLA lowers collectives over ICI within a
slice and DCN across slices — no hand-written communication layer.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger(__name__)


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-process JAX.

    With no arguments this probes the pod environment: a failure is
    LOGGED and reported as False (single-process fallback), never
    silently swallowed. With explicit arguments the caller asked for a
    real pod init, so any failure propagates."""
    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as e:
            log.info("jax.distributed auto-init unavailable (%s); "
                     "running single-process", e)
            return False
        return True
    # explicit request: do NOT mask failures
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_data_mesh(axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def per_process_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
