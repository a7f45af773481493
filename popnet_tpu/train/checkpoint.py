"""Orbax checkpointing of the FULL train state.

Upgrades the reference's best-val model-only torch.save (reference:
train_rtpose_light3d_kdh3d.py:335-338 — optimizer/scheduler/epoch were NOT
saved) to full-state checkpoints with resume.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

# one live manager per directory: constructing a CheckpointManager per save
# leaks its background threads and eventually deadlocks long runs
_MANAGERS: dict[str, "ocp.CheckpointManager"] = {}


def _manager(directory: str, keep: int = 3) -> "ocp.CheckpointManager":
    directory = os.path.abspath(directory)
    if directory not in _MANAGERS:
        _MANAGERS[directory] = ocp.CheckpointManager(
            directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
        )
    return _MANAGERS[directory]


def save_checkpoint(directory: str, state, step: int, metadata: dict | None = None,
                    keep: int = 3):
    mngr = _manager(directory, keep)
    payload = {
        "state": ocp.args.StandardSave(state),
        # always present so restore never has to guess the checkpoint shape
        "metadata": ocp.args.JsonSave(metadata if metadata is not None else {}),
    }
    mngr.save(step, args=ocp.args.Composite(**payload))
    mngr.wait_until_finished()


def restore_checkpoint(directory: str, abstract_state: Any, step: int | None = None):
    """Restore (state, metadata, step); abstract_state is a same-structure
    pytree (e.g. a freshly created TrainState) used as the restore template."""
    mngr = _manager(directory)
    if step is None:
        step = mngr.latest_step()
    restored = mngr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract_state),
            metadata=ocp.args.JsonRestore(),
        ),
    )
    return restored["state"], restored.get("metadata"), step


def restore_params(directory: str, step: int | None = None):
    """Restore only (params, batch_stats, metadata, step), template-free.

    Evaluation / serving must not have to reconstruct the training-time
    optimizer tree to read a checkpoint (the reference's torch.load has the
    same property): the checkpoint is restored as saved — whatever optimizer
    wrote it — and only the model leaves are returned.
    """
    mngr = _manager(directory)
    if step is None:
        step = mngr.latest_step()
    restored = mngr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(),
            metadata=ocp.args.JsonRestore(),
        ),
    )
    raw = restored["state"]
    return raw["params"], raw.get("batch_stats"), restored.get("metadata"), step
