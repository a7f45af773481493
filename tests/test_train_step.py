"""Sharded train-step smoke tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig, KDH3D_DEPTH
from popnet_tpu.models import PopNet, RTPoseLight3D, YoloPoseNet
from popnet_tpu.ops import encoders
from popnet_tpu.parallel.mesh import make_mesh, shard_batch
from popnet_tpu.train.state import create_train_state, set_learning_rate, get_learning_rate
from popnet_tpu.train.steps import (
    jit_step_over_mesh,
    make_popnet_train_step,
    make_rtpose_train_step,
    make_yolo_train_step,
)

CFG = EncoderConfig(input_x=64, input_y=64, max_people=4)


def make_batch(rng, batch=8):
    j2 = rng.uniform(5, 59, (batch, CFG.max_people, 15, 2)).astype(np.float32)
    z = rng.uniform(1, 5, (batch, CFG.max_people, 15)).astype(np.float32)
    j3 = np.stack([(j2[..., 0] - 32) / 504 * z, (j2[..., 1] - 32) / 504 * z, z], -1).astype(np.float32)
    bb = np.stack([
        j2[..., 0].min(-1) - 3, j2[..., 1].min(-1) - 3,
        j2[..., 0].max(-1) + 3, j2[..., 1].max(-1) + 3,
    ], -1).astype(np.float32)
    w = np.ones((batch, CFG.max_people), np.float32)
    valid = np.zeros((batch, CFG.max_people), bool)
    valid[:, :2] = True
    depth_resize = rng.uniform(0, 6, (batch, CFG.zgrid_h, CFG.zgrid_w)).astype(np.float32)

    enc = jax.vmap(
        lambda a, b, c, d, e, f: encoders.encode_targets(
            a, b, c, d, e, f, CFG, KDH3D_DEPTH, pose_align=True, with_prior=True
        )
    )(jnp.asarray(j2), jnp.asarray(j3), jnp.asarray(bb), jnp.asarray(w),
      jnp.asarray(valid), jnp.asarray(depth_resize))
    batch_dict = dict(enc)
    batch_dict["image"] = jnp.asarray(
        rng.uniform(-1.5, 1.5, (batch, 64, 64, 1)).astype(np.float32)
    )
    return batch_dict


def _run(model, make_step, batch_keys=None, steps=3):
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    if batch_keys:
        batch = {k: batch[k] for k in batch_keys}
    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), learning_rate=0.05
    )
    step = jit_step_over_mesh(make_step, mesh)
    batch = shard_batch(batch, mesh)
    losses = []
    for _ in range(steps):
        state, logs = step(state, batch)
        losses.append(float(logs["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch -> loss must drop
    return state


def test_popnet_train_step_sharded():
    state = _run(PopNet(), make_popnet_train_step())
    # plateau-driven lr injection works
    state = set_learning_rate(state, 0.01)
    assert abs(get_learning_rate(state) - 0.01) < 1e-6


def test_rtpose_train_step_sharded():
    _run(
        RTPoseLight3D(),
        make_rtpose_train_step(),
        batch_keys=["image", "heatmaps", "pafs", "zmaps", "fg_masks_z"],
    )


def test_yolo_train_step_sharded():
    _run(
        YoloPoseNet(),
        make_yolo_train_step(),
        batch_keys=["image", "prior_map", "prior_mask_conf", "prior_mask_coord", "prior_weight_map"],
    )
