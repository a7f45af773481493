"""Overfit sanity: training must drive decoded predictions onto the GT.

Overfits YoloPoseNet on one small synthetic batch, then decodes the prior
map and checks the recovered joints sit near the encoded GT — the full
train -> loss -> weights -> decode loop is consistent end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig, KDH3D_DEPTH
from popnet_tpu.decode import prior as prior_decode
from popnet_tpu.models import YoloPoseNet
from popnet_tpu.ops import encoders
from popnet_tpu.train.state import create_train_state
from popnet_tpu.train.steps import make_yolo_train_step

CFG = EncoderConfig(input_x=64, input_y=64, max_people=2)


@pytest.mark.slow
def test_yolo_overfit_decodes_gt():
    rng = np.random.default_rng(0)
    B = 4
    j2 = np.zeros((B, 2, 15, 2), np.float32)
    for b in range(B):
        for p, cx in enumerate((20, 44)):
            j2[b, p] = np.clip(
                np.array([cx, 32]) + rng.normal(0, 7, (15, 2)), 2, 61
            )
    z = rng.uniform(2, 4, (B, 2, 15)).astype(np.float32)
    j3 = np.stack([(j2[..., 0] - 32) / 504 * z, (j2[..., 1] - 32) / 504 * z, z], -1)
    bb = np.stack([
        j2[..., 0].min(-1) - 2, j2[..., 1].min(-1) - 2,
        j2[..., 0].max(-1) + 2, j2[..., 1].max(-1) + 2,
    ], -1).astype(np.float32)
    w = np.ones((B, 2), np.float32)
    valid = np.ones((B, 2), bool)
    dr = np.full((B, CFG.zgrid_h, CFG.zgrid_w), 5.0, np.float32)

    enc = jax.vmap(
        lambda a, b_, c, d, e, f: encoders.encode_targets(
            a, b_, c, d, e, f, CFG, KDH3D_DEPTH, pose_align=False, with_prior=True
        )
    )(jnp.asarray(j2), jnp.asarray(j3), jnp.asarray(bb), jnp.asarray(w),
      jnp.asarray(valid), jnp.asarray(dr))
    # render an informative depth image (blobs at the joints over a far
    # background): background-cell conf suppression must be learnable from
    # signal, not memorized from noise — a noise input makes the overfit
    # seed-fragile (spurious high-conf neighbor cells win NMS)
    imgs = np.full((B, 64, 64), 5.5, np.float32)
    ys, xs = np.mgrid[0:64, 0:64]
    for b in range(B):
        for p in range(2):
            for k in range(15):
                m = (np.abs(xs - j2[b, p, k, 0]) < 3) & (np.abs(ys - j2[b, p, k, 1]) < 3)
                imgs[b][m] = z[b, p, k]
    imgs = (imgs - KDH3D_DEPTH.mean) / KDH3D_DEPTH.std
    batch = {
        "image": jnp.asarray(imgs[..., None]),
        "prior_map": enc["prior_map"],
        "prior_mask_conf": enc["prior_mask_conf"],
        "prior_mask_coord": enc["prior_mask_coord"],
        "prior_weight_map": enc["prior_weight_map"],
    }

    model = YoloPoseNet()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), learning_rate=0.05
    )
    step = jax.jit(make_yolo_train_step())
    loss0 = None
    for i in range(800):
        state, logs = step(state, batch)
        if i == 0:
            loss0 = float(logs["loss"])
    assert float(logs["loss"]) < 0.05 * loss0

    pred = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], train=False,
    )
    _, humans, _ = prior_decode.parse_prior_pose(
        pred, np.array(CFG.anchors, np.float32), 15, 64, 64, KDH3D_DEPTH,
        conf_threshold=0.8, nms_threshold=0.5,
    )
    # each GT person must be recovered by some detection with low joint
    # error (partially-converged neighbor cells may add a few extras — the
    # reference's plain-MSE conf loss converges them to 0 only slowly)
    errs = []
    for b in range(B):
        assert 2 <= len(humans[b]) <= 4, f"image {b}: {len(humans[b])} people"
        for p in range(2):
            best = min(
                np.mean(np.linalg.norm(np.asarray(h)[:, :2] - j2[b, p], axis=1))
                for h in humans[b]
            )
            errs.append(best)
    assert np.mean(errs) < 3.0, f"mean joint error {np.mean(errs):.2f}px"
