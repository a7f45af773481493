"""MPII parsing + RGB PoP-Net loss."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from popnet_tpu.data import mpii
from popnet_tpu.losses import popnet_rgb_loss
from popnet_tpu.models import PopNetRGB


def test_prepare_mpii_labels(tmp_path):
    annos = [
        {"image": "a.jpg", "joints": [[1.0, 2.0]] * 16, "joints_vis": [1] * 16},
        {"image": "a.jpg", "joints": [[5.0, 6.0]] * 16, "joints_vis": [0] * 16},
        {"image": "b.jpg", "joints": [[7.0, 8.0]] * 16, "joints_vis": [1] * 16},
    ]
    p = tmp_path / "train.json"
    json.dump(annos, open(p, "w"))
    labels = mpii.prepare_mpii_labels(str(p))
    assert set(labels) == {"a.jpg", "b.jpg"}
    assert len(labels["a.jpg"]) == 2


def test_visibility_from_border():
    anns = [{"2d_joints": [[1.0, 50.0], [50.0, 50.0], [250.0, 50.0]] ,
             "visible_joints": [1, 0, 1]}]
    out = mpii.assign_visibility_from_border(anns, 100, 200, margin=3)
    assert out[0]["visible_joints"] == [0, 1, 0]
    out2 = mpii.assign_visibility_from_border(anns, 100, 200, intersect_gt=True)
    assert out2[0]["visible_joints"] == [0, 0, 0]


def test_mpii_limb_table():
    assert len(mpii.MPII_LIMBS) == 15
    assert len(mpii.MPII_SWAP_INDICES) == 16
    # swap is an involution
    s = np.asarray(mpii.MPII_SWAP_INDICES)
    assert (s[s] == np.arange(16)).all()


def test_popnet_rgb_loss_runs_and_grads():
    K = 16
    model = PopNetRGB(num_parts=K)
    x = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    (_, rgb_saved) = model.apply(v, x, train=False)

    rng = np.random.default_rng(0)
    b, h, w = 2, 8, 8
    heat_gt = jnp.asarray(rng.uniform(0, 1, (b, h, w, K + 1)).astype(np.float32))
    align_gt = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2 * K)).astype(np.float32))
    fg_align = jnp.asarray((rng.uniform(size=(b, h, w, 2 * K)) > 0.5).astype(np.float32))
    A = 2
    naf = 5 + 3 * K  # x, y, vis per joint (no z in RGB)
    prior_gt = jnp.asarray(rng.uniform(-1, 1, (b, 4, 4, A * naf)).astype(np.float32))
    mconf = jnp.asarray(rng.uniform(0, 1, (b, 4, 4, A)).astype(np.float32))
    mcoord = jnp.asarray((rng.uniform(size=(b, 4, 4, A)) > 0.7).astype(np.float32))

    loss, logs = popnet_rgb_loss(
        rgb_saved, heat_gt, align_gt, fg_align, prior_gt, mconf, mcoord, K
    )
    assert np.isfinite(float(loss))
    assert {"loss_prior", "loss_bbox", "loss_obj", "loss_selfpose"} <= set(logs)
