"""Batched MPII RGB dataset: GT targets golden vs the reference
MPII_Keypoints (lib/datasets/datasets_mpii_new.py:413-517) and the
PopNetRGB training loop closing end to end."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from tests.reference_shim import load_cr_module

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.data.mpii import (
    MPII_LIMBS,
    MPII_NUM_JOINTS,
    MPIIKeypointsDataset,
    encode_mpii_batch,
    mpii_anchors,
)


def _random_anns(rng, h, w, n_people=3):
    anns = []
    for _ in range(n_people):
        j = np.stack(
            [rng.uniform(-5, w + 5, MPII_NUM_JOINTS),
             rng.uniform(-5, h + 5, MPII_NUM_JOINTS)], axis=1
        )
        vis = rng.choice([-1, 0, 1], MPII_NUM_JOINTS, p=[0.1, 0.2, 0.7])
        anns.append({"2d_joints": j, "visible_joints": vis})
    return anns


@pytest.mark.reference
def test_mpii_gt_targets_golden():
    ref = load_cr_module(
        "ref_datasets_mpii_new",
        "third_party_methods/lib/datasets/datasets_mpii_new.py",
    )
    h = w = 64
    stride, stride_prior, align_radius = 8, 16, 3
    anchors = mpii_anchors(h, stride_prior)

    rk = ref.MPII_Keypoints.__new__(ref.MPII_Keypoints)
    rk.input_y, rk.input_x = h, w
    rk.stride, rk.strideA, rk.stride_prior = stride, stride, stride_prior
    rk.anchors = np.asarray(anchors)
    rk.align_radius = align_radius
    rk.num_joints = MPII_NUM_JOINTS
    rk.joint_names = list(range(MPII_NUM_JOINTS))

    rng = np.random.default_rng(0)
    anns = _random_anns(rng, h, w)
    (r_heat, r_align, r_fg, r_prior, r_mconf, r_mcoord, r_wmap) = (
        rk.get_ground_truth([dict(a) for a in anns])
    )

    ecfg = EncoderConfig(
        input_x=w, input_y=h, stride=stride, stride_align=stride,
        stride_prior=stride_prior, align_radius=align_radius,
        num_joints=MPII_NUM_JOINTS, num_limbs=len(MPII_LIMBS),
        anchors=anchors, max_people=4,
    )
    P = 4
    j2 = np.full((1, P, MPII_NUM_JOINTS, 2), -1.0)
    vis = np.zeros((1, P, MPII_NUM_JOINTS), np.float32)
    valid = np.zeros((1, P), bool)
    boxes = np.zeros((1, P, 4), np.float32)
    weights = np.ones((1, P), np.float32)
    row = 0
    for a in anns:
        v = (np.asarray(a["visible_joints"]) != 0).astype(np.float32)
        if v.sum() == 0:
            continue  # reference drops people with no visible joints
        j = np.asarray(a["2d_joints"], np.float64)
        jv = j[v > 0]
        boxes[0, row] = [jv[:, 0].min() - 10, jv[:, 1].min() - 10,
                         jv[:, 0].max() + 10, jv[:, 1].max() + 10]
        j2[0, row], vis[0, row], valid[0, row] = j, v, True
        row += 1

    out = encode_mpii_batch(
        jnp.asarray(j2, jnp.float32), jnp.asarray(vis), jnp.asarray(valid),
        jnp.asarray(boxes), jnp.asarray(weights), ecfg,
    )
    np.testing.assert_allclose(np.asarray(out["heatmaps"][0]), r_heat, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["align_maps"][0]), r_align, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["fg_masks_align"][0]), r_fg, atol=0)
    np.testing.assert_allclose(np.asarray(out["prior_map"][0]), r_prior, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["prior_mask_conf"][0]), r_mconf, atol=0)
    np.testing.assert_allclose(np.asarray(out["prior_mask_coord"][0]), r_mcoord, atol=0)
    np.testing.assert_allclose(np.asarray(out["prior_weight_map"][0]), r_wmap, atol=0)


def _write_tiny_mpii(tmp_path, n_images=2, h=80, w=96):
    import cv2

    rng = np.random.default_rng(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    annos = []
    for i in range(n_images):
        fname = f"m{i:03d}.jpg"
        cv2.imwrite(
            str(img_dir / fname),
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        )
        for _ in range(2):
            j = np.stack(
                [rng.uniform(5, w - 5, MPII_NUM_JOINTS),
                 rng.uniform(5, h - 5, MPII_NUM_JOINTS)], 1
            )
            annos.append({
                "image": fname,
                "joints": j.tolist(),
                "joints_vis": [1] * MPII_NUM_JOINTS,
            })
    ann_file = tmp_path / "mpii.json"
    ann_file.write_text(json.dumps(annos))
    return str(img_dir), str(ann_file)


def test_mpii_dataset_batches_and_train_step(tmp_path):
    """Dataset batch -> PopNetRGB -> popnet_rgb_loss -> one gradient step
    decreases the loss (the reference ships MPII_Keypoints library-only,
    with no train script — this closes the RGB PoP-Net loop)."""
    import jax
    import optax

    from popnet_tpu.losses import popnet_rgb_loss
    from popnet_tpu.models.popnet import PopNetRGB

    img_dir, ann_file = _write_tiny_mpii(tmp_path)
    ds = MPIIKeypointsDataset(
        img_dir, ann_file, input_y=64, input_x=64, max_people=4,
        is_train=True, hflip=True, seed=0,
    )
    assert len(ds) == 2
    b = ds.get_batch([0, 1])
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["heatmaps"].shape == (2, 8, 8, MPII_NUM_JOINTS + 1)
    assert b["align_maps"].shape == (2, 8, 8, 2 * MPII_NUM_JOINTS)
    A = len(mpii_anchors(64))
    assert b["prior_map"].shape == (2, 4, 4, A * (5 + 3 * MPII_NUM_JOINTS))
    # the visibility slots of assigned cells are 0/1
    vis_block = np.asarray(b["prior_map"]).reshape(2, 4, 4, A, -1)[
        ..., 5 + 2 * MPII_NUM_JOINTS:
    ]
    assert set(np.round(np.unique(vis_block), 6)) <= {0.0, 1.0}

    model = PopNetRGB(num_parts=MPII_NUM_JOINTS)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        _, saved = model.apply({"params": params, **extra}, b["image"],
                               train=False)
        loss, _ = popnet_rgb_loss(
            saved, b["heatmaps"], b["align_maps"], b["fg_masks_align"],
            b["prior_map"], b["prior_mask_conf"], b["prior_mask_coord"],
            MPII_NUM_JOINTS,
        )
        return loss

    tx = optax.sgd(1e-2)
    params = variables["params"]
    opt_state = tx.init(params)
    l0, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    l1 = loss_fn(params)
    assert np.isfinite(l0) and l1 < l0
