"""ITOP A2J crop pipeline."""

import numpy as np

import jax.numpy as jnp

from popnet_tpu.data.itop_a2j import (
    CROP, boxes_from_centers, itop_crop_batch, itop_crop_labels, itop_uncrop_keypoints,
)


def test_boxes_from_centers_roundtrip():
    centers = np.array([[160.0, 120.0, 3.0], [100.0, 80.0, 2.0]])
    boxes = boxes_from_centers(centers, xy_thres=0.5)
    # box center projects back near the torso pixel (before clamping)
    mid = (boxes[:, :2] + boxes[:, 2:]) / 2
    np.testing.assert_allclose(mid[0], centers[0, :2], atol=1.0)
    assert (boxes[:, 2] > boxes[:, 0]).all() and (boxes[:, 3] > boxes[:, 1]).all()


def test_itop_crop_depth_clamping():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 5, (1, 240, 320)).astype(np.float32)
    cz = np.float32(3.0)
    boxes = jnp.asarray([[40.0, 40.0, 200.0, 200.0]])
    crops = np.asarray(
        itop_crop_batch(jnp.asarray(img), jnp.asarray([0]), boxes,
                        jnp.asarray([cz]), mean=0.0, std=1.0, depth_thres=0.4)
    )[0, :, :, 0]
    # all values are relative, within +-0.4 of the center depth
    assert np.abs(crops).max() <= 0.4 + 1e-5


def test_itop_label_roundtrip():
    rng = np.random.default_rng(1)
    boxes = np.array([[30.0, 20.0, 260.0, 220.0]], np.float32)
    j = np.concatenate(
        [rng.uniform(40, 200, (1, 15, 2)), rng.uniform(2, 4, (1, 15, 1))], -1
    )
    cz = np.array([3.1])
    lab = itop_crop_labels(j, boxes, cz)
    back = itop_uncrop_keypoints(lab, boxes, cz)
    np.testing.assert_allclose(back, j, atol=1e-5)


def test_itop_a2j_crop_dataset(tmp_path):
    """ITOPA2JCropDataset: torso-centered crops + relative-z labels through
    the dataset/batch API (reference recipe: itop_train_64.py:44-52)."""
    import json
    import os

    import jax.numpy as jnp

    from popnet_tpu.core.camera import ITOP_INTRINSICS
    from popnet_tpu.core.config import EncoderConfig, ITOP_DATASET
    from popnet_tpu.data.a2j_crops import ITOPA2JCropDataset
    from popnet_tpu.data.datasets import KDH3DDataset

    h, w, K = 240, 320, 15
    rng = np.random.default_rng(1)
    img_dir = tmp_path / "depth_maps"
    os.makedirs(img_dir)
    labels = {}
    for i in range(4):
        d = rng.uniform(2, 4.5, (h, w)).astype(np.float32)
        name = f"i{i}.npy"
        np.save(img_dir / name, d)
        j2 = np.stack([rng.uniform(120, 200, K), rng.uniform(80, 160, K)], 1)
        z = rng.uniform(2.5, 3.5, K)
        j3 = np.stack([
            (j2[:, 0] - ITOP_INTRINSICS.cx) / ITOP_INTRINSICS.fx * z,
            (j2[:, 1] - ITOP_INTRINSICS.cy) / ITOP_INTRINSICS.fy * z, z], 1)
        labels[name] = [{
            "2d_joints": j2.tolist(), "3d_joints": j3.tolist(),
            "bbox": [float(j2[:, 0].min()), float(j2[:, 1].min()),
                     float(j2[:, 0].max()), float(j2[:, 1].max())],
        }]
    json.dump(labels, open(tmp_path / "labels.json", "w"))

    inner = KDH3DDataset(
        str(img_dir), str(tmp_path / "labels.json"),
        ecfg=EncoderConfig(max_people=2), dcfg=ITOP_DATASET, seed=0,
    )
    ds = ITOPA2JCropDataset(inner, xy_thres=0.6, rand_shift=0, erase=False)
    assert len(ds) == 4
    batch = ds.get_batch([0, 1, 2])
    assert batch["crops"].shape == (3, 288, 288, 1)
    lbl = np.asarray(batch["labels"])
    assert lbl.shape == (3, K, 3)
    # relative z: torso joint (idx 8) must sit at ~0
    assert np.all(np.abs(lbl[:, 8, 2]) < 1e-5)
    # depth clamp: crop values bounded by (depth_thres - mean)/std around 0
    crops = np.asarray(batch["crops"])
    assert np.isfinite(crops).all()
    # the prefetch iterator drives the same path
    n = sum(b["crops"].shape[0] for b in ds.iter_batches(2, shuffle=False))
    assert n == 4
