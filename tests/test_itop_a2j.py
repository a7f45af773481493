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
