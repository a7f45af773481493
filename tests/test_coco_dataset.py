"""COCO RGB training dataset: GT maps golden vs the reference CocoKeypoints
(lib/datasets/datasets_coco.py:262-313) and batch pipeline smoke."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from tests import reference_shim  # noqa: F401

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.core.skeleton_coco import (
    COCO_KEYPOINT_NAMES,
    COCO_LIMBS,
    COCO_NUM_JOINTS,
)
from popnet_tpu.data.coco_dataset import (
    CocoKeypointsDataset,
    add_neck,
    encode_coco_batch,
    load_coco_images,
)


def _random_kp17(rng, h, w, p_vis=0.8):
    kp = np.zeros((17, 3))
    kp[:, 0] = rng.uniform(-5, w + 5, 17)
    kp[:, 1] = rng.uniform(-5, h + 5, 17)
    kp[:, 2] = rng.choice([0, 1, 2], 17, p=[1 - p_vis, p_vis / 2, p_vis / 2])
    return kp


@pytest.mark.reference
def test_limb_table_matches_reference():
    from lib.datasets import datasets_coco as ref

    names = ref.get_keypoints()
    assert tuple(names) == tuple(COCO_KEYPOINT_NAMES)
    assert [list(l) for l in COCO_LIMBS] == ref.kp_connections(names)


@pytest.mark.reference
def test_gt_maps_golden():
    from lib.datasets import datasets_coco as ref

    h, w, stride = 64, 80, 8
    names = ref.get_keypoints()
    rk = ref.CocoKeypoints.__new__(ref.CocoKeypoints)
    rk.HEATMAP_COUNT = len(names)
    rk.LIMB_IDS = ref.kp_connections(names)
    rk.input_y, rk.input_x, rk.stride = h, w, stride

    rng = np.random.default_rng(0)
    anns = [
        {"keypoints": _random_kp17(rng, h, w).ravel().tolist()}
        for _ in range(3)
    ]
    ref_heat, ref_paf = rk.get_ground_truth(
        [dict(a) for a in anns]
    )

    ecfg = EncoderConfig(
        input_x=w, input_y=h, stride=stride,
        num_joints=COCO_NUM_JOINTS, num_limbs=len(COCO_LIMBS), max_people=4,
    )
    joints = np.full((1, 4, COCO_NUM_JOINTS, 2), -1.0)
    valid = np.zeros((1, 4), bool)
    for p, a in enumerate(anns):
        kp18 = add_neck(np.asarray(a["keypoints"]).reshape(17, 3))
        j = np.where(kp18[:, 2:3] > 0.5, kp18[:, :2], -1.0)
        bad = (j[:, 0] >= w) | (j[:, 0] < 0) | (j[:, 1] >= h) | (j[:, 1] < 0)
        j[bad] = -1.0
        joints[0, p] = j
        valid[0, p] = True

    heat, paf = encode_coco_batch(
        jnp.asarray(joints, jnp.float32), jnp.asarray(valid), ecfg
    )
    np.testing.assert_allclose(np.asarray(heat[0]), ref_heat, atol=2e-5)
    np.testing.assert_allclose(np.asarray(paf[0]), ref_paf, atol=2e-5)


def _write_tiny_coco(tmp_path, n_images=3, h=50, w=70):
    import cv2

    rng = np.random.default_rng(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(n_images):
        fname = f"im{i:03d}.png"
        cv2.imwrite(
            str(img_dir / fname),
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        )
        images.append({"id": i, "file_name": fname, "height": h, "width": w})
        kp = _random_kp17(rng, h, w)
        annotations.append(
            {
                "id": 100 + i,
                "image_id": i,
                "category_id": 1,
                "keypoints": kp.ravel().tolist(),
                "num_keypoints": int((kp[:, 2] > 0).sum()),
                "bbox": [5, 5, 20, 30],
            }
        )
    ann = {"images": images, "annotations": annotations}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


def test_dataset_batches(tmp_path):
    img_dir, ann_file = _write_tiny_coco(tmp_path)
    ds = CocoKeypointsDataset(
        img_dir, ann_file, input_y=64, input_x=64, mode="rtpose",
        is_train=True, hflip=True, max_people=4, seed=0,
    )
    assert len(ds) == 3
    batches = list(ds.iter_batches(batch_size=2, drop_last=True, prefetch=1))
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["heat"].shape == (2, 8, 8, COCO_NUM_JOINTS + 1)
    assert b["paf"].shape == (2, 8, 8, 2 * len(COCO_LIMBS))
    img = np.asarray(b["image"])
    assert img.min() >= -0.5 - 1e-6 and img.max() <= 0.5 + 1e-6  # rtpose norm
    h = np.asarray(b["heat"])
    assert h.min() >= 0.0 and h.max() <= 1.0 + 1e-6
    # letterbox scale: min(64/50, 64/70)
    np.testing.assert_allclose(b["scale"], 64 / 70, rtol=1e-6)


def test_coco_rgb_train_step(tmp_path):
    """Dataset batch -> rtpose_vgg (mobilenet trunk) -> 6-stage MSE loss ->
    one gradient step decreases the loss: the COCO RGB training loop closes
    end to end (the reference ships only the loader + eval for this path)."""
    import jax
    import optax

    from popnet_tpu.losses.losses import rtpose_light_loss
    from popnet_tpu.models.rtpose_vgg import RTPoseVGG

    img_dir, ann_file = _write_tiny_coco(tmp_path, n_images=2, h=64, w=64)
    ds = CocoKeypointsDataset(
        img_dir, ann_file, input_y=64, input_x=64, mode="vgg",
        is_train=True, hflip=False, max_people=4, seed=0,
    )
    b = ds.get_batch([0, 1])
    model = RTPoseVGG(trunk="mobilenet")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )

    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        _, saved = model.apply({"params": params, **extra}, b["image"],
                               train=False)
        loss, _ = rtpose_light_loss(saved, b["heat"], b["paf"], num_stages=6)
        return loss

    tx = optax.sgd(1e-2)
    params = variables["params"]
    opt_state = tx.init(params)
    l0, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    l1 = loss_fn(params)
    assert np.isfinite(l0) and l1 < l0


def test_coco_cli_train_smoke(tmp_path):
    """CLI COCO RGB recipe runs one epoch end to end (mobilenet trunk)."""
    from popnet_tpu.cli.main import main

    root = tmp_path / "coco"
    root.mkdir()
    img_dir, ann_file = _write_tiny_coco(root, n_images=2, h=64, w=64)
    os.rename(img_dir, str(root / "images"))
    out = tmp_path / "out"
    main([
        "train", "--dataset", "coco", "--model", "rtpose_vgg",
        "--trunk", "mobilenet", "--data-root", str(root),
        "--labels", "ann.json", "--input-size", "64",
        "--batch-size", "2", "--epochs", "1", "--lr", "0.01",
        "--out-dir", str(out),
    ])
    hist = (out / "history.jsonl").read_text().strip().splitlines()
    assert len(hist) == 1
    rec = json.loads(hist[0])
    assert np.isfinite(rec["train_loss"])


def test_load_coco_images_filters_unlabeled(tmp_path):
    ann = {
        "images": [
            {"id": 0, "file_name": "a.png", "height": 10, "width": 10},
            {"id": 1, "file_name": "b.png", "height": 10, "width": 10},
        ],
        "annotations": [
            {
                "id": 1, "image_id": 0, "category_id": 1,
                "keypoints": [0.0] * 51, "num_keypoints": 0, "bbox": [0, 0, 1, 1],
            },
            {
                "id": 2, "image_id": 1, "category_id": 1,
                "keypoints": ([3.0, 4.0, 2.0] + [0.0] * 48),
                "num_keypoints": 1, "bbox": [0, 0, 1, 1],
            },
        ],
    }
    f = tmp_path / "ann.json"
    f.write_text(json.dumps(ann))
    items = load_coco_images(str(f))
    assert [fn for fn, _ in items] == ["b.png"]


def test_rotate_bound_geometry():
    """rotate_bound expands the canvas and its returned affine maps original
    pixel coords onto the rotated image (reference: transforms.py:457-480
    RandomRotate.rotate_bound): a bright block's post-rotation argmax must
    land where M sends the block center."""
    from popnet_tpu.data.coco_dataset import rotate_bound

    img = np.zeros((40, 60, 3), np.uint8)
    img[10:13, 44:47] = 255  # block centered at (x=45, y=11)
    out, M = rotate_bound(img, 30.0)
    assert out.shape[0] >= 40 and out.shape[1] >= 60
    exp = np.array([45.0, 11.0, 1.0]) @ M.T
    flat = out[..., 0].astype(np.float64)
    yy, xx = np.unravel_index(np.argmax(flat), flat.shape)
    assert abs(xx - exp[0]) <= 1.5 and abs(yy - exp[1]) <= 1.5


def test_train_augmentations(tmp_path):
    """RGB train-time augmentations (reference transforms.py RandomRotate /
    RescaleRelative / blur_augmentation): the static canvas holds, joints
    stay in-canvas or hole-coded, a degenerate jitter range pins the exact
    letterbox scale, eval mode ignores every knob, and the same seed
    reproduces the same sample."""
    img_dir, ann_file = _write_tiny_coco(tmp_path)

    def make(seed=0, is_train=True, **kw):
        return CocoKeypointsDataset(
            img_dir, ann_file, input_y=64, input_x=64, mode="rtpose",
            is_train=is_train, hflip=False, max_people=4, seed=seed, **kw,
        )

    ds = make(rotate_max_deg=30.0, scale_jitter=(0.6, 0.9),
              blur_max_sigma=2.0)
    b = ds.get_batch([0, 1, 2])
    assert b["image"].shape == (3, 64, 64, 3)
    assert b["heat"].shape == (3, 8, 8, COCO_NUM_JOINTS + 1)
    canvas, joints, valid, scale = ds._load_one(0)
    assert canvas.shape == (64, 64, 3)
    hole = joints == -1.0
    assert np.all(hole | ((joints >= 0.0) & (joints < 64.0)))

    # degenerate jitter range -> exact factor on the letterbox scale
    ds_pin = make(scale_jitter=(0.5, 0.5))
    bp = ds_pin.get_batch([0])
    np.testing.assert_allclose(bp["scale"], 0.5 * 64 / 70, rtol=1e-6)

    # eval mode ignores the augmentation knobs entirely
    ds_eval = make(is_train=False, rotate_max_deg=30.0,
                   scale_jitter=(0.5, 0.5), blur_max_sigma=2.0)
    be = ds_eval.get_batch([0])
    np.testing.assert_allclose(be["scale"], 64 / 70, rtol=1e-6)

    # same seed -> same stochastic sample
    a0 = make(seed=7, rotate_max_deg=30.0, scale_jitter=(0.6, 0.9),
              blur_max_sigma=2.0)._load_one(0)
    a1 = make(seed=7, rotate_max_deg=30.0, scale_jitter=(0.6, 0.9),
              blur_max_sigma=2.0)._load_one(0)
    np.testing.assert_array_equal(a0[0], a1[0])
    np.testing.assert_array_equal(a0[1], a1[1])
