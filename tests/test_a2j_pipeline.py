"""A2J crop pipeline + two-stage Yolo-A2J driver tests."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.core.config import DecodeConfig, EncoderConfig
from popnet_tpu.cli import yolo_a2j
from popnet_tpu.data.a2j_crops import (
    CROP, crop_resize_batch, crop_labels, random_erasing, uncrop_keypoints,
)
from popnet_tpu.data.datasets import MPRealDataset
from popnet_tpu.data.labels import pack_annotations
from popnet_tpu.models.a2j import generate_anchors, shift_anchors
from popnet_tpu.ops import encoders

from tests import synthetic_data

ECFG = EncoderConfig(max_people=6)


def test_crop_resize_matches_cv2_nearest():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 6, (512, 480)).astype(np.float32)
    box = np.array([[50.0, 80.0, 300.0, 400.0]], np.float32)
    crops = np.asarray(
        crop_resize_batch(jnp.asarray(img)[None], jnp.asarray([0]), jnp.asarray(box))
    )[0, :, :, 0]
    ref = img[80:400, 50:300]
    ref = cv2.resize(ref, (CROP, CROP), interpolation=cv2.INTER_NEAREST)
    ref = (ref - 3.0) / 2.0
    np.testing.assert_allclose(crops, ref, atol=1e-6)


def test_crop_oob_zero_padded():
    img = jnp.ones((1, 512, 480))
    box = jnp.asarray([[-100.0, -100.0, 100.0, 100.0]])
    crops = np.asarray(crop_resize_batch(img, jnp.asarray([0]), box))[0, :, :, 0]
    # top-left half is OOB -> normalized zero = -1.5
    assert crops[0, 0] == pytest.approx(-1.5)
    assert crops[-1, -1] == pytest.approx((1 - 3) / 2)


def test_crop_label_roundtrip():
    rng = np.random.default_rng(1)
    boxes = rng.uniform(0, 200, (4, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(80, 200, (4, 2))], 1)
    j2 = boxes[:, None, :2] + rng.uniform(0, 80, (4, 15, 2))
    z = rng.uniform(1, 5, (4, 15))
    labels = crop_labels(j2, z, boxes)
    back = uncrop_keypoints(labels, boxes)
    np.testing.assert_allclose(back[..., :2], j2, atol=1e-4)
    np.testing.assert_allclose(back[..., 2], z, atol=1e-5)


def test_random_erasing():
    """Erasing is ADDITIVE Gaussian noise over one random rectangle
    (reference random_erasing.py:45-53 `img[...] += rand_patch`), never a
    replacement — outside the patch the crop is bit-identical."""
    base = jnp.full((8, 64, 64, 1), -1.5)
    out = np.asarray(random_erasing(base, jax.random.PRNGKey(0), probability=1.0))
    delta = out - np.asarray(base)
    changed = (np.abs(delta) > 1e-9).reshape(8, -1).mean(1)
    assert (changed > 0).all() and (changed < 0.5).all()
    # additive: the patch delta is unit Gaussian noise, not values near 0-(-1.5)
    patch = delta[np.abs(delta) > 1e-9]
    assert abs(patch.mean()) < 0.2 and 0.7 < patch.std() < 1.3


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("kdh3d_a2j")
    paths = synthetic_data.build(str(root), n_images=6)
    return MPRealDataset(paths["img_dir"], paths["labels"], ecfg=ECFG)


def test_two_stage_driver_oracle(dataset):
    """Yolo oracle (GT prior maps) + A2J oracle (one-hot anchor votes onto
    GT crop labels) must recover near-perfect poses end to end."""
    from popnet_tpu.cli.evaluate import evaluate_predictions
    from popnet_tpu.data.labels import OOB

    depth = dataset.dcfg.depth
    sx = ECFG.input_x / dataset.dcfg.width
    sy = ECFG.input_y / dataset.dcfg.height
    pos = {"i": 0}

    def infer_yolo(images):
        idx = list(range(pos["i"], pos["i"] + images.shape[0]))
        pos["i"] += images.shape[0]
        priors = []
        for i in idx:
            anns = dataset.anno_dic[dataset.ids[i]]
            pk = pack_annotations(anns, ECFG.max_people, ECFG.num_joints)
            j2 = pk.joints2d.copy()
            j2[pk.valid, :, 0] *= sx
            j2[pk.valid, :, 1] *= sy
            j2[~pk.valid] = OOB
            bb = pk.bboxes.copy()
            bb[:, 0::2] *= sx
            bb[:, 1::2] *= sy
            pm, _, _, _ = encoders.encode_prior_targets(
                jnp.asarray(bb), jnp.asarray(j2), jnp.asarray(pk.joints3d[..., 2]),
                jnp.asarray(pk.pose_weights), jnp.asarray(pk.valid), ECFG, depth,
            )
            priors.append(pm)
        return jnp.stack(priors)

    anchors = shift_anchors((CROP // 16, CROP // 16), 16, generate_anchors())
    state = {"boxes": None}

    # capture the stage-1 boxes so the A2J oracle can emit crop-space labels
    orig_stage1 = yolo_a2j.stage1_detect_boxes

    def stage1_capture(*a, **k):
        idx, boxes = orig_stage1(*a, **k)
        state["boxes"] = (idx, boxes)
        return idx, boxes

    yolo_a2j.stage1_detect_boxes = stage1_capture
    try:
        consumed = {"n": 0}

        def infer_a2j(crops):
            idx_all, boxes_all = state["boxes"]
            n = crops.shape[0]
            s = consumed["n"]
            consumed["n"] += n
            cls = np.full((n, anchors.shape[0], 15), -20.0, np.float32)
            reg = np.zeros((n, anchors.shape[0], 15, 2), np.float32)
            dep = np.zeros((n, anchors.shape[0], 15), np.float32)
            for m in range(n):
                img_i = int(idx_all[s + m])
                box = boxes_all[s + m]
                ann = dataset.anno_dic[dataset.ids[img_i]][0]
                j2 = np.asarray(ann["2d_joints"])
                z = np.asarray(ann["3d_joints"])[:, 2]
                lab = crop_labels(j2[None], z[None], box[None])[0]  # (K,3) y,x,z
                for k in range(15):
                    a = int(np.argmin(np.sum((anchors - lab[k, :2]) ** 2, 1)))
                    cls[m, a, k] = 20.0
                    reg[m, a, k] = lab[k, :2] - anchors[a]
                    dep[m, a, k] = lab[k, 2]
            return jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(dep)

        data = yolo_a2j.run_yolo_a2j_eval(
            infer_yolo, infer_a2j, dataset, batch_size=3, ecfg=ECFG,
            dcfg=DecodeConfig(),
        )
    finally:
        yolo_a2j.stage1_detect_boxes = orig_stage1

    res = evaluate_predictions(
        data["human_pred_set_2d"], data["human_pred_set_3d"],
        data["human_pred_set_part_conf"], data["human_gt_set_2d"],
        data["human_gt_set_3d"], verbose=False,
    )
    assert res["pck2d"] > 0.95
    assert res["pck3d"] > 0.9


def test_gt_box_driver_oracle(dataset):
    """GT-box stage 1 (a2j_test_gt_box ablation): label boxes + A2J oracle
    recover near-perfect poses with no detector at all."""
    from popnet_tpu.cli.evaluate import evaluate_predictions

    idx_all, boxes_all = yolo_a2j.stage1_gt_boxes(dataset)
    # person index within each image, in stage1_gt_boxes emission order
    person_of = []
    seen: dict = {}
    for i in idx_all:
        seen[int(i)] = seen.get(int(i), -1) + 1
        person_of.append(seen[int(i)])

    anchors = shift_anchors((CROP // 16, CROP // 16), 16, generate_anchors())
    consumed = {"n": 0}

    def infer_a2j(crops):
        n = crops.shape[0]
        s = consumed["n"]
        consumed["n"] += n
        cls = np.full((n, anchors.shape[0], 15), -20.0, np.float32)
        reg = np.zeros((n, anchors.shape[0], 15, 2), np.float32)
        dep = np.zeros((n, anchors.shape[0], 15), np.float32)
        for m in range(n):
            img_i = int(idx_all[s + m])
            ann = dataset.anno_dic[dataset.ids[img_i]][person_of[s + m]]
            j2 = np.asarray(ann["2d_joints"])
            z = np.asarray(ann["3d_joints"])[:, 2]
            lab = crop_labels(j2[None], z[None], boxes_all[s + m][None])[0]
            for k in range(15):
                a = int(np.argmin(np.sum((anchors - lab[k, :2]) ** 2, 1)))
                cls[m, a, k] = 20.0
                reg[m, a, k] = lab[k, :2] - anchors[a]
                dep[m, a, k] = lab[k, 2]
        return jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(dep)

    data = yolo_a2j.run_yolo_a2j_eval(
        None, infer_a2j, dataset, batch_size=3, ecfg=ECFG,
        dcfg=DecodeConfig(), gt_boxes=True,
    )
    res = evaluate_predictions(
        data["human_pred_set_2d"], data["human_pred_set_3d"],
        data["human_pred_set_part_conf"], data["human_gt_set_2d"],
        data["human_gt_set_3d"], verbose=False,
    )
    assert res["pck2d"] > 0.95
    assert res["pck3d"] > 0.9


def test_crop_resize_grouped_matches_gather():
    """The one-hot matmul crop (TPU serving path) equals the exact gather
    crop: same nearest-neighbor taps, same zero OOB padding. f32 one-hot
    selection is exact (each output is 1*v plus zeros)."""
    import jax.numpy as jnp
    import numpy as np

    from popnet_tpu.data.a2j_crops import crop_resize_grouped

    rng = np.random.default_rng(11)
    B, C = 3, 4
    images = jnp.asarray(rng.uniform(0.5, 6.0, (B, 96, 80)).astype(np.float32))
    boxes = rng.uniform(-20, 70, (B, C, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(10, 60, (B, C, 2))
    boxes = jnp.asarray(boxes)
    idx = jnp.repeat(jnp.arange(B), C)

    exact = np.asarray(
        crop_resize_batch(images, idx, boxes.reshape(B * C, 4), out_size=32)
    )
    grouped = np.asarray(
        crop_resize_grouped(images, boxes, out_size=32, dtype=jnp.float32)
    )
    np.testing.assert_array_equal(exact, grouped)
