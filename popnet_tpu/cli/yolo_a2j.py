"""Two-stage Yolo-A2J pipeline: detector boxes -> per-person A2J crops.

Framework equivalent of the reference's two scripts
(reference: A2J_experiments/evaluation_yolo_posenet_kdh3d_mpreal_
a2j_preprocess.py:265-266 stage 1 box dump; a2j_test_pred_box.py:550-700
stage 2 crop/infer/uncrop/group) — here a single driver with the box list
passed in memory instead of .npy side files.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from popnet_tpu.core.config import DecodeConfig, EncoderConfig
from popnet_tpu.data.a2j_crops import CROP, crop_resize_batch, uncrop_keypoints
from popnet_tpu.decode import prior as prior_decode
from popnet_tpu.decode.a2j import a2j_post_process
from popnet_tpu.models.a2j import generate_anchors, shift_anchors


def stage1_detect_boxes(
    infer_yolo,
    dataset,
    batch_size: int = 16,
    ecfg: EncoderConfig = EncoderConfig(),
    dcfg: DecodeConfig = DecodeConfig(),
    margin_scale: float = 1.0,
):
    """Run the detector over the dataset; returns (image_idx (N,),
    boxes (N, 4) in original-image pixels)
    (reference: evaluation_yolo_posenet_kdh3d_mpreal_a2j_preprocess.py)."""
    w_org, h_org = dataset.dcfg.width, dataset.dcfg.height
    image_idx, boxes = [], []
    n = len(dataset)
    for s in range(0, n, batch_size):
        idx = list(range(s, min(s + batch_size, n)))
        batch = dataset.get_batch(idx)
        prior_map = infer_yolo(batch["image"])
        bxs, _, _ = prior_decode.parse_prior_pose(
            prior_map, np.asarray(ecfg.anchors, np.float32), ecfg.num_joints,
            w_org, h_org, dataset.dcfg.depth,
            conf_threshold=dcfg.conf_threshold, nms_threshold=dcfg.nms_threshold,
            max_det=dcfg.max_people,
        )
        for b, img_i in enumerate(idx):
            for box in bxs[b]:
                x0, y0, x1, y1 = box[:4]
                cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
                w2, h2 = (x1 - x0) / 2 * margin_scale, (y1 - y0) / 2 * margin_scale
                image_idx.append(img_i)
                boxes.append([cx - w2, cy - h2, cx + w2, cy + h2])
    return np.asarray(image_idx, np.int32), np.asarray(boxes, np.float32)


def stage1_gt_boxes(dataset, margin_scale: float = 1.0):
    """GT-box stage 1 (reference: A2J_experiments/a2j_test_gt_box.py):
    crops come from the labels' person bboxes instead of the detector —
    the A2J-in-isolation ablation row."""
    image_idx, boxes = [], []
    for i in range(len(dataset)):
        _, anns = dataset.load_composited(i)
        for a in anns:
            if "bbox" not in a:
                continue
            x0, y0, x1, y1 = np.asarray(a["bbox"][:4], np.float64)
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            w2 = (x1 - x0) / 2 * margin_scale
            h2 = (y1 - y0) / 2 * margin_scale
            image_idx.append(i)
            boxes.append([cx - w2, cy - h2, cx + w2, cy + h2])
    return (
        np.asarray(image_idx, np.int32),
        np.asarray(boxes, np.float32).reshape(-1, 4),
    )


def run_yolo_a2j_eval(
    infer_yolo,
    infer_a2j,
    dataset,
    batch_size: int = 16,
    ecfg: EncoderConfig = EncoderConfig(),
    dcfg: DecodeConfig = DecodeConfig(),
    crop_batch: int = 32,
    gt_boxes: bool = False,
):
    """Full two-stage inference over an eval dataset -> benchmark eval_data.

    `infer_a2j(crops (N, 288, 288, 1))` returns (cls, reg, depth) heads.
    With gt_boxes=True stage 1 reads the labels' bboxes (a2j_test_gt_box)
    and `infer_yolo` may be None.
    """
    cam = dataset.intrinsics or dataset.dcfg.intrinsics
    depth = dataset.dcfg.depth

    if gt_boxes:
        image_idx, boxes = stage1_gt_boxes(dataset)
    else:
        image_idx, boxes = stage1_detect_boxes(
            infer_yolo, dataset, batch_size, ecfg, dcfg
        )

    all_anchors = jnp.asarray(
        shift_anchors((CROP // 16, CROP // 16), 16, generate_anchors()),
        dtype=jnp.float32,
    )

    # raw full-res images for cropping
    raw = np.stack(
        [dataset.load_composited(i)[0] for i in range(len(dataset))]
    ).astype(np.float32)
    raw_j = jnp.asarray(raw)

    preds = []
    for s in range(0, len(boxes), crop_batch):
        bi = jnp.asarray(image_idx[s : s + crop_batch])
        bb = jnp.asarray(boxes[s : s + crop_batch])
        crops = crop_resize_batch(raw_j, bi, bb, depth.mean, depth.std, CROP)
        heads = infer_a2j(crops)
        kp = a2j_post_process(heads, all_anchors)  # (n, K, 3) (y, x, z)
        preds.append(np.asarray(kp))
    pred_yxz = np.concatenate(preds, 0) if preds else np.zeros((0, ecfg.num_joints, 3))

    pred_xyz = uncrop_keypoints(pred_yxz, boxes, CROP) if len(boxes) else pred_yxz

    # group rows by image (reference: a2j_test_pred_box.py:606-672)
    pred2d_set = [[] for _ in range(len(dataset))]
    pred3d_set = [[] for _ in range(len(dataset))]
    conf_set = [[] for _ in range(len(dataset))]
    for n in range(len(boxes)):
        i = int(image_idx[n])
        h = pred_xyz[n]
        x, y, z = h[:, 0], h[:, 1], h[:, 2]
        X = (x - cam.cx) / cam.fx * z
        Y = (y - cam.cy) / cam.fy * z
        pred2d_set[i].append(np.stack([x, y], 1).tolist())
        pred3d_set[i].append(np.stack([X, Y, z], 1).tolist())
        conf_set[i].append([1.0] * ecfg.num_joints)

    gt2d_set, gt3d_set = dataset.gt_human_lists()
    return {
        "human_pred_set_2d": pred2d_set,
        "human_pred_set_3d": pred3d_set,
        "human_pred_set_part_conf": conf_set,
        "human_gt_set_2d": gt2d_set,
        "human_gt_set_3d": gt3d_set,
    }
