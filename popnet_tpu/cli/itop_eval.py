"""ITOP single-person evaluation drivers (the itop_test.py twin).

Two rows, both scored with the 10-cm single-person protocol
(eval/single.py; reference: evaluate/eval_pose_single.py:44-133,
A2J_experiments/itop_test.py):

- run_itop_a2j_eval: torso-box crops (xy_thres world-extent box about the
  torso, depth clamped to +-depth_thres of the center depth — reference:
  itop_train_64.py:44-52, 220-265) -> A2J anchor voting -> un-crop ->
  the flipped-Y ITOP camera back-projection (eval_pose_single.py:30-34).
- run_itop_openpose_eval: the full Open-Pose+ decode (peaks/PAF/assembly/z
  readout) -> best-confidence person per frame -> the same back-projection.

Both predictions AND ground truth go to world space through the SAME
itop_pixel2world, exactly as the reference protocol does — the metric is a
function of (u, v, z) on both sides.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from popnet_tpu.core.config import DecodeConfig, EncoderConfig, ITOP_DATASET
from popnet_tpu.eval.single import (
    accuracy_10cm, accuracy_10cm_per_joint, itop_pixel2world,
)

__all__ = ["run_itop_a2j_eval", "run_itop_openpose_eval", "score_itop_uvz"]


def _world(uvz: np.ndarray) -> np.ndarray:
    """(N, K, 3) (u, v, z) -> (N, K, 3) world via the flipped-Y ITOP camera."""
    u, v, z = uvz[..., 0], uvz[..., 1], uvz[..., 2]
    X, Y = itop_pixel2world(u, v, z)
    return np.stack([X, Y, z], -1)


def score_itop_uvz(pred_uvz, gt_uvz) -> dict:
    """10-cm protocol on aligned (N, K, 3) (u, v, z) arrays."""
    pw, gw = _world(np.asarray(pred_uvz)), _world(np.asarray(gt_uvz))
    return {
        "acc_10cm": accuracy_10cm(pw, gw),
        "per_joint": accuracy_10cm_per_joint(pw, gw).tolist(),
    }


def _gt_uvz(dataset) -> np.ndarray:
    """(N, K, 3) single-person GT (u, v, z) from an ITOP-labeled dataset."""
    rows = []
    for image_id in dataset.ids:
        ann = dataset.anno_dic[image_id][0]
        j2 = np.asarray(ann["2d_joints"], np.float64)
        z = np.asarray(ann["3d_joints"], np.float64)[:, 2]
        rows.append(np.concatenate([j2, z[:, None]], 1))
    return np.stack(rows)


def run_itop_a2j_eval(infer_a2j, dataset, batch_size: int = 16,
                      xy_thres: float = 120.0, depth_thres: float = 0.4,
                      center_joint: int = 8,
                      mean: float | None = None,
                      std: float | None = None) -> dict:
    """A2J over torso-box crops -> 10-cm accuracy.

    `dataset` is a KDH3DDataset-style single-person set with ITOP_DATASET
    geometry; `infer_a2j(crops)` returns (cls, reg, depth) heads. The crop
    geometry matches ITOPA2JCropDataset (no augmentation: rand_shift=0).
    `mean`/`std` normalize the torso-RELATIVE crop values and must be the
    measured relative stats the net was trained with
    (data.itop_a2j.itop_relative_stats — the reference's
    itop_side_mean/std.npy, itop_train_64.py:85-86); they default to the
    dataset's absolute stats only for backward compatibility."""
    from popnet_tpu.core.camera import ITOP_INTRINSICS
    from popnet_tpu.data.a2j_crops import CROP
    from popnet_tpu.data.itop_a2j import (
        boxes_from_centers, itop_crop_batch, itop_uncrop_keypoints,
    )
    from popnet_tpu.decode.a2j import a2j_post_process
    from popnet_tpu.models.a2j import generate_anchors, shift_anchors

    cam = dataset.intrinsics or ITOP_INTRINSICS
    mean = dataset.dcfg.depth.mean if mean is None else float(mean)
    std = dataset.dcfg.depth.std if std is None else float(std)
    gt = _gt_uvz(dataset)
    anchors = jnp.asarray(
        shift_anchors((CROP // 16, CROP // 16), 16, generate_anchors()),
        jnp.float32,
    )

    preds = []
    n = len(dataset)
    for s in range(0, n, batch_size):
        idxs = range(s, min(s + batch_size, n))
        imgs = np.stack(
            [dataset.load_composited(i)[0].astype(np.float32) for i in idxs]
        )
        uvd = gt[s : s + len(imgs)]
        centers = uvd[:, center_joint]
        h, w = imgs.shape[1:]
        boxes = boxes_from_centers(centers, cam, xy_thres=xy_thres,
                                   img_h=h, img_w=w)
        cz = centers[:, 2].astype(np.float32)
        crops = itop_crop_batch(
            jnp.asarray(imgs), jnp.arange(len(imgs)), jnp.asarray(boxes),
            jnp.asarray(cz), mean=mean, std=std,
            depth_thres=depth_thres,
        )
        heads = infer_a2j(crops)
        yxz = np.asarray(a2j_post_process(heads, anchors))   # (B, K, 3)
        preds.append(itop_uncrop_keypoints(yxz, boxes, cz))  # (B, K, 3) uvz
    pred = np.concatenate(preds)

    out = score_itop_uvz(pred, gt)
    out["pred_uvz"] = pred.tolist()
    return out


def run_itop_openpose_eval(infer, dataset, batch_size: int = 16,
                           ecfg: EncoderConfig = EncoderConfig(),
                           dcfg: DecodeConfig = DecodeConfig()) -> dict:
    """Open-Pose+ at ITOP geometry -> best-confidence person per frame ->
    10-cm accuracy. Joints the assembler left unmatched (the [-1, -1]
    sentinel) count as misses, exactly as an out-of-range prediction would."""
    from popnet_tpu.cli import evaluate as ev

    data = ev.run_openpose_eval(infer, dataset, batch_size, ecfg, dcfg)
    gt = _gt_uvz(dataset)
    K = gt.shape[1]

    pred = np.full_like(gt, 1e6)  # a miss everywhere a frame has no person
    for i, (h2, h3, conf) in enumerate(zip(
        data["human_pred_set_2d"], data["human_pred_set_3d"],
        data["human_pred_set_part_conf"],
    )):
        if not h2:
            continue
        best = int(np.argmax([np.mean(c) for c in conf]))
        j2 = np.asarray(h2[best], np.float64)
        z = np.asarray(h3[best], np.float64)[:, 2]
        row = np.concatenate([j2, z[:, None]], 1)
        row[(j2[:, 0] < 0) | (z < 0)] = 1e6  # unassembled joints -> miss
        pred[i, :K] = row
    out = score_itop_uvz(pred, gt)
    out["pred_uvz"] = pred.tolist()
    return out
