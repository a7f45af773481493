"""Single-person evaluation: 10 cm rule and 2D pixel rule (A2J protocol).

Vectorized equivalents of the reference's per-sample loops
(reference: evaluate/eval_pose_single.py:44-133,
A2J_experiments/itop_test.py). Inputs are aligned (N, K, 3) / (N, K, 2)
prediction and GT arrays (one person per frame).
"""

from __future__ import annotations

import numpy as np

from popnet_tpu.core.camera import ITOP_INTRINSICS


def itop_pixel2world(x, y, z):
    """ITOP camera model with flipped Y (reference: eval_pose_single.py:30-34)."""
    X = (x - ITOP_INTRINSICS.cx) * z / ITOP_INTRINSICS.fx
    Y = (ITOP_INTRINSICS.cy - y) * z / ITOP_INTRINSICS.fy
    return X, Y


def itop_world2pixel(X, Y, z):
    x = ITOP_INTRINSICS.cx + X / z * ITOP_INTRINSICS.fx
    y = ITOP_INTRINSICS.cy - Y / z * ITOP_INTRINSICS.fy
    return x, y


def accuracy_10cm(pred3d, gt3d, thresh: float = 0.1):
    """Overall fraction of joints within `thresh` meters
    (reference: eval_pose_single.py:42-53)."""
    d2 = np.sum((np.asarray(pred3d) - np.asarray(gt3d)) ** 2, axis=-1)
    return float(np.mean(d2 < thresh**2))


def accuracy_10cm_per_joint(pred3d, gt3d, thresh: float = 0.1):
    """(K,) per-joint accuracy (reference: eval_pose_single.py:55-71)."""
    d2 = np.sum((np.asarray(pred3d) - np.asarray(gt3d)) ** 2, axis=-1)
    return np.mean(d2 < thresh**2, axis=0)


def accuracy_2d(pred2d, gt2d, dist_th: float):
    """Overall 2D accuracy at a pixel threshold
    (reference: eval_pose_single.py:93-103)."""
    d2 = np.sum((np.asarray(pred2d)[..., :2] - np.asarray(gt2d)[..., :2]) ** 2, axis=-1)
    return float(np.mean(d2 < dist_th**2))


def accuracy_2d_per_joint(pred2d, gt2d, dist_th: float):
    """(K,) per-joint 2D accuracy (reference: eval_pose_single.py:75-90)."""
    d2 = np.sum((np.asarray(pred2d)[..., :2] - np.asarray(gt2d)[..., :2]) ** 2, axis=-1)
    return np.mean(d2 < dist_th**2, axis=0)


def default_2d_threshold(w_org: int, h_org: int) -> float:
    """0.02 x image diagonal (reference: eval_pose_single.py:108)."""
    return 0.02 * np.sqrt(w_org**2 + h_org**2)
