"""Skeleton / depth visualization (GT and prediction viewers).

Framework equivalents of the reference's visualizers
(reference: main_visualize_gt.py:8-51, main_visualize_pred.py:8-50,
util/util_functions.py:58-97 draw_humans*).
"""

from __future__ import annotations

import cv2
import numpy as np

from popnet_tpu.core.skeleton import JOINT_COLORS, LIMBS


def depth_to_gray(depth: np.ndarray, depth_max: float = 6.0) -> np.ndarray:
    """Clip to [0, depth_max] and map to a 3-channel uint8 grayscale image."""
    d = np.clip(np.asarray(depth, dtype=np.float64), 0, depth_max)
    g = (d / depth_max * 255).astype(np.uint8)
    return cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)


def overlay_seg(img: np.ndarray, seg: np.ndarray, color=(0, 0, 255), alpha=0.5):
    """Superimpose a segmentation mask in red (reference: main_visualize_gt)."""
    out = img.copy()
    m = np.asarray(seg) > 0
    out[m] = (out[m] * (1 - alpha) + np.asarray(color) * alpha).astype(np.uint8)
    return out


def draw_humans(img, humans, limbs=LIMBS, colors=JOINT_COLORS, visibilities=None):
    """Draw skeletons; joints with visibility < 0.5 are skipped
    (reference: util/util_functions.py:58-77)."""
    for i, human in enumerate(humans):
        h = np.asarray(human)
        for k, (a, b) in enumerate(limbs):
            if visibilities is not None and visibilities[i][a] < 0.5:
                continue
            c1 = tuple(int(v) for v in h[a, :2])
            cv2.circle(img, c1, 3, (0, 0, 255), thickness=2, lineType=8)
            if visibilities is not None and visibilities[i][b] < 0.5:
                continue
            c2 = tuple(int(v) for v in h[b, :2])
            cv2.line(img, c1, c2, colors[k % len(colors)], 2)
            cv2.circle(img, c2, 3, (0, 0, 255), thickness=2, lineType=8)
    return img


def draw_humans_visibility(img, humans, limbs=LIMBS, colors=JOINT_COLORS,
                           visibilities=None):
    """Like draw_humans but marks invisible joints in black
    (reference: util/util_functions.py:80-97)."""
    for i, human in enumerate(humans):
        h = np.asarray(human)
        for k, (a, b) in enumerate(limbs):
            ca = (0, 0, 0) if (visibilities is not None and visibilities[i][a] < 0.5) else (0, 0, 255)
            c1 = tuple(int(v) for v in h[a, :2])
            cv2.circle(img, c1, 3, ca, thickness=2, lineType=8)
            cb = (0, 0, 0) if (visibilities is not None and visibilities[i][b] < 0.5) else (0, 0, 255)
            c2 = tuple(int(v) for v in h[b, :2])
            cv2.line(img, c1, c2, colors[k % len(colors)], 2)
            cv2.circle(img, c2, 3, cb, thickness=2, lineType=8)
    return img


def visualize_gt(depth, anns, seg=None, depth_max: float = 6.0):
    """Depth -> grayscale, optional red seg overlay, GT skeletons
    (reference: main_visualize_gt.py:8-51)."""
    img = depth_to_gray(depth, depth_max)
    if seg is not None:
        img = overlay_seg(img, seg)
    humans = [np.asarray(a["2d_joints"]).reshape(-1, 2) for a in anns]
    return draw_humans(img, humans)


def visualize_pred(depth, humans, visibilities=None, depth_max: float = 6.0):
    """Depth -> grayscale with predicted skeletons
    (reference: main_visualize_pred.py:8-50)."""
    img = depth_to_gray(depth, depth_max)
    return draw_humans_visibility(img, humans, visibilities=visibilities)
