"""Heatmap peak detection with sub-pixel bicubic refinement (host reference).

Exact-semantics NumPy/cv2 implementation of the reference's NMS
(reference: lib/utils/paf_to_pose.py:33-153):

1. local maxima of each joint heatmap under a cross (4-neighbor) footprint,
   above `thresh`;
2. for each peak, bicubic-upsample the surrounding 5x5 patch by the
   downsample factor and take the argmax for a sub-pixel position;
3. coordinates map through the half-pixel convention
   (c + 0.5) * factor - 0.5.

The batched on-device equivalent lives in decode/device.py; this module is
the parity oracle and the fallback path.
"""

from __future__ import annotations

import cv2
import numpy as np
from scipy.ndimage import maximum_filter

_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)


def find_peaks(thresh: float, img: np.ndarray, top_n: int | None = None) -> np.ndarray:
    """[x, y] integer coordinates of local maxima above `thresh`
    (reference: paf_to_pose.py:33-46, prior_pose_align.py:378-398)."""
    peaks_binary = (maximum_filter(img, footprint=_CROSS) == img) & (img > thresh)
    peaks = np.array(np.nonzero(peaks_binary)[::-1]).T
    if top_n and len(peaks) > top_n:
        confs = img[peaks[:, 1], peaks[:, 0]]
        order = np.argsort(confs)[::-1]
        return peaks[order[:top_n]]
    return peaks


def compute_resized_coords(coords, resize_factor):
    """Half-pixel coordinate mapping under resize
    (reference: paf_to_pose.py:49-73)."""
    return (np.array(coords, dtype=float) + 0.5) * resize_factor - 0.5


def nms_heatmaps(
    heatmaps: np.ndarray,
    upsamp_factor: float = 8.0,
    thresh: float = 0.1,
    num_joints: int = 15,
    refine_center: bool = True,
    win_size: int = 2,
):
    """Per-joint peak lists [(N_j, 4) of x, y, score, id]
    (reference: paf_to_pose.py:75-153)."""
    joint_list_per_joint_type = []
    cnt_total = 0
    for joint in range(num_joints):
        map_orig = heatmaps[:, :, joint]
        peak_coords = find_peaks(thresh, map_orig)
        peaks = np.zeros((len(peak_coords), 4))
        for i, peak in enumerate(peak_coords):
            if refine_center:
                x_min, y_min = np.maximum(0, peak - win_size)
                x_max, y_max = np.minimum(np.array(map_orig.T.shape) - 1, peak + win_size)
                patch = map_orig[y_min : y_max + 1, x_min : x_max + 1]
                map_upsamp = cv2.resize(
                    patch.astype(np.float32), None, fx=upsamp_factor, fy=upsamp_factor,
                    interpolation=cv2.INTER_CUBIC,
                )
                loc_max = np.unravel_index(map_upsamp.argmax(), map_upsamp.shape)
                patch_center = compute_resized_coords(peak[::-1] - [y_min, x_min], upsamp_factor)
                refined = np.array(loc_max) - patch_center  # (dy, dx)
                score = map_upsamp[loc_max]
            else:
                refined = np.zeros(2)
                score = map_orig[tuple(peak[::-1])]
            xy = compute_resized_coords(peak_coords[i], upsamp_factor) + refined[::-1]
            peaks[i, :] = (xy[0], xy[1], score, cnt_total)
            cnt_total += 1
        joint_list_per_joint_type.append(peaks)
    return joint_list_per_joint_type
