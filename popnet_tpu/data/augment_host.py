"""2D+3D-consistent geometric augmentation — exact host (NumPy/cv2) path.

Bit-parity implementation of the reference's stochastic transform pipeline
(reference: lib/datasets/data_augmentation_2d3d.py:59-552), used for golden
tests and for regenerating the frozen benchmark sets
(generate_kdh3d_{bg,mp}aug_set). The TPU training pipeline uses the fused
single-warp equivalent in augment_device.py (identical label algebra).

Annotations are dicts with '2d_joints' (K, 2), '3d_joints' (K, 3), optional
'bbox' (4,), 'visible_joints', 'pose_weight'. Each transform takes and
returns (image, [ann, ...]); randomness comes from an explicit
np.random.Generator so pipelines are reproducible.
"""

from __future__ import annotations

import copy

import cv2
import numpy as np


def _hom(M, x, y):
    ones = np.ones_like(y)
    pos = np.vstack([x, y, ones])
    t = M @ pos
    return t[0, :] / t[2, :], t[1, :] / t[2, :]


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data


class Cvt2ndarray:
    """Normalize annotation dtypes (reference: data_augmentation_2d3d.py:70-90)."""

    def __init__(self, num_joints: int = 15):
        self.num_joints = num_joints

    def __call__(self, data):
        image, label = data
        out = []
        for lb in label:
            lb = copy.deepcopy(lb)
            lb["2d_joints"] = np.array(lb["2d_joints"]).reshape(self.num_joints, 2).astype(np.float32)
            lb["3d_joints"] = np.array(lb["3d_joints"]).reshape(self.num_joints, 3).astype(np.float32)
            if "visible_joints" in lb:
                lb["visible_joints"] = np.array(lb["visible_joints"])
            if "bbox" in lb:
                lb["bbox"] = np.array(lb["bbox"], dtype=np.float64)
            out.append(lb)
        return image.astype(np.float32), out


class Crop:
    """Random edge crop up to max_crop per side; 2D labels shift
    (reference: data_augmentation_2d3d.py:94-128)."""

    def __init__(self, max_crop: float = 0.1, rng: np.random.Generator | None = None):
        self.max_crop = max_crop
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        image, label = data
        height, width = image.shape[:2]
        crop_left = self.rng.uniform(0, self.max_crop)
        crop_right = self.rng.uniform(0, self.max_crop)
        crop_top = self.rng.uniform(0, self.max_crop)
        crop_bottom = self.rng.uniform(0, self.max_crop)
        return self.apply(image, label, crop_left, crop_right, crop_top, crop_bottom)

    @staticmethod
    def apply(image, label, crop_left, crop_right, crop_top, crop_bottom):
        height, width = image.shape[:2]
        new_xmin = int(min(crop_left * width, width))
        new_ymin = int(min(crop_top * height, height))
        new_xmax = int(max(width - 1 - crop_right * width, 0))
        new_ymax = int(max(height - 1 - crop_bottom * height, 0))
        image = image[new_ymin:new_ymax, new_xmin:new_xmax]
        out = []
        for lb in label:
            lb = copy.deepcopy(lb)
            lb["2d_joints"][:, 0] -= new_xmin
            lb["2d_joints"][:, 1] -= new_ymin
            if "bbox" in lb:
                lb["bbox"][0:4:2] -= new_xmin
                lb["bbox"][1:4:2] -= new_ymin
            out.append(lb)
        return image, out


class RenderDepth:
    """Simulated camera dolly along the principal axis: crop/pad by ratio a
    about (cx, cy), multiply depth values AND 3D Z by the rounding-corrected
    ratio (reference: data_augmentation_2d3d.py:283-350)."""

    def __init__(self, cx=None, cy=None, min_ratio=0.7, max_ratio=1.2,
                 rng: np.random.Generator | None = None):
        self.cx = cx
        self.cy = cy
        self.min_ratio = min_ratio
        self.max_ratio = max_ratio
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        a = self.rng.uniform(self.min_ratio, self.max_ratio)
        image, label = data
        return self.apply(image, label, a, self.cx, self.cy)

    @staticmethod
    def apply(image, label, a, cx=None, cy=None):
        chn = 1 if image.ndim == 2 else image.shape[2]
        height, width = image.shape[:2]
        if cx is None:
            cx = width / 2
        if cy is None:
            cy = height / 2
        xmin, ymin, xmax, ymax = 0.0, 0.0, float(width), float(height)

        new_xmin = int(a * (xmin - cx) + cx)
        new_ymin = int(a * (ymin - cy) + cy)
        new_xmax = int(a * (xmax - cx) + cx)
        new_ymax = int(a * (ymax - cy) + cy)
        # recompute ratio from the rounded bounds (reference :313-320)
        ax = (new_xmin - cx) / (xmin - cx)
        ay = (new_ymin - cy) / (ymin - cy)
        a = (ax + ay) / 2

        new_width = new_xmax - new_xmin + 1
        new_height = new_ymax - new_ymin + 1
        if a <= 1:
            new_image = image[new_ymin:new_ymax, new_xmin:new_xmax]
        else:
            dx = int(xmin - new_xmin)
            dy = int(ymin - new_ymin)
            if chn > 1:
                new_image = np.zeros((new_height, new_width, chn), dtype=np.float32)
                new_image[dy : dy + height, dx : dx + width, :] = image
            else:
                new_image = np.zeros((new_height, new_width), dtype=np.float32)
                new_image[dy : dy + height, dx : dx + width] = image

        out = []
        for lb in label:
            lb = copy.deepcopy(lb)
            lb["2d_joints"][:, 0] -= new_xmin
            lb["2d_joints"][:, 1] -= new_ymin
            lb["3d_joints"][:, 2] *= a
            if "bbox" in lb:
                lb["bbox"][0:4:2] -= new_xmin
                lb["bbox"][1:4:2] -= new_ymin
            out.append(lb)
        return new_image * a, out


class Rotate:
    """+-10 degree rotation about the principal point; 2D via the image
    homography, optionally 3D X, Y about the camera axis
    (reference: data_augmentation_2d3d.py:411-448)."""

    def __init__(self, cx=None, cy=None, is_3d=False, max_deg=10.0,
                 rng: np.random.Generator | None = None):
        self.cx = cx
        self.cy = cy
        self.is_3d = is_3d
        self.max_deg = max_deg
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        rot = self.rng.uniform(-self.max_deg, self.max_deg)
        image, label = data
        return self.apply(image, label, rot, self.cx, self.cy, self.is_3d)

    @staticmethod
    def apply(image, label, rot, cx=None, cy=None, is_3d=False):
        height, width = image.shape[:2]
        center_x = cx if cx is not None else width / 2
        center_y = cy if cy is not None else height / 2
        rot_mat = cv2.getRotationMatrix2D((center_x, center_y), rot, 1.0)
        img_rot = cv2.warpAffine(image, rot_mat, (width, height), flags=cv2.INTER_LINEAR)
        rot_mat = np.vstack([rot_mat, [0, 0, 1]])
        rot_mat3d = np.vstack([cv2.getRotationMatrix2D((0, 0), rot, 1.0), [0, 0, 1]])

        out = []
        for lb in label:
            lb = copy.deepcopy(lb)
            lb["2d_joints"][:, 0], lb["2d_joints"][:, 1] = _hom(
                rot_mat, lb["2d_joints"][:, 0], lb["2d_joints"][:, 1]
            )
            if is_3d:
                lb["3d_joints"][:, 0], lb["3d_joints"][:, 1] = _hom(
                    rot_mat3d, lb["3d_joints"][:, 0], lb["3d_joints"][:, 1]
                )
            out.append(lb)
        return img_rot, out


class Hflip:
    """Horizontal flip with left/right joint swap; 3D X negated
    (reference: data_augmentation_2d3d.py:452-493)."""

    def __init__(self, swap_indices, is_3d=False, rng: np.random.Generator | None = None):
        self.swap_indices = list(swap_indices)
        self.is_3d = is_3d
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        if self.rng.uniform(0, 1) < 0.5:
            return data
        image, label = data
        return self.apply(image, label, self.swap_indices, self.is_3d)

    @staticmethod
    def apply(image, label, swap_indices, is_3d=False):
        image = np.flip(image, axis=1)
        width = image.shape[1]
        out = []
        for lb in label:
            lb = copy.deepcopy(lb)
            lb["2d_joints"][:, 0] = -lb["2d_joints"][:, 0] + width
            if is_3d:
                lb["3d_joints"][:, 0] *= -1
            lb["2d_joints"] = lb["2d_joints"][swap_indices, :]
            if is_3d:
                lb["3d_joints"] = lb["3d_joints"][swap_indices, :]
            if "visible_joints" in lb:
                lb["visible_joints"] = lb["visible_joints"][swap_indices]
            if "bbox" in lb:
                xmin = -lb["bbox"][2] + width
                xmax = -lb["bbox"][0] + width
                lb["bbox"][0] = xmin
                lb["bbox"][2] = xmax
            out.append(lb)
        return image, out


class Resize:
    """Bilinear resize to the network input; 2D labels scale
    (reference: data_augmentation_2d3d.py:497-522)."""

    def __init__(self, target_w: int, target_h: int | None = None):
        self.target_w = target_w
        self.target_h = target_h if target_h is not None else target_w

    def __call__(self, data):
        image, label = data
        height, width = image.shape[:2]
        image = cv2.resize(image, (self.target_w, self.target_h), interpolation=cv2.INTER_LINEAR)
        wr = float(self.target_w) / width
        hr = float(self.target_h) / height
        out = []
        for lb in label:
            lb = copy.deepcopy(lb)
            lb["2d_joints"][:, 0] *= wr
            lb["2d_joints"][:, 1] *= hr
            if "bbox" in lb:
                lb["bbox"][0:4:2] = lb["bbox"][0:4:2].astype(np.float64) * wr
                lb["bbox"][1:4:2] = lb["bbox"][1:4:2].astype(np.float64) * hr
            out.append(lb)
        return image, out


class CropPoseRoi:
    """Crop a random person's joints+margin ROI; keeps only that person's
    label (the A2J / ROI-model input crop,
    reference: data_augmentation_2d3d.py:131-169)."""

    def __init__(self, joint2box_margin: float = 20, rng: np.random.Generator | None = None):
        self.joint2box_margin = joint2box_margin
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        image, label = data
        rnd_id = int(self.rng.integers(len(label)))
        return self.apply(image, label, rnd_id, self.joint2box_margin)

    @staticmethod
    def apply(image, label, person_idx, margin):
        height, width = image.shape[:2]
        j = np.asarray(label[person_idx]["2d_joints"])
        xmin = j[:, 0].min() - margin
        ymin = j[:, 1].min() - margin
        xmax = j[:, 0].max() + margin
        ymax = j[:, 1].max() + margin
        return _apply_roi(image, label, person_idx, xmin, ymin, xmax, ymax, height, width)


class CropPoseRoiJitter:
    """ROI crop with random aspect shrink
    (reference: data_augmentation_2d3d.py:172-231)."""

    def __init__(self, joint2box_margin: float = 20, max_aspect_jitter: float = 0.2,
                 rng: np.random.Generator | None = None):
        self.joint2box_margin = joint2box_margin
        self.max_aspect_jitter = max_aspect_jitter
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        image, label = data
        w_jitter = self.rng.uniform(1 - self.max_aspect_jitter, 1)
        h_jitter = self.rng.uniform(1 - self.max_aspect_jitter, 1)
        rnd_id = int(self.rng.integers(len(label)))
        return self.apply(image, label, rnd_id, self.joint2box_margin, w_jitter, h_jitter)

    @staticmethod
    def apply(image, label, person_idx, margin, w_jitter, h_jitter):
        height, width = image.shape[:2]
        j = np.asarray(label[person_idx]["2d_joints"])
        xmin = j[:, 0].min() - margin
        ymin = j[:, 1].min() - margin
        xmax = j[:, 0].max() + margin
        ymax = j[:, 1].max() + margin
        cx = (xmin + xmax) / 2
        cy = (ymin + ymax) / 2
        crop_w = (xmax - xmin) * w_jitter
        crop_h = (ymax - ymin) * h_jitter
        return _apply_roi(
            image, label, person_idx, cx - crop_w / 2, cy - crop_h / 2,
            cx + crop_w / 2, cy + crop_h / 2, height, width,
        )


class CropPoseRoiV2:
    """ROI crop sized by margin ratios of the joint box
    (reference: data_augmentation_2d3d.py:234-279)."""

    def __init__(self, margin_ratio_x: float = 2.0, margin_ratio_y: float = 1.5,
                 rng: np.random.Generator | None = None):
        self.margin_ratio_x = margin_ratio_x
        self.margin_ratio_y = margin_ratio_y
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        image, label = data
        rnd_id = int(self.rng.integers(len(label)))
        return self.apply(image, label, rnd_id, self.margin_ratio_x, self.margin_ratio_y)

    @staticmethod
    def apply(image, label, person_idx, margin_ratio_x, margin_ratio_y):
        height, width = image.shape[:2]
        j = np.asarray(label[person_idx]["2d_joints"])
        xc = (j[:, 0].min() + j[:, 0].max()) / 2
        yc = (j[:, 1].min() + j[:, 1].max()) / 2
        bw = j[:, 0].max() - j[:, 0].min()
        bh = j[:, 1].max() - j[:, 1].min()
        return _apply_roi(
            image, label, person_idx,
            xc - bw / 2 * margin_ratio_x, yc - bh / 2 * margin_ratio_y,
            xc + bw / 2 * margin_ratio_x, yc + bh / 2 * margin_ratio_y,
            height, width,
        )


def _apply_roi(image, label, person_idx, xmin, ymin, xmax, ymax, height, width):
    new_xmin = int(max(0, min(width, xmin)))
    new_ymin = int(max(0, min(height, ymin)))
    new_xmax = int(max(0, min(width, xmax)))
    new_ymax = int(max(0, min(height, ymax)))
    image = image[new_ymin:new_ymax, new_xmin:new_xmax]
    lb = copy.deepcopy(label[person_idx])
    lb["2d_joints"][:, 0] -= new_xmin
    lb["2d_joints"][:, 1] -= new_ymin
    if "bbox" in lb:
        lb["bbox"][0:4:2] -= new_xmin
        lb["bbox"][1:4:2] -= new_ymin
    return image, [lb]


class RandomScaleRGB:
    """RGB scale crop/pad (RenderDepth's geometry without depth scaling;
    the reference file spells it 'RandomSacleRGB',
    reference: data_augmentation_2d3d.py:354-407)."""

    def __init__(self, min_ratio=0.7, max_ratio=1.3, rng: np.random.Generator | None = None):
        self.min_ratio = min_ratio
        self.max_ratio = max_ratio
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        a = self.rng.uniform(self.min_ratio, self.max_ratio)
        image, label = data
        return self.apply(image, label, a)

    @staticmethod
    def apply(image, label, a):
        height, width, chn = image.shape
        cx, cy = width / 2, height / 2
        new_xmin = int(a * (0 - cx) + cx)
        new_ymin = int(a * (0 - cy) + cy)
        new_xmax = int(a * (width - cx) + cx)
        new_ymax = int(a * (height - cy) + cy)
        ax = (new_xmin - cx) / (0 - cx)
        ay = (new_ymin - cy) / (0 - cy)
        a = (ax + ay) / 2
        if a <= 1:
            new_image = image[new_ymin:new_ymax, new_xmin:new_xmax]
        else:
            new_image = np.zeros(
                (new_ymax - new_ymin + 1, new_xmax - new_xmin + 1, chn), np.float32
            )
            new_image[-new_ymin : -new_ymin + height, -new_xmin : -new_xmin + width] = image
        out = []
        for lb in label:
            lb = copy.deepcopy(lb)
            lb["2d_joints"][:, 0] -= new_xmin
            lb["2d_joints"][:, 1] -= new_ymin
            if "bbox" in lb:
                lb["bbox"][0:4:2] -= new_xmin
                lb["bbox"][1:4:2] -= new_ymin
            out.append(lb)
        return new_image, out


class SquarePadRGB:
    """Zero-pad an RGB image to a centered square
    (reference: data_augmentation_2d3d.py:526-552)."""

    def __call__(self, data):
        image, label = data
        height, width, chn = image.shape
        edge = max(height, width)
        new_image = np.zeros((edge, edge, chn), np.float32)
        x0 = int((edge - width) / 2)
        y0 = int((edge - height) / 2)
        new_image[y0 : y0 + height, x0 : x0 + width] = image
        out = []
        for lb in label:
            lb = copy.deepcopy(lb)
            lb["2d_joints"][:, 0] += x0
            lb["2d_joints"][:, 1] += y0
            if "bbox" in lb:
                lb["bbox"][0:4:2] += x0
                lb["bbox"][1:4:2] += y0
            out.append(lb)
        return new_image, out
