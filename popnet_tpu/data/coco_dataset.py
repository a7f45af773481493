"""COCO keypoints RGB training dataset (CocoKeypoints equivalent).

Reference: lib/datasets/datasets_coco.py:99-316 — pycocotools-backed Dataset
whose __getitem__ converts COCO-17 annotations to the rtpose-18 order
(``add_neck``, :233-260), masks out-of-input joints (:221-229), and builds
stride-8 Gaussian heatmaps (18 + background) and 38-channel PAFs with Python
per-joint/per-limb loops (:262-313).

TPU-first redesign:

- json-direct annotation parsing (no pycocotools), images filtered to those
  with at least one labeled keypoint (filter_for_keypoint_annotations,
  :144-158).
- Per-batch: host does image IO + letterbox resize to a STATIC canvas (the
  reference keeps ragged per-image sizes, which cannot batch under XLA) and
  scales the keypoints; one jitted device program then paints all heatmaps
  and PAFs for the whole batch (ops/encoders with the COCO-18 tables — the
  same closed-form kernels the depth path uses, golden vs putGaussianMaps /
  putVecMaps).
- Normalization follows data/preprocessing.py (rtpose / vgg variants).
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.core.skeleton_coco import (
    COCO_LIMBS,
    COCO_NUM_JOINTS,
    COCO_SWAP_INDICES,
)
from popnet_tpu.data.datasets import _BaseDataset
from popnet_tpu.data.preprocessing import preprocess

# COCO-17 index -> rtpose-18 order (reference: datasets_coco.py:246-248
# our_order, applied after the neck row is appended at index 17)
_OUR_ORDER = (0, 17, 6, 8, 10, 5, 7, 9, 12, 14, 16, 11, 13, 15, 2, 1, 4, 3)


def rotate_bound(image: np.ndarray, angle_deg: float,
                 border=(128, 128, 128)):
    """Rotate about the image center, expanding the canvas so no pixel is
    cropped; constant gray border (reference: transforms.py:457-480
    RandomRotate.rotate_bound, same -angle cv2 convention). Returns
    (rotated image, 2x3 affine M mapping original -> rotated pixel coords;
    keypoints follow as [x, y, 1] @ M.T, transforms.py:443-452)."""
    import cv2

    h, w = image.shape[:2]
    cx, cy = w // 2, h // 2
    M = cv2.getRotationMatrix2D((cx, cy), -angle_deg, 1.0)
    cos, sin = abs(M[0, 0]), abs(M[0, 1])
    nw = int(h * sin + w * cos)
    nh = int(h * cos + w * sin)
    M[0, 2] += nw / 2 - cx
    M[1, 2] += nh / 2 - cy
    out = cv2.warpAffine(
        image, M, (nw, nh), flags=cv2.INTER_CUBIC,
        borderMode=cv2.BORDER_CONSTANT, borderValue=border,
    )
    return out, M


def blur_image(image: np.ndarray, sigma: float) -> np.ndarray:
    """Spatial-only Gaussian blur (reference: transforms.py:34-39
    blur_augmentation — sigma drawn by the caller, channels untouched)."""
    from scipy import ndimage

    return ndimage.gaussian_filter(image, sigma=(sigma, sigma, 0))


def add_neck(kp17: np.ndarray) -> np.ndarray:
    """(17, 3) -> (18, 3) in rtpose order with the synthesized neck
    (reference: datasets_coco.py:233-260 — note the np.round on the neck
    row and the visibility product rule)."""
    kp17 = np.asarray(kp17, dtype=np.float64)
    r, l = kp17[6], kp17[5]
    neck = (r + l) / 2.0
    neck[2] = 2.0 if (r[2] == 2 and l[2] == 2) else r[2] * l[2]
    neck = np.round(neck)
    return np.vstack([kp17, neck[None]])[list(_OUR_ORDER)]


def load_coco_images(annotation_json: str):
    """person_keypoints_*.json -> list of (file_name, [(17, 3) kp, ...]),
    keeping only images with at least one labeled keypoint
    (reference: datasets_coco.py:144-158)."""
    data = json.load(open(annotation_json))
    images = {im["id"]: im["file_name"] for im in data["images"]}
    per_image: dict[int, list] = {}
    for ann in data.get("annotations", []):
        if "keypoints" not in ann:
            continue
        kp = np.asarray(ann["keypoints"], dtype=np.float64).reshape(17, 3)
        per_image.setdefault(ann["image_id"], []).append(kp)
    out = []
    for img_id, kps in per_image.items():
        if any(np.any(k[:, 2] > 0) for k in kps):
            out.append((images[img_id], kps))
    out.sort(key=lambda t: t[0])
    return out


@functools.partial(jax.jit, static_argnames=("ecfg",))
def encode_coco_batch(joints2d, person_valid, ecfg: EncoderConfig):
    """One device program painting the whole batch's GT maps.

    joints2d (B, P, 18, 2) in input pixels with (-1, -1) holes for invisible
    or out-of-input joints (the encoders' in-bounds gate reproduces the
    reference's v > 0.5 paint condition after remove_illegal_joint);
    person_valid (B, P). Returns heat (B, gh, gw, 19), paf (B, gh, gw, 38).
    """
    from popnet_tpu.ops import encoders

    heat = jax.vmap(lambda j, v: encoders.encode_heatmaps(j, v, ecfg))(
        joints2d, person_valid
    )
    paf = jax.vmap(
        lambda j, v: encoders.encode_pafs(j, v, ecfg, limbs=COCO_LIMBS)
    )(joints2d, person_valid)
    return heat, paf


class CocoKeypointsDataset(_BaseDataset):
    """Batched COCO RGB keypoints dataset for rtpose_vgg / PopNetRGB training.

    Yields dicts {image (B, input_y, input_x, 3) float32 normalized,
    heat (B, gh, gw, 19), paf (B, gh, gw, 38), scale (B,), valid (B, P)}.
    """

    def __init__(
        self,
        image_dir: str,
        annotation_json: str,
        input_y: int = 368,
        input_x: int = 368,
        stride: int = 8,
        mode: str = "vgg",
        is_train: bool = True,
        hflip: bool = True,
        rotate_max_deg: float = 0.0,
        scale_jitter: tuple[float, float] | None = None,
        blur_max_sigma: float = 0.0,
        max_people: int = 16,
        seed: int = 0,
    ):
        # Train-time RGB augmentations mirroring the reference's transform
        # library (lib/datasets/transforms.py): rotate_max_deg —
        # RandomRotate(:403-441), uniform in +-deg with canvas expansion;
        # scale_jitter=(lo, hi) — RescaleRelative(:159-208), a uniform
        # multiplicative factor folded into this dataset's letterbox scale
        # (ONE resample, clamped so the static canvas always fits);
        # blur_max_sigma — blur_augmentation(:34-39), sigma ~ U[0, max].
        # All default off; the reference's own COCO path applies none of
        # them by default either (datasets_coco.py:133 uses Normalize only).
        # deliberately NOT calling _BaseDataset.__init__ (depth-specific);
        # set the attributes its iter_batches prefetch machinery uses
        self.image_dir = image_dir
        self.items = load_coco_images(annotation_json)
        self.ecfg = EncoderConfig(
            input_x=input_x, input_y=input_y, stride=stride,
            num_joints=COCO_NUM_JOINTS, num_limbs=len(COCO_LIMBS),
            max_people=max_people,
        )
        self.mode = mode
        self.is_train = is_train
        self.hflip = hflip and is_train
        self.rotate_max_deg = float(rotate_max_deg) if is_train else 0.0
        self.scale_jitter = scale_jitter if is_train else None
        self.blur_max_sigma = float(blur_max_sigma) if is_train else 0.0
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.items)

    def _load_one(self, index: int):
        """image HWC BGR float32 letterboxed to the canvas (top-left, like
        im_transform.crop_with_factor's padding), joints (P, 18, 2)."""
        import cv2

        fname, kps = self.items[index]
        img = cv2.imread(os.path.join(self.image_dir, fname))
        if img is None:
            raise FileNotFoundError(os.path.join(self.image_dir, fname))
        rot_M = None
        if self.rotate_max_deg > 0.0:
            deg = (self.rng.random() - 0.5) * 2.0 * self.rotate_max_deg
            img, rot_M = rotate_bound(img, deg)
        if self.blur_max_sigma > 0.0:
            img = blur_image(img, self.blur_max_sigma * self.rng.random())
        h, w = img.shape[:2]
        scale = min(self.ecfg.input_y / h, self.ecfg.input_x / w)
        if self.scale_jitter is not None:
            lo, hi = self.scale_jitter
            scale = min(
                scale * self.rng.uniform(lo, hi),
                self.ecfg.input_y / h, self.ecfg.input_x / w,
            )
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = cv2.resize(img, (nw, nh))
        canvas = np.zeros((self.ecfg.input_y, self.ecfg.input_x, 3), img.dtype)
        canvas[:nh, :nw] = resized

        P = self.ecfg.max_people
        joints = np.full((P, COCO_NUM_JOINTS, 2), -1.0)
        valid = np.zeros(P, bool)
        for p, kp17 in enumerate(kps[:P]):
            kp18 = add_neck(kp17)
            vis = kp18[:, 2] > 0.5
            if rot_M is not None:
                xy1 = np.concatenate(
                    [kp18[:, :2], np.ones((kp18.shape[0], 1))], axis=1
                )
                kp18[:, :2] = xy1 @ rot_M.T
            j = np.where(vis[:, None], kp18[:, :2] * scale, -1.0)
            # remove_illegal_joint: out-of-input coords -> the (-1, -1) hole
            bad = (
                (j[:, 0] >= self.ecfg.input_x) | (j[:, 0] < 0)
                | (j[:, 1] >= self.ecfg.input_y) | (j[:, 1] < 0)
            )
            j[bad] = -1.0
            joints[p] = j
            valid[p] = True

        if self.hflip and self.rng.random() < 0.5:
            canvas = canvas[:, ::-1]
            vis_j = joints[..., 0] >= 0
            joints[..., 0] = np.where(
                vis_j, self.ecfg.input_x - 1 - joints[..., 0], joints[..., 0]
            )
            joints = joints[:, list(COCO_SWAP_INDICES)]
        return canvas, joints, valid, scale

    def get_batch(self, indices):
        images, joints, valids, scales = [], [], [], []
        for idx in indices:
            img, j, v, s = self._load_one(int(idx))
            images.append(preprocess(img, self.mode))
            joints.append(j)
            valids.append(v)
            scales.append(s)
        heat, paf = encode_coco_batch(
            jnp.asarray(np.stack(joints), jnp.float32),
            jnp.asarray(np.stack(valids)),
            self.ecfg,
        )
        return {
            "image": jnp.asarray(np.stack(images), jnp.float32),
            "heat": heat,
            "paf": paf,
            "scale": np.asarray(scales, np.float32),
            "valid": np.stack(valids),
        }
