"""MPII RGB keypoints: label parsing + dataset (the RGB PoP-Net side).

Reference: lib/datasets/parse_mpii_dataset_from_json.py (label conversion),
datasets_mpii_new.py (visibility assignment, 16-joint MPII skeleton).
The RGB variant trains PopNet(pred_vis=True) with pop_net_rgb-style targets:
heatmaps + align maps + prior with per-joint visibility; no depth channels.
"""

from __future__ import annotations

import json

import numpy as np

# MPII 16-joint order (reference: parse_mpii_dataset_from_json.py:32-35)
MPII_KEYPOINT_NAMES: tuple[str, ...] = (
    "ANKLE_RIGHT", "KNEE_RIGHT", "HIP_RIGHT", "HIP_LEFT", "KNEE_LEFT",
    "ANKLE_LEFT", "PELVIS", "THORAX", "UPPER_NECK", "HEAD_TOP",
    "WRIST_RIGHT", "ELBOW_RIGHT", "SHOULDER_RIGHT", "SHOULDER_LEFT",
    "ELBOW_LEFT", "WRIST_LEFT",
)
MPII_NUM_JOINTS = len(MPII_KEYPOINT_NAMES)  # 16


def _mpii_limbs():
    i = MPII_KEYPOINT_NAMES.index
    return (
        (i("PELVIS"), i("HIP_RIGHT")),
        (i("HIP_RIGHT"), i("KNEE_RIGHT")),
        (i("KNEE_RIGHT"), i("ANKLE_RIGHT")),
        (i("PELVIS"), i("HIP_LEFT")),
        (i("HIP_LEFT"), i("KNEE_LEFT")),
        (i("KNEE_LEFT"), i("ANKLE_LEFT")),
        (i("PELVIS"), i("THORAX")),
        (i("THORAX"), i("UPPER_NECK")),
        (i("UPPER_NECK"), i("HEAD_TOP")),
        (i("THORAX"), i("SHOULDER_RIGHT")),
        (i("SHOULDER_RIGHT"), i("ELBOW_RIGHT")),
        (i("ELBOW_RIGHT"), i("WRIST_RIGHT")),
        (i("THORAX"), i("SHOULDER_LEFT")),
        (i("SHOULDER_LEFT"), i("ELBOW_LEFT")),
        (i("ELBOW_LEFT"), i("WRIST_LEFT")),
    )


MPII_LIMBS = _mpii_limbs()

_SWAPS = (
    ("ANKLE_RIGHT", "ANKLE_LEFT"), ("KNEE_RIGHT", "KNEE_LEFT"),
    ("HIP_RIGHT", "HIP_LEFT"), ("WRIST_RIGHT", "WRIST_LEFT"),
    ("ELBOW_RIGHT", "ELBOW_LEFT"), ("SHOULDER_RIGHT", "SHOULDER_LEFT"),
)


def _swap_indices():
    m = {}
    for a, b in _SWAPS:
        m[a] = MPII_KEYPOINT_NAMES.index(b)
        m[b] = MPII_KEYPOINT_NAMES.index(a)
    return tuple(m.get(n, i) for i, n in enumerate(MPII_KEYPOINT_NAMES))


MPII_SWAP_INDICES = _swap_indices()


def prepare_mpii_labels(annotation_json: str, istrain: bool = True) -> dict:
    """Standard MPII JSON release -> our per-image label dict
    (reference: parse_mpii_dataset_from_json.py:56-90)."""
    annos = json.load(open(annotation_json))
    image_label_dict: dict[str, list] = {}
    for a in annos:
        name = a["image"]
        image_label_dict.setdefault(name, [])
        if istrain:
            image_label_dict[name].append(
                {"2d_joints": a["joints"], "visible_joints": a["joints_vis"]}
            )
    return image_label_dict


def assign_visibility_from_border(anns, height: int, width: int, margin: int = 3,
                                  intersect_gt: bool = False):
    """Per-joint visibility from the image border (and optionally the GT
    flags) (reference: datasets_mpii_new.py:142-189)."""
    out = []
    for ann in anns:
        ann = dict(ann)
        j = np.asarray(ann["2d_joints"], dtype=np.float64)
        vis = (
            (j[:, 0] >= margin) & (j[:, 0] < width - margin)
            & (j[:, 1] >= margin) & (j[:, 1] < height - margin)
        )
        if intersect_gt and "visible_joints" in ann:
            vis = vis & (np.asarray(ann["visible_joints"]) != 0)
        ann["visible_joints"] = vis.astype(np.int64).tolist()
        out.append(ann)
    return out


def bbox_from_visible_joints(ann, margin: float = 25.0):
    j = np.asarray(ann["2d_joints"], dtype=np.float64)
    vis = np.asarray(ann.get("visible_joints", np.ones(len(j)))) > 0
    jv = j[vis] if vis.any() else j
    return [
        float(jv[:, 0].min() - margin), float(jv[:, 1].min() - margin),
        float(jv[:, 0].max() + margin), float(jv[:, 1].max() + margin),
    ]


def _unwrap(a):
    """Peel size-1 object-array wrappers (loadmat nesting varies)."""
    import numpy as _np

    while isinstance(a, _np.ndarray) and a.dtype == object and a.size == 1:
        a = a.reshape(-1)[0]
    return a


def _cells(a):
    """Iterate the entries of a matlab cell/struct array."""
    import numpy as _np

    a = _unwrap(a) if isinstance(a, _np.ndarray) and a.dtype == object and a.size == 1 else a
    if isinstance(a, _np.ndarray):
        return [x for x in a.reshape(-1)]
    return [a]


def _scalar(a):
    a = _unwrap(a)
    import numpy as _np

    if isinstance(a, _np.ndarray):
        return a.reshape(-1)[0]
    return a


def prepare_mpii_labels_from_mat(mat_path: str, train_only: bool = True):
    """Official MPII RELEASE .mat -> per-image label dict with head rects.

    Walks RELEASE.annolist / img_train, collecting per-person joint
    positions (id-indexed, 16 joints), visibility flags, and the MPII head
    rectangle (reference: parse_mpii_dataset_from_mat.py:62-113). Robust to
    loadmat's varying object-array nesting.
    """
    import scipy.io as sio

    mat = sio.loadmat(mat_path)
    release = _unwrap(mat["RELEASE"])
    annolist = _cells(release["annolist"])
    img_train = np.asarray(_unwrap(release["img_train"])).reshape(-1)
    out: dict[str, list] = {}
    for anno, train_flag in zip(annolist, img_train):
        if train_only and not int(train_flag):
            continue
        anno = _unwrap(anno)
        image = _unwrap(anno["image"])
        img_fn = str(_scalar(image["name"]))
        rects_arr = anno["annorect"]
        if "annopoints" not in str(getattr(_unwrap(rects_arr), "dtype", "")):
            continue
        for rect in _cells(rects_arr):
            rect = _unwrap(rect)
            try:
                head_rect = [float(_scalar(rect["x1"])), float(_scalar(rect["y1"])),
                             float(_scalar(rect["x2"])), float(_scalar(rect["y2"]))]
                pts = _unwrap(_unwrap(rect["annopoints"])["point"])
            except (ValueError, IndexError, KeyError, TypeError):
                continue
            if getattr(pts, "size", 0) == 0:
                continue
            j_ids = [int(_scalar(v)) for v in _cells(pts["id"])]
            xs = [float(_scalar(v)) for v in _cells(pts["x"])]
            ys = [float(_scalar(v)) for v in _cells(pts["y"])]
            if "is_visible" in str(pts.dtype):
                vis_raw = []
                for v in _cells(pts["is_visible"]):
                    v = _unwrap(v)
                    vis_raw.append(int(_scalar(v)) if getattr(v, "size", 1) else 0)
            else:
                continue
            joints = np.full((MPII_NUM_JOINTS, 2), -1.0)
            vis = np.zeros(MPII_NUM_JOINTS, dtype=int)
            for j_id, x, y, v in zip(j_ids, xs, ys, vis_raw):
                if 0 <= j_id < MPII_NUM_JOINTS:
                    joints[j_id] = (x, y)
                    vis[j_id] = v
            out.setdefault(img_fn, []).append(
                {
                    "2d_joints": joints.tolist(),
                    "visible_joints": vis.tolist(),
                    "head_rect": head_rect,
                }
            )
    return out


# ---- batched MPII training dataset (PopNetRGB targets) -------------------


def mpii_anchors(input_y: int = 368, stride_prior: int = 16):
    """Reference default anchors (datasets_mpii_new.py:235-238):
    anchor_h = input_y/stride_prior - 3; [(h/2, h/4), (h, h/2)] as (w, h)."""
    h = input_y / stride_prior - 3
    return ((h / 2, h / 4), (h, h / 2))


import functools as _functools

import jax as _jax


@_functools.partial(_jax.jit, static_argnames=("ecfg",))
def encode_mpii_batch(joints2d, vis, valid, bboxes, weights, ecfg):
    """One device program painting a whole batch of MPII RGB targets
    (reference: datasets_mpii_new.py:413-517 get_ground_truth):

    - heatmaps gate on in-bounds coords only (occluded joints still paint);
    - align maps additionally require visibility (invisible joints are
      pushed out of bounds before encoding);
    - prior targets carry [box, conf, K x (x, y, VIS)] — visibility rides
      the z slot of the depth encoder with identity normalization.
    Returns dict(heat, align_maps, fg_masks_align, prior_map,
    prior_mask_conf, prior_mask_coord, prior_weight_map).
    """
    import jax
    import jax.numpy as jnp

    from popnet_tpu.core.config import DepthStats
    from popnet_tpu.ops import encoders

    ident = DepthStats(mean=0.0, std=1.0, max=1.0)

    def one(j2, v, val, bb, w):
        heat = encoders.encode_heatmaps(j2, val, ecfg)
        j2_vis = jnp.where(v[..., None] > 0, j2, -1e6)
        amap, afg = encoders.encode_alignmaps(j2_vis, val, ecfg)
        prior, mconf, mcoord, wmap = encoders.encode_prior_targets(
            bb, j2, v, w, val, ecfg, ident
        )
        return {
            "heatmaps": heat, "align_maps": amap, "fg_masks_align": afg,
            "prior_map": prior, "prior_mask_conf": mconf,
            "prior_mask_coord": mcoord, "prior_weight_map": wmap,
        }

    return jax.vmap(one)(joints2d, vis, valid, bboxes, weights)


class MPIIKeypointsDataset:
    """Batched MPII RGB dataset for PopNetRGB training
    (reference: datasets_mpii_new.py:203-517 MPII_Keypoints).

    Host: image IO + letterbox to a static canvas + imagenet normalization
    (the reference's BGR->RGB /255 Normalize(rgb_mean, rgb_std) ==
    data/preprocessing.vgg_preprocess); device: one jitted program encodes
    the whole batch's heat / align / prior-with-visibility targets.
    """

    def __init__(self, img_dir: str, ann_file: str, input_y: int = 368,
                 input_x: int = 368, stride: int = 8, stride_prior: int = 16,
                 align_radius: int = 3, max_people: int = 8,
                 is_train: bool = True, hflip: bool = True, seed: int = 0,
                 border_margin: int = 3):
        from popnet_tpu.core.config import EncoderConfig

        self.img_dir = img_dir
        self.anno_dic = prepare_mpii_labels(ann_file, istrain=True)
        self.ids = list(self.anno_dic.keys())
        self.ecfg = EncoderConfig(
            input_x=input_x, input_y=input_y, stride=stride,
            stride_align=stride, stride_prior=stride_prior,
            align_radius=align_radius, num_joints=MPII_NUM_JOINTS,
            num_limbs=len(MPII_LIMBS),
            anchors=mpii_anchors(input_y, stride_prior),
            max_people=max_people,
        )
        self.is_train = is_train
        self.hflip = hflip and is_train
        self.border_margin = border_margin
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.ids)

    def _load_one(self, index: int):
        import cv2

        fname = self.ids[index]
        img = cv2.imread(f"{self.img_dir}/{fname}")
        if img is None:
            raise FileNotFoundError(f"{self.img_dir}/{fname}")
        h, w = img.shape[:2]
        anns = assign_visibility_from_border(
            self.anno_dic[fname], h, w, margin=self.border_margin,
            intersect_gt=True,
        )
        scale = min(self.ecfg.input_y / h, self.ecfg.input_x / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        canvas = np.zeros((self.ecfg.input_y, self.ecfg.input_x, 3), img.dtype)
        canvas[:nh, :nw] = cv2.resize(img, (nw, nh))

        P, K = self.ecfg.max_people, MPII_NUM_JOINTS
        joints = np.full((P, K, 2), -1.0)
        vis = np.zeros((P, K), np.float32)
        valid = np.zeros(P, bool)
        boxes = np.zeros((P, 4), np.float32)
        weights = np.ones(P, np.float32)
        flip = self.hflip and self.rng.random() < 0.5
        for p, ann in enumerate(anns[:P]):
            v = (np.asarray(ann["visible_joints"]) != 0).astype(np.float32)
            if v.sum() == 0:
                continue  # reference skips people with no visible joints
            j = np.asarray(ann["2d_joints"], np.float64) * scale
            if flip:
                j[:, 0] = self.ecfg.input_x - 1 - j[:, 0]
                j = j[list(MPII_SWAP_INDICES)]
                v = v[list(MPII_SWAP_INDICES)]
            joints[p], vis[p], valid[p] = j, v, True
            boxes[p] = bbox_from_visible_joints(
                {"2d_joints": j.tolist(), "visible_joints": v.tolist()},
                margin=10.0,
            )
            weights[p] = float(ann.get("pose_weight", 1.0))
        return canvas, joints, vis, valid, boxes, weights

    def get_batch(self, indices):
        import jax.numpy as jnp

        from popnet_tpu.data.preprocessing import vgg_preprocess

        imgs, j2, vis, valid, boxes, weights = [], [], [], [], [], []
        for i in indices:
            c, j, v, val, bb, w = self._load_one(int(i))
            imgs.append(vgg_preprocess(c))
            j2.append(j)
            vis.append(v)
            valid.append(val)
            boxes.append(bb)
            weights.append(w)
        batch = dict(
            encode_mpii_batch(
                jnp.asarray(np.stack(j2), jnp.float32),
                jnp.asarray(np.stack(vis), jnp.float32),
                jnp.asarray(np.stack(valid)),
                jnp.asarray(np.stack(boxes), jnp.float32),
                jnp.asarray(np.stack(weights), jnp.float32),
                self.ecfg,
            )
        )
        batch["image"] = jnp.asarray(np.stack(imgs), jnp.float32)
        return batch

    # prefetching batch iterator shared with the depth datasets
    from popnet_tpu.data.datasets import _BaseDataset as _B

    iter_batches = _B.iter_batches
    del _B
