"""Synthetic MP-3DHP-shaped data on disk for pipeline tests.

Builds a miniature dataset tree matching the benchmark layout:
depth_maps/*.npy, seg_maps/*.npy, bg_maps/*.npy, labels.json (with
'intrinsics' sibling key), labels_bg.json — enough to drive every dataset
class without the 800 GB release.
"""

import json
import os

import numpy as np

from popnet_tpu.core.camera import KDH3D_INTRINSICS

H, W = 512, 480
K = 15


def person_scene(rng, center, z_base, H=H, W=W, intr=KDH3D_INTRINSICS,
                 scale=1.0, block=18):
    """Kinematic-template person: depth map, seg mask, joints.

    Joints follow a consistent articulated skeleton (head above neck,
    shoulders L/R of neck, limbs hanging with random articulation), not
    i.i.d. scatter: joint IDENTITY must be inferable from arrangement or
    held-out PCK is bounded by chance and the synthetic-generalization
    benchmark (scripts/syngen.py) measures noise instead of learning.
    Keypoint order matches the benchmark skeleton
    (datasets_kdh3d_mpreal.get_keypoints). H/W/intr/scale parameterize the
    camera geometry (ITOP's 320x240 f=285.7 via build_itop).
    """
    s = rng.uniform(0.85, 1.25) * scale  # person scale
    lean = rng.normal(0.0, 0.12)         # whole-body lean (radians)

    def rot(vx, vy, a):
        return np.array([vx * np.cos(a) - vy * np.sin(a),
                         vx * np.sin(a) + vy * np.cos(a)])

    torso = np.asarray(center, np.float64) + rng.normal(0, 8, 2)
    neck = torso + rot(0, -62 * s, lean)
    head = neck + rot(0, -34 * s, lean + rng.normal(0, 0.1))
    pts = np.zeros((K, 2))
    pts[8] = torso
    pts[1] = neck
    pts[0] = head
    for side, sh_i, el_i, wr_i, hip_i, kn_i, an_i in (
        (+1, 2, 4, 6, 9, 11, 13),        # right
        (-1, 3, 5, 7, 10, 12, 14),       # left
    ):
        sh = neck + rot(side * 30 * s, 6 * s, lean)
        el = sh + rot(0, 42 * s, lean + rng.normal(0, 0.5))
        wr = el + rot(0, 40 * s, lean + rng.normal(0, 0.7))
        hip = torso + rot(side * 20 * s, 46 * s, lean)
        kn = hip + rot(0, 50 * s, lean + rng.normal(0, 0.25))
        an = kn + rot(0, 48 * s, lean + rng.normal(0, 0.25))
        for i, p in ((sh_i, sh), (el_i, el), (wr_i, wr),
                     (hip_i, hip), (kn_i, kn), (an_i, an)):
            pts[i] = p
    pts += rng.normal(0, 2.0 * scale, size=(K, 2))
    pts = np.clip(pts, 10 * scale, [W - 10 * scale, H - 10 * scale])
    z = z_base + rng.normal(0, 0.05, K)
    depth = np.zeros((H, W), np.float32)
    seg = np.zeros((H, W), np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    blk = max(4, int(round(block * scale)))
    for k in range(K):
        m = (np.abs(xs - pts[k, 0]) < blk) & (np.abs(ys - pts[k, 1]) < blk)
        depth[m] = z[k]
        seg[m] = 1.0
    j3 = np.stack(
        [
            (pts[:, 0] - intr.cx) / intr.fx * z,
            (pts[:, 1] - intr.cy) / intr.fy * z,
            z,
        ],
        1,
    )
    margin = 20 * scale
    ann = {
        "2d_joints": pts.tolist(),
        "3d_joints": j3.tolist(),
        "bbox": [
            float(pts[:, 0].min() - margin), float(pts[:, 1].min() - margin),
            float(pts[:, 0].max() + margin), float(pts[:, 1].max() + margin),
        ],
        "pose_weight": float(rng.uniform(0.8, 1.5)),
    }
    return depth, seg, ann


def build_itop(root, n_images=6, seed=0):
    """Synthetic ITOP-geometry set: 320x240 single-person depth frames at
    the ITOP camera (f = 1/0.0035, cx=160, cy=120, 5 m clip — reference:
    datasets_itop.py:37-47), same kinematic person template. Drives the
    ITOP A2J torso-crop recipe and the openpose-ITOP recipe end to end."""
    from popnet_tpu.core.camera import ITOP_INTRINSICS

    rng = np.random.default_rng(seed)
    h, w = 240, 320
    img_dir = os.path.join(root, "depth_maps")
    os.makedirs(img_dir, exist_ok=True)
    intr = {
        "fx": ITOP_INTRINSICS.fx, "fy": ITOP_INTRINSICS.fy,
        "cx": ITOP_INTRINSICS.cx, "cy": ITOP_INTRINSICS.cy,
    }
    labels = {"intrinsics": intr}
    for i in range(n_images):
        center = np.array([w / 2, h / 2]) + rng.uniform(-25, 25, 2)
        depth, _, ann = person_scene(
            rng, center, rng.uniform(1.8, 3.6), H=h, W=w,
            intr=ITOP_INTRINSICS, scale=0.42, block=16,
        )
        # ITOP frames have clutter-free far background within the 5 m clip
        depth[depth == 0] = 4.5
        name = f"itop_{i:04d}.npy"
        np.save(os.path.join(img_dir, name), depth)
        labels[name] = [ann]
    path = os.path.join(root, "labels.json")
    json.dump(labels, open(path, "w"))
    return {"img_dir": img_dir, "labels": path}


def build(root, n_images=6, n_bg=2, n_locations=2, seed=0):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "depth_maps")
    seg_dir = os.path.join(root, "seg_maps")
    bg_dir = os.path.join(root, "bg_maps")
    for d in (img_dir, seg_dir, bg_dir):
        os.makedirs(d, exist_ok=True)

    # backgrounds
    bg_index = {}
    for i in range(n_bg):
        ys, xs = np.mgrid[0:H, 0:W]
        bg = (4.0 + 1.5 * np.sin(xs / 60.0 + i) * np.cos(ys / 80.0)).astype(np.float32)
        name = f"bg_{i:03d}.npy"
        np.save(os.path.join(bg_dir, name), bg)
        bg_index[str(i)] = {"file_name": name}
    json.dump(bg_index, open(os.path.join(root, "labels_bg.json"), "w"))

    intr = {
        "fx": KDH3D_INTRINSICS.fx, "fy": KDH3D_INTRINSICS.fy,
        "cx": KDH3D_INTRINSICS.cx, "cy": KDH3D_INTRINSICS.cy,
    }

    # one label file (single-person frames)
    labels = {"intrinsics": intr}
    for i in range(n_images):
        depth, seg, ann = person_scene(
            rng, np.array([W / 2, H / 2]), rng.uniform(2.5, 4.0)
        )
        name = f"img_{i:04d}.npy"
        np.save(os.path.join(img_dir, name), depth)
        np.save(os.path.join(seg_dir, name), seg)
        labels[name] = [ann]
    json.dump(labels, open(os.path.join(root, "labels.json"), "w"))

    # per-location label files for mp-aug
    loc_files = []
    centers = [np.array([140.0, 256.0]), np.array([340.0, 256.0]),
               np.array([140.0, 380.0]), np.array([340.0, 380.0]),
               np.array([240.0, 300.0])]
    for loc in range(n_locations):
        loc_labels = {"intrinsics": intr}
        for i in range(n_images):
            depth, seg, ann = person_scene(rng, centers[loc % 5], rng.uniform(2.0, 4.5))
            name = f"loc{loc}_{i:04d}.npy"
            np.save(os.path.join(img_dir, name), depth)
            np.save(os.path.join(seg_dir, name), seg)
            loc_labels[name] = [ann]
        path = os.path.join(root, f"labels_loc{loc}.json")
        json.dump(loc_labels, open(path, "w"))
        loc_files.append(path)

    return {
        "img_dir": img_dir,
        "seg_dir": seg_dir,
        "bg_dir": bg_dir,
        "labels": os.path.join(root, "labels.json"),
        "labels_bg": os.path.join(root, "labels_bg.json"),
        "labels_locs": loc_files,
    }
