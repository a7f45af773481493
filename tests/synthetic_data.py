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


def person_scene(rng, center, z_base):
    """Gaussian blob person: depth map, seg mask, joints."""
    pts = center + rng.normal(0, 35, size=(K, 2))
    pts = np.clip(pts, 10, [W - 10, H - 10])
    z = z_base + rng.normal(0, 0.05, K)
    depth = np.zeros((H, W), np.float32)
    seg = np.zeros((H, W), np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    for k in range(K):
        m = (np.abs(xs - pts[k, 0]) < 18) & (np.abs(ys - pts[k, 1]) < 18)
        depth[m] = z[k]
        seg[m] = 1.0
    j3 = np.stack(
        [
            (pts[:, 0] - KDH3D_INTRINSICS.cx) / KDH3D_INTRINSICS.fx * z,
            (pts[:, 1] - KDH3D_INTRINSICS.cy) / KDH3D_INTRINSICS.fy * z,
            z,
        ],
        1,
    )
    ann = {
        "2d_joints": pts.tolist(),
        "3d_joints": j3.tolist(),
        "bbox": [
            float(pts[:, 0].min() - 20), float(pts[:, 1].min() - 20),
            float(pts[:, 0].max() + 20), float(pts[:, 1].max() + 20),
        ],
        "pose_weight": float(rng.uniform(0.8, 1.5)),
    }
    return depth, seg, ann


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
