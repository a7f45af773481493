"""COCO loader + ITOP recipe coverage."""

import json

import numpy as np

from popnet_tpu.core.config import EncoderConfig, ITOP_DATASET
from popnet_tpu.data.coco import coco17_to_rtpose18, coco_eval_results, load_coco_keypoints
from popnet_tpu.data.datasets import KDH3DDataset


def test_coco_loader(tmp_path):
    ann = {
        "images": [{"id": 1, "file_name": "x.jpg"}],
        "annotations": [
            {
                "image_id": 1, "iscrowd": 0, "num_keypoints": 10,
                "keypoints": sum([[10.0 * i, 20.0 * i, 2] for i in range(17)], []),
                "bbox": [5, 5, 100, 200],
            },
            {"image_id": 1, "iscrowd": 0, "num_keypoints": 2,
             "keypoints": [0] * 51, "bbox": [0, 0, 1, 1]},
        ],
    }
    p = tmp_path / "person_keypoints.json"
    json.dump(ann, open(p, "w"))
    labels = load_coco_keypoints(str(p))
    assert list(labels) == ["x.jpg"]
    assert len(labels["x.jpg"]) == 1  # low-keypoint ann dropped
    a = labels["x.jpg"][0]
    assert len(a["2d_joints"]) == 18 and a["bbox"] == [5, 5, 105, 205]
    # neck synthesized from shoulders
    assert a["visible_joints"][1] == 1


def test_coco17_conversion_invisible():
    kp = np.zeros((17, 3))
    kp[0] = (10, 20, 2)  # only nose
    joints, vis = coco17_to_rtpose18(kp)
    assert vis.sum() == 1 and vis[0] == 1 and joints[1, 0] == -1


def test_coco_results_format():
    humans = [[np.full((18, 2), 50.0)]]
    res = coco_eval_results(humans, [7], [[0.9]])
    assert res[0]["image_id"] == 7 and len(res[0]["keypoints"]) == 51


def test_itop_dataset_recipe(tmp_path):
    """Dataset classes run with the ITOP camera/depth config (320x240)."""
    import os

    from popnet_tpu.core.camera import ITOP_INTRINSICS

    h, w, K = 240, 320, 15
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "depth_maps"
    os.makedirs(img_dir)
    labels = {}
    for i in range(4):
        d = rng.uniform(0, 5, (h, w)).astype(np.float32)
        name = f"i{i}.npy"
        np.save(img_dir / name, d)
        j2 = rng.uniform(30, 200, (K, 2))
        j2[:, 1] = np.clip(j2[:, 1], 20, 220)
        z = rng.uniform(1, 4.5, K)
        j3 = np.stack([
            (j2[:, 0] - ITOP_INTRINSICS.cx) / ITOP_INTRINSICS.fx * z,
            (j2[:, 1] - ITOP_INTRINSICS.cy) / ITOP_INTRINSICS.fy * z, z], 1)
        labels[name] = [{
            "2d_joints": j2.tolist(), "3d_joints": j3.tolist(),
            "bbox": [float(j2[:, 0].min()), float(j2[:, 1].min()),
                     float(j2[:, 0].max()), float(j2[:, 1].max())],
        }]
    json.dump(labels, open(tmp_path / "labels.json", "w"))

    ds = KDH3DDataset(
        str(img_dir), str(tmp_path / "labels.json"),
        ecfg=EncoderConfig(max_people=2), dcfg=ITOP_DATASET, seed=0,
    )
    batch = ds.get_batch([0, 1])
    assert batch["image"].shape == (2, 224, 224, 1)
    img = np.asarray(batch["image"])
    # ITOP depth clip is 5 m -> normalized max (5-3)/2 = 1
    assert img.max() <= 1.0 + 1e-5
    assert np.asarray(batch["heatmaps"]).max() > 0.9
