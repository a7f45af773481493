"""Golden tests: popnet_tpu.eval must reproduce the reference metrics exactly."""

import numpy as np
import pytest

from tests import reference_shim  # noqa: F401  (installs aliases + sys.path)
from util import eval_pck as ref_pck
from util import eval_mAP as ref_map

from popnet_tpu.core.skeleton import KEYPOINT_NAMES
from popnet_tpu.eval import pck as our_pck
from popnet_tpu.eval import map as our_map

K = 15


def make_scene(rng, num_images=12, max_people=3, drop_prob=0.15, fp_prob=0.3):
    """Random multi-person scenes with holes and false positives."""
    gt2d, gt3d, pred2d, pred3d, conf, vis = [], [], [], [], [], []
    for _ in range(num_images):
        n = rng.integers(1, max_people + 1)
        g2, g3, p2, p3, cf, vs = [], [], [], [], [], []
        for _p in range(n):
            center = rng.uniform(60, 400, size=2)
            joints = center + rng.normal(0, 40, size=(K, 2))
            z = rng.uniform(1.5, 5.0) + rng.normal(0, 0.2, size=K)
            g2.append(joints.tolist())
            g3.append(
                np.stack([(joints[:, 0] - 232) / 504 * z, (joints[:, 1] - 320) / 504 * z, z], 1).tolist()
            )
            vs.append((rng.uniform(size=K) > 0.1).astype(float).tolist())
            # prediction: perturbed copy, some joints dropped
            pj = joints + rng.normal(0, 6, size=(K, 2))
            pz = z + rng.normal(0, 0.05, size=K)
            dropped = rng.uniform(size=K) < drop_prob
            pj[dropped] = -1.0
            p3j = np.stack([(pj[:, 0] - 232) / 504 * pz, (pj[:, 1] - 320) / 504 * pz, pz], 1)
            p2.append(pj.tolist())
            p3.append(p3j.tolist())
            cf.append(rng.uniform(0.2, 1.0, size=K).tolist())
        # occasional false positive
        if rng.uniform() < fp_prob:
            fp = rng.uniform(0, 460, size=(K, 2))
            fz = rng.uniform(1, 5, size=K)
            p2.append(fp.tolist())
            p3.append(
                np.stack([(fp[:, 0] - 232) / 504 * fz, (fp[:, 1] - 320) / 504 * fz, fz], 1).tolist()
            )
            cf.append(rng.uniform(0.0, 0.6, size=K).tolist())
        gt2d.append(g2)
        gt3d.append(g3)
        pred2d.append(p2)
        pred3d.append(p3)
        conf.append(cf)
        vis.append(vs)
    return gt2d, gt3d, pred2d, pred3d, conf, vis


@pytest.fixture(scope="module")
def scene():
    return make_scene(np.random.default_rng(0))


@pytest.mark.reference
def test_match_humans_2d_golden(scene):
    gt2d, _, pred2d, _, _, _ = scene
    for i in range(len(gt2d)):
        ref = ref_pck.match_humans_2d(pred2d[i], gt2d[i], 0.5)
        ours = our_pck.match_humans_2d(pred2d[i], gt2d[i], 0.5)
        assert len(ref) == len(ours)
        for a, b in zip(ref, ours):
            np.testing.assert_allclose(a, b, rtol=1e-12)


@pytest.mark.reference
def test_match_empty_pred(scene):
    gt2d, _, _, _, _, _ = scene
    ref = ref_pck.match_humans_2d([], gt2d[0], 0.5)
    ours = our_pck.match_humans_2d([], gt2d[0], 0.5)
    for a, b in zip(ref, ours):
        np.testing.assert_allclose(a, b)


@pytest.mark.reference
def test_pck_2d_golden(scene):
    gt2d, _, pred2d, _, _, _ = scene
    ref = ref_pck.eval_human_dataset_2d(pred2d, gt2d, num_joints=K, dist_th=10.0, iou_th=0.5)
    ours = our_pck.eval_human_dataset_2d(pred2d, gt2d, num_joints=K, dist_th=10.0, iou_th=0.5)
    np.testing.assert_allclose(ref[0], ours[0], rtol=1e-12)
    np.testing.assert_allclose(ref[1], ours[1], rtol=1e-12)


@pytest.mark.reference
def test_pckh_2d_golden(scene):
    gt2d, _, pred2d, _, _, vis = scene
    for v in (None, vis):
        ref = ref_pck.eval_human_dataset_2d_PCKh(
            pred2d, gt2d, head_id=0, neck_id=1, num_joints=K, h_th=0.5, iou_th=0.5,
            human_gt_set_visibility=None if v is None else [list(map(list, x)) for x in v],
        )
        ours = our_pck.eval_human_dataset_2d_pckh(
            pred2d, gt2d, head_id=0, neck_id=1, num_joints=K, h_th=0.5, iou_th=0.5,
            human_gt_set_visibility=None if v is None else [list(map(list, x)) for x in v],
        )
        np.testing.assert_allclose(ref[0], ours[0], rtol=1e-12)
        np.testing.assert_allclose(ref[1], ours[1], rtol=1e-12)


@pytest.mark.reference
def test_pck_3d_golden(scene):
    gt2d, gt3d, pred2d, pred3d, _, _ = scene
    ref = ref_pck.eval_human_dataset_3d(
        pred2d, gt2d, pred3d, gt3d, num_joints=K, dist_th=0.1, iou_th=0.5
    )
    ours = our_pck.eval_human_dataset_3d(
        pred2d, gt2d, pred3d, gt3d, num_joints=K, dist_th=0.1, iou_th=0.5
    )
    np.testing.assert_allclose(ref[0], ours[0], rtol=1e-12)
    np.testing.assert_allclose(ref[1], ours[1], rtol=1e-12)


@pytest.mark.reference
def test_voc_ap_and_rpc_golden():
    rng = np.random.default_rng(1)
    scores = rng.uniform(size=200)
    labels = (rng.uniform(size=200) > 0.5).astype(int)
    ref_p, ref_r = ref_map.getRPC(scores.tolist(), labels.tolist(), labels.sum())
    our_p, our_r = our_map.get_rpc(scores.tolist(), labels.tolist(), labels.sum())
    np.testing.assert_allclose(ref_p, our_p, rtol=1e-12)
    np.testing.assert_allclose(ref_r, our_r, rtol=1e-12)
    assert ref_map.VOCap(ref_r, ref_p) == pytest.approx(our_map.voc_ap(our_r, our_p), rel=1e-12)


@pytest.mark.reference
def test_map_2d_v2_golden(scene):
    gt2d, _, pred2d, _, conf, _ = scene
    ref = ref_map.eval_ap_mpii_v2(
        pred2d, [list(c) for c in conf], gt2d, gt_visibility_set=[],
        head_id=0, neck_id=1, joint_names=list(KEYPOINT_NAMES), thresh=0.5,
    )
    ours = our_map.eval_ap_mpii_v2(
        pred2d, [list(c) for c in conf], gt2d, gt_visibility_set=[],
        head_id=0, neck_id=1, joint_names=list(KEYPOINT_NAMES), thresh=0.5, verbose=False,
    )
    np.testing.assert_allclose(ref, ours, rtol=1e-9)


@pytest.mark.reference
def test_map_3d_golden(scene):
    _, gt3d, _, pred3d, conf, _ = scene
    ref = ref_map.eval_ap_3D(
        pred3d, [list(c) for c in conf], gt3d, gt_visibility_set=[],
        joint_names=list(KEYPOINT_NAMES), thresh=0.1,
    )
    ours = our_map.eval_ap_3d(
        pred3d, [list(c) for c in conf], gt3d, gt_visibility_set=[],
        joint_names=list(KEYPOINT_NAMES), thresh=0.1, verbose=False,
    )
    np.testing.assert_allclose(ref, ours, rtol=1e-9)


@pytest.mark.reference
def test_pckh_rect_golden(scene):
    gt2d, _, pred2d, _, _, _ = scene
    rng = np.random.default_rng(5)
    head_sz_set = []
    for humans in gt2d:
        rects = []
        for h in humans:
            x, y = h[0][0], h[0][1]
            rects.append([x - 15, y - 20, x + 15 + rng.uniform(0, 5), y + 10])
        head_sz_set.append(rects)
    ref = ref_pck.eval_human_dataset_2d_PCKh_rect(
        pred2d, gt2d, head_sz_set, num_joints=K, h_th=0.5, iou_th=0.5
    )
    ours = our_pck.eval_human_dataset_2d_pckh_rect(
        pred2d, gt2d, head_sz_set, num_joints=K, h_th=0.5, iou_th=0.5
    )
    np.testing.assert_allclose(ref[0], ours[0], rtol=1e-12)
    np.testing.assert_allclose(ref[1], ours[1], rtol=1e-12)


@pytest.mark.reference
def test_map_2d_headrect_golden(scene):
    gt2d, _, pred2d, _, conf, _ = scene
    rng = np.random.default_rng(6)
    head_sz_set = []
    for humans in gt2d:
        rects = []
        for h in humans:
            x, y = h[0][0], h[0][1]
            rects.append([x - 15, y - 20, x + 15 + rng.uniform(0, 5), y + 10])
        head_sz_set.append(rects)
    ref = ref_map.eval_ap_mpii(
        pred2d, [list(c) for c in conf], gt2d, gt_visibility_set=[],
        head_sz_set=head_sz_set, joint_names=[str(i) for i in range(K)], thresh=0.5,
    )
    ours = our_map.eval_ap_mpii(
        pred2d, [list(c) for c in conf], gt2d, gt_visibility_set=[],
        head_sz_set=head_sz_set, joint_names=[str(i) for i in range(K)],
        thresh=0.5, verbose=False,
    )
    np.testing.assert_allclose(ref, ours, rtol=1e-9)
