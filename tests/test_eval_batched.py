"""Batched on-device PCK must match the NumPy reference implementation."""

import numpy as np

from popnet_tpu.eval import pck as np_pck
from popnet_tpu.eval.batched import (
    eval_pck2d_batched,
    eval_pck3d_batched,
    eval_pckh2d_batched,
    pack_human_sets,
)

from tests.test_eval_golden import make_scene


def test_batched_pck_matches_numpy():
    gt2d, gt3d, pred2d, pred3d, conf, _ = make_scene(np.random.default_rng(3), num_images=20)
    g2, g3, _, gv = pack_human_sets(gt2d, gt3d)
    p2, p3, _, pv = pack_human_sets(pred2d, pred3d)

    ref_avg, ref_pck = np_pck.eval_human_dataset_2d(pred2d, gt2d, dist_th=10.0)
    avg, pck = eval_pck2d_batched(g2, gv, p2, pv, dist_th=10.0)
    np.testing.assert_allclose(pck, ref_pck, atol=1e-6)
    np.testing.assert_allclose(avg, ref_avg, rtol=1e-5)

    ref_avg, ref_pck = np_pck.eval_human_dataset_2d_pckh(pred2d, gt2d, head_id=0, neck_id=1)
    avg, pck = eval_pckh2d_batched(g2, gv, p2, pv)
    np.testing.assert_allclose(pck, ref_pck, atol=1e-6)
    np.testing.assert_allclose(avg, ref_avg, rtol=1e-5)

    ref_avg, ref_pck = np_pck.eval_human_dataset_3d(pred2d, gt2d, pred3d, gt3d, dist_th=0.1)
    avg, pck = eval_pck3d_batched(g2, g3, gv, p2, p3, pv, dist_th=0.1)
    np.testing.assert_allclose(pck, ref_pck, atol=1e-6)
    np.testing.assert_allclose(avg, ref_avg, rtol=1e-5)


def test_batched_pck_empty_pred_images():
    """Images with zero predictions must contribute all-unmatched GTs."""
    gt2d, gt3d, pred2d, pred3d, _, _ = make_scene(np.random.default_rng(4), num_images=6)
    pred2d[2] = []
    pred3d[2] = []
    g2, g3, _, gv = pack_human_sets(gt2d, gt3d)
    p2, p3, _, pv = pack_human_sets(pred2d, pred3d)
    ref_avg, ref_pck = np_pck.eval_human_dataset_2d(pred2d, gt2d, dist_th=10.0)
    avg, pck = eval_pck2d_batched(g2, gv, p2, pv, dist_th=10.0)
    np.testing.assert_allclose(pck, ref_pck, atol=1e-6)
    np.testing.assert_allclose(avg, ref_avg, rtol=1e-5)


def test_batched_map_matches_numpy():
    from popnet_tpu.eval import map as np_map
    from popnet_tpu.eval.batched import eval_ap_batched

    gt2d, _, pred2d, _, conf, _ = make_scene(np.random.default_rng(6), num_images=15)
    ref = np_map.eval_ap_mpii_v2(
        pred2d, [list(c) for c in conf], gt2d, gt_visibility_set=[],
        head_id=0, neck_id=1, joint_names=[str(i) for i in range(15)],
        thresh=0.5, verbose=False,
    )

    g2, _, _, gv = pack_human_sets(gt2d)
    p2, _, cf, pv = pack_human_sets(pred2d, conf=conf)
    hsz = 2.0 * np.sqrt(((g2[:, :, 0] - g2[:, :, 1]) ** 2).sum(-1))
    gvis = np.ones(g2.shape[:3], np.float32)
    ap = eval_ap_batched(p2, cf, pv, g2, gvis, gv, hsz, thresh=0.5)
    np.testing.assert_allclose(ap, ref, atol=1e-6)
