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
