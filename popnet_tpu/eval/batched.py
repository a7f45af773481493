"""Batched on-device evaluation: PCK/PCKh and the mAP assignment step.

The NumPy implementations (eval/pck.py, eval/map.py) are the semantic source
of truth; these jitted versions run the whole dataset's matching in one XLA
program over padded (N, P, K, ...) arrays — the BASELINE target of
"best-match scoring batched on TPU with numerically matching results".

Padding conventions: per-image person counts become validity masks; invalid
joints are [-1, -1] exactly like the JSON contract. Semantics follow the
reference for well-formed inputs (every valid human has >= 1 valid joint).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e9


def pack_human_sets(set2d, set3d=None, conf=None, max_people=None, num_joints=15):
    """Per-image human lists -> padded arrays + mask."""
    n = len(set2d)
    P = max_people or max((len(h) for h in set2d), default=1) or 1
    out2 = np.full((n, P, num_joints, 2), -1.0, np.float32)
    out3 = np.zeros((n, P, num_joints, 3), np.float32)
    cf = np.zeros((n, P, num_joints), np.float32)
    valid = np.zeros((n, P), bool)
    for i, humans in enumerate(set2d):
        for j, h in enumerate(humans[:P]):
            out2[i, j] = np.asarray(h, np.float32).reshape(num_joints, 2)
            valid[i, j] = True
            if set3d is not None and j < len(set3d[i]):
                out3[i, j] = np.asarray(set3d[i][j], np.float32).reshape(num_joints, 3)
            if conf is not None and j < len(conf[i]):
                cf[i, j] = np.asarray(conf[i][j], np.float32)
    return out2, out3, cf, valid


def _bboxes(j2, person_valid):
    """(N, P, 4) tight boxes over valid joints; invalid persons get
    degenerate far-away boxes."""
    ok = ~jnp.all(j2 == -1.0, axis=-1)  # (N, P, K)
    x = jnp.where(ok, j2[..., 0], BIG)
    y = jnp.where(ok, j2[..., 1], BIG)
    xmin = jnp.min(x, -1)
    ymin = jnp.min(y, -1)
    xmax = jnp.max(jnp.where(ok, j2[..., 0], -BIG), -1)
    ymax = jnp.max(jnp.where(ok, j2[..., 1], -BIG), -1)
    far = ~person_valid
    xmin = jnp.where(far, 2 * BIG, xmin)
    ymin = jnp.where(far, 2 * BIG, ymin)
    xmax = jnp.where(far, 2 * BIG + 1, xmax)
    ymax = jnp.where(far, 2 * BIG + 1, ymax)
    return jnp.stack([xmin, ymin, xmax, ymax], -1)


def _iou(b1, b2):
    """(N, Pg, 4) x (N, Pp, 4) -> (N, Pg, Pp)."""
    dx = jnp.maximum(
        jnp.minimum(b1[..., :, None, 2], b2[..., None, :, 2])
        - jnp.maximum(b1[..., :, None, 0], b2[..., None, :, 0]), 0.0)
    dy = jnp.maximum(
        jnp.minimum(b1[..., :, None, 3], b2[..., None, :, 3])
        - jnp.maximum(b1[..., :, None, 1], b2[..., None, :, 1]), 0.0)
    inter = dx * dy
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    return inter / (a1[..., :, None] + a2[..., None, :] - inter)


@functools.partial(jax.jit, static_argnames=("mode",))
def _match_dists(gt2, gt_valid, pred2, pred_valid, gt3=None, pred3=None,
                 iou_th=0.5, mode="2d"):
    """(N, Pg, K) joint distances with -1 semantics, matching
    match_humans_2d/3d (reference: util/eval_pck.py:266-430)."""
    ious = _iou(_bboxes(gt2, gt_valid), _bboxes(pred2, pred_valid))
    ious = jnp.where(pred_valid[:, None, :], ious, -1.0)
    any_pred = jnp.any(pred_valid, axis=1)  # empty pred list -> all -1
    best = jnp.argmax(ious, axis=-1)  # (N, Pg)
    matched = (jnp.max(ious, axis=-1) >= iou_th) & any_pred[:, None]

    # gather matched predictions: (N, Pg, K, C)
    p2 = jnp.take_along_axis(pred2, best[:, :, None, None].astype(int), axis=1)
    if mode == "3d":
        p3 = jnp.take_along_axis(pred3, best[:, :, None, None].astype(int), axis=1)
        d = jnp.sqrt(jnp.sum((gt3 - p3) ** 2, -1))
    else:
        d = jnp.sqrt(jnp.sum((gt2 - p2) ** 2, -1))
    invalid_joint = jnp.all(p2 == -1.0, axis=-1)
    d = jnp.where(invalid_joint, -1.0, d)
    if mode == "3d":
        gt_invisible = jnp.all(gt2 == -1.0, axis=-1)
        d = jnp.where(gt_invisible, -1.0, d)
    d = jnp.where(matched[..., None], d, -1.0)
    return d


def eval_pck2d_batched(gt2, gt_valid, pred2, pred_valid, dist_th=10.0, iou_th=0.5):
    """(avg_dist (K,), pck (K,)) — eval_human_dataset_2d, batched."""
    d = _match_dists(jnp.asarray(gt2), jnp.asarray(gt_valid), jnp.asarray(pred2),
                     jnp.asarray(pred_valid), iou_th=iou_th, mode="2d")
    d = jnp.where(jnp.asarray(gt_valid)[..., None], d, -1.0)
    matched = d >= 0
    total = jnp.sum(jnp.asarray(gt_valid))
    avg = _avg_matched(d, matched)
    hits = jnp.sum(matched & (d < dist_th), (0, 1))
    return np.asarray(avg), np.asarray(hits / total)


def _avg_matched(d, matched):
    """Per-joint mean over matched distances; NaN when a joint has no
    matches, like the NumPy reference's np.mean of an empty slice."""
    n = jnp.sum(matched, (0, 1))
    avg = jnp.sum(jnp.where(matched, d, 0.0), (0, 1)) / jnp.maximum(n, 1)
    return jnp.where(n > 0, avg, jnp.nan)


def eval_pckh2d_batched(gt2, gt_valid, pred2, pred_valid, head_id=0, neck_id=1,
                        h_th=0.5, iou_th=0.5):
    """eval_human_dataset_2d_PCKh, batched."""
    gt2 = jnp.asarray(gt2)
    gv = jnp.asarray(gt_valid)
    d = _match_dists(gt2, gv, jnp.asarray(pred2), jnp.asarray(pred_valid),
                     iou_th=iou_th, mode="2d")
    d = jnp.where(gv[..., None], d, -1.0)
    hsz = 2.0 * jnp.sqrt(jnp.sum((gt2[:, :, head_id] - gt2[:, :, neck_id]) ** 2, -1))
    matched = d >= 0
    total = jnp.sum(gv)
    avg = _avg_matched(d, matched)
    hits = jnp.sum(matched & (d < (hsz * h_th)[..., None]), (0, 1))
    return np.asarray(avg), np.asarray(hits / total)


def eval_pck3d_batched(gt2, gt3, gt_valid, pred2, pred3, pred_valid,
                       dist_th=0.1, iou_th=0.5):
    """eval_human_dataset_3d, batched."""
    d = _match_dists(jnp.asarray(gt2), jnp.asarray(gt_valid), jnp.asarray(pred2),
                     jnp.asarray(pred_valid), jnp.asarray(gt3), jnp.asarray(pred3),
                     iou_th=iou_th, mode="3d")
    gv = jnp.asarray(gt_valid)
    d = jnp.where(gv[..., None], d, -1.0)
    matched = d >= 0
    total = jnp.sum(gv)
    avg = _avg_matched(d, matched)
    hits = jnp.sum(matched & (d < dist_th), (0, 1))
    return np.asarray(avg), np.asarray(hits / total)


@functools.partial(jax.jit, static_argnames=("thresh",))
def assign_gt_multi_batched(pred2, pred_conf, pred_valid, gt2, gt_vis, gt_valid,
                            ref_dist, thresh=0.5):
    """Batched assignGTmulti (reference: util/eval_mAP.py:60-157).

    pred2 (N, Pp, K, C), pred_conf (N, Pp, K), gt2 (N, Pg, K, C),
    gt_vis (N, Pg, K), ref_dist (N, Pg). Returns
    (scores (N, Pp, K), labels (N, Pp, K), has_pred (N, Pp, K), n_gt (N, K)).
    Host code flattens valid entries per joint and runs getRPC/VOCap.
    """
    has_pred = jnp.broadcast_to(pred_valid[..., None], pred_conf.shape)
    has_gt = gt_vis * gt_valid[..., None]  # (N, Pg, K)

    d = jnp.sqrt(jnp.sum(
        (pred2[:, :, None] - gt2[:, None, :]) ** 2, axis=-1))  # (N, Pp, Pg, K)
    d = d / ref_dist[:, None, :, None]
    usable = has_pred[:, :, None] * has_gt[:, None]  # (N, Pp, Pg, K)
    d = jnp.where(usable > 0, d, jnp.inf)

    match = (d <= thresh).astype(jnp.int32)  # (N, Pp, Pg, K)
    n_gt_per = jnp.sum(has_gt, axis=-1)  # (N, Pg)
    pck = jnp.sum(match, axis=-1) / jnp.maximum(n_gt_per[:, None, :], 1)  # (N, Pp, Pg)
    pck = jnp.where(gt_valid[:, None, :], pck, -jnp.inf)
    pck = jnp.where(pred_valid[..., None], pck, -jnp.inf)

    # keep each prediction's best GT only, then invert: GT -> best pred
    best_gt = jnp.argmax(pck, axis=-1)  # (N, Pp)
    Pg = gt2.shape[1]
    only_best = jnp.where(
        jax.nn.one_hot(best_gt, Pg, dtype=bool), pck, -jnp.inf
    )  # zero-out non-best (reference sets them 0; -inf works since we max)
    only_best = jnp.where(only_best == -jnp.inf, 0.0, only_best)
    val = jnp.max(only_best, axis=1)  # (N, Pg)
    pred_to_gt = jnp.argmax(only_best, axis=1)  # (N, Pg)
    pred_to_gt = jnp.where(val == 0, -1, pred_to_gt)

    # pred p is assigned to the first gt g with pred_to_gt[g] == p
    Pp = pred2.shape[1]
    assign = pred_to_gt[:, None, :] == jnp.arange(Pp)[None, :, None]  # (N, Pp, Pg)
    is_assigned = jnp.any(assign, axis=-1)
    first_gt = jnp.argmax(assign, axis=-1)  # (N, Pp)

    matched_labels = jnp.take_along_axis(
        match, first_gt[:, :, None, None], axis=2
    )[:, :, 0, :]  # (N, Pp, K)
    labels = jnp.where(is_assigned[..., None], matched_labels, 0)
    labels = labels * has_pred.astype(jnp.int32)

    n_gt = jnp.sum(has_gt, axis=1)  # (N, K)
    return pred_conf * has_pred, labels, has_pred, n_gt


def eval_ap_batched(pred2, pred_conf, pred_valid, gt2, gt_vis, gt_valid, ref_dist,
                    thresh=0.5):
    """Full batched mAP: device assignment + host RPC/VOCap.
    Returns (K+1,) APs like eval_ap_mpii_v2 (reference: eval_mAP.py:272-332)."""
    from popnet_tpu.eval.map import get_rpc, voc_ap

    scores, labels, has_pred, n_gt = assign_gt_multi_batched(
        jnp.asarray(pred2), jnp.asarray(pred_conf), jnp.asarray(pred_valid),
        jnp.asarray(gt2), jnp.asarray(gt_vis), jnp.asarray(gt_valid),
        jnp.asarray(ref_dist), thresh,
    )
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    has_pred = np.asarray(has_pred) > 0
    n_gt = np.asarray(n_gt)

    K = scores.shape[-1]
    ap = np.zeros(K + 1)
    for k in range(K):
        sel = has_pred[..., k]
        p, r = get_rpc(scores[..., k][sel], labels[..., k][sel], n_gt[:, k].sum())
        ap[k] = voc_ap(r, p) * 100
    ap[-1] = ap[:-1].mean()
    return ap
