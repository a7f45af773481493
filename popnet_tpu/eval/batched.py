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
    avg = jnp.sum(jnp.where(matched, d, 0.0), (0, 1)) / jnp.maximum(
        jnp.sum(matched, (0, 1)), 1)
    hits = jnp.sum(matched & (d < dist_th), (0, 1))
    return np.asarray(avg), np.asarray(hits / total)


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
    avg = jnp.sum(jnp.where(matched, d, 0.0), (0, 1)) / jnp.maximum(
        jnp.sum(matched, (0, 1)), 1)
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
    avg = jnp.sum(jnp.where(matched, d, 0.0), (0, 1)) / jnp.maximum(
        jnp.sum(matched, (0, 1)), 1)
    hits = jnp.sum(matched & (d < dist_th), (0, 1))
    return np.asarray(avg), np.asarray(hits / total)
