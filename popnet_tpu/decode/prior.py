"""Anchor-pose (prior map) decode + NMS.

TPU-native re-design of the reference's tensorized decode
(reference: lib/utils/prior_pose_align.py:10-168 parse_prior_pose):

- `decode_prior_maps`: one jitted batched pass turning (B, H, W, A*naf)
  prior maps into fixed-size score-sorted detections with a validity mask.
  The suppression loop replicates the reference's triangular-IoU NMS exactly,
  including its skip of the final candidate.
- `parse_prior_pose`: host wrapper producing the reference's per-image
  (bboxes, humans, visibility) Python lists for the eval contract.

Detections: [cx, cy, w, h, conf] normalized to [0, 1], joints (K, 3) as
(x_norm, y_norm, z_meters); `scale_to_output` maps to pixels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from popnet_tpu.core.config import DepthStats


@functools.partial(
    jax.jit,
    static_argnames=("num_joints", "conf_threshold", "nms_threshold", "max_det", "pred_vis"),
)
def decode_prior_maps(
    prior: jnp.ndarray,          # (B, H, W, A*naf)
    anchors: jnp.ndarray,        # (A, 2)
    depth_mean: float,
    depth_std: float,
    num_joints: int = 15,
    conf_threshold: float = 0.35,
    nms_threshold: float = 0.5,
    max_det: int = 16,
    pred_vis: bool = False,
):
    """Batched prior decode -> (dets (B, M, naf), valid (B, M)).

    dets rows are [cx, cy, w, h, conf, K*x, K*y, K*z(, K*vis)] with box and
    joint (x, y) normalized by the prior grid, z in meters; rows are sorted
    by descending confidence and NMS-filtered.
    """
    b, h, w, _ = prior.shape
    a = anchors.shape[0]
    naf = prior.shape[-1] // a
    p = prior.reshape(b, h, w, a, naf)

    gx = jnp.arange(w, dtype=prior.dtype)[None, None, :, None]
    gy = jnp.arange(h, dtype=prior.dtype)[None, :, None, None]
    aw = anchors[:, 0][None, None, None, :]
    ah = anchors[:, 1][None, None, None, :]

    cx = (p[..., 0] + gx) / w
    cy = (p[..., 1] + gy) / h
    bw = p[..., 2] * aw / w
    bh = p[..., 3] * ah / h
    conf = p[..., 4]
    jx = (p[..., 5 : 5 + num_joints] * (aw[..., None] / 2.0) + gx[..., None]) / w
    jy = (p[..., 5 + num_joints : 5 + 2 * num_joints] * (ah[..., None] / 2.0) + gy[..., None]) / h
    jz = p[..., 5 + 2 * num_joints : 5 + 3 * num_joints] * depth_std + depth_mean

    fields = [cx[..., None], cy[..., None], bw[..., None], bh[..., None], conf[..., None], jx, jy, jz]
    if pred_vis:
        fields.append(p[..., 5 + 3 * num_joints :])
    dets = jnp.concatenate(fields, axis=-1).reshape(b, h * w * a, naf)

    score = jnp.where(dets[..., 4] > conf_threshold, dets[..., 4], -jnp.inf)
    top_score, top_idx = jax.lax.top_k(score, max_det)  # descending
    dets = jnp.take_along_axis(dets, top_idx[..., None], axis=1)
    valid = jnp.isfinite(top_score)

    # reference NMS (prior_pose_align.py:79-123): triangular IoU conflicts,
    # sequential suppression that never visits the last candidate.
    x1 = dets[..., 0] - dets[..., 2] / 2
    y1 = dets[..., 1] - dets[..., 3] / 2
    x2 = dets[..., 0] + dets[..., 2] / 2
    y2 = dets[..., 1] + dets[..., 3] / 2
    dx = jnp.maximum(
        jnp.minimum(x2[:, :, None], x2[:, None, :]) - jnp.maximum(x1[:, :, None], x1[:, None, :]), 0.0
    )
    dy = jnp.maximum(
        jnp.minimum(y2[:, :, None], y2[:, None, :]) - jnp.maximum(y1[:, :, None], y1[:, None, :]), 0.0
    )
    inter = dx * dy
    areas = dets[..., 2] * dets[..., 3]
    union = areas[:, :, None] + areas[:, None, :] - inter
    ious = inter / jnp.maximum(union, 1e-12)

    both_valid = valid[:, :, None] & valid[:, None, :]
    conflicting = ((ious > nms_threshold) & both_valid).astype(jnp.int32)
    conflicting = jnp.triu(conflicting, k=1)

    keep = jnp.sum(conflicting, axis=1)  # column sums

    def body(i, keep):
        sub = jnp.where(keep[:, i] > 0, 1, 0)[:, None] * conflicting[:, i, :]
        return keep - sub

    # range(1, M-1): the reference loop skips index 0 and the final index
    keep = jax.lax.fori_loop(1, max_det - 1, body, keep)
    valid = valid & (keep == 0)
    return dets, valid


def scale_to_output(dets: np.ndarray, valid: np.ndarray, num_joints: int,
                    w_out: float, h_out: float, vis_margin: float = 0.0,
                    pred_vis: bool = False):
    """Per-image lists (bboxes, humans (K,3), visibility) in output pixels
    (reference: prior_pose_align.py:125-168)."""
    bboxes_out, humans_out, visibility_out = [], [], []
    for det, ok in zip(np.asarray(dets), np.asarray(valid)):
        det = det[ok].copy()
        if det.shape[0] == 0:
            bboxes_out.append([])
            humans_out.append([])
            visibility_out.append([])
            continue
        det[:, 0] *= w_out
        det[:, 2] *= w_out
        det[:, 1] *= h_out
        det[:, 3] *= h_out
        det[:, 0] -= det[:, 2] / 2
        det[:, 1] -= det[:, 3] / 2
        det[:, 2] += det[:, 0]
        det[:, 3] += det[:, 1]
        det[:, 5 : 5 + num_joints] *= w_out
        det[:, 5 + num_joints : 5 + 2 * num_joints] *= h_out
        bboxes_out.append([row[:5] for row in det])
        humans_b, vis_b = [], []
        for row in det:
            human = row[5 : 5 + 3 * num_joints].reshape(3, -1).T
            humans_b.append(human)
            inb = np.logical_and(
                np.logical_and(human[:, 0] >= vis_margin, human[:, 0] <= w_out - 1 - vis_margin),
                np.logical_and(human[:, 1] >= vis_margin, human[:, 1] <= h_out - 1 - vis_margin),
            )
            if pred_vis:
                vis_b.append(inb * row[5 + 3 * num_joints :])
            else:
                vis_b.append(inb)
        humans_out.append(humans_b)
        visibility_out.append(vis_b)
    return bboxes_out, humans_out, visibility_out


def parse_prior_pose(
    prior,                       # (B, H, W, A*naf) NHWC prior maps
    anchors,
    num_joints: int,
    w_out: float,
    h_out: float,
    depth: DepthStats,
    conf_threshold: float = 0.35,
    nms_threshold: float = 0.5,
    pred_vis: bool = False,
    vis_margin: float = 0.0,
    max_det: int = 16,
):
    """Drop-in equivalent of the reference parse_prior_pose
    (reference: prior_pose_align.py:10-168)."""
    dets, valid = decode_prior_maps(
        jnp.asarray(prior), jnp.asarray(anchors, dtype=jnp.float32),
        depth.mean, depth.std, num_joints=num_joints,
        conf_threshold=conf_threshold, nms_threshold=nms_threshold,
        max_det=max_det, pred_vis=pred_vis,
    )
    return scale_to_output(
        np.asarray(dets), np.asarray(valid), num_joints, w_out, h_out,
        vis_margin, pred_vis,
    )
