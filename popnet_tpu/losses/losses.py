"""Training losses for the depth-pose model families.

Weighted-MSE family and the per-model composite losses, numerically matching
the reference (reference: lib/network/losses.py:7-465; A2J_experiments/
anchor.py:84-154). All dense maps are NHWC; prior maps are (B, H, W, A*naf)
reshaped to (B, H, W, A, naf) — means over all elements are layout-invariant,
so values equal the reference's NCHW computation.

Every loss returns (total_loss, logs) with logs a dict of scalars including
the activation-range canaries the reference tracks (max/min ht/paf/z).
"""

from __future__ import annotations

import jax.numpy as jnp


def weighted_mse(pred, target, weights):
    """mean((pred-target)^2 * w) over all (broadcasted) elements
    (reference: losses.py:7-11)."""
    return jnp.mean((pred - target) ** 2 * weights)


def weighted_mse_v2(pred, target, weights):
    """sum((pred-target)^2 * w) / (sum(w) + eps) (reference: losses.py:14-18)."""
    out = (pred - target) ** 2 * weights
    return jnp.sum(out) / (jnp.sum(jnp.broadcast_to(weights, out.shape)) + 1e-6)


def weighted_sse(pred, target, weights):
    """sum((pred-target)^2 * w) (reference: losses.py:21-25)."""
    return jnp.sum((pred - target) ** 2 * weights)


def _mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def rtpose_light3d_loss(saved_for_loss, heat_gt, paf_gt, z_gt, num_stages=2):
    """Plain per-stage MSE (reference: losses.py:28-62).

    saved_for_loss: [paf1, heat1, z1, paf2, heat2, z2] (NHWC).
    """
    logs = {}
    total = 0.0
    for j in range(num_stages):
        paf, heat, z = saved_for_loss[3 * j], saved_for_loss[3 * j + 1], saved_for_loss[3 * j + 2]
        l1, l2, l3 = _mse(paf, paf_gt), _mse(heat, heat_gt), _mse(z, z_gt)
        total = total + l1 + l2 + l3
        logs[f"stage{j + 1}_paf"] = l1
        logs[f"stage{j + 1}_heat"] = l2
        logs[f"stage{j + 1}_z"] = l3
    logs["max_ht"] = jnp.max(saved_for_loss[-2][..., :-1])
    logs["min_ht"] = jnp.min(saved_for_loss[-2][..., :-1])
    logs["max_paf"] = jnp.max(saved_for_loss[-3])
    logs["min_paf"] = jnp.min(saved_for_loss[-3])
    return total, logs


def rtpose_light3d_loss_fgweight(saved_for_loss, heat_gt, paf_gt, z_gt, fg_mask_z,
                                 num_stages=2):
    """Foreground-weighted z loss: weight = 0.1 + 0.9 * fg
    (reference: losses.py:65-106)."""
    logs = {}
    total = 0.0
    weight = 0.1 + fg_mask_z * 0.9
    for j in range(num_stages):
        paf, heat, z = saved_for_loss[3 * j], saved_for_loss[3 * j + 1], saved_for_loss[3 * j + 2]
        l1, l2 = _mse(paf, paf_gt), _mse(heat, heat_gt)
        l3 = weighted_mse(z, z_gt, weight)
        total = total + l1 + l2 + l3
        logs[f"stage{j + 1}_paf"] = l1
        logs[f"stage{j + 1}_heat"] = l2
        logs[f"stage{j + 1}_z"] = l3
    logs["max_ht"] = jnp.max(saved_for_loss[-2][..., :-1])
    logs["min_ht"] = jnp.min(saved_for_loss[-2][..., :-1])
    logs["max_paf"] = jnp.max(saved_for_loss[-3])
    logs["min_paf"] = jnp.min(saved_for_loss[-3])
    logs["max_z"] = jnp.max(saved_for_loss[-1])
    logs["min_z"] = jnp.min(saved_for_loss[-1])
    return total, logs


def rtpose_light_loss(saved_for_loss, heat_gt, paf_gt, num_stages=2):
    """2D-only per-stage MSE for RTPoseLight."""
    logs = {}
    total = 0.0
    for j in range(num_stages):
        paf, heat = saved_for_loss[2 * j], saved_for_loss[2 * j + 1]
        l1, l2 = _mse(paf, paf_gt), _mse(heat, heat_gt)
        total = total + l1 + l2
        logs[f"stage{j + 1}_paf"] = l1
        logs[f"stage{j + 1}_heat"] = l2
    return total, logs


def _prior_loss(prior_pred, prior_gt, mask_conf, mask_coord, num_joints,
                weight_map=None, pred_vis=False):
    """Shared prior-subnet loss (reference: losses.py:275-296, 397-465).

    prior_pred/prior_gt: (B, H, W, A*naf); masks: (B, H, W, A);
    weight_map: optional (B, H, W, A) pose-rarity weights.
    """
    b, h, w, _ = prior_pred.shape
    a = mask_conf.shape[-1]
    pred = prior_pred.reshape(b, h, w, a, -1)
    gt = prior_gt.reshape(b, h, w, a, -1)
    mc = mask_coord[..., None]

    coords_pred, conf_pred, joints_pred = pred[..., :4], pred[..., 4], pred[..., 5:]
    coords_gt, conf_gt, joints_gt = gt[..., :4], gt[..., 4], gt[..., 5:]

    joint_factor = (4 if pred_vis else 3) * num_joints
    if weight_map is None:
        loss_coord = weighted_mse(coords_pred, coords_gt, mc) * 4
        loss_obj = weighted_mse(conf_pred, conf_gt, mask_conf)
        loss_selfpose = weighted_mse(joints_pred, joints_gt, mc) * joint_factor
    else:
        wm = weight_map[..., None]
        loss_coord = weighted_mse(coords_pred * mc, coords_gt * mc, wm) * 4
        loss_obj = weighted_mse(conf_pred * mask_conf, conf_gt * mask_conf, weight_map)
        loss_selfpose = weighted_mse(joints_pred * mc, joints_gt * mc, wm) * joint_factor
    return loss_coord, loss_obj, loss_selfpose


def yolo_loss(pred, prior_gt, mask_conf, mask_coord, num_joints,
              weight_map=None):
    """Yolo-Pose+ loss (reference: losses.py:397-465, fgweight[_poseweight])."""
    loss_coord, loss_obj, loss_selfpose = _prior_loss(
        pred, prior_gt, mask_conf, mask_coord, num_joints, weight_map
    )
    total = loss_coord + loss_obj + loss_selfpose
    logs = {
        "loss_prior": total,
        "loss_bbox": loss_coord,
        "loss_obj": loss_obj,
        "loss_selfpose": loss_selfpose,
    }
    return total, logs


def popnet_loss(
    saved_for_loss, heat_gt, zmap_gt, fg_mask_z, alignmap_gt, fg_mask_align,
    prior_gt, prior_mask_conf, prior_mask_coord, num_joints,
    prior_weight_map=None, num_stages=2, prior_subnet_only=False, pred_vis=False,
):
    """PoP-Net composite loss (reference: losses.py:237-394,
    pop_net_loss_fgweight[_poseweight]).

    saved_for_loss: [heat1, z1, align1, ..., heatS, zS, alignS, prior].
    """
    logs = {}
    total = 0.0
    weight_z = 0.1 + fg_mask_z * 0.9
    b, h, w, _ = weight_z.shape
    weight_ht = jnp.concatenate(
        [weight_z, jnp.ones((b, h, w, 1), weight_z.dtype)], axis=-1
    )
    for j in range(num_stages):
        heat, z, align = saved_for_loss[3 * j], saved_for_loss[3 * j + 1], saved_for_loss[3 * j + 2]
        l1 = weighted_mse(heat, heat_gt, weight_ht)
        l2 = weighted_mse(z, zmap_gt, weight_z)
        l3 = weighted_mse(align, alignmap_gt, fg_mask_align)
        if not prior_subnet_only:
            total = total + l1 + l2 + l3
        logs[f"stage{j + 1}_heat"] = l1
        logs[f"stage{j + 1}_z"] = l2
        logs[f"stage{j + 1}_align"] = l3

    loss_coord, loss_obj, loss_selfpose = _prior_loss(
        saved_for_loss[-1], prior_gt, prior_mask_conf, prior_mask_coord,
        num_joints, prior_weight_map, pred_vis,
    )
    loss_prior = loss_coord + loss_obj + loss_selfpose
    total = total + loss_prior
    logs["loss_prior"] = loss_prior
    logs["loss_bbox"] = loss_coord
    logs["loss_obj"] = loss_obj
    logs["loss_selfpose"] = loss_selfpose
    logs["max_ht"] = jnp.max(saved_for_loss[-4][..., :-1])
    logs["min_ht"] = jnp.min(saved_for_loss[-4][..., :-1])
    logs["max_z"] = jnp.max(saved_for_loss[-3])
    logs["min_z"] = jnp.min(saved_for_loss[-3])
    logs["max_alignf"] = jnp.max(saved_for_loss[-2] * fg_mask_align)
    logs["min_alignf"] = jnp.min(saved_for_loss[-2] * fg_mask_align)
    return total, logs


def _smooth_l1(diff, beta):
    return jnp.where(diff <= beta, 0.5 / beta * diff**2, diff - 0.5 * beta)


def a2j_loss(heads, annotations, all_anchors, spatial_factor=0.5, is_3d=True):
    """A2J anchor-weighted smooth-L1 loss (reference: anchor.py:84-154).

    heads: (cls (B, N, K), reg (B, N, K, 2), depth (B, N, K)); annotations
    (B, K, 3) in (y, x, z); all_anchors (N, 2) in (h, w) order.
    Returns (anchor_loss, regression_loss) like the reference (combined by
    the caller as cls + reg * factor).
    """
    if is_3d:
        cls, reg, dep = heads
    else:
        cls, reg = heads
        dep = None
    anchors = all_anchors[None, :, None, :]  # (1, N, 1, 2)
    w = jnp.exp(cls - jnp.max(cls, axis=1, keepdims=True))
    w = w / jnp.sum(w, axis=1, keepdims=True)  # softmax over anchors, (B, N, K)
    gt_xy = annotations[..., :2]  # (B, K, 2)

    anchor_pos = jnp.sum(w[..., None] * anchors, axis=1)  # (B, K, 2)
    anchor_diff = jnp.abs(gt_xy - anchor_pos)
    anchor_loss = jnp.mean(_smooth_l1(anchor_diff, 1.0))

    reg_pos = jnp.sum(w[..., None] * (anchors + reg), axis=1)  # (B, K, 2)
    reg_diff = jnp.abs(gt_xy - reg_pos)
    reg_loss = jnp.mean(_smooth_l1(reg_diff, 1.0)) * spatial_factor
    if is_3d:
        gt_z = annotations[..., 2]
        z_diff = jnp.abs(gt_z - jnp.sum(w * dep, axis=1))
        # the reference adds the raw depth L1 (its smooth-L1 result is unused)
        reg_loss = reg_loss + jnp.mean(z_diff)
    return anchor_loss, reg_loss


def popnet_rgb_loss(
    saved_for_loss, heat_gt, alignmap_gt, fg_mask_align, prior_gt,
    prior_mask_conf, prior_mask_coord, num_joints,
    num_stages=2, prior_subnet_only=False,
):
    """RGB PoP-Net loss: heat + align stages and a visibility-masked
    self-pose prior (reference: losses.py:468-539 pop_net_rgb_loss_fgweight).

    saved_for_loss: [heat1, align1, ..., heatS, alignS, prior] with the
    prior carrying 5 + 4K channels per anchor (x, y, vis targets).
    """
    logs = {}
    total = 0.0
    weight_align = fg_mask_align
    b, h, w, _ = weight_align.shape
    fg = weight_align[..., :num_joints]
    weight_fg = 0.1 + fg * 0.9
    weight_ht = jnp.concatenate([weight_fg, jnp.ones((b, h, w, 1), fg.dtype)], -1)

    for j in range(num_stages):
        heat, align = saved_for_loss[2 * j], saved_for_loss[2 * j + 1]
        l1 = weighted_mse(heat, heat_gt, weight_ht)
        l2 = weighted_mse(align, alignmap_gt, weight_align)
        if not prior_subnet_only:
            total = total + l1 + l2
        logs[f"stage{j + 1}_heat"] = l1
        logs[f"stage{j + 1}_align"] = l2

    pred = saved_for_loss[-1]
    a = prior_mask_conf.shape[-1]
    hp, wp = pred.shape[1], pred.shape[2]
    pred = pred.reshape(b, hp, wp, a, -1)
    gt = prior_gt.reshape(b, hp, wp, a, -1)
    mc = prior_mask_coord[..., None]

    coords_pred, conf_pred, joints_pred = pred[..., :4], pred[..., 4], pred[..., 5:]
    coords_gt, conf_gt, joints_gt = gt[..., :4], gt[..., 4], gt[..., 5:]

    loss_coord = weighted_mse(coords_pred, coords_gt, mc) * 4
    loss_obj = weighted_mse(conf_pred, conf_gt, prior_mask_conf)
    # joint-position loss masked by GT visibility; visibility channels get
    # the plain coord mask (reference: losses.py:521-529)
    vis_gt = joints_gt[..., 2 * num_joints:]
    selfpose_mask = jnp.concatenate(
        [jnp.tile(mc * vis_gt[..., :num_joints], (1, 1, 1, 1, 2)),
         jnp.tile(mc, (1, 1, 1, 1, num_joints))], axis=-1,
    )
    loss_selfpose = weighted_mse(joints_pred, joints_gt, selfpose_mask) * 3 * num_joints
    loss_prior = loss_coord + loss_obj + loss_selfpose
    total = total + loss_prior
    logs["loss_prior"] = loss_prior
    logs["loss_bbox"] = loss_coord
    logs["loss_obj"] = loss_obj
    logs["loss_selfpose"] = loss_selfpose
    return total, logs


def popnet_roi_loss(
    saved_for_loss, heat_gt, zmap_gt, fg_mask_z, alignmap_gt, fg_mask_align,
    obj_label, num_joints, pose_weights=None,
    num_stages=2, prior_subnet_only=False, pred_vis=False,
):
    """ROI (single-person crop) PoP-Net loss: dense stages as in popnet_loss,
    prior replaced by a direct pose-vector regression against obj_label
    (reference: losses.py:109-234 pop_net_loss_fgweight_roi[_poseweight]).

    saved_for_loss[-1]: (B, D) flat pose vector; obj_label (B, D);
    pose_weights: optional (B, ...) rarity weights (mean per sample).
    """
    logs = {}
    total = 0.0
    weight_z = 0.1 + fg_mask_z * 0.9
    b, h, w, _ = weight_z.shape
    weight_ht = jnp.concatenate(
        [weight_z, jnp.ones((b, h, w, 1), weight_z.dtype)], axis=-1
    )
    for j in range(num_stages):
        heat, z, align = saved_for_loss[3 * j], saved_for_loss[3 * j + 1], saved_for_loss[3 * j + 2]
        l1 = weighted_mse(heat, heat_gt, weight_ht)
        l2 = weighted_mse(z, zmap_gt, weight_z)
        l3 = weighted_mse(align, alignmap_gt, fg_mask_align)
        if not prior_subnet_only:
            total = total + l1 + l2 + l3
        logs[f"stage{j + 1}_heat"] = l1
        logs[f"stage{j + 1}_z"] = l2
        logs[f"stage{j + 1}_align"] = l3

    pred = saved_for_loss[-1].reshape(b, -1)
    obj = obj_label.reshape(b, -1)
    factor = (4 if pred_vis else 3) * num_joints
    if pose_weights is None:
        loss_prior = _mse(pred, obj) * factor
    else:
        tw = jnp.mean(pose_weights.reshape(b, -1), axis=1).reshape(b, 1)
        loss_prior = weighted_mse(pred, obj, tw) * factor
    total = total + loss_prior
    logs["loss_prior"] = loss_prior
    return total, logs
