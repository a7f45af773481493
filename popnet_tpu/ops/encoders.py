"""Dense GT-target encoders as closed-form vectorized JAX array programs.

The reference builds its training targets with per-joint / per-limb Python
loops inside DataLoader worker processes — its #1 CPU hot loop (reference:
lib/datasets/heatmap.py:20-36, paf.py:18-69, posemap.py:18-106,
datasets_kdh3d.py:324-563). Here each target is a single broadcasted
expression over the (people, joints, grid) axes, so a whole batch encodes in
one fused XLA kernel on device:

- heatmaps:  additive per-joint Gaussians on the stride grid, clipped at 1,
             plus a background channel.
- PAFs:      unit limb vectors painted in a width-1 band, averaged across
             overlapping people.
- z-maps:    per-joint constant-depth boxes with z-buffer min across people;
             background filled from the downsampled input depth; normalized.
- align-maps: truncated normalized (dx, dy) offset fields, nearest joint
             instance wins via the distance field.
- prior targets: YOLO-style anchor assignment of [box, conf, per-joint
             (x, y, z)] with conf/coord masks and pose-rarity weights.

All functions take fixed-size (P, K, ...) arrays with validity masks
(P = cfg.max_people) and are vmap-able over a batch axis.

Conventions (identical to the reference):
- a joint participates iff 0 <= x < input_x and 0 <= y < input_y;
- grid cell (i, j) has pixel-space center (j*stride + stride/2 - 0.5, ...)
  for heatmaps, and grid-space center (j + 0.5, i + 0.5) for align maps;
- box bounds use floor() then clamping to the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig, DepthStats
from popnet_tpu.core.skeleton import LIMBS

_GAUSS_CUTOFF = 4.6052  # exp(-4.6052) ~= 0.01 (reference: heatmap.py:31)


def _inbound(joints2d: jnp.ndarray, person_valid: jnp.ndarray, cfg: EncoderConfig):
    """(P, K) mask of joints inside the input image and of valid people
    (reference: datasets_kdh3d.py:317-322 remove_illegal_joint)."""
    x, y = joints2d[..., 0], joints2d[..., 1]
    ok = (x >= 0) & (x < cfg.input_x) & (y >= 0) & (y < cfg.input_y)
    return ok & person_valid[:, None]


def _grid_centers_px(h: int, w: int, stride: int):
    start = stride / 2.0 - 0.5
    xs = jnp.arange(w, dtype=jnp.float32) * stride + start
    ys = jnp.arange(h, dtype=jnp.float32) * stride + start
    return xs, ys


def encode_heatmaps(joints2d, person_valid, cfg: EncoderConfig):
    """(grid_h, grid_w, K+1) Gaussian part-confidence maps + background.

    Reference semantics: heatmap.py:20-36 summed over people with clip at 1
    (clip-after-each-add equals clip-of-sum since each Gaussian is <= 1),
    background = max(1 - max_k heat_k, 0) (datasets_kdh3d.py:487-501).
    """
    H, W = cfg.grid_h, cfg.grid_w
    xs, ys = _grid_centers_px(H, W, cfg.stride)
    inb = _inbound(joints2d, person_valid, cfg)  # (P, K)

    dx = xs[None, None, None, :] - joints2d[:, :, 0, None, None]  # (P, K, 1, W)
    dy = ys[None, None, :, None] - joints2d[:, :, 1, None, None]  # (P, K, H, 1)
    expo = (dx * dx + dy * dy) / (2.0 * cfg.sigma * cfg.sigma)  # (P, K, H, W)
    g = jnp.exp(-expo) * (expo <= _GAUSS_CUTOFF) * inb[:, :, None, None]
    heat = jnp.clip(jnp.sum(g, axis=0), 0.0, 1.0)  # (K, H, W)
    bg = jnp.maximum(1.0 - jnp.max(heat, axis=0), 0.0)  # (H, W)
    return jnp.concatenate([heat, bg[None]], axis=0).transpose(1, 2, 0)


def encode_pafs(joints2d, person_valid, cfg: EncoderConfig, limbs=LIMBS):
    """(grid_h, grid_w, 2*L) part-affinity fields.

    Unit limb direction painted where the perpendicular distance to the limb
    line is < 1 grid cell, inside the rounded limb bounding box, averaged
    over contributing people (reference: paf.py:18-69).
    """
    H, W = cfg.grid_h, cfg.grid_w
    limbs_arr = jnp.asarray(limbs)  # (L, 2)
    inb = _inbound(joints2d, person_valid, cfg)  # (P, K)

    gj = joints2d / cfg.stride  # grid units, (P, K, 2)
    cA = gj[:, limbs_arr[:, 0]]  # (P, L, 2)
    cB = gj[:, limbs_arr[:, 1]]
    valid = inb[:, limbs_arr[:, 0]] & inb[:, limbs_arr[:, 1]]  # (P, L)

    vec = cB - cA
    norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1))  # (P, L)
    valid = valid & (norm > 0.0)
    unit = vec / jnp.maximum(norm, 1e-12)[..., None]  # (P, L, 2)

    thre = cfg.paf_width
    min_xy = jnp.round(jnp.minimum(cA, cB) - thre)
    max_xy = jnp.round(jnp.maximum(cA, cB) + thre)
    min_x = jnp.maximum(min_xy[..., 0], 0.0)
    min_y = jnp.maximum(min_xy[..., 1], 0.0)
    max_x = jnp.minimum(max_xy[..., 0], W - 1.0)
    max_y = jnp.minimum(max_xy[..., 1], H - 1.0)

    xx = jnp.arange(W, dtype=jnp.float32)
    yy = jnp.arange(H, dtype=jnp.float32)
    in_box = (
        (xx[None, None, None, :] >= min_x[..., None, None])
        & (xx[None, None, None, :] <= max_x[..., None, None])
        & (yy[None, None, :, None] >= min_y[..., None, None])
        & (yy[None, None, :, None] <= max_y[..., None, None])
    )  # (P, L, H, W)

    ba_x = xx[None, None, None, :] - cA[..., 0, None, None]
    ba_y = yy[None, None, :, None] - cA[..., 1, None, None]
    width = jnp.abs(ba_x * unit[..., 1, None, None] - ba_y * unit[..., 0, None, None])
    paint = in_box & (width < thre) & valid[..., None, None]  # (P, L, H, W)

    contrib = paint[..., None] * unit[:, :, None, None, :]  # (P, L, H, W, 2)
    total = jnp.sum(contrib, axis=0)  # (L, H, W, 2)
    count = jnp.sum(paint, axis=0)  # (L, H, W)
    paf = total / jnp.maximum(count, 1)[..., None]
    # interleave (x, y) per limb into channels [2l, 2l+1]
    L = limbs_arr.shape[0]
    return paf.transpose(1, 2, 0, 3).reshape(H, W, 2 * L)


def _box_mask(centers, valid, radius, h, w):
    """(P, K, H, W) mask of floor-clamped (2r+1)^2 boxes around grid centers."""
    min_x = jnp.maximum(jnp.floor(centers[..., 0] - radius), 0.0)
    max_x = jnp.minimum(jnp.floor(centers[..., 0] + radius), w - 1.0)
    min_y = jnp.maximum(jnp.floor(centers[..., 1] - radius), 0.0)
    max_y = jnp.minimum(jnp.floor(centers[..., 1] + radius), h - 1.0)
    xx = jnp.arange(w, dtype=jnp.float32)
    yy = jnp.arange(h, dtype=jnp.float32)
    m = (
        (xx[None, None, None, :] >= min_x[..., None, None])
        & (xx[None, None, None, :] <= max_x[..., None, None])
        & (yy[None, None, :, None] >= min_y[..., None, None])
        & (yy[None, None, :, None] <= max_y[..., None, None])
    )
    return m & valid[..., None, None]


def encode_zmaps(joints2d, joints_z, person_valid, depth_resize, cfg: EncoderConfig,
                 depth: DepthStats):
    """(zgrid_h, zgrid_w, K) normalized pose-depth maps + (..., K) fg masks.

    Foreground: z-buffer min of joint depths over people inside radius boxes;
    background: downsampled input depth. Clipped to [0, depth.max] then
    normalized (reference: posemap.py:83-106, datasets_kdh3d.py:505-560).
    """
    H, W = cfg.zgrid_h, cfg.zgrid_w
    inb = _inbound(joints2d, person_valid, cfg)
    centers = joints2d / cfg.stride_z
    box = _box_mask(centers, inb, cfg.z_radius, H, W)  # (P, K, H, W)

    cand = jnp.where(box, joints_z[..., None, None], jnp.inf)
    zfg = jnp.min(cand, axis=0)  # (K, H, W)
    fg = jnp.any(box, axis=0)  # (K, H, W)

    z = jnp.where(fg, zfg, depth_resize[None])
    z = jnp.clip(z, 0.0, depth.max)
    z = (z - depth.mean) / depth.std
    return z.transpose(1, 2, 0), fg.astype(jnp.float32).transpose(1, 2, 0)


def encode_alignmaps(joints2d, person_valid, cfg: EncoderConfig):
    """(agrid_h, agrid_w, 2K) truncated offset fields + fg masks.

    Within a radius box around each joint instance, stores the normalized
    (dx, dy) from the pixel center to the joint; when instances of the same
    joint type overlap, the nearest one wins (reference: posemap.py:18-80).
    """
    H, W = cfg.agrid_h, cfg.agrid_w
    r = float(cfg.align_radius)
    max_dist = 2.0 * (r + 0.5)
    inb = _inbound(joints2d, person_valid, cfg)
    centers = joints2d / cfg.stride_align  # (P, K, 2)
    box = _box_mask(centers, inb, cfg.align_radius, H, W)  # (P, K, H, W)

    xx = jnp.arange(W, dtype=jnp.float32)
    yy = jnp.arange(H, dtype=jnp.float32)
    dx = -(xx[None, None, None, :] + 0.5 - centers[..., 0, None, None])
    dy = -(yy[None, None, :, None] + 0.5 - centers[..., 1, None, None])
    dx = jnp.clip(dx, -(r + 0.5), r + 0.5) / (r + 0.5)
    dy = jnp.clip(dy, -(r + 0.5), r + 0.5) / (r + 0.5)

    dist = jnp.where(box, jnp.sqrt(dx * dx + dy * dy), max_dist)  # (P, K, H, W)
    winner = jnp.argmin(dist, axis=0)  # (K, H, W); first-wins ties = reference order
    win_dist = jnp.min(dist, axis=0)
    has_fg = win_dist < max_dist

    wdx = jnp.take_along_axis(dx, winner[None], axis=0)[0]  # (K, H, W)
    wdy = jnp.take_along_axis(dy, winner[None], axis=0)[0]
    amap = jnp.stack([jnp.where(has_fg, wdx, 0.0), jnp.where(has_fg, wdy, 0.0)], axis=-1)

    fg = jnp.any(box, axis=0)  # (K, H, W)
    fg2 = jnp.repeat(fg[..., None], 2, axis=-1).astype(jnp.float32)
    K = joints2d.shape[1]
    return (
        amap.transpose(1, 2, 0, 3).reshape(H, W, 2 * K),
        fg2.transpose(1, 2, 0, 3).reshape(H, W, 2 * K),
    )


def _wh_iou(wh: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Centered-box IoU by (w, h) only (reference: datasets_kdh3d.py:390-417)."""
    inter = jnp.minimum(wh[:, None, 0], anchors[None, :, 0]) * jnp.minimum(
        wh[:, None, 1], anchors[None, :, 1]
    )
    union = wh[:, None, 0] * wh[:, None, 1] + anchors[None, :, 0] * anchors[None, :, 1] - inter
    return inter / union


def encode_prior_targets(
    bboxes, joints2d, joints_z, pose_weights, person_valid, cfg: EncoderConfig,
    depth: DepthStats, noobject_scale: float = 0.1, object_scale: float = 1.0,
):
    """YOLO-style anchor targets for the prior subnetwork.

    Returns (prior_map (H, W, A*(5+3K)), mask_conf (H, W, A),
    mask_coord (H, W, A), weight_map (H, W, A)). Targets per assigned cell:
    [dx, dy, w/aw, h/ah, 1, K x x-offsets/(aw/2), K x y-offsets/(ah/2),
    K x normalized z]. Sequential overwrite across people matches the
    reference's loop (reference: datasets_kdh3d.py:324-388).
    """
    H, W = cfg.prior_h, cfg.prior_w
    A = cfg.num_anchors
    K = cfg.num_joints
    anchors = jnp.asarray(cfg.anchors, dtype=jnp.float32)  # (A, 2)
    P = bboxes.shape[0]

    s = float(cfg.stride_prior)
    cx = (bboxes[:, 0] + bboxes[:, 2]) / 2.0 / s
    cy = (bboxes[:, 1] + bboxes[:, 3]) / 2.0 / s
    bw = (bboxes[:, 2] - bboxes[:, 0]) / s
    bh = (bboxes[:, 3] - bboxes[:, 1]) / s
    jx = joints2d[:, :, 0] / s  # (P, K)
    jy = joints2d[:, :, 1] / s
    jz = (joints_z - depth.mean) / depth.std

    best_n = jnp.argmax(_wh_iou(jnp.stack([bw, bh], 1), anchors), axis=1)  # (P,)
    gi = jnp.clip(jnp.floor(cx), 0, W - 1).astype(jnp.int32)
    gj = jnp.clip(jnp.floor(cy), 0, H - 1).astype(jnp.int32)

    aw = anchors[best_n, 0]
    ah = anchors[best_n, 1]
    target = jnp.concatenate(
        [
            jnp.stack([cx - gi, cy - gj, bw / aw, bh / ah, jnp.ones_like(cx)], axis=1),
            (jx - gi[:, None]) / (aw[:, None] / 2.0),
            (jy - gj[:, None]) / (ah[:, None] / 2.0),
            jz,
        ],
        axis=1,
    )  # (P, 5+3K)

    def body(i, state):
        prior, mconf, mcoord, wmap = state
        ok = person_valid[i]

        def write(st):
            prior, mconf, mcoord, wmap = st
            prior = prior.at[gj[i], gi[i], best_n[i]].set(target[i])
            mconf = mconf.at[gj[i], gi[i], best_n[i]].set(object_scale)
            mcoord = mcoord.at[gj[i], gi[i], best_n[i]].set(1.0)
            wmap = wmap.at[gj[i], gi[i], :].set(pose_weights[i])
            return prior, mconf, mcoord, wmap

        return jax.lax.cond(ok, write, lambda st: st, (prior, mconf, mcoord, wmap))

    prior0 = jnp.zeros((H, W, A, 5 + 3 * K), dtype=jnp.float32)
    mconf0 = jnp.full((H, W, A), noobject_scale, dtype=jnp.float32)
    mcoord0 = jnp.zeros((H, W, A), dtype=jnp.float32)
    wmap0 = jnp.ones((H, W, A), dtype=jnp.float32)
    prior, mconf, mcoord, wmap = jax.lax.fori_loop(
        0, P, body, (prior0, mconf0, mcoord0, wmap0)
    )
    return prior.reshape(H, W, A * (5 + 3 * K)), mconf, mcoord, wmap


def infer_joint_visibility(joints2d, joints_z, zmaps_norm, cfg: EncoderConfig,
                           depth: DepthStats, depth_thresh: float = 0.03):
    """Per-joint visibility from the z-buffered pose-depth map.

    A joint is visible iff its grid cell is in bounds and the composited
    normalized z-map at int-truncated (x, y)/stride_z agrees with the joint
    depth within `depth_thresh` meters (reference:
    lib/datasets/datasets_kdh3d_mpaug.py:419-451
    build_prior_targets_infer_visibility).
    """
    H, W = cfg.zgrid_h, cfg.zgrid_w
    xj = jnp.trunc(joints2d[..., 0] / cfg.stride_z).astype(jnp.int32)  # (P, K)
    yj = jnp.trunc(joints2d[..., 1] / cfg.stride_z).astype(jnp.int32)
    inb = (xj >= 0) & (xj < W) & (yj >= 0) & (yj < H)
    xc = jnp.clip(xj, 0, W - 1)
    yc = jnp.clip(yj, 0, H - 1)
    K = joints2d.shape[1]
    kk = jnp.arange(K)[None, :]
    zread = zmaps_norm[yc, xc, jnp.broadcast_to(kk, yc.shape)]  # (P, K)
    zj_norm = (joints_z - depth.mean) / depth.std
    agree = jnp.abs(zread - zj_norm) * depth.std <= depth_thresh
    return (inb & agree).astype(jnp.float32)


def encode_prior_targets_with_visibility(
    bboxes, joints2d, joints_z, pose_weights, person_valid, zmaps_norm,
    cfg: EncoderConfig, depth: DepthStats, depth_thresh: float = 0.03,
    noobject_scale: float = 0.1, object_scale: float = 1.0,
):
    """Prior targets extended with K inferred-visibility channels per anchor
    (naf = 5 + 4K) (reference: datasets_kdh3d_mpaug.py:419-503)."""
    H, W = cfg.prior_h, cfg.prior_w
    A = cfg.num_anchors
    K = cfg.num_joints
    anchors = jnp.asarray(cfg.anchors, dtype=jnp.float32)
    P = bboxes.shape[0]

    vis = infer_joint_visibility(joints2d, joints_z, zmaps_norm, cfg, depth, depth_thresh)

    s = float(cfg.stride_prior)
    cx = (bboxes[:, 0] + bboxes[:, 2]) / 2.0 / s
    cy = (bboxes[:, 1] + bboxes[:, 3]) / 2.0 / s
    bw = (bboxes[:, 2] - bboxes[:, 0]) / s
    bh = (bboxes[:, 3] - bboxes[:, 1]) / s
    jx = joints2d[:, :, 0] / s
    jy = joints2d[:, :, 1] / s
    jz = (joints_z - depth.mean) / depth.std

    best_n = jnp.argmax(_wh_iou(jnp.stack([bw, bh], 1), anchors), axis=1)
    gi = jnp.clip(jnp.floor(cx), 0, W - 1).astype(jnp.int32)
    gj = jnp.clip(jnp.floor(cy), 0, H - 1).astype(jnp.int32)
    aw = anchors[best_n, 0]
    ah = anchors[best_n, 1]
    target = jnp.concatenate(
        [
            jnp.stack([cx - gi, cy - gj, bw / aw, bh / ah, jnp.ones_like(cx)], axis=1),
            (jx - gi[:, None]) / (aw[:, None] / 2.0),
            (jy - gj[:, None]) / (ah[:, None] / 2.0),
            jz,
            vis,
        ],
        axis=1,
    )  # (P, 5+4K)

    def body(i, state):
        prior, mconf, mcoord, wmap = state

        def write(st):
            prior, mconf, mcoord, wmap = st
            prior = prior.at[gj[i], gi[i], best_n[i]].set(target[i])
            mconf = mconf.at[gj[i], gi[i], best_n[i]].set(object_scale)
            mcoord = mcoord.at[gj[i], gi[i], best_n[i]].set(1.0)
            wmap = wmap.at[gj[i], gi[i], :].set(pose_weights[i])
            return prior, mconf, mcoord, wmap

        return jax.lax.cond(person_valid[i], write, lambda st: st, state)

    prior0 = jnp.zeros((H, W, A, 5 + 4 * K), dtype=jnp.float32)
    mconf0 = jnp.full((H, W, A), noobject_scale, dtype=jnp.float32)
    mcoord0 = jnp.zeros((H, W, A), dtype=jnp.float32)
    wmap0 = jnp.ones((H, W, A), dtype=jnp.float32)
    prior, mconf, mcoord, wmap = jax.lax.fori_loop(
        0, P, body, (prior0, mconf0, mcoord0, wmap0)
    )
    return prior.reshape(H, W, A * (5 + 4 * K)), mconf, mcoord, wmap


@functools.partial(
    jax.jit, static_argnames=("cfg", "depth", "pose_align", "with_prior", "pred_vis")
)
def encode_targets(
    joints2d,
    joints3d,
    bboxes,
    pose_weights,
    person_valid,
    depth_resize,
    cfg: EncoderConfig,
    depth: DepthStats,
    pose_align: bool = True,
    with_prior: bool = True,
    pred_vis: bool = False,
):
    """Full GT-target bundle for one image; vmap over the batch axis.

    Mirrors datasets_kdh3d.get_ground_truth (reference:
    lib/datasets/datasets_kdh3d.py:420-563); with pred_vis, the mp-aug
    visibility-inferring variant (datasets_kdh3d_mpaug.py:535-688).
    """
    joints_z = joints3d[..., 2]
    out = {
        "heatmaps": encode_heatmaps(joints2d, person_valid, cfg),
        "pafs": encode_pafs(joints2d, person_valid, cfg),
    }
    zm, zfg = encode_zmaps(joints2d, joints_z, person_valid, depth_resize, cfg, depth)
    out["zmaps"] = zm
    out["fg_masks_z"] = zfg
    if pose_align:
        am, afg = encode_alignmaps(joints2d, person_valid, cfg)
        out["align_maps"] = am
        out["fg_masks_align"] = afg
    if with_prior:
        if pred_vis:
            prior, mconf, mcoord, wmap = encode_prior_targets_with_visibility(
                bboxes, joints2d, joints_z, pose_weights, person_valid, zm, cfg, depth
            )
        else:
            prior, mconf, mcoord, wmap = encode_prior_targets(
                bboxes, joints2d, joints_z, pose_weights, person_valid, cfg, depth
            )
        out["prior_map"] = prior
        out["prior_mask_conf"] = mconf
        out["prior_mask_coord"] = mcoord
        out["prior_weight_map"] = wmap
    return out
