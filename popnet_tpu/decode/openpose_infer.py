"""Fully-jitted Open-Pose+ inference decode: dense maps -> 3D human lists.

One XLA program for the complete bottom-up path (reference call stack:
evaluation_rtpose_light3d_kdh3d_mpreal_ablation.py:161-305):

    peaks + subpixel refine  (decode/device.find_peaks_batched)
    PAF pair scoring         (decode/device.score_limb_pairs_batched)
    greedy person assembly   (decode/assemble_device.assemble_batched)
    heat-weighted z readout  (== utils/common.py:272-293 semantics, batched)
    raw-depth readout        (== ablation eval's img[b][0][int(y), int(x)])
    scale to original res + pinhole back-projection

Only the final (B, P, K, ...) human tensors leave the device, so the
Open-Pose+ serving path has no dense D2H and no host assembly stage.
Float32 semantics match the host path (decode/assemble.py + decode/readout.py)
except the z/raw readouts which the host computes in float64 (tested to
~1e-5 relative).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from popnet_tpu.core.camera import CameraIntrinsics
from popnet_tpu.core.config import DecodeConfig, DepthStats, EncoderConfig
from popnet_tpu.core.skeleton import LIMBS
from popnet_tpu.decode.assemble_device import assemble_batched
from popnet_tpu.decode.device import find_peaks_batched, score_limb_pairs_batched


def window_readout_heat_weighted(
    depthmaps: jnp.ndarray,  # (B, H, W, K) denormalized z maps
    heatmaps: jnp.ndarray,   # (B, H, W, K)
    cx: jnp.ndarray,         # (B, P, K) int32 window centers (grid coords)
    cy: jnp.ndarray,
    radius: int = 1,
    use_pallas: bool | None = None,
):
    """Batched retrieve_depth_heat_weighted (reference: common.py:272-293).

    Window = inclusive [clip(c-r), clip(c+r)] per axis — it SHRINKS at the
    borders (and collapses to the edge cell for centers outside the map),
    exactly like the host _window helper. Negative heat clamps to 0; every
    true window element gets the +1e-9 stabilizer.

    use_pallas: None auto-selects the VMEM kernel on TPU (parity pinned in
    tests/test_pallas_kernels.py); the XLA einsum path runs elsewhere.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from popnet_tpu.ops.pallas_kernels import window_readout_pallas

        return window_readout_pallas(
            depthmaps, heatmaps, cx, cy, radius=radius,
            interpret=jax.default_backend() != "tpu",
        ).astype(depthmaps.dtype)
    B, H, W, K = depthmaps.shape
    S = 2 * radius + 1
    t = jnp.arange(S)

    x0 = jnp.clip(cx - radius, 0, W - 1)
    x1 = jnp.clip(cx + radius, 0, W - 1)
    y0 = jnp.clip(cy - radius, 0, H - 1)
    y1 = jnp.clip(cy + radius, 0, H - 1)

    cols = x0[..., None] + t                          # (B, P, K, S)
    rows = y0[..., None] + t
    cmask = t <= (x1 - x0)[..., None]
    rmask = t <= (y1 - y0)[..., None]

    dt = depthmaps.dtype
    C = jax.nn.one_hot(cols, W, dtype=dt) * cmask[..., None].astype(dt)
    R = jax.nn.one_hot(rows, H, dtype=dt) * rmask[..., None].astype(dt)

    zK = depthmaps.transpose(0, 3, 1, 2)              # (B, K, H, W)
    hK = jnp.maximum(heatmaps, 0.0).transpose(0, 3, 1, 2)

    pz = jnp.einsum("bpkth,bkhw,bpksw->bpkts", R, zK, C)
    ph = jnp.einsum("bpkth,bkhw,bpksw->bpkts", R, hK, C)
    mask2d = (rmask[..., :, None] & cmask[..., None, :]).astype(dt)
    w = ph + 1e-9 * mask2d
    return jnp.sum(pz * w, axis=(-2, -1)) / jnp.sum(w, axis=(-2, -1))


@functools.partial(
    jax.jit,
    static_argnames=("num_joints", "dcfg", "limbs", "sx", "sy"),
)
def paf_decode_2d(
    heat: jnp.ndarray,   # (B, H, W, >=K) raw model heatmaps
    paf: jnp.ndarray,    # (B, H, W, 2L)
    num_joints: int,
    dcfg: DecodeConfig = DecodeConfig(),
    limbs: tuple = LIMBS,
    sx: float = 1.0,     # model-input px -> output px scale
    sy: float = 1.0,
):
    """Skeleton-generic 2D PAF decode: peaks + subpixel refine + PAF scoring
    + greedy assembly, ONE jitted program, no depth/3D stage — the decode
    the RGB (COCO/MPII) models need (reference: paf_to_pose + pafprocess in
    evaluate/coco_eval.py:243-281, here on device). Returns
    joints2d (B, P, K, 2) with (-1, -1) holes, conf (B, P, K), counts (B,).
    """
    heat = heat.astype(jnp.float32)
    paf = paf.astype(jnp.float32)
    peaks, pvalid = find_peaks_batched(
        heat, max_peaks=dcfg.max_peaks, thresh=dcfg.thresh_heatmap,
        factor=dcfg.downsample, win_size=dcfg.win_size,
        num_joints=num_joints,
    )
    scores, ok = score_limb_pairs_batched(
        paf, peaks, pvalid, num_intermed_pts=dcfg.num_intermed_pts,
        thresh_paf=dcfg.thresh_paf, factor=dcfg.downsample, limbs=limbs,
    )
    joints, counts = assemble_batched(
        peaks, pvalid, scores, ok, limbs=limbs, max_people=dcfg.max_people,
        min_parts=dcfg.min_parts, min_score=dcfg.min_score,
    )
    vis = joints[..., 0] >= 0
    x2 = jnp.where(vis, joints[..., 0] * jnp.float32(sx), joints[..., 0])
    y2 = jnp.where(vis, joints[..., 1] * jnp.float32(sy), joints[..., 1])
    return {
        "joints2d": jnp.stack([x2, y2], axis=-1),
        "conf": joints[..., 2],
        "visibility": vis.astype(jnp.int32),
        "counts": counts,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "ecfg", "dcfg", "depth", "cam", "w_out", "h_out", "limbs",
    ),
)
def openpose_decode(
    heat: jnp.ndarray,   # (B, H, W, >=K) raw model heatmaps
    paf: jnp.ndarray,    # (B, H, W, 2L)
    zmap: jnp.ndarray,   # (B, H, W, K) NORMALIZED z branch output
    image: jnp.ndarray,  # (B, input_y, input_x, 1) NORMALIZED input depth
    ecfg: EncoderConfig = EncoderConfig(),
    dcfg: DecodeConfig = DecodeConfig(),
    depth: DepthStats = None,
    cam: CameraIntrinsics = None,
    w_out: float = 480.0,
    h_out: float = 512.0,
    limbs: tuple = LIMBS,
):
    """Returns a dict of fixed-size human tensors:

    joints2d (B, P, K, 2) in (w_out, h_out) coords, (-1, -1) holes;
    joints3d / joints3d_raw (B, P, K, 3) back-projected from the pose-z and
    raw-depth readouts; conf (B, P, K); visibility (B, P, K) int32;
    counts (B,). Person rows are packed: row p is real iff p < counts[b].
    """
    heat = heat.astype(jnp.float32)
    paf = paf.astype(jnp.float32)
    zmap = zmap.astype(jnp.float32) * depth.std + depth.mean
    raw = image[..., 0].astype(jnp.float32) * depth.std + depth.mean

    peaks, pvalid = find_peaks_batched(
        heat, max_peaks=dcfg.max_peaks, thresh=dcfg.thresh_heatmap,
        factor=dcfg.downsample, win_size=dcfg.win_size,
        num_joints=ecfg.num_joints,
    )
    scores, ok = score_limb_pairs_batched(
        paf, peaks, pvalid, num_intermed_pts=dcfg.num_intermed_pts,
        thresh_paf=dcfg.thresh_paf, factor=dcfg.downsample, limbs=limbs,
    )
    joints, counts = assemble_batched(
        peaks, pvalid, scores, ok, limbs=limbs, max_people=dcfg.max_people,
        min_parts=dcfg.min_parts, min_score=dcfg.min_score,
    )

    x_up = joints[..., 0]                              # (B, P, K)
    y_up = joints[..., 1]
    conf = joints[..., 2]
    vis = x_up >= 0  # border-clamped refinement keeps real joints at x,y >= 0

    # pose-depth readout at truncated low-res coords (int() semantics)
    gx = (x_up / dcfg.downsample).astype(jnp.int32)
    gy = (y_up / dcfg.downsample).astype(jnp.int32)
    z_pose = window_readout_heat_weighted(zmap, heat[..., : ecfg.num_joints], gx, gy)

    # raw-depth readout: img[int(clip(y)), int(clip(x))]
    Hi, Wi = raw.shape[1], raw.shape[2]
    rx = jnp.clip(x_up, 0, Wi - 1).astype(jnp.int32)
    ry = jnp.clip(y_up, 0, Hi - 1).astype(jnp.int32)
    if jax.default_backend() == "tpu":
        # point gathers serialize on TPU — one-hot matmul kernel instead
        from popnet_tpu.ops.pallas_kernels import point_readout_pallas

        P_, K_ = rx.shape[1], rx.shape[2]
        z_raw = point_readout_pallas(
            raw, rx.reshape(-1, P_ * K_), ry.reshape(-1, P_ * K_)
        ).reshape(rx.shape).astype(raw.dtype)
    else:
        z_raw = raw[jnp.arange(raw.shape[0])[:, None, None], ry, rx]

    z_pose = jnp.where(vis, z_pose, -1.0)
    z_raw = jnp.where(vis, z_raw, -1.0)

    sx = jnp.float32(w_out / ecfg.input_x)
    sy = jnp.float32(h_out / ecfg.input_y)
    x2 = jnp.where(vis, x_up * sx, x_up)
    y2 = jnp.where(vis, y_up * sy, y_up)

    def backproj(z):
        X = (x2 - cam.cx) / cam.fx * z
        Y = (y2 - cam.cy) / cam.fy * z
        return jnp.stack([X, Y, z], axis=-1)

    return {
        "joints2d": jnp.stack([x2, y2], axis=-1),
        "joints3d": backproj(z_pose),
        "joints3d_raw": backproj(z_raw),
        "conf": conf,
        "visibility": vis.astype(jnp.int32),
        "counts": counts,
    }
