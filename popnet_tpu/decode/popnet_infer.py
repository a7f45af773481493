"""End-to-end PoP-Net inference: depth frame -> aligned 3D poses, fully jitted.

The PoP-Net readout path (reference artifacts: prior subnet decode as in
evaluation_yolo_posenet_* scripts, plus the alignment refinement mechanism
shipped library-only in lib/utils/prior_pose_align.py:321-375 and the
heat-weighted z readout of lib/utils/common.py:272-293):

1. decode the prior subnet into candidate people (boxes + K x (x, y, z)),
2. refine each joint's 2D position with the predicted short-range alignment
   field, weighted by the part heatmap in a (2r+1)^2 window,
3. re-read each joint's depth from the z-map with heatmap weighting,
4. back-project to camera-frame 3D.

Everything is batched and static-shape: (B, M, K, ...) with validity masks,
so the whole pipeline (CNN included) compiles to one XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from popnet_tpu.core.camera import CameraIntrinsics
from popnet_tpu.core.config import DecodeConfig, DepthStats, EncoderConfig
from popnet_tpu.decode.prior import decode_prior_maps


def _window_offsets(radius: int):
    r = jnp.arange(-radius, radius + 1)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return dx.reshape(-1), dy.reshape(-1)


def _int_peaks_batched(heat: jnp.ndarray, thresh: float, max_peaks: int):
    """Integer-coordinate local maxima per joint channel, top-K by score
    (the device twin of decode/peaks_np.find_peaks, no subpixel refine).

    heat (B, H, W, K) -> (px, py, valid) each (B, K, N)."""
    from popnet_tpu.ops.pallas_kernels import peak_mask

    B, H, W, K = heat.shape
    is_peak = peak_mask(heat, thresh)
    s = jnp.where(is_peak, heat, -jnp.inf).transpose(0, 3, 1, 2).reshape(B, K, H * W)

    # lax.top_k is stable (lower index first on ties) — identical selection
    # to a max_peaks-step iterative masked argmax, in one fused op instead
    # of a serial scan (which cost ~2x the whole prior decode at batch 512)
    val, idx = jax.lax.top_k(s, max_peaks)  # (B, K, N)
    valid = jnp.isfinite(val)
    # row-major (scan) order like the host's np.nonzero, so downstream
    # nearest-peak argmin ties break identically (peaks_np.find_peaks)
    idx = jnp.sort(jnp.where(valid, idx, H * W), axis=-1)
    valid = idx < H * W
    idx = jnp.where(valid, idx, 0)
    return idx % W, idx // W, valid


@functools.partial(
    jax.jit, static_argnames=("ecfg", "dcfg", "depth", "cam", "readout", "ht_thresh")
)
def popnet_decode(
    heat: jnp.ndarray,    # (B, Hg, Wg, K+1)
    zmap: jnp.ndarray,    # (B, Hg, Wg, K) normalized
    align: jnp.ndarray,   # (B, Hg, Wg, 2K) normalized offsets
    prior: jnp.ndarray,   # (B, Hp, Wp, A*(5+3K))
    ecfg: EncoderConfig,
    dcfg: DecodeConfig,
    depth: DepthStats,
    cam: CameraIntrinsics,
    w_out: float = 480.0,
    h_out: float = 512.0,
    readout: str = "universe",
    ht_thresh: float = 0.5,
):
    """Returns dict with boxes (B,M,5 px), joints2d (B,M,K,2 px),
    joints3d (B,M,K,3 m), conf (B,M,K), valid (B,M).

    `readout` selects the 2D/z refinement mechanism. "universe" is the
    default AND the measured winner — gated is DOMINATED on every 3D
    metric (PCK3D 0.837 vs 0.966, mAP3D 0.762 vs 0.944 on the synthetic
    generalization benchmark, examples/results/syngen_r3.json). Keep gated
    for ablation studies only; do not ship it.

    - "gated": heat-gated window refinement — each window cell
      votes its align-corrected center, heat-weighted; joints without local
      heat evidence keep the prior subnet's direct prediction.
    - "universe": the reference's universe_align_map fusion (reference:
      lib/utils/prior_pose_align.py:321-375, shipped library-only) — align
      offsets outside any heat peak's radius box are replaced by the offset
      toward the nearest peak of that joint type, then the fused field is
      read out heat-weighted (common.py:161-187) and z re-read at the
      refined position (common.py:272-293). `ht_thresh` is the peak
      threshold of the fusion (reference default 0.5).
    """
    K = ecfg.num_joints
    anchors = jnp.asarray(ecfg.anchors, dtype=jnp.float32)
    dets, valid = decode_prior_maps(
        prior, anchors, depth.mean, depth.std, num_joints=K,
        conf_threshold=dcfg.conf_threshold, nms_threshold=dcfg.nms_threshold,
        max_det=dcfg.max_people,
    )
    B, M = valid.shape
    jx = dets[..., 5 : 5 + K]              # normalized [0,1] image coords
    jy = dets[..., 5 + K : 5 + 2 * K]
    jz_prior = dets[..., 5 + 2 * K : 5 + 3 * K]  # meters

    Hg, Wg = ecfg.agrid_h, ecfg.agrid_w
    r = 1  # readout radius (reference eval scripts use radius=1)
    span = float(ecfg.align_radius) + 0.5

    # joint positions on the align/heat grid
    gx = jx * Wg
    gy = jy * Hg
    cx = jnp.clip(jnp.floor(gx), 0, Wg - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(gy), 0, Hg - 1).astype(jnp.int32)

    # window readout, gather-free: per-joint one-hot row/col selectors make
    # every (2r+1)^2 window read a tiny einsum on the VPU/MXU
    dxo, dyo = _window_offsets(r)
    gxw = jnp.clip(cx[..., None] + dxo, 0, Wg - 1)  # (B, M, K, win)
    gyw = jnp.clip(cy[..., None] + dyo, 0, Hg - 1)
    rowsel = jax.nn.one_hot(gyw, Hg, dtype=heat.dtype)  # (B, M, K, win, Hg)
    colsel = jax.nn.one_hot(gxw, Wg, dtype=heat.dtype)  # (B, M, K, win, Wg)
    align2 = align.reshape(align.shape[0], Hg, Wg, K, 2)

    def window(field):  # field (B, Hg, Wg, K) -> (B, M, K, win)
        return jnp.einsum("byxk,bmkiy,bmkix->bmki", field, rowsel, colsel)

    hwin = jnp.maximum(window(heat[..., :K]), 0.0) + 1e-9
    zwin = window(zmap)
    axwin = window(align2[..., 0])
    aywin = window(align2[..., 1])
    wsum = jnp.sum(hwin, axis=-1)
    heat_at = jnp.einsum(
        "byxk,bmky,bmkx->bmk",
        heat[..., :K],
        jax.nn.one_hot(cy, Hg, dtype=heat.dtype),
        jax.nn.one_hot(cx, Wg, dtype=heat.dtype),
    )

    if readout == "gated":
        # candidate centers voted by each window cell (align-grid units)
        cand_x = gxw + 0.5 + axwin * span
        cand_y = gyw + 0.5 + aywin * span
        ref_x = jnp.sum(cand_x * hwin, axis=-1) / wsum  # (B, M, K)
        ref_y = jnp.sum(cand_y * hwin, axis=-1) / wsum
        z_norm = jnp.sum(zwin * hwin, axis=-1) / wsum
        z = z_norm * depth.std + depth.mean

        # alignment confidence: where local heat evidence is weak, keep the
        # prior subnet's direct prediction
        use_align = heat_at > dcfg.thresh_heatmap
        out_x = jnp.where(use_align, ref_x / Wg, jx) * w_out
        out_y = jnp.where(use_align, ref_y / Hg, jy) * h_out
        out_z = jnp.where(use_align, z, jz_prior)
    elif readout == "universe":
        px, py, pk_valid = _int_peaks_batched(
            heat[..., :K], ht_thresh, dcfg.max_peaks
        )  # (B, K, N)
        pxe = px[:, None, :, None, :]                    # (B, 1, K, 1, N)
        pye = py[:, None, :, None, :]
        dxp = (pxe - gxw[..., None]).astype(jnp.float32)  # (B, M, K, win, N)
        dyp = (pye - gyw[..., None]).astype(jnp.float32)
        d2 = jnp.where(
            pk_valid[:, None, :, None, :], dxp * dxp + dyp * dyp, jnp.inf
        )
        # nearest-peak select as a one-hot reduction over the small N axis —
        # a take_along_axis point gather here serializes on TPU (minor-dim
        # gather), and N = max_peaks is tiny
        nearest = jax.nn.one_hot(
            jnp.argmin(d2, axis=-1), d2.shape[-1], dtype=dxp.dtype
        )
        far_x = jnp.sum(dxp * nearest, axis=-1)
        far_y = jnp.sum(dyp * nearest, axis=-1)
        ra = float(ecfg.align_radius)
        in_box = (
            (jnp.abs(dxp) <= ra) & (jnp.abs(dyp) <= ra)
            & pk_valid[:, None, :, None, :]
        )
        fg = jnp.any(in_box, axis=-1)                    # cell near some peak
        has_pk = jnp.any(pk_valid, axis=-1)[:, None, :, None]
        off_x = jnp.where(has_pk & ~fg, far_x, axwin * span)
        off_y = jnp.where(has_pk & ~fg, far_y, aywin * span)

        # retrieve_offsets_heat_weighted at the prior position's window
        dxv = off_x + (gxw - cx[..., None]) + 0.5
        dyv = off_y + (gyw - cy[..., None]) + 0.5
        ref_x = cx + jnp.sum(dxv * hwin, axis=-1) / wsum  # grid units
        ref_y = cy + jnp.sum(dyv * hwin, axis=-1) / wsum

        # z re-read (heat-weighted) at the REFINED position
        cx2 = jnp.clip(ref_x.astype(jnp.int32), 0, Wg - 1)
        cy2 = jnp.clip(ref_y.astype(jnp.int32), 0, Hg - 1)
        gxw2 = jnp.clip(cx2[..., None] + dxo, 0, Wg - 1)
        gyw2 = jnp.clip(cy2[..., None] + dyo, 0, Hg - 1)
        rs2 = jax.nn.one_hot(gyw2, Hg, dtype=heat.dtype)
        cs2 = jax.nn.one_hot(gxw2, Wg, dtype=heat.dtype)
        hwin2 = jnp.maximum(
            jnp.einsum("byxk,bmkiy,bmkix->bmki", heat[..., :K], rs2, cs2), 0.0
        ) + 1e-9
        zwin2 = jnp.einsum("byxk,bmkiy,bmkix->bmki", zmap, rs2, cs2)
        z = (jnp.sum(zwin2 * hwin2, -1) / jnp.sum(hwin2, -1)) * depth.std + depth.mean

        out_x = ref_x / Wg * w_out
        out_y = ref_y / Hg * h_out
        out_z = z
    else:
        raise ValueError(f"unknown readout {readout!r}")

    X = (out_x - cam.cx) / cam.fx * out_z
    Y = (out_y - cam.cy) / cam.fy * out_z
    joints2d = jnp.stack([out_x, out_y], axis=-1)
    joints3d = jnp.stack([X, Y, out_z], axis=-1)

    boxes = dets[..., :5]
    boxes = boxes.at[..., 0].mul(w_out)
    boxes = boxes.at[..., 1].mul(h_out)
    boxes = boxes.at[..., 2].mul(w_out)
    boxes = boxes.at[..., 3].mul(h_out)

    return {
        "boxes": boxes,
        "joints2d": joints2d,
        "joints3d": joints3d,
        "conf": heat_at,
        "valid": valid,
    }
