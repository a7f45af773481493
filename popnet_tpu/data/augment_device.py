"""Fused on-device augmentation: one affine warp per sample.

TPU-first re-design of the reference's sequential host pipeline
(Rotate -> RenderDepth -> Crop -> Resize, reference:
data_augmentation_2d3d.py + train_rtpose_light3d_kdh3d.py:298-305):

- the tiny scalar math (random ratios, the RenderDepth integer-rounding /
  ratio-recompute trick, crop bounds) runs on host per sample, exactly as
  the reference computes it;
- the label algebra is applied in closed form (identical to composing the
  reference transforms);
- the heavy pixel work collapses into ONE batched inverse-affine bilinear
  warp on device, instead of warpAffine + slice + resize (two resamplings)
  per sample in worker processes.

Pixel values therefore differ from the reference by at most one extra
bilinear resampling (the fused warp is the higher-quality variant); label
geometry is bit-identical.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class AffineParams:
    """Composed augmentation for one sample."""

    label_mat: np.ndarray    # (2, 3) forward map input px -> output px (2D joints)
    bbox_scale: np.ndarray   # (2,) forward bbox scale (no rotation, per reference)
    bbox_offset: np.ndarray  # (2,) forward bbox offset
    inv_mat: np.ndarray      # (2, 3) inverse map output px -> input px (sampling)
    depth_scale: float       # multiply depth values and 3D Z
    rot_deg: float           # 3D X, Y rotation (if is_3d)
    flip: bool               # horizontal flip applied
    src_w: int               # source width (for flip label algebra)


def _rot_mat(cx: float, cy: float, deg: float) -> np.ndarray:
    """cv2.getRotationMatrix2D(center, deg, 1.0) equivalent."""
    a = math.cos(math.radians(deg))
    b = math.sin(math.radians(deg))
    return np.array(
        [[a, b, (1 - a) * cx - b * cy], [-b, a, b * cx + (1 - a) * cy]], dtype=np.float64
    )


def _compose(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(2,3) affine composition: A after B."""
    M = np.eye(3)
    M[:2] = A
    N = np.eye(3)
    N[:2] = B
    return (M @ N)[:2]


def sample_augment_params(
    rng: np.random.Generator,
    h: int,
    w: int,
    out_h: int = 224,
    out_w: int = 224,
    rotate_deg: float = 10.0,
    render_min: float = 0.7,
    render_max: float = 1.2,
    max_crop: float = 0.1,
    hflip: bool = False,
) -> AffineParams:
    """Draw one augmentation and compose it into a single affine.

    Scalar math (rounding, ratio recompute) matches the reference exactly
    (reference: data_augmentation_2d3d.py:283-350 RenderDepth,
    :94-128 Crop, :411-448 Rotate, :497-522 Resize).
    """
    # --- Rotate ---
    rot = float(rng.uniform(-rotate_deg, rotate_deg)) if rotate_deg > 0 else 0.0
    cx0, cy0 = w / 2, h / 2
    R = _rot_mat(cx0, cy0, rot)

    # --- RenderDepth (integer-rounded bounds, ratio recompute) ---
    a = float(rng.uniform(render_min, render_max))
    xmin, ymin, xmax, ymax = 0.0, 0.0, float(w), float(h)
    new_xmin = int(a * (xmin - cx0) + cx0)
    new_ymin = int(a * (ymin - cy0) + cy0)
    new_xmax = int(a * (xmax - cx0) + cx0)
    new_ymax = int(a * (ymax - cy0) + cy0)
    ax = (new_xmin - cx0) / (xmin - cx0)
    ay = (new_ymin - cy0) / (ymin - cy0)
    a = (ax + ay) / 2
    rd_w = new_xmax - new_xmin + (1 if a > 1 else 0)
    rd_h = new_ymax - new_ymin + (1 if a > 1 else 0)
    if a <= 1:
        # crop: size is the slice length
        rd_w = new_xmax - new_xmin
        rd_h = new_ymax - new_ymin
    T_rd = np.array([[1, 0, -new_xmin], [0, 1, -new_ymin]], dtype=np.float64)

    # --- Crop ---
    if max_crop > 0:
        cl = float(rng.uniform(0, max_crop))
        cr = float(rng.uniform(0, max_crop))
        ct = float(rng.uniform(0, max_crop))
        cb = float(rng.uniform(0, max_crop))
        c_xmin = int(min(cl * rd_w, rd_w))
        c_ymin = int(min(ct * rd_h, rd_h))
        c_xmax = int(max(rd_w - 1 - cr * rd_w, 0))
        c_ymax = int(max(rd_h - 1 - cb * rd_h, 0))
    else:
        # no Crop stage at all (the reference eval pipeline is
        # Cvt2ndarray + Resize only) — do NOT apply Crop's 1-px shave
        c_xmin = c_ymin = 0
        c_xmax, c_ymax = rd_w, rd_h
    crop_w = c_xmax - c_xmin
    crop_h = c_ymax - c_ymin
    T_c = np.array([[1, 0, -c_xmin], [0, 1, -c_ymin]], dtype=np.float64)

    # --- Resize ---
    wr = float(out_w) / crop_w
    hr = float(out_h) / crop_h
    S = np.array([[wr, 0, 0], [0, hr, 0]], dtype=np.float64)

    flip = bool(hflip and rng.uniform(0, 1) >= 0.5)

    # forward 2D-label map (flip handled separately: it precedes everything)
    label_mat = _compose(S, _compose(T_c, _compose(T_rd, R)))

    # bbox map skips the rotation (the reference keeps bboxes unrotated)
    bbox_scale = np.array([wr, hr])
    bbox_offset = np.array([(-new_xmin - c_xmin) * wr, (-new_ymin - c_ymin) * hr])

    # inverse map for sampling: out px -> src px, with resize half-pixel
    # convention ((u+0.5)*scale-0.5) like cv2.resize INTER_LINEAR
    inv_resize = np.array(
        [[1 / wr, 0, 0.5 / wr - 0.5], [0, 1 / hr, 0.5 / hr - 0.5]], dtype=np.float64
    )
    fwd_pre = _compose(T_c, _compose(T_rd, R))  # src -> pre-resize px
    M3 = np.eye(3)
    M3[:2] = fwd_pre
    inv_pre = np.linalg.inv(M3)[:2]
    inv_mat = _compose(inv_pre, inv_resize)

    return AffineParams(
        label_mat=label_mat.astype(np.float32),
        bbox_scale=bbox_scale.astype(np.float32),
        bbox_offset=bbox_offset.astype(np.float32),
        inv_mat=inv_mat.astype(np.float32),
        depth_scale=float(a),
        rot_deg=rot,
        flip=flip,
        src_w=w,
    )


def transform_labels(params: AffineParams, joints2d, joints3d, bboxes, swap_indices=None):
    """Exact label algebra of the composed pipeline (NumPy, per sample)."""
    j2 = np.asarray(joints2d, dtype=np.float64).copy()
    j3 = np.asarray(joints3d, dtype=np.float64).copy()
    bb = np.asarray(bboxes, dtype=np.float64).copy()

    if params.flip:
        j2[..., 0] = -j2[..., 0] + params.src_w
        j3[..., 0] *= -1
        if swap_indices is not None:
            j2 = j2[..., swap_indices, :]
            j3 = j3[..., swap_indices, :]
        xmin = -bb[..., 2] + params.src_w
        xmax = -bb[..., 0] + params.src_w
        bb[..., 0], bb[..., 2] = xmin, xmax

    A = params.label_mat
    x = A[0, 0] * j2[..., 0] + A[0, 1] * j2[..., 1] + A[0, 2]
    y = A[1, 0] * j2[..., 0] + A[1, 1] * j2[..., 1] + A[1, 2]
    j2 = np.stack([x, y], axis=-1)

    R3 = _rot_mat(0.0, 0.0, params.rot_deg)
    X = R3[0, 0] * j3[..., 0] + R3[0, 1] * j3[..., 1]
    Y = R3[1, 0] * j3[..., 0] + R3[1, 1] * j3[..., 1]
    j3 = np.stack([X, Y, j3[..., 2] * params.depth_scale], axis=-1)

    bb[..., 0:4:2] = bb[..., 0:4:2] * params.bbox_scale[0] + params.bbox_offset[0]
    bb[..., 1:4:2] = bb[..., 1:4:2] * params.bbox_scale[1] + params.bbox_offset[1]
    return j2.astype(np.float32), j3.astype(np.float32), bb.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_depth_batch(
    images: jnp.ndarray,       # (B, H, W)
    inv_mats: jnp.ndarray,     # (B, 2, 3) output px -> source px
    depth_scales: jnp.ndarray, # (B,)
    flips: jnp.ndarray,        # (B,) bool
    out_h: int = 224,
    out_w: int = 224,
) -> jnp.ndarray:
    """Batched inverse-affine bilinear warp with zero fill; depth scaled."""
    B, H, W = images.shape
    u = jnp.arange(out_w, dtype=jnp.float32)
    v = jnp.arange(out_h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # (out_h, out_w)

    def one(img, M, scale, flip):
        img = jnp.where(flip, img[:, ::-1], img)
        sx = M[0, 0] * uu + M[0, 1] * vv + M[0, 2]
        sy = M[1, 0] * uu + M[1, 1] * vv + M[1, 2]
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0

        def tap(xi, yi):
            inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            return jnp.where(inside, img[yi_c, xi_c], 0.0)

        out = (
            tap(x0, y0) * (1 - fx) * (1 - fy)
            + tap(x0 + 1, y0) * fx * (1 - fy)
            + tap(x0, y0 + 1) * (1 - fx) * fy
            + tap(x0 + 1, y0 + 1) * fx * fy
        )
        return out * scale

    return jax.vmap(one)(images, inv_mats, depth_scales, flips)


def params_from_box(box, out_h: int = 224, out_w: int = 224, src_w: int = 480):
    """AffineParams for a plain integer ROI crop + resize (the CropPoseRoi ->
    Resize pipeline of the ROI model variants,
    reference: data_augmentation_2d3d.py:131-169, 497-522)."""
    x0, y0, x1, y1 = (int(v) for v in box)
    crop_w = max(x1 - x0, 1)
    crop_h = max(y1 - y0, 1)
    wr = float(out_w) / crop_w
    hr = float(out_h) / crop_h
    label_mat = np.array([[wr, 0, -x0 * wr], [0, hr, -y0 * hr]], dtype=np.float32)
    inv_mat = np.array(
        [[1 / wr, 0, 0.5 / wr - 0.5 + x0], [0, 1 / hr, 0.5 / hr - 0.5 + y0]],
        dtype=np.float32,
    )
    return AffineParams(
        label_mat=label_mat,
        bbox_scale=np.array([wr, hr], np.float32),
        bbox_offset=np.array([-x0 * wr, -y0 * hr], np.float32),
        inv_mat=inv_mat,
        depth_scale=1.0,
        rot_deg=0.0,
        flip=False,
        src_w=src_w,
    )
