"""ITOP A2J preprocessing: torso-centered crops with relative depth.

Reference: A2J_experiments/itop_train_64.py:55-290 / itop_test.py —
the ITOP recipe differs from the KDH3D one (a2j_crops.py):

- the person box comes from the torso center: +-xy_thres in WORLD
  coordinates around the center, back-projected to pixels;
- depth is clamped to center_z +- depth_thres then expressed RELATIVE to
  the center depth (so the network regresses offsets around the torso);
- normalization uses per-dataset mean/std of that relative depth;
- labels carry (y, x) in crop space and z - center_z.

All the pixel work is one jitted nearest-gather per crop batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from popnet_tpu.core.camera import CameraIntrinsics, ITOP_INTRINSICS

CROP = 288


def boxes_from_centers(
    centers_uvd: np.ndarray,     # (N, 3) torso (u, v, z)
    cam: CameraIntrinsics = ITOP_INTRINSICS,
    xy_thres: float = 120.0,     # world-units half-extent (reference :50)
    img_h: int = 240,
    img_w: int = 320,
    rand_shift: int = 0,
    rng: np.random.Generator | None = None,
):
    """World-space +-xy_thres box about each center, projected to pixels
    (reference: itop_train_64.py:110-131, 245-249). Returns (N, 4)
    [xmin, ymin, xmax, ymax] clamped to the image."""
    c = np.asarray(centers_uvd, dtype=np.float64)
    X = (c[:, 0] - cam.cx) * c[:, 2] / cam.fx
    Y = (c[:, 1] - cam.cy) * c[:, 2] / cam.fy
    x0 = (X - xy_thres) * cam.fx / c[:, 2] + cam.cx
    x1 = (X + xy_thres) * cam.fx / c[:, 2] + cam.cx
    y0 = (Y - xy_thres) * cam.fy / c[:, 2] + cam.cy
    y1 = (Y + xy_thres) * cam.fy / c[:, 2] + cam.cy
    xmin = np.minimum(x0, x1)
    xmax = np.maximum(x0, x1)
    ymin = np.minimum(y0, y1)
    ymax = np.maximum(y0, y1)
    if rand_shift and rng is not None:
        xmin = xmin + rng.integers(-rand_shift, rand_shift, len(c))
        ymin = ymin + rng.integers(-rand_shift, rand_shift, len(c))
        xmax = xmax + rng.integers(-rand_shift, rand_shift, len(c))
        ymax = ymax + rng.integers(-rand_shift, rand_shift, len(c))
    xmin = np.maximum(xmin, 0)
    ymin = np.maximum(ymin, 0)
    xmax = np.minimum(xmax, img_w - 1)
    ymax = np.minimum(ymax, img_h - 1)
    return np.stack([xmin, ymin, xmax, ymax], 1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_size",))
def itop_crop_batch(
    images: jnp.ndarray,     # (B, H, W)
    image_idx: jnp.ndarray,  # (N,)
    boxes: jnp.ndarray,      # (N, 4) int-truncated like the reference slices
    center_z: jnp.ndarray,   # (N,)
    mean: float,
    std: float,
    depth_thres: float = 0.4,
    out_size: int = CROP,
):
    """Torso-relative normalized crops (reference: itop_train_64.py:250-262):
    out = ((clamp(d, cz +- thres) -> cz outside) - cz - mean) / std."""
    B, H, W = images.shape

    def one(bidx, box, cz):
        x0, y0, x1, y1 = jnp.floor(box[0]), jnp.floor(box[1]), jnp.floor(box[2]), jnp.floor(box[3])
        bw = x1 - x0
        bh = y1 - y0
        u = jnp.arange(out_size, dtype=jnp.float32)
        sx = jnp.floor(u * bw / out_size) + x0
        sy = jnp.floor(u * bh / out_size) + y0
        xi = jnp.clip(sx[None, :], 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(sy[:, None], 0, H - 1).astype(jnp.int32)
        crop = images[bidx][yi + jnp.zeros_like(xi), xi + jnp.zeros_like(yi)]
        crop = jnp.where(crop >= cz + depth_thres, cz, crop)
        crop = jnp.where(crop <= cz - depth_thres, cz, crop)
        return (crop - cz - mean) / std

    return jax.vmap(one)(image_idx, boxes, center_z)[..., None]


def itop_relative_stats(
    dataset,
    xy_thres: float = 120.0,
    depth_thres: float = 0.4,
    center_joint: int = 8,
    batch_size: int = 32,
    out_size: int = CROP,
):
    """Measured (mean, std) of the torso-relative clamped crop distribution.

    The reference precomputes exactly this per dataset
    (itop_train_64.py:85-86 loads itop_side_mean/std.npy) and normalizes
    crops with it (:260 `(imgResize - mean[-1]) / std[-1]`) — the crop
    values are RELATIVE depth in [-depth_thres, depth_thres], so absolute
    depth stats (3.0 / 2.0) are the wrong scale by ~5x and park every crop
    at -1.5 with ~0.1 variance. `dataset` is the KDH3DDataset-style
    single-person set the eval driver consumes."""
    cam = dataset.intrinsics or ITOP_INTRINSICS
    total, total_sq, count = 0.0, 0.0, 0
    n = len(dataset)
    for s in range(0, n, batch_size):
        idxs = range(s, min(s + batch_size, n))
        imgs, centers = [], []
        for i in idxs:
            depth, anns = dataset.load_composited(int(i))
            imgs.append(depth.astype(np.float32))
            j2 = np.asarray(anns[0]["2d_joints"], np.float64)[center_joint]
            z = np.asarray(anns[0]["3d_joints"], np.float64)[center_joint, 2]
            centers.append([j2[0], j2[1], z])
        centers = np.asarray(centers)
        h, w = imgs[0].shape
        boxes = boxes_from_centers(centers, cam, xy_thres=xy_thres,
                                   img_h=h, img_w=w)
        crops = np.asarray(itop_crop_batch(
            jnp.asarray(np.stack(imgs)), jnp.arange(len(imgs)),
            jnp.asarray(boxes), jnp.asarray(centers[:, 2], jnp.float32),
            mean=0.0, std=1.0, depth_thres=depth_thres, out_size=out_size,
        ), dtype=np.float64)
        total += crops.sum()
        total_sq += (crops ** 2).sum()
        count += crops.size
    mean = total / count
    var = max(total_sq / count - mean * mean, 1e-12)
    return float(mean), float(np.sqrt(var))


def itop_crop_labels(joints_uvd: np.ndarray, boxes: np.ndarray,
                     center_z: np.ndarray, out_size: int = CROP):
    """(N, K, 3) (y, x, z-rel) labels in crop space
    (reference: itop_train_64.py:263-276)."""
    j = np.asarray(joints_uvd, dtype=np.float64)
    b = np.floor(np.asarray(boxes, dtype=np.float64))
    x = (j[..., 0] - b[:, None, 0]) * out_size / (b[:, None, 2] - b[:, None, 0])
    y = (j[..., 1] - b[:, None, 1]) * out_size / (b[:, None, 3] - b[:, None, 1])
    z = j[..., 2] - np.asarray(center_z)[:, None]
    return np.stack([y, x, z], -1).astype(np.float32)


def itop_uncrop_keypoints(pred_yxz: np.ndarray, boxes: np.ndarray,
                          center_z: np.ndarray, out_size: int = CROP):
    """Crop-space (y, x, z-rel) -> image-space (x, y, z) (itop_test.py)."""
    p = np.asarray(pred_yxz, dtype=np.float64)
    b = np.floor(np.asarray(boxes, dtype=np.float64))
    x = p[..., 1] * (b[:, None, 2] - b[:, None, 0]) / out_size + b[:, None, 0]
    y = p[..., 0] * (b[:, None, 3] - b[:, None, 1]) / out_size + b[:, None, 1]
    z = p[..., 2] + np.asarray(center_z)[:, None]
    return np.stack([x, y, z], -1)
