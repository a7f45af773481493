"""A2J crop pipeline: person boxes -> fixed 288x288 normalized depth crops.

Reference semantics (A2J_experiments/a2j_test_pred_box.py:466-518
dataPreprocess): clamp the box to the image, zero-pad out-of-bounds regions,
resize with nearest-neighbor to 288x288, normalize (d - 3) / 2. Train-time
augmentation adds a random box shift, in-plane rotation, and random noise
patches (random_erasing.py:11-55).

TPU-first: the dynamic-size crop+resize collapses to one nearest-neighbor
gather with static output shape, vmapped over a flat (image_idx, box) list,
so a whole detection batch crops in one fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CROP = 288


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_resize_batch(
    images: jnp.ndarray,   # (B, H, W) raw depth
    image_idx: jnp.ndarray,  # (N,) int — which image each box belongs to
    boxes: jnp.ndarray,    # (N, 4) [xmin, ymin, xmax, ymax], may exceed image
    mean: float = 3.0,
    std: float = 2.0,
    out_size: int = CROP,
):
    """(N, out, out, 1) normalized crops with zero OOB padding."""
    B, H, W = images.shape

    def one(bidx, box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        bw = x1 - x0
        bh = y1 - y0
        u = jnp.arange(out_size, dtype=jnp.float32)
        # cv2 INTER_NEAREST source index: floor(dst * scale)
        sx = jnp.floor(u * bw / out_size) + x0
        sy = jnp.floor(u * bh / out_size) + y0
        gx = sx[None, :]
        gy = sy[:, None]
        inside = (gx >= 0) & (gx < W) & (gy >= 0) & (gy < H)
        xi = jnp.clip(gx, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(gy, 0, H - 1).astype(jnp.int32)
        img = images[bidx]
        crop = jnp.where(inside, img[yi + jnp.zeros_like(xi), xi + jnp.zeros_like(yi)], 0.0)
        return (crop - mean) / std

    crops = jax.vmap(one)(image_idx, boxes)
    return crops[..., None]


def crop_labels(joints2d, joints_z, boxes, out_size: int = CROP):
    """Map image-space joints into crop space as (N, K, 3) (y, x, z) —
    the A2J annotation convention (anchor coords are (h, w))."""
    j = np.asarray(joints2d, dtype=np.float64)
    b = np.asarray(boxes, dtype=np.float64)
    x = (j[..., 0] - b[:, None, 0]) / (b[:, None, 2] - b[:, None, 0]) * out_size
    y = (j[..., 1] - b[:, None, 1]) / (b[:, None, 3] - b[:, None, 1]) * out_size
    return np.stack([y, x, np.asarray(joints_z)], axis=-1).astype(np.float32)


def uncrop_keypoints(pred_yxz, boxes, out_size: int = CROP):
    """Crop-space (N, K, 3) (y, x, z) -> image-space (N, K, 3) (x, y, z)
    (reference: a2j_test_pred_box.py:575-584)."""
    p = np.asarray(pred_yxz, dtype=np.float64)
    b = np.asarray(boxes, dtype=np.float64)
    x = p[..., 1] * (b[:, None, 2] - b[:, None, 0]) / out_size + b[:, None, 0]
    y = p[..., 0] * (b[:, None, 3] - b[:, None, 1]) / out_size + b[:, None, 1]
    return np.stack([x, y, p[..., 2]], axis=-1)


@functools.partial(jax.jit, static_argnames=("max_patches",))
def random_erasing(
    crops: jnp.ndarray,  # (N, S, S, 1) normalized
    rng_key,
    probability: float = 0.5,
    sl: float = 0.02,
    sh: float = 0.4,
    r1: float = 0.3,
    max_patches: int = 1,
):
    """Noise-patch erasing on depth crops (reference:
    A2J_experiments/random_erasing.py:11-55): with probability p, replace a
    random-area, random-aspect rectangle with Gaussian noise."""
    N, S = crops.shape[0], crops.shape[1]
    keys = jax.random.split(rng_key, 6)
    do = jax.random.uniform(keys[0], (N,)) < probability
    area = jax.random.uniform(keys[1], (N,), minval=sl, maxval=sh) * S * S
    aspect = jax.random.uniform(keys[2], (N,), minval=r1, maxval=1.0 / r1)
    ph = jnp.clip(jnp.sqrt(area * aspect), 1, S - 1).astype(jnp.int32)
    pw = jnp.clip(jnp.sqrt(area / aspect), 1, S - 1).astype(jnp.int32)
    y0 = (jax.random.uniform(keys[3], (N,)) * (S - ph)).astype(jnp.int32)
    x0 = (jax.random.uniform(keys[4], (N,)) * (S - pw)).astype(jnp.int32)
    noise = jax.random.normal(keys[5], crops.shape)

    ys = jnp.arange(S)[None, :, None]
    xs = jnp.arange(S)[None, None, :]
    inpatch = (
        (ys >= y0[:, None, None]) & (ys < (y0 + ph)[:, None, None])
        & (xs >= x0[:, None, None]) & (xs < (x0 + pw)[:, None, None])
        & do[:, None, None]
    )
    return jnp.where(inpatch[..., None], noise, crops)
