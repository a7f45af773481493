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
        # cv2 INTER_NEAREST source index: floor(dst * scale). One documented
        # divergence: when dst*bw/out is an EXACT integer k, cv2's double
        # dst*(bw/out) lands at k*(1 - 2^-53) and floors to k-1, while this
        # f32 product is exact (dst*bw < 2^24) and floors to k — the
        # mathematically exact tap. Affects only extents sharing a factor
        # with out_size (tests/test_full_system_oracle.py pins the rest).
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


@functools.partial(jax.jit, static_argnames=("out_size", "dtype"))
def crop_resize_grouped(
    images: jnp.ndarray,   # (B, H, W) raw depth
    boxes: jnp.ndarray,    # (B, C, 4) [xmin, ymin, xmax, ymax] per image
    mean: float = 3.0,
    std: float = 2.0,
    out_size: int = CROP,
    dtype=jnp.bfloat16,
):
    """(B*C, out, out, 1) crops via separable one-hot matmuls — the TPU
    serving twin of crop_resize_batch.

    The per-crop 2D point gather serializes on TPU (measured 3.9 s for
    2560 crops vs 0.63 s for the entire A2J CNN — the same lesson as the
    PAF-scoring rewrite, NOTES.md §21): instead each crop row/column
    selection becomes a one-hot selector and the crop is
    rowsel @ image @ colsel^T on the MXU. Same nearest-neighbor taps and
    zero OOB padding as the gather path; values ride in `dtype` (the
    serving consumer casts crops to bf16 for the CNN anyway — use the
    exact gather path where f32 crop values matter)."""
    B, H, W = images.shape
    C, S = boxes.shape[1], out_size
    u = jnp.arange(S, dtype=jnp.float32)
    x0, y0 = boxes[..., 0], boxes[..., 1]                      # (B, C)
    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]
    # cv2 INTER_NEAREST source index: floor(dst * scale) (crop_resize_batch)
    sx = jnp.floor(u[None, None, :] * bw[..., None] / S) + x0[..., None]
    sy = jnp.floor(u[None, None, :] * bh[..., None] / S) + y0[..., None]
    inx = (sx >= 0) & (sx < W)
    iny = (sy >= 0) & (sy < H)
    xi = jnp.clip(sx, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(sy, 0, H - 1).astype(jnp.int32)
    rowsel = ((yi[..., None] == jnp.arange(H)[None, None, None, :])
              & iny[..., None]).astype(dtype)                  # (B, C, S, H)
    colsel = ((xi[..., None] == jnp.arange(W)[None, None, None, :])
              & inx[..., None]).astype(dtype)                  # (B, C, S, W)
    img = images.astype(dtype)
    rows = jnp.einsum("bcsh,bhw->bcsw", rowsel, img)           # (B, C, S, W)
    crops = jnp.einsum("bcsw,bctw->bcst", rows, colsel)        # (B, C, S, S)
    crops = (crops - jnp.asarray(mean, dtype)) / jnp.asarray(std, dtype)
    return crops.reshape(B * C, S, S, 1)


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
    A2J_experiments/random_erasing.py:30-55): with probability p, ADD unit
    Gaussian noise over a random-area, random-aspect rectangle. The
    reference's `img[...] += rand_patch` is additive — it perturbs the
    patch around the data, it does not replace it. Replacing was a round-4
    divergence that broke ITOP training: torso-relative crops concentrate
    in a narrow band, and replacement N(0,1) patches dominated the
    BatchNorm batch statistics, so the running averages tracked an
    erasing-skewed distribution and eval-mode accuracy collapsed while
    batch-stats-mode accuracy kept improving (diagnosed r5; the fix
    restores the reference's additive semantics)."""
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
    return crops + jnp.where(inpatch[..., None], noise, 0.0)


class A2JCropDataset:
    """Person-crop training set for A2J over any composited depth dataset.

    Reference recipe (train_a2j_mpaug_new.py:356-428 my_dataloader +
    dataPreprocess): compose the multi-person frame, run the shared 2D+3D
    augmentation (Rotate, RenderDepth max 1.7, Resize back to full res),
    pick ONE random person, crop its GT box to 288^2 with zero OOB padding,
    labels (y, x, z_world) in crop space, optional random noise-patch
    erasing. Wraps any dataset exposing load_composited(i) -> (depth, anns).
    """

    def __init__(self, inner, augment: bool = True, erase: bool = True,
                 out_size: int = CROP, seed: int = 0):
        from popnet_tpu.data import augment_host as ah

        self.inner = inner
        self.is_train = inner.is_train
        self.augment = augment and inner.is_train
        self.erase = erase
        self.out_size = out_size
        self.rng = np.random.default_rng(seed)
        self._erase_key = jax.random.PRNGKey(seed + 1)
        self.depth = inner.dcfg.depth
        cam = inner.dcfg.intrinsics
        w, h = inner.dcfg.width, inner.dcfg.height
        cvt = ah.Cvt2ndarray(num_joints=inner.ecfg.num_joints)
        self._pipeline = ah.Compose([
            cvt,
            ah.Rotate(cx=cam.cx, cy=cam.cy, rng=self.rng),
            ah.RenderDepth(cx=cam.cx, cy=cam.cy, max_ratio=1.7, rng=self.rng),
            ah.Resize(w, h),
        ])
        self._ident = ah.Compose([cvt, ah.Resize(w, h)])

    def __len__(self):
        return len(self.inner)

    def get_batch(self, indices):
        imgs, boxes, j2s, zs = [], [], [], []
        for idx in indices:
            depth, anns = self.inner.load_composited(int(idx))
            depth, anns = (self._pipeline if self.augment else self._ident)(
                (depth, anns)
            )
            i = int(self.rng.integers(0, len(anns))) if self.augment else 0
            ann = anns[i]
            imgs.append(depth.astype(np.float32))
            boxes.append(np.asarray(ann["bbox"][:4], np.float64))
            j2s.append(np.asarray(ann["2d_joints"], np.float64))
            zs.append(np.asarray(ann["3d_joints"], np.float64)[:, 2])

        images = jnp.asarray(np.stack(imgs))
        boxes = np.stack(boxes)
        crops = crop_resize_batch(
            images, jnp.arange(len(imgs)), jnp.asarray(boxes, jnp.float32),
            mean=self.depth.mean, std=self.depth.std, out_size=self.out_size,
        )
        if self.augment and self.erase:
            self._erase_key, sub = jax.random.split(self._erase_key)
            crops = random_erasing(crops, sub)
        labels = crop_labels(np.stack(j2s), np.stack(zs), boxes, self.out_size)
        return {"crops": crops, "labels": jnp.asarray(labels)}

    # same background-prefetch iterator as the dense datasets
    from popnet_tpu.data.datasets import _BaseDataset as _B
    iter_batches = _B.iter_batches
    del _B


class ITOPA2JCropDataset:
    """ITOP A2J recipe: torso-centered world-extent crops, torso-relative
    depth (reference: itop_train_64.py:44-52, 215-290 — xy_thres=120,
    depth_thres=0.4, RandCropShift=5, random erasing p=0.5 at :313).

    `inner` must expose images + single-person joints_uvd per index
    (the ITOP h5-derived layout of data/construction.py); `center_joint`
    defaults to the torso (GT stand-in for the reference's refined centers).
    """

    def __init__(self, inner, xy_thres: float = 120.0, depth_thres: float = 0.4,
                 rand_shift: int = 5, center_joint: int = 8,
                 augment: bool = True, erase: bool = True,
                 out_size: int = CROP, seed: int = 0,
                 mean: float | None = None, std: float | None = None):
        from popnet_tpu.core.camera import ITOP_INTRINSICS
        from popnet_tpu.data.itop_a2j import (
            boxes_from_centers, itop_crop_batch, itop_crop_labels,
        )

        self.inner = inner
        self.is_train = inner.is_train
        self.augment = augment and inner.is_train
        self.erase = erase
        self.out_size = out_size
        self.rng = np.random.default_rng(seed)
        self._erase_key = jax.random.PRNGKey(seed + 1)
        self.xy_thres = xy_thres
        self.depth_thres = depth_thres
        self.rand_shift = rand_shift
        self.center_joint = center_joint
        self.cam = inner.intrinsics or ITOP_INTRINSICS
        # the crop values are torso-RELATIVE depth; normalize them with the
        # measured relative stats (itop_a2j.itop_relative_stats — the
        # reference's itop_side_mean/std.npy, itop_train_64.py:85-86, :260),
        # not the dataset's absolute stats
        self.mean = inner.dcfg.depth.mean if mean is None else float(mean)
        self.std = inner.dcfg.depth.std if std is None else float(std)
        self._boxes_from_centers = boxes_from_centers
        self._crop = itop_crop_batch
        self._labels = itop_crop_labels

    def __len__(self):
        return len(self.inner)

    def get_batch(self, indices):
        imgs, uvds = [], []
        for idx in indices:
            depth, anns = self.inner.load_composited(int(idx))
            ann = anns[0]
            j2 = np.asarray(ann["2d_joints"], np.float64)
            j3 = np.asarray(ann["3d_joints"], np.float64)
            imgs.append(depth.astype(np.float32))
            uvds.append(np.concatenate([j2, j3[:, 2:3]], axis=1))  # (K, 3)
        uvd = np.stack(uvds)
        centers = uvd[:, self.center_joint]  # (B, 3)
        h, w = imgs[0].shape
        boxes = self._boxes_from_centers(
            centers, self.cam, xy_thres=self.xy_thres, img_h=h, img_w=w,
            rand_shift=self.rand_shift if self.augment else 0, rng=self.rng,
        )
        cz = centers[:, 2].astype(np.float32)
        crops = self._crop(
            jnp.asarray(np.stack(imgs)), jnp.arange(len(imgs)),
            jnp.asarray(boxes), jnp.asarray(cz),
            mean=self.mean, std=self.std,
            depth_thres=self.depth_thres, out_size=self.out_size,
        )
        if self.augment and self.erase:
            self._erase_key, sub = jax.random.split(self._erase_key)
            crops = random_erasing(crops, sub)
        labels = self._labels(uvd, boxes, cz, self.out_size)
        return {"crops": crops, "labels": jnp.asarray(labels)}

    from popnet_tpu.data.datasets import _BaseDataset as _B
    iter_batches = _B.iter_batches
    del _B
