"""Depth-map compositing for background / multi-person augmentation.

The MP-3DHP benchmark's core augmentations, as fused jittable ops:

- bg_composite: paste a person foreground over a background depth map using
  the segmentation mask (reference: lib/datasets/datasets_kdh3d.py:256-263).
- mp_composite: z-buffer-merge several single-person recordings into one
  synthetic multi-person frame, then paste over a background (reference:
  lib/datasets/datasets_kdh3d_mpaug.py:259-296).

Both are elementwise min/where programs: one fused XLA kernel per batch,
instead of the reference's per-sample NumPy fancy-indexing in DataLoader
workers. vmap over a leading batch axis for batched compositing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def bg_composite(depth: jnp.ndarray, fg_mask: jnp.ndarray, bg: jnp.ndarray) -> jnp.ndarray:
    """fg depth where masked, background elsewhere: img*fg + bg*(1-fg)."""
    return depth * fg_mask + bg * (1.0 - fg_mask)


@jax.jit
def mp_composite(
    person_depths: jnp.ndarray,  # (P, H, W) single-person depth maps
    person_masks: jnp.ndarray,   # (P, H, W) segmentation masks in {0, 1}
    person_keep: jnp.ndarray,    # (P,) bool — person selected this sample
    bg: jnp.ndarray,             # (H, W) background depth
    far: float = 12.0,           # 2 * depth_max init (reference :259)
):
    """Z-buffer composite of selected person layers over a background.

    Returns (image (H, W), fg_union (H, W)). Matches the reference's
    sequential `image[fg>0] = min(img*fg, image)` accumulation: the min over
    selected masked layers, background pasted where no person covers.
    """
    keep = person_keep[:, None, None]
    masked = person_masks > 0
    cand = jnp.where(keep & masked, person_depths * person_masks, far)
    zmin = jnp.min(cand, axis=0)
    fg_union = jnp.max(
        jnp.where(keep, person_masks, 0.0), axis=0
    )
    image = zmin * fg_union + bg * (1.0 - fg_union)
    return image, fg_union
