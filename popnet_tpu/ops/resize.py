"""cv2-compatible bilinear resize as a JAX gather program.

The reference resizes depth maps with cv2.resize INTER_LINEAR (half-pixel
source mapping, edge clamping, no antialiasing), e.g. the z-map background
init (reference: lib/datasets/datasets_kdh3d.py:273-275) and the 224->output
rescale in eval scripts. jax.image.resize antialiases on downsampling, so a
direct sampling implementation is needed for bit-parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int):
    """cv2 INTER_LINEAR source coords: (o + 0.5) * in/out - 0.5, clamped."""
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    i0 = jnp.floor(src)
    frac = src - i0
    i0c = jnp.clip(i0.astype(jnp.int32), 0, in_size - 1)
    i1c = jnp.clip(i0.astype(jnp.int32) + 1, 0, in_size - 1)
    return i0c, i1c, frac


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_cv2(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize (H, W) or (H, W, C) with cv2.INTER_LINEAR semantics."""
    in_h, in_w = img.shape[0], img.shape[1]
    y0, y1, fy = _axis_weights(in_h, out_h)
    x0, x1, fx = _axis_weights(in_w, out_w)

    rows0 = jnp.take(img, y0, axis=0)
    rows1 = jnp.take(img, y1, axis=0)
    fy_b = fy.reshape((-1,) + (1,) * (img.ndim - 1))
    rows = rows0 * (1.0 - fy_b) + rows1 * fy_b

    cols0 = jnp.take(rows, x0, axis=1)
    cols1 = jnp.take(rows, x1, axis=1)
    fx_b = fx.reshape((1, -1) + (1,) * (img.ndim - 2))
    return cols0 * (1.0 - fx_b) + cols1 * fx_b


def downsample_bilinear_cv2(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Downsample by an integer factor with cv2.INTER_LINEAR semantics
    (used to init the z-map background from the input depth)."""
    return resize_bilinear_cv2(img, img.shape[0] // factor, img.shape[1] // factor)
