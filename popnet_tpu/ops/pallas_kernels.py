"""Pallas TPU kernels for decode-path hot ops.

peak_mask_pallas: fused cross-footprint local-max test + threshold over a
(B, H, W, C) heatmap stack — the first stage of peak NMS
(reference semantics: lib/utils/paf_to_pose.py:33-46 find_peaks). The whole
(H, W) plane of a (batch, channel) slice lives in VMEM; the 4 shifted
comparisons and the threshold fuse into one VPU pass, avoiding the 5
intermediate HBM round-trips of the unfused lowering.

Falls back to the jnp implementation on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _peak_mask_kernel(h_ref, out_ref):
    h = h_ref[0]  # (H, W)
    neg = jnp.float32(-jnp.inf)
    up = jnp.concatenate([jnp.full((1, h.shape[1]), neg, h.dtype), h[:-1]], axis=0)
    down = jnp.concatenate([h[1:], jnp.full((1, h.shape[1]), neg, h.dtype)], axis=0)
    left = jnp.concatenate([jnp.full((h.shape[0], 1), neg, h.dtype), h[:, :-1]], axis=1)
    right = jnp.concatenate([h[:, 1:], jnp.full((h.shape[0], 1), neg, h.dtype)], axis=1)
    mx = jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right))
    out_ref[0] = (h >= mx).astype(h.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def peak_local_max_pallas(heat_bchw: jnp.ndarray, interpret: bool = False):
    """(N, H, W) float32 -> (N, H, W) {0,1} cross-footprint local-max mask."""
    n, H, W = heat_bchw.shape
    return pl.pallas_call(
        _peak_mask_kernel,
        out_shape=jax.ShapeDtypeStruct((n, H, W), heat_bchw.dtype),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(heat_bchw)


def peak_mask(heat: jnp.ndarray, thresh: float, use_pallas: bool | None = None):
    """(B, H, W, C) -> bool peak mask. Uses the Pallas kernel on TPU."""
    B, H, W, C = heat.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        flat = heat.transpose(0, 3, 1, 2).reshape(B * C, H, W).astype(jnp.float32)
        is_max = peak_local_max_pallas(flat).reshape(B, C, H, W).transpose(0, 2, 3, 1)
        return (is_max > 0) & (heat > thresh)
    pad = jnp.pad(heat, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    mx = jnp.maximum(
        jnp.maximum(pad[:, 1:-1, 1:-1], pad[:, :-2, 1:-1]),
        jnp.maximum(jnp.maximum(pad[:, 2:, 1:-1], pad[:, 1:-1, :-2]), pad[:, 1:-1, 2:]),
    )
    return (heat == mx) & (heat > thresh)
