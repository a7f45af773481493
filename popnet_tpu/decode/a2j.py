"""A2J anchor-vote decoding: softmax-weighted anchor aggregation.

Reference: A2J_experiments/anchor.py:44-82 post_process. Fully batched —
one einsum per head instead of the reference's per-image loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("is_3d",))
def a2j_post_process(heads, all_anchors: jnp.ndarray, is_3d: bool = True):
    """(cls (B,N,K), reg (B,N,K,2)[, depth (B,N,K)]) -> keypoints
    (B, K, 3) in (y, x, z) or (B, K, 2); anchors (N, 2) in (h, w) order."""
    if is_3d:
        cls, reg, dep = heads
    else:
        cls, reg = heads
        dep = None
    w = jax.nn.softmax(cls, axis=1)  # over anchors
    pos = all_anchors[None, :, None, :] + reg  # (B, N, K, 2)
    xy = jnp.sum(w[..., None] * pos, axis=1)  # (B, K, 2)
    if not is_3d:
        return xy
    z = jnp.sum(w * dep, axis=1)  # (B, K)
    return jnp.concatenate([xy, z[..., None]], axis=-1)
