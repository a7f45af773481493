"""Flip-averaged inference for heatmaps and PAFs (COCO eval trick).

Generic, skeleton-table-driven equivalent of the reference's hard-coded
COCO-18 handler (reference: evaluate/coco_eval.py:158-204
handle_paf_and_heat): average the normal outputs with the outputs of the
horizontally mirrored image, un-mirroring by flipping the width axis,
swapping left/right channels, and negating the PAF x-components.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def paf_swap_table(limbs, swap_indices) -> np.ndarray:
    """Channel permutation for a flipped PAF stack: limb (a, b) maps to the
    limb connecting (swap[a], swap[b]); channels are (x, y) interleaved."""
    limbs = [tuple(l) for l in limbs]
    swap = list(swap_indices)
    table = np.zeros(2 * len(limbs), dtype=np.int64)
    for l, (a, b) in enumerate(limbs):
        target = (swap[a], swap[b])
        m = limbs.index(target) if target in limbs else l
        table[2 * l] = 2 * m
        table[2 * l + 1] = 2 * m + 1
    return table


def unflip_maps(heat_f, paf_f, limbs, swap_indices):
    """Convert outputs computed on a mirrored image back to the original
    frame: width-flip, channel swaps, PAF-x negation."""
    K = len(swap_indices)
    heat_perm = list(swap_indices) + list(range(K, heat_f.shape[-1]))
    heat = heat_f[:, :, ::-1, :][..., np.asarray(heat_perm)]
    pswap = paf_swap_table(limbs, swap_indices)
    paf = paf_f[:, :, ::-1, :][..., pswap]
    L = len(limbs)
    sign = np.ones(2 * L, dtype=np.float32)
    sign[0::2] = -1.0  # x components change direction under mirroring
    paf = paf * jnp.asarray(sign)
    return heat, paf


def flip_average_infer(infer, images, limbs, swap_indices):
    """Run `infer(images) -> (paf, heat, ...)` on the image and its mirror,
    returning flip-averaged (heat, paf) (reference: coco_eval.py:158-204).

    `images` is NHWC; extra outputs of infer beyond (paf, heat) are returned
    from the normal pass unchanged."""
    out_n = infer(images)
    out_f = infer(images[:, :, ::-1, :])
    paf_n, heat_n = out_n[0], out_n[1]
    heat_u, paf_u = unflip_maps(out_f[1], out_f[0], limbs, swap_indices)
    heat = (heat_n + heat_u) / 2.0
    paf = (paf_n + paf_u) / 2.0
    return (paf, heat) + tuple(out_n[2:])
