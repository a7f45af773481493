"""Pallas TPU kernels for decode-path hot ops.

peak_mask_pallas: fused cross-footprint local-max test + threshold over a
(B, H, W, C) heatmap stack — the first stage of peak NMS
(reference semantics: lib/utils/paf_to_pose.py:33-46 find_peaks). The whole
(H, W) plane of a (batch, channel) slice lives in VMEM; the 4 shifted
comparisons and the threshold fuse into one VPU pass, avoiding the 5
intermediate HBM round-trips of the unfused lowering.

paf_sample_pallas: the PAF line-integral sampler (reference semantics:
lib/utils/paf_to_pose.py:156-264 find_connected_joints — bicubic samples at
num_intermed_pts rounded points between every src/dst peak pair). The XLA
one-hot-matmul formulation (decode/device.py method="onehot") is exact and
gather-free but must materialize its (B, L, N, Wp) selector / (B, L, C, Hp,
N) product operands in HBM — ~3.5 GB of intermediate traffic per batch-256,
which is the entire cost of the stage (the useful tap math is ~0.3 GFLOP).
This kernel keeps every per-(batch, limb) selector in VMEM: per point-batch
it builds 4-tap cubic row/column selectors with iota compares (VPU), feeds
one (Wp, Hp) x (Hp, P) matmul per channel to the MXU, and reduces the
projected samples in registers. Only the (B, L, M, M) sums/counts ever
touch HBM.

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


def _cubic_tap_weight(t_frac, j, a=-0.75):
    """Catmull-Rom-style cubic weight of tap j (offset j-1 from floor) —
    the same piecewise polynomial as decode/device.py cubic_w."""
    tt = jnp.abs(t_frac - (j - 1.0))
    near = (a + 2) * tt**3 - (a + 3) * tt**2 + 1
    far = a * tt**3 - 5 * a * tt**2 + 8 * a * tt - 4 * a
    return jnp.where(tt <= 1, near, jnp.where(tt < 2, far, 0.0))


def _paf_sample_kernel(pafT_ref, sx_ref, sy_ref, dx_ref, dy_ref,
                       ux_ref, uy_ref, sum_ref, cnt_ref,
                       *, num_limbs, num_pts, factor, thresh, wp, hp):
    PT = pafT_ref[0]          # (L, 2, Wp, Hp): PT[l, c, x, y], edge-padded
    SX, SY = sx_ref[0], sy_ref[0]   # (L, P) pair-flattened src coords
    DX, DY = dx_ref[0], dy_ref[0]   # (L, P) dst - src
    UX, UY = ux_ref[0], uy_ref[0]   # (L, P) unit direction
    P = SX.shape[-1]

    # Mosaic requires integer iota; compare against int32 tap columns.
    row_x = jax.lax.broadcasted_iota(jnp.int32, (wp, P), 0)
    row_y = jax.lax.broadcasted_iota(jnp.int32, (hp, P), 0)

    sums, cnts = [], []
    for l in range(num_limbs):
        sx, sy = SX[l:l + 1], SY[l:l + 1]          # (1, P)
        dx, dy = DX[l:l + 1], DY[l:l + 1]
        ux, uy = UX[l:l + 1], UY[l:l + 1]
        acc = jnp.zeros((1, P), jnp.float32)
        cnt = jnp.zeros((1, P), jnp.float32)
        for t in range(num_pts):
            ts = t / (num_pts - 1.0)
            pxi = jnp.round(sx + dx * ts)
            pyi = jnp.round(sy + dy * ts)
            lx = (pxi + 0.5) / factor - 0.5
            ly = (pyi + 0.5) / factor - 0.5
            x0 = jnp.floor(lx)
            y0 = jnp.floor(ly)
            fx = lx - x0
            fy = ly - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            # 4-tap cubic selectors, built with iota compares (no one-hot
            # matmul): padded column of tap j is x0 - 1 + j + 2
            xsel = jnp.zeros((wp, P), jnp.float32)
            ysel = jnp.zeros((hp, P), jnp.float32)
            for j in range(4):
                xsel = xsel + jnp.where(
                    row_x == x0i + (1 + j), _cubic_tap_weight(fx, j), 0.0
                )
                ysel = ysel + jnp.where(
                    row_y == y0i + (1 + j), _cubic_tap_weight(fy, j), 0.0
                )
            # vals_c[p] = sum_xy pafp[c, y, x] xsel[x, p] ysel[y, p]
            gx = jnp.dot(PT[l, 0], ysel, preferred_element_type=jnp.float32)
            vx = jnp.sum(xsel * gx, axis=0, keepdims=True)      # (1, P)
            gy = jnp.dot(PT[l, 1], ysel, preferred_element_type=jnp.float32)
            vy = jnp.sum(xsel * gy, axis=0, keepdims=True)
            proj = vx * ux + vy * uy
            acc = acc + proj
            cnt = cnt + (proj > thresh).astype(jnp.float32)
        sums.append(acc)
        cnts.append(cnt)
    sum_ref[0] = jnp.concatenate(sums, axis=0)     # (L, P)
    cnt_ref[0] = jnp.concatenate(cnts, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("num_pts", "factor", "thresh", "interpret"),
)
def paf_sample_pallas(pafT, srcx, srcy, dx, dy, ux, uy,
                      num_pts: int = 10, factor: int = 8,
                      thresh: float = 0.05, interpret: bool = False):
    """Batched PAF line-integral sums/counts.

    pafT: (B, L, 2, Wp, Hp) edge-padded transposed PAF planes.
    srcx..uy: (B, L, P) pair-flattened (P = M*M, src-major) geometry.
    Returns (proj_sum, count_above_thresh), each (B, L, P) f32.
    """
    B, L, _, wp, hp = pafT.shape
    P = srcx.shape[-1]
    kernel = functools.partial(
        _paf_sample_kernel, num_limbs=L, num_pts=num_pts,
        factor=float(factor), thresh=thresh, wp=wp, hp=hp,
    )
    flat = pl.BlockSpec((1, L, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, L, P), jnp.float32),
            jax.ShapeDtypeStruct((B, L, P), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, 2, wp, hp), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            flat, flat, flat, flat, flat, flat,
        ],
        out_specs=(flat, flat),
        interpret=interpret,
    )(pafT, srcx, srcy, dx, dy, ux, uy)


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
