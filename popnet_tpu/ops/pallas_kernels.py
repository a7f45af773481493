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
import numpy as np
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


def _refine_joint(plane, px, py, Q, *, m, size, win_size, h, w,
                  clamp_targets):
    """Windowed bicubic refine of one joint's M peaks against its (hp, wp)
    plane. px/py are (M, 1) int32 integer peak coords in UNPADDED grid
    coords; with clamp_targets the plane is unpadded and tap rows/cols are
    edge-clamped (identical values to reading an edge-padded plane).
    Returns (loc (M,) argmax in the S*S window, score (M,))."""
    S2 = Q.shape[1]
    hp, wp = plane.shape
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (m, hp), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (m, wp), 1)
    lane25 = jax.lax.broadcasted_iota(jnp.int32, (m, size * size), 1)
    patch = jnp.zeros((m, size * size), jnp.float32)
    for i in range(size):
        tgt = py + (i - win_size) if clamp_targets else py + i
        if clamp_targets:
            tgt = jnp.clip(tgt, 0, h - 1)
        rmask = (iota_h == tgt).astype(jnp.float32)           # (M, Hp)
        ti = jnp.dot(rmask, plane, preferred_element_type=jnp.float32)
        for j in range(size):
            tgtx = px + (j - win_size) if clamp_targets else px + j
            if clamp_targets:
                tgtx = jnp.clip(tgtx, 0, w - 1)
            val = jnp.sum(
                jnp.where(iota_w == tgtx, ti, 0.0), axis=1, keepdims=True
            )
            patch = patch + jnp.where(lane25 == i * size + j, val, 0.0)
    up = jnp.dot(patch, Q, preferred_element_type=jnp.float32)  # (M, S2)
    Sdim = int(round(S2 ** 0.5))
    fac = Sdim // size
    qpos = jax.lax.broadcasted_iota(jnp.int32, (m, S2), 1)
    swin = (qpos // Sdim) // fac
    twin = (qpos % Sdim) // fac
    kx0 = jnp.maximum(0, win_size - px)
    kx1 = win_size + jnp.minimum(w - 1 - px, win_size)
    ky0 = jnp.maximum(0, win_size - py)
    ky1 = win_size + jnp.minimum(h - 1 - py, win_size)
    ok = (swin >= ky0) & (swin <= ky1) & (twin >= kx0) & (twin <= kx1)
    upm = jnp.where(ok, up, jnp.float32(-jnp.inf))
    return jnp.argmax(upm, axis=1).astype(jnp.int32), jnp.max(upm, axis=1)


_SENT = -1e30  # finite sentinel: 0 * -inf would NaN in additive masks


def _find_peaks_kernel(h_ref, q_ref, px_ref, py_ref, loc_ref, score_ref,
                       valid_ref, *, num_joints, m, size, win_size, thresh,
                       h, w):
    H = h_ref[0]              # (K, H, W) f32 heat planes
    Q = q_ref[:, :]
    K = num_joints

    # ---- cross-footprint local-max mask + threshold, per joint ------------
    planes = []
    for k in range(K):
        hk = H[k]
        neg = jnp.full((1, w), _SENT, jnp.float32)
        negc = jnp.full((h, 1), _SENT, jnp.float32)
        up = jnp.concatenate([neg, hk[:-1]], axis=0)
        down = jnp.concatenate([hk[1:], neg], axis=0)
        left = jnp.concatenate([negc, hk[:, :-1]], axis=1)
        right = jnp.concatenate([hk[:, 1:], negc], axis=1)
        mx = jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right))
        planes.append(jnp.where((hk >= mx) & (hk > thresh), hk, _SENT)[None])
    score = jnp.concatenate(planes, axis=0)                 # (K, H, W)

    # ---- top-M per joint: M iterations of two-level argmax ----------------
    # (first row holding the global max, then first col == lax.top_k's
    # lowest-flat-index tie rule; see find_peaks_batched)
    iota_KH = jax.lax.broadcasted_iota(jnp.int32, (K, h), 1)
    iota_KW = jax.lax.broadcasted_iota(jnp.int32, (K, w), 1)
    iota_KM = jax.lax.broadcasted_iota(jnp.int32, (K, m), 1)
    PX = jnp.zeros((K, m), jnp.int32)
    PY = jnp.zeros((K, m), jnp.int32)
    PV = jnp.full((K, m), _SENT, jnp.float32)
    for pick in range(m):
        rowmax = jnp.max(score, axis=2)                     # (K, H)
        r = jnp.argmax(rowmax, axis=1)                      # (K,)
        keep_r = jnp.where(iota_KH == r[:, None], 0.0, _SENT)
        srow = jnp.max(score + keep_r[:, :, None], axis=1)  # (K, W)
        c = jnp.argmax(srow, axis=1)
        v = jnp.max(srow, axis=1)
        m1 = (iota_KH == r[:, None]).astype(jnp.float32)
        m2 = (iota_KW == c[:, None]).astype(jnp.float32)
        score = score - m1[:, :, None] * m2[:, None, :] * 1e30
        put = iota_KM == pick
        PX = jnp.where(put, c[:, None], PX)
        PY = jnp.where(put, r[:, None], PY)
        PV = jnp.where(put, v[:, None], PV)

    valid = PV > -1e29
    # invalid slots: the XLA path reads flat index 0 -> (0, 0)
    PX = jnp.where(valid, PX, 0)
    PY = jnp.where(valid, PY, 0)

    # ---- windowed bicubic subpixel refine, edge-clamped taps --------------
    for k in range(K):
        loc, sc = _refine_joint(
            H[k], PX[k][:, None], PY[k][:, None], Q,
            m=m, size=size, win_size=win_size, h=h, w=w,
            clamp_targets=True,
        )
        loc_ref[0, k] = loc
        score_ref[0, k] = sc
    px_ref[0] = PX
    py_ref[0] = PY
    valid_ref[0] = valid.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("max_peaks", "thresh", "factor", "win_size", "interpret"),
)
def find_peaks_pallas(heat_khw, max_peaks: int = 16, thresh: float = 0.1,
                      factor: int = 8, win_size: int = 2,
                      interpret: bool = False):
    """Fused peak front end: cross-footprint NMS + threshold + top-M
    selection + windowed bicubic subpixel refine, one kernel per batch row.

    Replaces three dispatches (peak-mask kernel -> lax.top_k -> refine
    kernel) and all their HBM intermediates (masked score planes, padded
    planes, index arrays): the (K, H, W) heat planes are read once and only
    (K, M) px/py/loc/score/valid leave. Tap reads are edge-CLAMPED instead
    of reading an edge-padded plane — identical values by construction.
    Tie semantics match lax.top_k (lowest flat index), pinned in
    tests/test_pallas_kernels.py.

    heat_khw: (B, K, H, W) f32. Returns (px, py, loc, score, valid), each
    (B, K, max_peaks); loc is the flat argmax in the S*S refine window.
    """
    from popnet_tpu.decode.device import _upsample_matrix

    B, K, H, W = heat_khw.shape
    size = 2 * win_size + 1
    S = size * factor
    U = _upsample_matrix(size, factor)
    Q = jnp.asarray(
        np.einsum("si,tj->ijst", U, U).reshape(size * size, S * S),
        jnp.float32,
    )
    kernel = functools.partial(
        _find_peaks_kernel, num_joints=K, m=max_peaks, size=size,
        win_size=win_size, thresh=float(thresh), h=H, w=W,
    )
    km = pl.BlockSpec((1, K, max_peaks), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    px, py, loc, score, valid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, K, max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((B, K, max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((B, K, max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((B, K, max_peaks), jnp.float32),
            jax.ShapeDtypeStruct((B, K, max_peaks), jnp.int32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((size * size, S * S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(km, km, km, km, km),
        interpret=interpret,
    )(heat_khw.astype(jnp.float32), Q)
    return px, py, loc, score, valid > 0


def _find_peaks_bt_kernel(h_ref, q_ref, px_ref, py_ref, loc_ref, score_ref,
                          valid_ref, *, bt, num_joints, m, size, win_size,
                          thresh, h, w):
    """Batch-tiled peak front end: BT batch rows per grid cell.

    The NMS mask and the top-M argmax loop vectorize over N = BT*K rows
    at once, and the bicubic refine feeds the MXU one (BT*M, 25) x
    (25, S^2) matmul per joint — BT x taller than the per-row kernel's
    (M, 25) — with the patch extraction done as batched one-hot row/col
    selects (tap semantics identical to _refine_joint, edge-CLAMPED
    targets, lowest-flat-index ties).

    Measured same-session at b256 (v5e): per-row 5.9 ms, bt8 6.1, bt16
    5.5-5.8 — i.e. batch-tiling is roughly NEUTRAL, refuting the
    grid-serialization hypothesis from the roofline table: the stage's
    cost is the unrolled one-hot tap-select VPU work (identical total in
    both layouts), not grid dispatch. bt16 is kept as the TPU default for
    its small consistent edge; the per-row kernel remains the parity
    reference (decode/device.py refine="pallas_row").
    """
    K = num_joints
    N = bt * K
    HB = h_ref[...]                      # (BT, K, H, W) f32
    HH = HB.reshape(N, h, w)
    Q = q_ref[:, :]                      # (25, S2)
    S2 = Q.shape[1]

    # ---- cross-footprint local-max mask + threshold, all rows at once ----
    neg_r = jnp.full((N, 1, w), _SENT, jnp.float32)
    neg_c = jnp.full((N, h, 1), _SENT, jnp.float32)
    up = jnp.concatenate([neg_r, HH[:, :-1]], axis=1)
    down = jnp.concatenate([HH[:, 1:], neg_r], axis=1)
    left = jnp.concatenate([neg_c, HH[:, :, :-1]], axis=2)
    right = jnp.concatenate([HH[:, :, 1:], neg_c], axis=2)
    mx = jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right))
    score = jnp.where((HH >= mx) & (HH > thresh), HH, _SENT)   # (N, H, W)

    # ---- top-M per row: M iterations of two-level argmax ------------------
    # (identical pick order to _find_peaks_kernel / lax.top_k tie rule)
    iota_NH = jax.lax.broadcasted_iota(jnp.int32, (N, h), 1)
    iota_NW = jax.lax.broadcasted_iota(jnp.int32, (N, w), 1)
    iota_NM = jax.lax.broadcasted_iota(jnp.int32, (N, m), 1)
    PX = jnp.zeros((N, m), jnp.int32)
    PY = jnp.zeros((N, m), jnp.int32)
    PV = jnp.full((N, m), _SENT, jnp.float32)
    for pick in range(m):
        rowmax = jnp.max(score, axis=2)                     # (N, H)
        r = jnp.argmax(rowmax, axis=1)                      # (N,)
        keep_r = jnp.where(iota_NH == r[:, None], 0.0, _SENT)
        srow = jnp.max(score + keep_r[:, :, None], axis=1)  # (N, W)
        c = jnp.argmax(srow, axis=1)
        v = jnp.max(srow, axis=1)
        m1 = (iota_NH == r[:, None]).astype(jnp.float32)
        m2 = (iota_NW == c[:, None]).astype(jnp.float32)
        score = score - m1[:, :, None] * m2[:, None, :] * 1e30
        put = iota_NM == pick
        PX = jnp.where(put, c[:, None], PX)
        PY = jnp.where(put, r[:, None], PY)
        PV = jnp.where(put, v[:, None], PV)
    valid = PV > -1e29
    PX = jnp.where(valid, PX, 0)
    PY = jnp.where(valid, PY, 0)

    # ---- windowed bicubic refine: one (BT*M, 25) x (25, S2) per joint -----
    PXk = PX.reshape(bt, K, m)
    PYk = PY.reshape(bt, K, m)
    iota_BMH = jax.lax.broadcasted_iota(jnp.int32, (bt, m, h), 2)
    iota_BMW = jax.lax.broadcasted_iota(jnp.int32, (bt, m, w), 2)
    lane25 = jax.lax.broadcasted_iota(jnp.int32, (bt, m, size * size), 2)
    Sdim = int(round(S2 ** 0.5))
    fac = Sdim // size
    # window-validity geometry kept in (BT, M, S2) space throughout:
    # Mosaic rejects minor-dim reshapes like (BT, M) -> (BT*M, 1)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (bt, m, S2), 2)
    swin = (qpos // Sdim) // fac
    twin = (qpos % Sdim) // fac
    for k in range(K):
        plane = HB[:, k]                                    # (BT, H, W)
        pxk = PXk[:, k]                                     # (BT, M)
        pyk = PYk[:, k]
        patch = jnp.zeros((bt, m, size * size), jnp.float32)
        for i in range(size):
            ty = jnp.clip(pyk + (i - win_size), 0, h - 1)   # (BT, M)
            rmask = (iota_BMH == ty[..., None]).astype(jnp.float32)
            # (BT, M, W): tap row i of every peak's window, all rows at
            # once — batched dot keeps the same reduction association as
            # the per-row kernel's jnp.dot(rmask, plane) (byte parity)
            ti = jax.lax.dot_general(
                rmask, plane,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for j in range(size):
                tx = jnp.clip(pxk + (j - win_size), 0, w - 1)
                val = jnp.sum(
                    jnp.where(iota_BMW == tx[..., None], ti, 0.0), axis=2
                )
                patch = patch + jnp.where(
                    lane25 == i * size + j, val[..., None], 0.0
                )
        upq = jnp.dot(patch.reshape(bt * m, size * size), Q,
                      preferred_element_type=jnp.float32)   # (BT*M, S2)
        up3 = upq.reshape(bt, m, S2)
        kx0 = jnp.maximum(0, win_size - pxk)                # (BT, M)
        kx1 = win_size + jnp.minimum(w - 1 - pxk, win_size)
        ky0 = jnp.maximum(0, win_size - pyk)
        ky1 = win_size + jnp.minimum(h - 1 - pyk, win_size)
        ok = (
            (swin >= ky0[..., None]) & (swin <= ky1[..., None])
            & (twin >= kx0[..., None]) & (twin <= kx1[..., None])
        )
        upm = jnp.where(ok, up3, jnp.float32(-jnp.inf))     # (BT, M, S2)
        loc_ref[:, k] = jnp.argmax(upm, axis=2).astype(jnp.int32)
        score_ref[:, k] = jnp.max(upm, axis=2)
    px_ref[...] = PX.reshape(bt, K, m)
    py_ref[...] = PY.reshape(bt, K, m)
    valid_ref[...] = valid.astype(jnp.int32).reshape(bt, K, m)


@functools.partial(
    jax.jit,
    static_argnames=("max_peaks", "thresh", "factor", "win_size", "bt",
                     "interpret"),
)
def find_peaks_pallas_bt(heat_khw, max_peaks: int = 16, thresh: float = 0.1,
                         factor: int = 8, win_size: int = 2, bt: int = 16,
                         interpret: bool = False):
    """Batch-tiled fused peak front end: same contract and exact same
    outputs as find_peaks_pallas, BT batch rows per grid cell instead of
    one (see _find_peaks_bt_kernel). B is zero-padded up to a multiple of
    BT (zero heat < thresh -> padded rows decode as no-peak) and sliced
    back."""
    from popnet_tpu.decode.device import _upsample_matrix

    B, K, H, W = heat_khw.shape
    bt = min(bt, B)
    pad = (-B) % bt
    hk = heat_khw.astype(jnp.float32)
    if pad:
        hk = jnp.pad(hk, ((0, pad), (0, 0), (0, 0), (0, 0)))
    Bp = B + pad
    size = 2 * win_size + 1
    S = size * factor
    U = _upsample_matrix(size, factor)
    Q = jnp.asarray(
        np.einsum("si,tj->ijst", U, U).reshape(size * size, S * S),
        jnp.float32,
    )
    kernel = functools.partial(
        _find_peaks_bt_kernel, bt=bt, num_joints=K, m=max_peaks, size=size,
        win_size=win_size, thresh=float(thresh), h=H, w=W,
    )
    km = pl.BlockSpec((bt, K, max_peaks), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    px, py, loc, score, valid = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Bp, K, max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((Bp, K, max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((Bp, K, max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((Bp, K, max_peaks), jnp.float32),
            jax.ShapeDtypeStruct((Bp, K, max_peaks), jnp.int32),
        ),
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, K, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((size * size, S * S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(km, km, km, km, km),
        interpret=interpret,
    )(hk, Q)
    if pad:
        px, py, loc, score, valid = (
            a[:B] for a in (px, py, loc, score, valid)
        )
    return px, py, loc, score, valid > 0


def _window_readout_kernel(zh_ref, hrelu_ref, z_ref, cx_ref, cy_ref, out_ref,
                           *, num_joints, p, radius, h, w):
    ZH = zh_ref[0]        # (K, H, W) z * relu(heat)
    HR = hrelu_ref[0]     # (K, H, W) relu(heat)
    Z = z_ref[0]          # (K, H, W) z
    CX = cx_ref[0]        # (K, P) int32 window centers, joint-major
    CY = cy_ref[0]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1)

    for k in range(num_joints):
        cx = CX[k][:, None]   # (P, 1)
        cy = CY[k][:, None]
        x0 = jnp.clip(cx - radius, 0, w - 1)
        x1 = jnp.clip(cx + radius, 0, w - 1)
        y0 = jnp.clip(cy - radius, 0, h - 1)
        y1 = jnp.clip(cy + radius, 0, h - 1)
        rm = ((iota_h >= y0) & (iota_h <= y1)).astype(jnp.float32)  # (P, H)
        cmask = (iota_w >= x0) & (iota_w <= x1)                     # (P, W)

        def wsum(plane):
            rows = jnp.dot(rm, plane, preferred_element_type=jnp.float32)
            return jnp.sum(jnp.where(cmask, rows, 0.0), axis=1, keepdims=True)

        s_zh = wsum(ZH[k])
        s_h = wsum(HR[k])
        s_z = wsum(Z[k])
        cnt = ((y1 - y0 + 1) * (x1 - x0 + 1)).astype(jnp.float32)
        out = (s_zh + 1e-9 * s_z) / (s_h + 1e-9 * cnt)
        out_ref[0, k] = out[:, 0]


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def window_readout_pallas(depthmaps, heatmaps, cx, cy,
                          radius: int = 1, interpret: bool = False):
    """Heat-weighted window readout (retrieve_depth_heat_weighted,
    reference: common.py:272-293), VMEM-resident.

    Same clipped-inclusive-window semantics as
    decode/openpose_infer.window_readout_heat_weighted: numerator
    sum z*(relu(h)+1e-9), denominator sum (relu(h)+1e-9) over the
    border-shrunken window. The XLA einsum path stages (B, P, K, S, H)
    one-hot selectors through HBM; here each batch row keeps its (K, H, W)
    planes in VMEM and emits only (B, P, K) readouts.

    depthmaps/heatmaps: (B, H, W, K); cx, cy: (B, P, K) int32 centers.
    Returns (B, P, K) f32.
    """
    B, H, W, K = depthmaps.shape
    P = cx.shape[1]
    z = depthmaps.transpose(0, 3, 1, 2).astype(jnp.float32)  # (B, K, H, W)
    hr = jnp.maximum(heatmaps, 0.0).transpose(0, 3, 1, 2).astype(jnp.float32)
    zh = z * hr
    cxk = cx.transpose(0, 2, 1).astype(jnp.int32)            # (B, K, P)
    cyk = cy.transpose(0, 2, 1).astype(jnp.int32)
    kernel = functools.partial(
        _window_readout_kernel, num_joints=K, p=P, radius=radius, h=H, w=W,
    )
    plane = pl.BlockSpec((1, K, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kp = pl.BlockSpec((1, K, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, P), jnp.float32),
        grid=(B,),
        in_specs=[plane, plane, plane, kp, kp],
        out_specs=kp,
        interpret=interpret,
    )(zh, hr, z, cxk, cyk)
    return out.transpose(0, 2, 1)                            # (B, P, K)


def _point_readout_kernel(img_ref, cx_ref, cy_ref, out_ref, *, p, h, w):
    img = img_ref[0]      # (H, W)
    CX = cx_ref[0, 0]     # (P,) — stored (1, 1, P); clipped by caller
    CY = cy_ref[0, 0]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1)
    rm = (iota_h == CY[:, None]).astype(jnp.float32)           # (P, H)
    rows = jnp.dot(rm, img, preferred_element_type=jnp.float32)  # (P, W)
    val = jnp.sum(jnp.where(iota_w == CX[:, None], rows, 0.0), axis=1)
    out_ref[0, 0] = val


@functools.partial(jax.jit, static_argnames=("interpret",))
def point_readout_pallas(img, cx, cy, interpret: bool = False):
    """img[b, cy, cx] point readout without a TPU gather.

    Point gathers on the minor dims serialize on TPU (NOTES.md §21); this
    kernel keeps each (H, W) plane in VMEM and reads all P points of a
    batch row with one one-hot matmul + masked reduce. The point arrays
    ride as (B, 1, P) blocks (Mosaic requires the last two block dims to
    divide (8, 128) or equal the array dims).

    img: (B, H, W) f32; cx, cy: (B, P) int32, already clipped in-range.
    Returns (B, P) f32.
    """
    B, H, W = img.shape
    P = cx.shape[-1]
    kernel = functools.partial(_point_readout_kernel, p=P, h=H, w=W)
    pt = pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, P), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pt, pt,
        ],
        out_specs=pt,
        interpret=interpret,
    )(
        img.astype(jnp.float32),
        cx.astype(jnp.int32).reshape(B, 1, P),
        cy.astype(jnp.int32).reshape(B, 1, P),
    )
    return out.reshape(B, P)


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
