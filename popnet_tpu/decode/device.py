"""Batched on-device peak detection, sub-pixel refinement, and PAF scoring.

The throughput path for the Open-Pose+ family: everything up to (and
including) limb-pair scoring runs as one jitted XLA program over the batch;
only the tiny greedy assembly (O(people^2) on <=16-peak lists) leaves the
device, handled by the NumPy reference (decode/paf_np.py) or the native C++
assembler (popnet_tpu/native).

Numerics match the host reference in the interior:
- peaks: cross-footprint local maxima above threshold, top-K per joint;
- sub-pixel refinement: the 5x5 patch bicubic upsample (cv2 INTER_CUBIC,
  Keys a=-0.75, half-pixel mapping, border replicate) is computed in closed
  form as U @ patch @ U^T and argmax'd over the window the reference's
  shrunken border patch covers — exact everywhere, borders included;
- PAF sampling: direct bicubic evaluation of the x8-upsampled field at the
  10 rounded line points — exactly cv2.resize(...)[y, x] for the interior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from popnet_tpu.core.skeleton import LIMBS


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution weights (cv2 INTER_CUBIC uses a=-0.75)."""
    t = np.abs(t)
    w = np.where(
        t <= 1,
        (a + 2) * t**3 - (a + 3) * t**2 + 1,
        np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
    )
    return w


def _upsample_matrix(size: int, factor: int) -> np.ndarray:
    """(size*factor, size) matrix U with cv2.resize INTER_CUBIC semantics:
    out[j] = sum_i U[j, i] * in[i], border-replicated."""
    out = np.zeros((size * factor, size))
    for j in range(size * factor):
        src = (j + 0.5) / factor - 0.5
        i0 = int(np.floor(src))
        for k in range(-1, 3):
            idx = i0 + k
            w = _cubic_kernel(src - idx)
            out[j, int(np.clip(idx, 0, size - 1))] += w
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_peaks", "thresh", "factor", "win_size", "num_joints", "refine"
    ),
)
def find_peaks_batched(
    heat: jnp.ndarray,  # (B, H, W, C)
    max_peaks: int = 16,
    thresh: float = 0.1,
    factor: int = 8,
    win_size: int = 2,
    num_joints: int = 15,
    refine: str | None = None,
):
    """Top-K peaks per joint with sub-pixel refinement.

    Returns peaks (B, K, max_peaks, 3) of (x, y, score) in upsampled-image
    coordinates and n_valid mask (B, K, max_peaks).

    refine: None auto-selects "pallas" on TPU — the fused
    mask+top-k+refine kernel (ops/pallas_kernels.find_peaks_pallas): the
    heat planes are read from HBM once and only (K, M) results leave —
    and the "xla" einsum formulation elsewhere; parity pinned in
    tests/test_pallas_kernels.py.
    """
    from popnet_tpu.ops.pallas_kernels import find_peaks_pallas, peak_mask

    if refine is None:
        refine = "pallas" if jax.default_backend() == "tpu" else "xla"

    B, H, W, _ = heat.shape
    h = heat[..., :num_joints]
    size = 2 * win_size + 1
    S = size * factor

    if refine in ("pallas", "pallas_row"):
        from popnet_tpu.ops.pallas_kernels import find_peaks_pallas_bt

        hK = h.astype(jnp.float32).transpose(0, 3, 1, 2)  # (B, K, H, W)
        # "pallas" = batch-tiled kernel (BT rows per grid cell — the
        # grid-per-row variant measured 7.0 ms/b256 against a 0.12 ms
        # byte bound, PARITY roofline table); "pallas_row" keeps the
        # per-row kernel as the parity reference
        fn = find_peaks_pallas_bt if refine == "pallas" else find_peaks_pallas
        px, py, loc, peak_score, valid = fn(
            hK, max_peaks=max_peaks, thresh=thresh, factor=factor,
            win_size=win_size, interpret=jax.default_backend() != "tpu",
        )
        peak_score = peak_score.astype(heat.dtype)
    else:
        # cross-footprint max filter + threshold (Pallas kernel on TPU)
        is_peak = peak_mask(h, thresh)

        score_flat = jnp.where(is_peak, h, -jnp.inf).transpose(0, 3, 1, 2).reshape(
            B, num_joints, H * W
        )
        # lax.top_k is stable (lower index first on ties) — identical
        # selection order to iterative masked argmax, in one fused op
        # instead of a max_peaks-step scan. Invalid (-inf) slots get index
        # 0, matching the scan's argmax-over-all--inf behavior exactly.
        top_score, top_idx = jax.lax.top_k(score_flat, max_peaks)  # (B, K, M)
        valid = jnp.isfinite(top_score)
        top_idx = jnp.where(valid, top_idx, 0)
        py = top_idx // W
        px = top_idx % W

        # 5x5 border-replicated patch upsample, gather-free: per-peak
        # one-hot row/col selectors fold into the U interpolation matrices,
        # so the whole refinement is three small matmuls per peak on the
        # MXU. (Measured on chip: a direct per-peak patch gather is ~2x
        # slower — TPU gathers serialize; the one-hot contractions fuse.)
        hK = h.transpose(0, 3, 1, 2)  # (B, K, H, W)
        hpad = jnp.pad(
            hK, ((0, 0), (0, 0), (win_size, win_size), (win_size, win_size)),
            mode="edge",
        )
        Hp, Wp = H + 2 * win_size, W + 2 * win_size

        U = jnp.asarray(_upsample_matrix(size, factor), dtype=heat.dtype)  # (S, 5)
        offs = jnp.arange(size)
        rowsel = jax.nn.one_hot(py[..., None] + offs, Hp, dtype=heat.dtype)  # (B,K,M,5,Hp)
        colsel = jax.nn.one_hot(px[..., None] + offs, Wp, dtype=heat.dtype)  # (B,K,M,5,Wp)
        # patch-first association: extract the 5x5 patches with the one-hot
        # selectors, THEN upsample with U. Same contractions as upsampling the
        # selectors first, but the largest intermediate shrinks from
        # (B,K,M,S,Hp) f32 (~300 MB at batch 256) to (B,K,M,5,Wp) (~37 MB) —
        # the refine stage is HBM-bound, so association order is the cost.
        tmp = jnp.einsum("bkmih,bkhw->bkmiw", rowsel, hpad)    # (B,K,M,5,Wp)
        patch = jnp.einsum("bkmiw,bkmjw->bkmij", tmp, colsel)  # (B,K,M,5,5)
        upA = jnp.einsum("si,bkmij->bkmsj", U, patch)          # (B,K,M,S,5)
        up = jnp.einsum("bkmsj,tj->bkmst", upA, U)             # (B,K,M,S,S)

        # restrict the argmax to the window the reference's shrunken border
        # patch covers — with edge clamping the values inside that window are
        # identical to resizing the smaller patch, so border peaks are exact too
        # (reference: paf_to_pose.py:118-127 crops the patch at image borders)
        kx0 = jnp.maximum(0, win_size - px)[..., None]           # (B, K, M, 1)
        kx1 = win_size + jnp.minimum(W - 1 - px, win_size)[..., None]
        ky0 = jnp.maximum(0, win_size - py)[..., None]
        ky1 = win_size + jnp.minimum(H - 1 - py, win_size)[..., None]
        cols = jnp.arange(S) // factor
        col_ok = (cols[None, None, None, :] >= kx0) & (cols[None, None, None, :] <= kx1)
        row_ok = (cols[None, None, None, :] >= ky0) & (cols[None, None, None, :] <= ky1)
        window = row_ok[..., :, None] & col_ok[..., None, :]     # (B, K, M, S, S)
        up = jnp.where(window, up, -jnp.inf)

        up_flat = up.reshape(B, num_joints, max_peaks, S * S)
        loc = jnp.argmax(up_flat, axis=-1)
        peak_score = jnp.max(up_flat, axis=-1)
    loc_y = loc // S
    loc_x = loc % S

    # patch center of the original peak in upsampled patch coords
    center = (jnp.asarray(win_size, heat.dtype) + 0.5) * factor - 0.5
    rx = loc_x - center
    ry = loc_y - center
    out_x = (px + 0.5) * factor - 0.5 + rx
    out_y = (py + 0.5) * factor - 0.5 + ry

    peaks = jnp.stack([out_x, out_y, peak_score], axis=-1)
    return peaks, valid


@functools.partial(
    jax.jit,
    static_argnames=("num_intermed_pts", "thresh_paf", "factor", "limbs", "method"),
)
def score_limb_pairs_batched(
    pafs: jnp.ndarray,         # (B, H, W, 2L) low-res fields
    peaks: jnp.ndarray,        # (B, K, M, 3) from find_peaks_batched
    peak_valid: jnp.ndarray,   # (B, K, M)
    num_intermed_pts: int = 10,
    thresh_paf: float = 0.05,
    factor: int = 8,
    limbs: tuple = LIMBS,
    method: str | None = None,
):
    """All src x dst pair scores per limb.

    Returns (scores (B, L, M, M), ok (B, L, M, M)) where ok combines the
    PAF-sample criterion, the positive penalized-score criterion, and pair
    validity — the exact candidate set of the reference's
    find_connected_joints (reference: paf_to_pose.py:156-264).

    method: None auto-selects "pallas" (VMEM tap-selection kernel) on TPU
    and "onehot" elsewhere; all three methods are exact-parity-tested
    against each other (tests/test_pallas_kernels.py, test_decode_device.py).
    """
    if method is None:
        method = "pallas" if jax.default_backend() == "tpu" else "onehot"
    limbs_arr = np.asarray(limbs)
    B, H, W, _ = pafs.shape
    M = peaks.shape[2]
    L = limbs_arr.shape[0]

    src = peaks[:, limbs_arr[:, 0]]  # (B, L, M, 3)
    dst = peaks[:, limbs_arr[:, 1]]
    src_ok = peak_valid[:, limbs_arr[:, 0]]  # (B, L, M)
    dst_ok = peak_valid[:, limbs_arr[:, 1]]

    d = dst[:, :, None, :, :2] - src[:, :, :, None, :2]  # (B, L, Ms, Md, 2)
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1)) + 1e-8
    u = d / dist[..., None]

    if method == "pallas":
        # VMEM-resident tap selection (ops/pallas_kernels.paf_sample_pallas):
        # only pair-level (B, L, M, M) geometry and sums/counts touch HBM —
        # the point-level (B, L, N, ...) expansions of the XLA paths never
        # materialize. Same tap math, parity-tested vs "onehot".
        from popnet_tpu.ops.pallas_kernels import paf_sample_pallas

        paf_l = pafs.transpose(0, 3, 1, 2).reshape(B, L, 2, H, W)
        pafp = jnp.pad(
            paf_l, ((0, 0), (0, 0), (0, 0), (2, 2), (2, 2)), mode="edge"
        )
        pafT = pafp.transpose(0, 1, 2, 4, 3)  # (B, L, 2, Wp, Hp)
        Pn = M * M
        pair = (B, L, M, M)
        flat = lambda a2: jnp.broadcast_to(a2, pair).reshape(B, L, Pn)
        psum, pcnt = paf_sample_pallas(
            pafT,
            flat(src[:, :, :, None, 0]), flat(src[:, :, :, None, 1]),
            d[..., 0].reshape(B, L, Pn), d[..., 1].reshape(B, L, Pn),
            u[..., 0].reshape(B, L, Pn), u[..., 1].reshape(B, L, Pn),
            num_pts=num_intermed_pts, factor=factor, thresh=thresh_paf,
            interpret=jax.default_backend() != "tpu",
        )
        mean_score = psum.reshape(pair) / num_intermed_pts
        penalty = jnp.minimum(0.5 * (H * factor) / dist - 1.0, 0.0)
        score = mean_score + penalty
        crit1 = pcnt.reshape(pair) > 0.8 * num_intermed_pts
        crit2 = score > 0
        ok = crit1 & crit2 & src_ok[:, :, :, None] & dst_ok[:, :, None, :]
        return score, ok

    ts = jnp.linspace(0.0, 1.0, num_intermed_pts)
    pts = src[:, :, :, None, None, :2] + d[:, :, :, :, None, :] * ts[None, None, None, None, :, None]
    # rounded integer coords in the upsampled image, mapped back to low-res
    # continuous coords with the cv2 half-pixel convention
    pxi = jnp.round(pts[..., 0])
    pyi = jnp.round(pts[..., 1])
    lx = (pxi + 0.5) / factor - 0.5
    ly = (pyi + 0.5) / factor - 0.5

    # bicubic sampling, gather-free: the 4 cubic taps per axis scatter into
    # dense one-hot selector rows, so the whole evaluation is two matmuls
    # per (batch, limb) plane on the MXU — no gathers at all. The 2-wide
    # edge pad reproduces cv2's border replication exactly.
    paf_l = pafs.transpose(0, 3, 1, 2).reshape(B, L, 2, H, W)
    pafp = jnp.pad(paf_l, ((0, 0), (0, 0), (0, 0), (2, 2), (2, 2)), mode="edge")
    Hp, Wp = H + 4, W + 4

    x0 = jnp.floor(lx)
    y0 = jnp.floor(ly)
    fx = lx - x0
    fy = ly - y0

    M_, T_ = pts.shape[2], num_intermed_pts
    npts = M_ * M_ * T_

    def cubic_w(t, a=-0.75):
        # weights for taps at offsets -1, 0, 1, 2 from floor
        offs = jnp.arange(-1.0, 3.0)
        tt = jnp.abs(t[..., None] - offs)
        return jnp.where(
            tt <= 1,
            (a + 2) * tt**3 - (a + 3) * tt**2 + 1,
            jnp.where(tt < 2, a * tt**3 - 5 * a * tt**2 + 8 * a * tt - 4 * a, 0.0),
        )

    tap = jnp.arange(4)
    if method == "upsample":
        # The sampled coordinates are ROUNDED integers of the upsampled
        # image, so the per-point cubic tap rows are rows of the FIXED
        # separable-resize matrices — exact bicubic at integer points ==
        # sampling the full separable upsample. Computing
        # up = Ry @ pafp @ Rx^T once per plane and reading points with one
        # batched take_along_axis keeps every operand small; the one-hot
        # path's (B, L, N, Wp) selector operands (~1-4 GB at batch 256)
        # never exist. Same cubic_w weights, same tap columns, same f32 ops.
        # NOT the default: measured on v5e the minor-dim point gather
        # serializes — 327 ms/batch-256 vs 17.9 ms for the one-hot matmul
        # (scripts/profile_decode.py). Kept for hosts where HBM, not
        # gather throughput, binds (and as an exact-parity cross-check).
        W_up, H_up = W * factor, H * factor

        def axis_table(n_out, n_pad):
            # rows for integer positions -1 .. n_out (clip range below)
            l = (jnp.arange(-1, n_out + 1, dtype=pafs.dtype) + 0.5) / factor - 0.5
            a0 = jnp.floor(l)
            w = cubic_w(l - a0)                              # (n_out+2, 4)
            idx = a0.astype(jnp.int32)[:, None] + 1 + tap    # padded cols
            return jnp.sum(
                jax.nn.one_hot(idx, n_pad, dtype=pafs.dtype) * w[..., None],
                axis=-2,
            )                                                # (n_out+2, n_pad)

        Rx_t = axis_table(W_up, Wp)
        Ry_t = axis_table(H_up, Hp)
        up = jnp.einsum("yh,blchw,xw->blcyx", Ry_t, pafp, Rx_t)
        pxc = jnp.clip(pxi, -1, W_up).astype(jnp.int32).reshape(B, L, npts) + 1
        pyc = jnp.clip(pyi, -1, H_up).astype(jnp.int32).reshape(B, L, npts) + 1
        flat = up.reshape(B, L, 2, (H_up + 2) * (W_up + 2))
        idx = (pyc * (W_up + 2) + pxc)[:, :, None, :]
        vals = jnp.take_along_axis(
            flat, jnp.broadcast_to(idx, (B, L, 2, npts)), axis=-1
        ).transpose(0, 1, 3, 2)                              # (B, L, N, 2)
    else:  # "onehot"
        wx = cubic_w(fx).reshape(B, L, npts, 4)  # (B, L, N, 4)
        wy = cubic_w(fy).reshape(B, L, npts, 4)
        # padded tap columns: x0 - 1 + j + 2 for j in 0..3
        xi = x0.astype(jnp.int32).reshape(B, L, npts)[..., None] + 1 + tap
        yi = y0.astype(jnp.int32).reshape(B, L, npts)[..., None] + 1 + tap
        R = jnp.sum(jax.nn.one_hot(xi, Wp, dtype=pafs.dtype) * wx[..., None], axis=-2)
        C = jnp.sum(jax.nn.one_hot(yi, Hp, dtype=pafs.dtype) * wy[..., None], axis=-2)
        # Q[b,l,c,y,n] = sum_x paf[b,l,c,y,x] * R[b,l,n,x]
        Q = jnp.einsum("blcyx,blnx->blcyn", pafp, R)
        vals = jnp.einsum("blcyn,blny->blnc", Q, C)  # (B, L, N, 2)
    sx = vals[..., 0].reshape(B, L, M_, M_, T_)
    sy = vals[..., 1].reshape(B, L, M_, M_, T_)

    proj = sx * u[..., None, 0] + sy * u[..., None, 1]  # (B, L, Ms, Md, T)
    mean_score = jnp.mean(proj, axis=-1)
    penalty = jnp.minimum(0.5 * (H * factor) / dist - 1.0, 0.0)
    score = mean_score + penalty
    crit1 = jnp.sum(proj > thresh_paf, axis=-1) > 0.8 * num_intermed_pts
    crit2 = score > 0
    ok = crit1 & crit2 & src_ok[:, :, :, None] & dst_ok[:, :, None, :]
    return score, ok
