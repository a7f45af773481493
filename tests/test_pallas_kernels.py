"""Pallas kernel parity (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from popnet_tpu.decode.device import find_peaks_batched, score_limb_pairs_batched
from popnet_tpu.ops.pallas_kernels import peak_local_max_pallas, peak_mask


def test_peak_mask_pallas_matches_jnp():
    rng = np.random.default_rng(0)
    heat = rng.uniform(0, 1, (2, 32, 128, 4)).astype(np.float32)
    ref = np.asarray(peak_mask(jnp.asarray(heat), 0.1, use_pallas=False))

    B, H, W, C = heat.shape
    flat = jnp.asarray(heat).transpose(0, 3, 1, 2).reshape(B * C, H, W)
    is_max = np.asarray(peak_local_max_pallas(flat, interpret=True))
    got = (is_max.reshape(B, C, H, W).transpose(0, 2, 3, 1) > 0) & (heat > 0.1)
    np.testing.assert_array_equal(got, ref)


def test_find_peaks_pallas_matches_xla():
    """The fused peak front end (NMS mask + top-M + windowed refine in one
    kernel) reproduces the XLA path: identical valid sets and identical
    refined coords/scores on random heatmaps, including border peaks."""
    rng = np.random.default_rng(11)
    B = 2
    heat = rng.uniform(0, 1, (B, 28, 28, 16)).astype(np.float32)
    # force some border peaks
    heat[0, 0, 3, 0] = 5.0
    heat[0, 27, 27, 1] = 5.0
    heat[1, 5, 0, 2] = 5.0

    pk_x, vx = find_peaks_batched(jnp.asarray(heat), refine="xla")
    pk_p, vp = find_peaks_batched(jnp.asarray(heat), refine="pallas")
    np.testing.assert_array_equal(np.asarray(vx), np.asarray(vp))
    v = np.asarray(vx)
    np.testing.assert_allclose(
        np.asarray(pk_p)[v], np.asarray(pk_x)[v], atol=1e-5
    )


def test_find_peaks_bt_matches_per_row():
    """The batch-tiled peak kernel (BT rows per grid cell) reproduces the
    per-row kernel: identical peak indices / window argmax / valid sets,
    scores equal to float epsilon (the refine matmul is (BT*M, 25) instead
    of (M, 25); same taps, shape-dependent reduction order in the backend).
    Covers the B % BT != 0 zero-padding path."""
    from popnet_tpu.ops.pallas_kernels import (
        find_peaks_pallas, find_peaks_pallas_bt,
    )

    rng = np.random.default_rng(7)
    for B in (8, 12, 3):
        heat = rng.uniform(0, 1, (B, 15, 28, 28)).astype(np.float32)
        heat[0, 0, 5, 5] = 0.9
        heat[0, 0, 5, 9] = 0.9  # exact tie: pick order must match
        a = find_peaks_pallas(jnp.asarray(heat), interpret=True)
        b = find_peaks_pallas_bt(jnp.asarray(heat), bt=8, interpret=True)
        for i in (0, 1, 2, 4):  # px, py, loc, valid: exact
            np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(b[i]))
        np.testing.assert_allclose(
            np.asarray(a[3]), np.asarray(b[3]), atol=1e-5
        )


def test_window_readout_pallas_matches_xla():
    """The VMEM window-readout kernel reproduces the XLA einsum
    retrieve_depth_heat_weighted, including border-shrunken and collapsed
    (center outside the map) windows."""
    from popnet_tpu.decode.openpose_infer import window_readout_heat_weighted

    rng = np.random.default_rng(3)
    B, H, W, K, P = 2, 28, 28, 15, 6
    z = rng.uniform(0.5, 6.0, (B, H, W, K)).astype(np.float32)
    heat = rng.uniform(-0.2, 1.0, (B, H, W, K)).astype(np.float32)
    cx = rng.integers(-3, W + 3, (B, P, K)).astype(np.int32)
    cy = rng.integers(-3, H + 3, (B, P, K)).astype(np.int32)

    ref = window_readout_heat_weighted(
        jnp.asarray(z), jnp.asarray(heat), jnp.asarray(cx), jnp.asarray(cy),
        use_pallas=False,
    )
    got = window_readout_heat_weighted(
        jnp.asarray(z), jnp.asarray(heat), jnp.asarray(cx), jnp.asarray(cy),
        use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_point_readout_pallas_matches_gather():
    """One-hot-matmul point readout equals advanced-indexing gather."""
    from popnet_tpu.ops.pallas_kernels import point_readout_pallas

    rng = np.random.default_rng(5)
    B, H, W, P = 3, 64, 48, 17
    img = rng.uniform(0.5, 6.0, (B, H, W)).astype(np.float32)
    cx = rng.integers(0, W, (B, P)).astype(np.int32)
    cy = rng.integers(0, H, (B, P)).astype(np.int32)
    ref = img[np.arange(B)[:, None], cy, cx]
    got = point_readout_pallas(
        jnp.asarray(img), jnp.asarray(cx), jnp.asarray(cy), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


def test_paf_sample_pallas_matches_onehot():
    """The VMEM tap-selection kernel reproduces the one-hot-matmul PAF
    scorer (same cubic taps, same rounding, same criteria inputs)."""
    rng = np.random.default_rng(7)
    B = 2
    heat = rng.uniform(0, 1, (B, 28, 28, 16)).astype(np.float32)
    paf = rng.uniform(-1, 1, (B, 28, 28, 28)).astype(np.float32)

    peaks, valid = find_peaks_batched(jnp.asarray(heat))
    s_oh, ok_oh = score_limb_pairs_batched(jnp.asarray(paf), peaks, valid)
    s_pl, ok_pl = score_limb_pairs_batched(
        jnp.asarray(paf), peaks, valid, method="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_oh), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(ok_pl), np.asarray(ok_oh))
