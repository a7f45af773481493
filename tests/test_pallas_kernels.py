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
