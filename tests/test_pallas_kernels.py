"""Pallas kernel parity (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

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
