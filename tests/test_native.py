"""Native C++ assembler must match the NumPy assembler exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from popnet_tpu.core.skeleton import LIMBS
from popnet_tpu.decode.assemble import assemble_batch
from popnet_tpu.decode.device import find_peaks_batched, score_limb_pairs_batched
from popnet_tpu import native
from tests.test_decode_device import synth


@pytest.mark.parametrize("seed,n_people", [(0, 2), (3, 3), (5, 4)])
def test_native_matches_numpy(seed, n_people):
    if not native.available():
        pytest.skip("g++/make unavailable")
    heat, paf = synth(seed, n_people, B=3)
    peaks, valid = find_peaks_batched(jnp.asarray(heat))
    scores, ok = score_limb_pairs_batched(jnp.asarray(paf), peaks, valid)

    ref = assemble_batch(peaks, valid, scores, ok)
    joints, counts = native.assemble_batch_native(
        np.asarray(peaks), np.asarray(valid), np.asarray(scores), np.asarray(ok), LIMBS
    )
    for b in range(heat.shape[0]):
        ref_h, ref_v, ref_c = ref[b]
        assert counts[b] == len(ref_h)
        for p in range(counts[b]):
            np.testing.assert_allclose(joints[b, p, :, :2], np.asarray(ref_h[p]), atol=1e-5)
            np.testing.assert_allclose(joints[b, p, :, 2], np.asarray(ref_c[p]), atol=1e-5)
