"""On-device greedy assembly must match the host assemblers exactly.

The NumPy assembler (decode/assemble.py) is the readable spec; the native
C++ twin is the f32 oracle. The device scan (decode/assemble_device.py) is
checked against both on (a) realistic synthetic scenes and (b) adversarial
random candidate tensors that force dense merges, 2-person unions, and
person-count overflow past max_people.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from popnet_tpu.core.skeleton import LIMBS, NUM_JOINTS
from popnet_tpu.decode.assemble import assemble_batch
from popnet_tpu.decode.assemble_device import assemble_batched
from popnet_tpu.decode.device import find_peaks_batched, score_limb_pairs_batched
from popnet_tpu import native
from tests.test_decode_device import synth


def numpy_oracle(peaks, valid, scores, ok, max_people=16):
    """decode/assemble.py output reshaped into the (joints, counts) contract."""
    res = assemble_batch(peaks, valid, scores, ok)
    B, K = peaks.shape[0], peaks.shape[1]
    joints = np.zeros((B, max_people, K, 3), np.float32)
    counts = np.zeros((B,), np.int32)
    for b, (hs, vs, cs) in enumerate(res):
        n = min(len(hs), max_people)
        counts[b] = n
        for p in range(n):
            for k in range(K):
                joints[b, p, k, :2] = hs[p][k]
                joints[b, p, k, 2] = cs[p][k]
    return joints, counts


def check_case(peaks, valid, scores, ok):
    dev_j, dev_c = assemble_batched(
        jnp.asarray(peaks), jnp.asarray(valid), jnp.asarray(scores), jnp.asarray(ok)
    )
    dev_j, dev_c = np.asarray(dev_j), np.asarray(dev_c)

    # the VMEM Pallas assembler (interpret mode off-TPU) is bit-identical
    pl_j, pl_c = assemble_batched(
        jnp.asarray(peaks), jnp.asarray(valid), jnp.asarray(scores),
        jnp.asarray(ok), method="pallas",
    )
    np.testing.assert_array_equal(np.asarray(pl_c), dev_c)
    np.testing.assert_array_equal(np.asarray(pl_j), dev_j)

    ref_j, ref_c = numpy_oracle(peaks, valid, scores, ok)
    np.testing.assert_array_equal(dev_c, ref_c)
    for b in range(peaks.shape[0]):
        for p in range(ref_c[b]):
            np.testing.assert_allclose(dev_j[b, p], ref_j[b, p], atol=1e-5)

    if native.available():
        nat_j, nat_c = native.assemble_batch_native(
            np.asarray(peaks, np.float32), np.asarray(valid), np.asarray(scores, np.float32),
            np.asarray(ok), LIMBS,
        )
        np.testing.assert_array_equal(dev_c, nat_c)
        for b in range(peaks.shape[0]):
            for p in range(nat_c[b]):
                np.testing.assert_array_equal(dev_j[b, p], nat_j[b, p])


@pytest.mark.parametrize("seed,n_people", [(0, 2), (3, 3), (5, 4), (7, 6)])
def test_device_assembly_on_synth_scenes(seed, n_people):
    heat, paf = synth(seed, n_people, B=3)
    peaks, valid = find_peaks_batched(jnp.asarray(heat))
    scores, ok = score_limb_pairs_batched(jnp.asarray(paf), peaks, valid)
    check_case(np.asarray(peaks), np.asarray(valid), np.asarray(scores), np.asarray(ok))


@pytest.mark.parametrize("seed,density", [(0, 0.08), (1, 0.3), (2, 0.7), (3, 1.0)])
def test_device_assembly_adversarial_random(seed, density):
    """Random candidate tensors: dense ok matrices force long merge chains,
    overflowing person creation well past max_people."""
    rng = np.random.default_rng(seed)
    B, K, M, L = 4, NUM_JOINTS, 16, len(LIMBS)
    n_valid = rng.integers(0, M + 1, size=(B, K))
    valid = np.arange(M)[None, None, :] < n_valid[:, :, None]
    peaks = np.zeros((B, K, M, 3), np.float32)
    peaks[..., :2] = rng.uniform(0, 223, size=(B, K, M, 2))
    peaks[..., 2] = rng.uniform(0.1, 1.0, size=(B, K, M))
    peaks[~valid] = 0.0

    scores = rng.uniform(0.01, 2.0, size=(B, L, M, M)).astype(np.float32)
    ok = rng.uniform(size=(B, L, M, M)) < density
    limbs = np.asarray(LIMBS)
    src_ok = valid[:, limbs[:, 0]]  # (B, L, M)
    dst_ok = valid[:, limbs[:, 1]]
    ok &= src_ok[:, :, :, None] & dst_ok[:, :, None, :]

    check_case(peaks, valid, scores, ok)


def test_device_assembly_empty():
    B, K, M, L = 2, NUM_JOINTS, 16, len(LIMBS)
    peaks = np.zeros((B, K, M, 3), np.float32)
    valid = np.zeros((B, K, M), bool)
    scores = np.zeros((B, L, M, M), np.float32)
    ok = np.zeros((B, L, M, M), bool)
    dev_j, dev_c = assemble_batched(
        jnp.asarray(peaks), jnp.asarray(valid), jnp.asarray(scores), jnp.asarray(ok)
    )
    assert np.all(np.asarray(dev_c) == 0)
