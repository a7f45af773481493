"""Flip-averaged inference: unflipping maps of the mirrored scene must
reproduce the originals (exactly for heat; exactly on PAF cells painted by
both — band boundaries differ by the reference's own rounding asymmetry)."""

import numpy as np

import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.core.skeleton import LIMBS, SWAP_INDICES
from popnet_tpu.decode.flip_average import (
    flip_average_infer,
    paf_swap_table,
    unflip_maps,
)
from popnet_tpu.ops import encoders

CFG = EncoderConfig()


def encode_scene(j2, valid):
    heat = encoders.encode_heatmaps(jnp.asarray(j2), jnp.asarray(valid), CFG)
    paf = encoders.encode_pafs(jnp.asarray(j2), jnp.asarray(valid), CFG)
    return np.asarray(heat), np.asarray(paf)


def test_unflip_inverts_mirroring():
    rng = np.random.default_rng(0)
    j2 = np.full((CFG.max_people, 15, 2), -1e6, np.float32)
    valid = np.zeros(CFG.max_people, bool)
    for p, c in enumerate([(70, 80), (160, 150)]):
        j2[p] = np.clip(np.array(c) + rng.normal(0, 20, (15, 2)), 8, 215)
        valid[p] = True
    heat, paf = encode_scene(j2, valid)

    # exact array mirror: x' = (W-1) - x with L/R joints swapped
    j2f = j2.copy()
    j2f[valid, :, 0] = (CFG.input_x - 1) - j2f[valid, :, 0]
    j2f = j2f[:, list(SWAP_INDICES), :]
    heat_f, paf_f = encode_scene(j2f, valid)

    heat_u, paf_u = unflip_maps(heat_f[None], paf_f[None], LIMBS, SWAP_INDICES)
    np.testing.assert_allclose(np.asarray(heat_u)[0], heat, atol=1e-5)
    pu = np.asarray(paf_u)[0]
    both = (np.abs(paf) > 0.01) & (np.abs(pu) > 0.01)
    assert both.mean() > 0.01  # bands overlap substantially
    np.testing.assert_allclose(pu[both], paf[both], atol=1e-5)


def test_flip_average_identity_for_equivariant_infer():
    """If infer is perfectly flip-equivariant, averaging changes nothing."""
    rng = np.random.default_rng(1)
    heat = rng.uniform(0, 1, (2, 28, 28, 16)).astype(np.float32)
    paf = rng.uniform(-1, 1, (2, 28, 28, 28)).astype(np.float32)
    heat_perm = list(SWAP_INDICES) + [15]
    pswap = paf_swap_table(LIMBS, SWAP_INDICES)
    sign = np.ones(28, np.float32)
    sign[0::2] = -1

    def infer(images):
        flipped = bool(np.asarray(images)[0, 0, 0, 0] < 0)
        if not flipped:
            return jnp.asarray(paf), jnp.asarray(heat), "extra"
        # emit exactly the mirrored-world outputs
        hf = heat[:, :, ::-1, :][..., np.asarray(heat_perm)]
        pf = paf[:, :, ::-1, :][..., pswap] * sign
        return jnp.asarray(pf), jnp.asarray(hf), "extra"

    images = np.ones((2, 224, 224, 1), np.float32)
    images[:, :, 112:] = -1.0  # the mirror flips the [0,0,0] marker
    out = flip_average_infer(infer, jnp.asarray(images), LIMBS, SWAP_INDICES)
    np.testing.assert_allclose(np.asarray(out[1]), heat, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0]), paf, atol=1e-6)
    assert out[2] == "extra"
