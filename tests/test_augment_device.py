"""Fused device augmentation: exact label algebra, near-exact pixels."""

import numpy as np

import jax.numpy as jnp

from popnet_tpu.data import augment_host as ah
from popnet_tpu.data import augment_device as ad
from popnet_tpu.core.skeleton import SWAP_INDICES


def scene(seed, h=512, w=480):
    rng = np.random.default_rng(seed)
    # smooth depth-like image: sub-pixel sampling differences stay bounded
    # (random noise would decorrelate under any resampling difference)
    ys, xs = np.mgrid[0:h, 0:w]
    p = rng.uniform(20, 70, 4)
    img = (3 + 1.5 * np.sin(xs / p[0]) * np.cos(ys / p[1])
           + 0.8 * np.cos(xs / p[2] + ys / p[3])).astype(np.float32)
    j2 = rng.uniform(20, 440, (2, 15, 2)).astype(np.float32)
    z = rng.uniform(1, 5, (2, 15))
    j3 = np.stack([(j2[..., 0] - 232) / 504 * z, (j2[..., 1] - 320) / 504 * z, z], -1).astype(np.float32)
    bb = np.stack([
        j2[..., 0].min(-1), j2[..., 1].min(-1), j2[..., 0].max(-1), j2[..., 1].max(-1)
    ], -1)
    return img, j2, j3, bb


def run_host(img, j2, j3, bb, rot, a, crops):
    anns = [
        {"2d_joints": j2[i].copy(), "3d_joints": j3[i].copy(), "bbox": bb[i].copy()}
        for i in range(len(j2))
    ]
    o_img, o_lab = ah.Rotate.apply(img.copy(), anns, rot, is_3d=True)
    o_img, o_lab = ah.RenderDepth.apply(o_img, o_lab, a)
    o_img, o_lab = ah.Crop.apply(o_img, o_lab, *crops)
    o_img, o_lab = ah.Resize(224)((o_img, o_lab))
    return o_img, o_lab


class FixedRng:
    """Deterministic uniform: returns preset fractions in order."""

    def __init__(self, fracs):
        self.it = iter(fracs)

    def uniform(self, a, b):
        return a + (b - a) * next(self.it)


def check(seed, fracs):
    img, j2, j3, bb = scene(seed)
    rot = -10 + 20 * fracs[0]
    a = 0.7 + 0.5 * fracs[1]
    crops = tuple(0.1 * f for f in fracs[2:6])

    ref_img, ref_lab = run_host(img, j2, j3, bb, rot, a, crops)

    params = ad.sample_augment_params(FixedRng(fracs), 512, 480)
    tj2, tj3, tbb = ad.transform_labels(params, j2, j3, bb, list(SWAP_INDICES))
    for i in range(len(ref_lab)):
        np.testing.assert_allclose(tj2[i], ref_lab[i]["2d_joints"], atol=1e-3)
        np.testing.assert_allclose(tj3[i], ref_lab[i]["3d_joints"], atol=1e-4)
        np.testing.assert_allclose(tbb[i], ref_lab[i]["bbox"], atol=1e-3)

    warped = np.asarray(
        ad.warp_depth_batch(
            jnp.asarray(img)[None],
            jnp.asarray(params.inv_mat)[None],
            jnp.asarray([params.depth_scale]),
            jnp.asarray([params.flip]),
        )
    )[0]
    return warped, ref_img


def test_no_rotation_pixels_exact():
    """rot=0: host path is slice+resize, the fused warp must match it."""
    warped, ref = check(0, [0.5, 0.8, 0.3, 0.6, 0.1, 0.9])
    np.testing.assert_allclose(warped, ref, atol=2e-3)


def test_rotation_labels_exact_pixels_close():
    warped, ref = check(1, [0.9, 0.2, 0.5, 0.0, 0.7, 0.4])
    # two resamplings (host) vs one (device): small smooth-field deviation
    assert np.mean(np.abs(warped - ref)) < 0.01
    assert np.max(np.abs(warped - ref)) < 0.1


def test_label_algebra_many_seeds():
    """Property sweep: label algebra matches the host pipeline for 25
    random parameter draws (including flips)."""
    from popnet_tpu.core.skeleton import SWAP_INDICES

    for seed in range(25):
        rng = np.random.default_rng(1000 + seed)
        fracs = rng.uniform(0.01, 0.99, 6)
        img, j2, j3, bb = scene(seed)
        rot = -10 + 20 * fracs[0]
        a = 0.7 + 0.5 * fracs[1]
        crops = tuple(0.1 * f for f in fracs[2:6])
        _, ref_lab = run_host(img, j2, j3, bb, rot, a, crops)
        params = ad.sample_augment_params(FixedRng(fracs), 512, 480)
        tj2, tj3, tbb = ad.transform_labels(params, j2, j3, bb, list(SWAP_INDICES))
        for i in range(len(ref_lab)):
            np.testing.assert_allclose(tj2[i], ref_lab[i]["2d_joints"], atol=2e-3)
            np.testing.assert_allclose(tj3[i], ref_lab[i]["3d_joints"], atol=1e-4)
            np.testing.assert_allclose(tbb[i], ref_lab[i]["bbox"], atol=2e-3)
