"""Golden tests: RGB preprocessing variants + crop_with_factor vs the
reference (lib/datasets/preprocessing.py, lib/network/im_transform.py)."""

import numpy as np
import pytest

from tests import reference_shim  # noqa: F401  (installs aliases/stubs)

from popnet_tpu.data import preprocessing as pp


@pytest.fixture(scope="module")
def ref_pp():
    from lib.datasets import preprocessing as ref

    return ref


@pytest.fixture(scope="module")
def ref_imt():
    from lib.network import im_transform as ref

    return ref


def _img(rng, h=37, w=53):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("mode", ["rtpose", "vgg", "inception", "ssd"])
def test_preprocess_golden(ref_pp, mode):
    rng = np.random.default_rng(0)
    img = _img(rng)
    ours = pp.preprocess(img, mode)  # HWC
    theirs = ref_pp.preprocess(img.copy(), mode)  # CHW
    np.testing.assert_allclose(
        ours, np.transpose(theirs, (1, 2, 0)), rtol=0, atol=1e-5
    )


def test_preprocess_unknown_mode_passthrough(ref_pp):
    rng = np.random.default_rng(1)
    img = _img(rng)
    assert pp.preprocess(img, "nope") is img
    assert ref_pp.preprocess(img, "nope") is img


@pytest.mark.parametrize("mode", ["rtpose", "vgg", "inception"])
def test_preprocess_inverse_roundtrip(mode):
    rng = np.random.default_rng(2)
    img = _img(rng)
    fwd = pp.PREPROCESSORS[mode](img)
    inv = getattr(pp, f"inverse_{mode}_preprocess")(fwd)
    np.testing.assert_allclose(
        np.asarray(inv, np.float32), img.astype(np.float32), atol=1.0
    )


@pytest.mark.parametrize(
    "h,w,dest,factor", [(57, 91, 48, 8), (91, 57, 48, 8), (64, 64, 368, 32)]
)
def test_crop_with_factor_golden(ref_imt, h, w, dest, factor):
    rng = np.random.default_rng(3)
    img = _img(rng, h, w)
    ours, s_ours, shape_ours = pp.crop_with_factor(img, dest, factor=factor)
    theirs, s_ref, shape_ref = ref_imt.crop_with_factor(
        img.copy(), dest, factor=factor, is_ceil=True
    )
    assert s_ours == s_ref
    assert tuple(shape_ours) == tuple(shape_ref)
    np.testing.assert_array_equal(ours, theirs)
    assert ours.shape[0] % factor == 0 and ours.shape[1] % factor == 0


def test_rgb_infer_shapes_and_scale():
    # fake CNN: stride-8 maps derived from the input so flip equivariance is
    # exercised end to end through crop_with_factor + preprocess
    # identity left/right swap: channels map to themselves, so for a
    # symmetric image the flip-averaged heat must equal the plain heat
    limbs = ((0, 1),)
    swap = (0, 1)

    def infer(x):
        # x: (N, H, W, 3) -> heat (N, H/8, W/8, 2), paf (N, H/8, W/8, 2)
        n, h, w, _ = x.shape
        pooled = x[:, : h // 8 * 8, : w // 8 * 8].reshape(
            n, h // 8, 8, w // 8, 8, 3
        ).mean(axis=(2, 4))
        heat = pooled[..., :2]
        paf = pooled[..., 1:3]
        return paf, heat

    rng = np.random.default_rng(4)
    img = _img(rng, 70, 100)
    paf, heat, scale = pp.rgb_infer(infer, img, mode="rtpose", dest_size=48,
                                    factor=8)
    assert paf.ndim == 3 and heat.ndim == 3
    assert heat.shape[:2] == paf.shape[:2]
    assert scale == 48.0 / 70.0

    # symmetric image at scale 1 with stride-aligned sides (no resize, no
    # pad, width a multiple of 8) -> flip-averaged maps equal the plain maps
    half = _img(rng, 48, 48)
    sym = np.concatenate([half, half[:, ::-1]], axis=1)
    p0, h0, _ = pp.rgb_infer(infer, sym, mode="rtpose", dest_size=48, factor=8)
    p1, h1, _ = pp.rgb_infer(infer, sym, mode="rtpose", dest_size=48, factor=8,
                             flip=True, limbs=limbs, swap_indices=swap)
    np.testing.assert_allclose(h0, h1, atol=1e-5)
