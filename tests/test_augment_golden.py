"""Golden tests: host augmentation pipeline vs reference data_augmentation_2d3d."""

import numpy as np
import pytest

from tests.reference_shim import load_cr_module

from popnet_tpu.core.skeleton import SWAP_INDICES
from popnet_tpu.data import augment_host as ah

ref_aug = load_cr_module(
    "ref_aug2d3d", "third_party_methods/lib/datasets/data_augmentation_2d3d.py"
)


def scene(seed, n=2, h=512, w=480):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 6, (h, w)).astype(np.float32)
    anns = []
    for _ in range(n):
        j2 = rng.uniform(20, min(h, w) - 20, (15, 2)).astype(np.float32)
        z = rng.uniform(1, 5, 15)
        j3 = np.stack([(j2[:, 0] - 232) / 504 * z, (j2[:, 1] - 320) / 504 * z, z], 1).astype(np.float32)
        anns.append({
            "2d_joints": j2.copy(),
            "3d_joints": j3.copy(),
            "bbox": np.array([j2[:, 0].min(), j2[:, 1].min(), j2[:, 0].max(), j2[:, 1].max()]),
        })
    return img, anns


def patch_uniform(mod, values):
    it = iter(values)
    mod.uniform = lambda a, b: a + (b - a) * next(it)


def assert_labels_equal(ours, theirs):
    assert len(ours) == len(theirs)
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(o["2d_joints"], t["2d_joints"], atol=1e-4)
        np.testing.assert_allclose(o["3d_joints"], t["3d_joints"], atol=1e-4)
        if "bbox" in o and "bbox" in t:
            np.testing.assert_allclose(o["bbox"], t["bbox"], atol=1e-4)


@pytest.mark.reference
@pytest.mark.parametrize("seed,fracs", [(0, (0.3, 0.7, 0.5, 0.9)), (1, (0.0, 0.99, 0.2, 0.4))])
def test_crop_golden(seed, fracs):
    img, anns = scene(seed)
    patch_uniform(ref_aug, fracs)
    ref_img, ref_lab = ref_aug.Crop(0.1)((img.copy(), [dict(a) for a in anns]))
    our_img, our_lab = ah.Crop.apply(
        img.copy(), anns, 0.1 * fracs[0], 0.1 * fracs[1], 0.1 * fracs[2], 0.1 * fracs[3]
    )
    np.testing.assert_array_equal(our_img, ref_img)
    assert_labels_equal(our_lab, ref_lab)


@pytest.mark.reference
@pytest.mark.parametrize("seed,frac", [(0, 0.0), (1, 0.37), (2, 0.8), (3, 1.0)])
def test_render_depth_golden(seed, frac):
    img, anns = scene(seed)
    patch_uniform(ref_aug, [frac])
    a = 0.7 + (1.2 - 0.7) * frac
    ref_img, ref_lab = ref_aug.RenderDepth(min_ratio=0.7, max_ratio=1.2)(
        (img.copy(), [dict(x) for x in anns])
    )
    our_img, our_lab = ah.RenderDepth.apply(img.copy(), anns, a)
    np.testing.assert_allclose(our_img, ref_img, atol=1e-5)
    assert_labels_equal(our_lab, ref_lab)


@pytest.mark.reference
@pytest.mark.parametrize("rot", [-10.0, -3.3, 0.0, 7.9])
def test_rotate_golden(rot):
    img, anns = scene(4)
    frac = (rot + 10) / 20
    patch_uniform(ref_aug, [frac])
    ref_img, ref_lab = ref_aug.Rotate(is_3d=True)((img.copy(), [dict(x) for x in anns]))
    our_img, our_lab = ah.Rotate.apply(img.copy(), anns, rot, is_3d=True)
    np.testing.assert_allclose(our_img, ref_img, atol=1e-5)
    assert_labels_equal(our_lab, ref_lab)


@pytest.mark.reference
def test_hflip_golden():
    img, anns = scene(5)
    patch_uniform(ref_aug, [0.9])  # >= 0.5 -> flip happens
    ref_img, ref_lab = ref_aug.Hflip(list(SWAP_INDICES), is_3d=True)(
        (img.copy(), [dict(x) for x in anns])
    )
    our_img, our_lab = ah.Hflip.apply(img.copy(), anns, list(SWAP_INDICES), is_3d=True)
    np.testing.assert_array_equal(our_img, ref_img)
    assert_labels_equal(our_lab, ref_lab)


@pytest.mark.reference
def test_resize_golden():
    img, anns = scene(6)
    ref_img, ref_lab = ref_aug.Resize(224)((img.copy(), [dict(x) for x in anns]))
    our_img, our_lab = ah.Resize(224)((img.copy(), anns))
    np.testing.assert_allclose(our_img, ref_img, atol=1e-6)
    assert_labels_equal(our_lab, ref_lab)


@pytest.mark.reference
def test_full_pipeline_golden():
    """Cvt2ndarray -> Rotate -> RenderDepth -> Crop -> Resize, the
    train_rtpose_light3d_kdh3d recipe, with pinned randomness."""
    img, anns = scene(7)
    fr = [0.42, 0.8, 0.1, 0.55, 0.3, 0.66]
    patch_uniform(ref_aug, fr)
    ref_pipe = ref_aug.Compose([
        ref_aug.Cvt2ndarray(15),
        ref_aug.Rotate(is_3d=True),
        ref_aug.RenderDepth(min_ratio=0.7, max_ratio=1.2),
        ref_aug.Crop(0.1),
        ref_aug.Resize(224),
    ])
    ref_img, ref_lab = ref_pipe((img.copy(), [dict(x) for x in anns]))

    o_img, o_lab = ah.Cvt2ndarray(15)((img.copy(), anns))
    o_img, o_lab = ah.Rotate.apply(o_img, o_lab, -10 + 20 * fr[0], is_3d=True)
    o_img, o_lab = ah.RenderDepth.apply(o_img, o_lab, 0.7 + 0.5 * fr[1])
    o_img, o_lab = ah.Crop.apply(o_img, o_lab, 0.1 * fr[2], 0.1 * fr[3], 0.1 * fr[4], 0.1 * fr[5])
    o_img, o_lab = ah.Resize(224)((o_img, o_lab))
    np.testing.assert_allclose(o_img, ref_img, atol=1e-5)
    assert_labels_equal(o_lab, ref_lab)


@pytest.mark.reference
def test_crop_pose_roi_golden():
    img, anns = scene(9)
    anns = [dict(a, **{"2d_joints": np.asarray(a["2d_joints"], np.float32),
                       "bbox": np.asarray(a["bbox"], np.float64)}) for a in anns]
    np.random.seed(3)
    rnd = np.random.randint(len(anns), size=1)[0]
    np.random.seed(3)
    ref_img, ref_lab = ref_aug.CropPoseRoi(20)(
        (img.copy(), [{k: (v.copy() if hasattr(v, "copy") else v) for k, v in a.items()} for a in anns])
    )
    our_img, our_lab = ah.CropPoseRoi.apply(img.copy(), anns, rnd, 20)
    np.testing.assert_array_equal(our_img, ref_img)
    assert_labels_equal(our_lab, ref_lab)


@pytest.mark.reference
def test_crop_pose_roi_v2_golden():
    img, anns = scene(10)
    anns = [dict(a, **{"2d_joints": np.asarray(a["2d_joints"], np.float32),
                       "bbox": np.asarray(a["bbox"], np.float64)}) for a in anns]
    np.random.seed(7)
    rnd = np.random.randint(len(anns), size=1)[0]
    np.random.seed(7)
    ref_img, ref_lab = ref_aug.CropPoseRoiV2(2.0, 1.5)(
        (img.copy(), [{k: (v.copy() if hasattr(v, "copy") else v) for k, v in a.items()} for a in anns])
    )
    our_img, our_lab = ah.CropPoseRoiV2.apply(img.copy(), anns, rnd, 2.0, 1.5)
    np.testing.assert_array_equal(our_img, ref_img)
    assert_labels_equal(our_lab, ref_lab)


@pytest.mark.reference
def test_rgb_transforms_golden():
    rng = np.random.default_rng(11)
    img = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
    anns = [{"2d_joints": rng.uniform(10, 230, (15, 2)).astype(np.float32),
             "3d_joints": np.zeros((15, 3), np.float32),
             "bbox": np.array([10.0, 10.0, 200.0, 200.0])}]

    patch_uniform(ref_aug, [0.35])
    a = 0.7 + (1.3 - 0.7) * 0.35
    ref_img, ref_lab = ref_aug.RandomSacleRGB()((img.copy(), [dict(x) for x in anns]))
    our_img, our_lab = ah.RandomScaleRGB.apply(img.copy(), anns, a)
    np.testing.assert_allclose(our_img, ref_img, atol=1e-6)
    assert_labels_equal(our_lab, ref_lab)

    ref_img, ref_lab = ref_aug.SquarePadRGB()((img.copy(), [dict(x) for x in anns]))
    our_img, our_lab = ah.SquarePadRGB()((img.copy(), anns))
    np.testing.assert_array_equal(our_img, ref_img)
    assert_labels_equal(our_lab, ref_lab)
