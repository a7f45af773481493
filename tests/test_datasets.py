"""Dataset pipeline tests on synthetic on-disk data."""

import numpy as np
import pytest

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.data.datasets import KDH3DDataset, KDH3DMPAugDataset, MPRealDataset

from tests import synthetic_data

CFG = EncoderConfig(max_people=6)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("kdh3d")
    return synthetic_data.build(str(root))


def test_bgaug_dataset_batch(data):
    ds = KDH3DDataset(
        data["img_dir"], data["labels"], bg_aug=True, bg_file=data["labels_bg"],
        bg_dir=data["bg_dir"], seg_dir=data["seg_dir"], ecfg=CFG, seed=1,
    )
    batch = ds.get_batch([0, 1])
    assert batch["image"].shape == (2, 224, 224, 1)
    assert batch["heatmaps"].shape == (2, 28, 28, 16)
    assert batch["prior_map"].shape == (2, 14, 14, 100)
    img = np.asarray(batch["image"])
    assert np.isfinite(img).all()
    # normalized depth stays in the clip range
    assert img.min() >= -1.5 - 1e-5 and img.max() <= 1.5 + 1e-5
    # heatmap peaks must sit where the (augmented) GT says: decoded peak of
    # joint 0 matches a high heat cell
    heat = np.asarray(batch["heatmaps"])[0, :, :, :15]
    assert heat.max() > 0.9


def test_heatmap_aligns_with_warped_person(data):
    """The augmented image's person pixels and the heatmap fg must overlap."""
    ds = KDH3DDataset(
        data["img_dir"], data["labels"], bg_aug=False, ecfg=CFG, seed=3,
    )
    batch = ds.get_batch([2])
    img = np.asarray(batch["image"])[0, :, :, 0]
    heat = np.asarray(batch["heatmaps"])[0, :, :, :15].max(-1)
    ys, xs = np.where(heat > 0.7)
    # at heatmap peaks (stride 8), the warped depth must be a person (not 0
    # background = normalized -1.5)
    vals = img[np.clip(ys * 8 + 4, 0, 223), np.clip(xs * 8 + 4, 0, 223)]
    assert np.mean(vals > -1.49) > 0.55


def test_mpaug_dataset_batch(data):
    ds = KDH3DMPAugDataset(
        data["img_dir"], data["labels_locs"], bg_file=data["labels_bg"],
        bg_dir=data["bg_dir"], seg_dir=data["seg_dir"], ecfg=CFG,
        pred_vis=True, seed=2,
    )
    batch = ds.get_batch([0, 1, 2])
    assert batch["image"].shape == (3, 224, 224, 1)
    # pred_vis prior has 5 + 4K channels per anchor
    assert batch["prior_map"].shape == (3, 14, 14, 2 * (5 + 60))
    assert np.isfinite(np.asarray(batch["image"])).all()


def test_mpreal_dataset_eval_mode(data):
    ds = MPRealDataset(data["img_dir"], data["labels"], ecfg=CFG)
    batch = ds.get_batch([0, 1])
    assert set(batch.keys()) == {"image", "index"}
    gt2d, gt3d = ds.gt_human_lists()
    assert len(gt2d) == len(ds)
    assert np.asarray(gt2d[0][0]).shape == (15, 2)


def test_mpaug_adv_dataset_batch(data):
    from popnet_tpu.data.datasets import KDH3DMPAugAdvDataset

    ds = KDH3DMPAugAdvDataset(
        data["img_dir"], data["labels_locs"], bg_file=data["labels_bg"],
        bg_dir=data["bg_dir"], seg_dir=data["seg_dir"], ecfg=CFG, seed=4,
    )
    batch = ds.get_batch([0, 1])
    assert batch["image"].shape == (2, 224, 224, 1)
    assert batch["heatmaps"].shape == (2, 28, 28, 16)
    img = np.asarray(batch["image"])
    assert np.isfinite(img).all()
    # per-person-augmented composite still yields fg heat + coherent image
    heat = np.asarray(batch["heatmaps"])[:, :, :, :15].max((1, 2, 3))
    assert (heat > 0.9).all()


def test_roi_dataset_batch(data):
    from popnet_tpu.data.datasets import ROIDataset

    ds = ROIDataset(data["img_dir"], data["labels"], ecfg=CFG, seed=5)
    batch = ds.get_batch([0, 1])
    assert batch["image"].shape == (2, 224, 224, 1)
    assert "prior_map" not in batch  # ROI variant trains dense heads only
    heat = np.asarray(batch["heatmaps"])[:, :, :, :15]
    assert (heat.max((1, 2, 3)) > 0.9).all()
    # the crop centers the chosen person: fg heat should cover a wide area
    assert (heat.max(-1) > 0.5).mean() > 0.02


def test_dataset_determinism(data):
    """Same seed -> identical augmented batches and targets."""
    def batch(seed):
        ds = KDH3DDataset(
            data["img_dir"], data["labels"], bg_aug=True, bg_file=data["labels_bg"],
            bg_dir=data["bg_dir"], seg_dir=data["seg_dir"], ecfg=CFG, seed=seed,
        )
        return ds.get_batch([0, 1, 2])

    b1, b2 = batch(123), batch(123)
    for k in b1:
        np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))
    b3 = batch(321)
    assert not np.allclose(np.asarray(b1["image"]), np.asarray(b3["image"]))


def test_transfer_u16mm_matches_f32(data):
    """The packed uint16-millimeter transfer (PARITY.md input pipeline) must
    match the f32 path to within the 0.5 mm quantization everywhere; labels
    and encoded targets built from them stay essentially identical."""
    kw = dict(ecfg=CFG, seed=7, augment=False)
    a = KDH3DDataset(data["img_dir"], data["labels"], transfer="f32", **kw)
    b = KDH3DDataset(data["img_dir"], data["labels"], transfer="u16mm", **kw)
    ba = a.get_batch([0, 1])
    bb = b.get_batch([0, 1])
    assert set(ba) == set(bb)
    # image: 0.5 mm quantization / depth_std(2 m) = 2.5e-4 in normalized units
    np.testing.assert_allclose(
        np.asarray(ba["image"]), np.asarray(bb["image"]), atol=3e-4
    )
    # label-derived targets are bit-identical (meta path is exact f32)
    np.testing.assert_array_equal(
        np.asarray(ba["prior_mask_coord"]), np.asarray(bb["prior_mask_coord"])
    )
    np.testing.assert_allclose(
        np.asarray(ba["heatmaps"]), np.asarray(bb["heatmaps"]), atol=1e-6
    )


def test_transfer_rejects_unknown(data):
    with pytest.raises(ValueError):
        KDH3DDataset(data["img_dir"], data["labels"], transfer="fp8")


def test_device_bank_matches_host_mpaug(data):
    """DeviceMPAugDataset (HBM-resident bank, on-device composite) must
    reproduce KDH3DMPAugDataset's batches: identical rng consumption ->
    identical scene/aug draws -> bit-equal labels; images/z differ only by
    the u16-mm quantization point (layers-then-composite vs
    composite-then-quantize commute except sub-mm z-buffer ties)."""
    from popnet_tpu.data.datasets import DeviceMPAugDataset

    kw = dict(bg_file=data["labels_bg"], bg_dir=data["bg_dir"],
              seg_dir=data["seg_dir"], ecfg=CFG, seed=7, transfer="u16mm")
    host = KDH3DMPAugDataset(data["img_dir"], data["labels_locs"], **kw)
    dev = DeviceMPAugDataset(data["img_dir"], data["labels_locs"], **kw)

    hb = host.get_batch([0, 1, 2, 3])
    db = dev.get_batch([0, 1, 2, 3])
    assert set(hb.keys()) == set(db.keys())
    for k in hb:
        a, b = np.asarray(hb[k]), np.asarray(db[k])
        assert a.shape == b.shape, k
        if k in ("image", "zmaps"):
            np.testing.assert_allclose(a, b, atol=2e-3, err_msg=k)
        else:
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=k)
    # rng streams stayed in lockstep
    assert host.rng.integers(0, 1 << 30) == dev.rng.integers(0, 1 << 30)
