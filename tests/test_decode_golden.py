"""Golden tests: decode layer vs the reference post-processing."""

import types

import numpy as np
import pytest

from tests.reference_shim import load_cr_module

import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig, KDH3D_DEPTH
from popnet_tpu.ops import encoders
from popnet_tpu.decode import paf_np, peaks_np, prior
from popnet_tpu.decode.human_list import paf_to_human_list

CFG = EncoderConfig()


def synth_maps(seed, n_people):
    """Realistic dense maps: GT-encoded scenes + mild noise."""
    rng = np.random.default_rng(seed)
    j2 = np.full((CFG.max_people, 15, 2), -1e6, dtype=np.float32)
    valid = np.zeros(CFG.max_people, dtype=bool)
    for p in range(n_people):
        center = rng.uniform(50, 174, size=2)
        j2[p] = center + rng.normal(0, 28, size=(15, 2))
        valid[p] = True
    heat = np.asarray(encoders.encode_heatmaps(jnp.asarray(j2), jnp.asarray(valid), CFG))
    paf = np.asarray(encoders.encode_pafs(jnp.asarray(j2), jnp.asarray(valid), CFG))
    heat = heat + rng.normal(0, 0.01, heat.shape)
    paf = paf + rng.normal(0, 0.01, paf.shape)
    return heat.astype(np.float64), paf.astype(np.float64)


def ref_config():
    cfg = types.SimpleNamespace()
    cfg.MODEL = types.SimpleNamespace(NUM_KEYPOINTS=15, DOWNSAMPLE=8)
    cfg.TEST = types.SimpleNamespace(
        THRESH_HEATMAP=0.1, THRESH_PAF=0.05, NUM_INTERMED_PTS_BETWEEN_KEYPOINTS=10
    )
    return cfg


@pytest.mark.reference
@pytest.mark.parametrize("seed,n_people", [(0, 1), (1, 2), (2, 3), (3, 4)])
def test_paf_to_pose_golden(seed, n_people):
    ref_mod = load_cr_module("ref_paf2pose", "third_party_methods/lib/utils/paf_to_pose.py")
    heat, paf = synth_maps(seed, n_people)

    ref_joints, ref_people = ref_mod.paf_to_pose(heat.copy(), paf.copy(), ref_config())
    our_joints, our_people = paf_np.paf_to_pose(heat.copy(), paf.copy())

    assert ref_joints.shape == our_joints.shape
    np.testing.assert_allclose(our_joints, ref_joints, atol=1e-5)
    assert ref_people.shape == our_people.shape
    np.testing.assert_allclose(our_people, ref_people, atol=1e-5)

    # human-list unfolding parity
    ref_common = load_cr_module("ref_common", "third_party_methods/lib/utils/common.py")
    if len(ref_people):
        rh, rv, rc = ref_common.paf_to_human_list(ref_joints, ref_people)
        oh, ov, oc = paf_to_human_list(our_joints, our_people)
        np.testing.assert_allclose(np.array(oh, dtype=float), np.array(rh, dtype=float), atol=1e-5)
        assert ov == rv
        np.testing.assert_allclose(np.array(oc, dtype=float), np.array(rc, dtype=float), atol=1e-5)


@pytest.mark.reference
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parse_prior_pose_golden(seed):
    torch = pytest.importorskip("torch")
    ref_mod = load_cr_module("ref_prior", "third_party_methods/lib/utils/prior_pose_align.py")

    rng = np.random.default_rng(seed)
    B, H, W, A, K = 2, 14, 14, 2, 15
    naf = 5 + 3 * K
    # plausible network outputs in the cast ranges
    raw = np.zeros((B, H, W, A, naf), dtype=np.float32)
    raw[..., 0:2] = rng.uniform(-1, 1, (B, H, W, A, 2))
    raw[..., 2:4] = rng.uniform(0.3, 2, (B, H, W, A, 2))
    raw[..., 4] = rng.uniform(0, 1, (B, H, W, A)) ** 6  # sparse confident cells
    raw[..., 5:] = rng.uniform(-2, 2, (B, H, W, A, 3 * K))

    anchors = np.array(CFG.anchors, dtype=np.float32)
    ours_prior = raw.reshape(B, H, W, A * naf)
    # reference expects NCHW with channels (A, naf)
    ref_in = torch.from_numpy(
        np.transpose(raw.reshape(B, H, W, A * naf), (0, 3, 1, 2)).copy()
    )
    ref_boxes, ref_humans, ref_vis = ref_mod.parse_prior_pose(
        ref_in, anchors.tolist(), K, 480, 512, KDH3D_DEPTH.mean, KDH3D_DEPTH.std,
        conf_threshold=0.5, nms_threshold=0.5,
    )
    our_boxes, our_humans, our_vis = prior.parse_prior_pose(
        ours_prior, anchors, K, 480, 512, KDH3D_DEPTH,
        conf_threshold=0.5, nms_threshold=0.5, max_det=H * W * A,
    )

    assert len(ref_boxes) == len(our_boxes)
    for b in range(B):
        assert len(ref_boxes[b]) == len(our_boxes[b]), f"image {b}"
        for rb, ob in zip(ref_boxes[b], our_boxes[b]):
            np.testing.assert_allclose(ob, rb, atol=1e-3)
        for rh, oh in zip(ref_humans[b], our_humans[b]):
            np.testing.assert_allclose(oh, np.asarray(rh), atol=2e-3)
        for rv, ov in zip(ref_vis[b], our_vis[b]):
            np.testing.assert_array_equal(ov, np.asarray(rv))
