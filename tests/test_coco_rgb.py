"""COCO RGB path: RTPoseVGG model + generic decode with COCO tables."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig
from popnet_tpu.core.skeleton_coco import COCO_LIMBS, COCO_NUM_JOINTS
from popnet_tpu.decode import paf_np
from popnet_tpu.models.rtpose_vgg import RTPoseVGG
from popnet_tpu.ops import encoders


def test_rtpose_vgg_shapes_and_params():
    model = RTPoseVGG()
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    (paf, heat), saved = model.apply(v, x, train=False)
    assert paf.shape == (1, 8, 8, 38)
    assert heat.shape == (1, 8, 8, 19)
    assert len(saved) == 12
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    # the published rtpose VGG19 model is ~52.3 M params
    assert 51_000_000 < n < 54_000_000


@pytest.mark.reference
def test_rtpose_vgg_param_parity():
    torch = pytest.importorskip("torch")
    from tests.reference_shim import load_cr_module

    ref = load_cr_module("ref_rtpose_vgg", "third_party_methods/lib/network/rtpose_vgg.py")
    ref_model = ref.get_model(trunk="vgg19")
    ref_n = sum(p.numel() for p in ref_model.parameters())
    model = RTPoseVGG()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    assert sum(p.size for p in jax.tree.leaves(v["params"])) == ref_n


def test_coco_decode_roundtrip():
    """Generic PAF decode with the COCO-18 tables recovers encoded people."""
    cfg = EncoderConfig(num_joints=COCO_NUM_JOINTS, num_limbs=len(COCO_LIMBS))
    rng = np.random.default_rng(0)
    j2 = np.full((cfg.max_people, COCO_NUM_JOINTS, 2), -1e6, dtype=np.float32)
    valid = np.zeros(cfg.max_people, bool)
    for p, c in enumerate([(70, 70), (160, 160)]):
        j2[p] = np.clip(np.array(c) + rng.normal(0, 20, (COCO_NUM_JOINTS, 2)), 8, 215)
        valid[p] = True
    heat = np.asarray(encoders.encode_heatmaps(jnp.asarray(j2), jnp.asarray(valid), cfg))
    paf = np.asarray(
        encoders.encode_pafs(jnp.asarray(j2), jnp.asarray(valid), cfg, limbs=COCO_LIMBS)
    )
    assert heat.shape == (28, 28, 19) and paf.shape == (28, 28, 38)
    joint_list, people = paf_np.paf_to_pose(
        heat.astype(np.float64), paf.astype(np.float64),
        num_joints=COCO_NUM_JOINTS, limbs=COCO_LIMBS,
    )
    assert len(people) == 2


def test_remove_illegal_joints_and_valid_area():
    """Reference loader hygiene: OOB joints -> (-1,-1) hole; padded image
    area zeroed (datasets_coco.py:221-229, utils.py:36-47)."""
    import numpy as np

    from popnet_tpu.data.coco import mask_valid_area, remove_illegal_joints

    j = np.array([[[5.0, 5.0], [-1.0, 10.0], [400.0, 10.0], [10.0, 999.0]]])
    out = remove_illegal_joints(j, 368, 368)
    np.testing.assert_array_equal(out[0, 0], [5, 5])
    for k in (1, 2, 3):
        np.testing.assert_array_equal(out[0, k], [-1, -1])

    img = np.ones((8, 8, 3))
    m = mask_valid_area(img, (2.0, 3.0))
    assert m[:3].sum() == 0 and m[:, :2].sum() == 0
    assert m[3:, 2:].sum() == 5 * 6 * 3
    # None valid area is a no-op
    np.testing.assert_array_equal(mask_valid_area(img, None), img)


def test_paf_decode_2d_matches_host_coco():
    """The jitted skeleton-generic 2D decode with the COCO-18 tables equals
    the exact host path (paf_to_pose + paf_to_human_list) — the device twin
    of the reference's coco_eval.py:243-281 decode."""
    from popnet_tpu.core.config import DecodeConfig
    from popnet_tpu.decode.human_list import paf_to_human_list
    from popnet_tpu.decode.openpose_infer import paf_decode_2d

    cfg = EncoderConfig(num_joints=COCO_NUM_JOINTS, num_limbs=len(COCO_LIMBS))
    rng = np.random.default_rng(5)
    B = 2
    heats, pafs = [], []
    for b in range(B):
        j2 = np.full((cfg.max_people, COCO_NUM_JOINTS, 2), -1e6, np.float32)
        valid = np.zeros(cfg.max_people, bool)
        for p in range(2 + b):
            j2[p] = np.clip(
                rng.uniform(60, 164, 2) + rng.normal(0, 18, (COCO_NUM_JOINTS, 2)),
                8, 215,
            )
            valid[p] = True
        h = np.asarray(
            encoders.encode_heatmaps(jnp.asarray(j2), jnp.asarray(valid), cfg)
        )
        f = np.asarray(
            encoders.encode_pafs(jnp.asarray(j2), jnp.asarray(valid), cfg,
                                 limbs=COCO_LIMBS)
        )
        heats.append(h + rng.normal(0, 0.005, h.shape))
        pafs.append(f + rng.normal(0, 0.005, f.shape))
    heat = np.stack(heats).astype(np.float32)
    paf = np.stack(pafs).astype(np.float32)

    out = paf_decode_2d(jnp.asarray(heat), jnp.asarray(paf), COCO_NUM_JOINTS,
                        DecodeConfig(), COCO_LIMBS)
    j2d = np.asarray(out["joints2d"])
    counts = np.asarray(out["counts"])
    for b in range(B):
        jl, people = paf_np.paf_to_pose(
            heat[b].astype(np.float64), paf[b].astype(np.float64),
            num_joints=COCO_NUM_JOINTS, limbs=COCO_LIMBS,
        )
        host_h, _, _ = paf_to_human_list(jl, people)
        n = int(counts[b])
        assert n == len(host_h) and n >= 2
        dev = sorted(tuple(np.round(j2d[b, p].ravel(), 2)) for p in range(n))
        host = sorted(tuple(np.round(np.array(h).ravel(), 2)) for h in host_h)
        assert dev == host


def test_rtpose_vgg_pipeline_plumbing():
    """The RGB serving builder runs e2e: frames in, packed 2D humans out."""
    from popnet_tpu.core.config import DecodeConfig
    from popnet_tpu.serving import build_rtpose_vgg_pipeline, unpack_outputs_2d

    pipe = build_rtpose_vgg_pipeline(dtype=jnp.float32, input_size=96)
    frames = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (2, 120, 160, 3)).astype(np.float32)
    )
    buf = np.asarray(pipe(frames))
    P = DecodeConfig().max_people
    out = unpack_outputs_2d(buf, P, COCO_NUM_JOINTS)
    assert out["joints2d"].shape == (2, P, COCO_NUM_JOINTS, 2)
    assert out["conf"].shape == (2, P, COCO_NUM_JOINTS)
    assert np.isfinite(buf).all()
