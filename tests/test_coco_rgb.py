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
