"""Golden tests: vectorized JAX GT encoders vs the reference's Python loops."""

import numpy as np
import pytest

from tests.reference_shim import load_cr_module

import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig, KDH3D_DEPTH
from popnet_tpu.ops import encoders

ref_ds = load_cr_module("ref_datasets_kdh3d", "third_party_methods/lib/datasets/datasets_kdh3d.py")

CFG = EncoderConfig()


def make_ref_dataset():
    obj = object.__new__(ref_ds.KDH3D_Keypoints)
    obj.joint_names = ref_ds.get_keypoints()
    obj.limb_ids = ref_ds.kp_connections(obj.joint_names)
    obj.num_joints = CFG.num_joints
    obj.input_x, obj.input_y = CFG.input_x, CFG.input_y
    obj.stride, obj.strideZ, obj.strideA = CFG.stride, CFG.stride_z, CFG.stride_align
    obj.stride_prior = CFG.stride_prior
    obj.anchors = np.array(CFG.anchors)
    obj.pose_align = True
    obj.z_radius = CFG.z_radius
    obj.align_radius = CFG.align_radius
    return obj


def random_annotations(rng, n_people, oob_frac=0.0):
    anns = []
    for _ in range(n_people):
        center = rng.uniform(30, 194, size=2)
        j2 = center + rng.normal(0, 35, size=(15, 2))
        if oob_frac > 0:
            # push some joints out of the image
            mask = rng.uniform(size=15) < oob_frac
            j2[mask] += rng.choice([-300.0, 300.0], size=(mask.sum(), 2))
        z = rng.uniform(1.0, 5.8, size=15)
        j3 = np.stack([(j2[:, 0] - 112) / 504 * z, (j2[:, 1] - 112) / 504 * z, z], 1)
        anns.append(
            {
                "2d_joints": j2,
                "3d_joints": j3,
                "bbox": np.array(
                    [j2[:, 0].min() - 10, j2[:, 1].min() - 10, j2[:, 0].max() + 10, j2[:, 1].max() + 10]
                ),
                "pose_weight": float(rng.uniform(0.5, 2.0)),
            }
        )
    return anns


def pack_annotations(anns, max_people=CFG.max_people):
    P = max_people
    j2 = np.full((P, 15, 2), -1e6, dtype=np.float32)
    j3 = np.zeros((P, 15, 3), dtype=np.float32)
    bb = np.zeros((P, 4), dtype=np.float32)
    w = np.ones(P, dtype=np.float32)
    valid = np.zeros(P, dtype=bool)
    for i, ann in enumerate(anns):
        j2[i] = ann["2d_joints"]
        j3[i] = ann["3d_joints"]
        bb[i] = ann["bbox"]
        w[i] = ann["pose_weight"]
        valid[i] = True
    return j2, j3, bb, w, valid


@pytest.mark.reference
@pytest.mark.parametrize("seed,n_people,oob", [(0, 1, 0.0), (1, 2, 0.0), (2, 3, 0.3), (3, 4, 0.15), (4, 2, 0.5)])
def test_encode_targets_golden(seed, n_people, oob):
    rng = np.random.default_rng(seed)
    obj = make_ref_dataset()
    anns = random_annotations(rng, n_people, oob)
    depth_resize = rng.uniform(0, 6, (CFG.zgrid_h, CFG.zgrid_w))

    # reference oracle (deep-copy anns: build_prior_targets mutates in place)
    import copy

    ref_out = obj.get_ground_truth(copy.deepcopy(anns), depth_resize)
    (
        r_heat, r_paf, r_z, r_zfg, r_align, r_alignfg,
        r_prior, r_mconf, r_mcoord, r_wmap,
    ) = ref_out

    j2, j3, bb, w, valid = pack_annotations(anns)
    out = encoders.encode_targets(
        jnp.asarray(j2), jnp.asarray(j3), jnp.asarray(bb), jnp.asarray(w),
        jnp.asarray(valid), jnp.asarray(depth_resize, dtype=jnp.float32),
        CFG, KDH3D_DEPTH, pose_align=True, with_prior=True,
    )

    np.testing.assert_allclose(out["heatmaps"], r_heat, atol=2e-6)
    np.testing.assert_allclose(out["pafs"], r_paf, atol=2e-6)
    np.testing.assert_allclose(out["zmaps"], r_z, atol=2e-6)
    np.testing.assert_allclose(out["fg_masks_z"], r_zfg, atol=0)
    np.testing.assert_allclose(out["align_maps"], r_align, atol=2e-6)
    np.testing.assert_allclose(out["fg_masks_align"], r_alignfg, atol=0)
    np.testing.assert_allclose(out["prior_map"], r_prior, atol=2e-5)
    np.testing.assert_allclose(out["prior_mask_conf"], r_mconf, atol=0)
    np.testing.assert_allclose(out["prior_mask_coord"], r_mcoord, atol=0)
    np.testing.assert_allclose(out["prior_weight_map"], r_wmap, atol=2e-6)


@pytest.mark.reference
def test_zero_length_limb():
    """A degenerate limb (coincident joints) must be skipped like the reference."""
    rng = np.random.default_rng(7)
    obj = make_ref_dataset()
    anns = random_annotations(rng, 1)
    # make torso == right_hip (limb 0 endpoints, after /stride they coincide)
    anns[0]["2d_joints"][9] = anns[0]["2d_joints"][8]
    depth_resize = rng.uniform(0, 6, (28, 28))
    import copy

    ref_out = obj.get_ground_truth(copy.deepcopy(anns), depth_resize)
    j2, j3, bb, w, valid = pack_annotations(anns)
    out = encoders.encode_targets(
        jnp.asarray(j2), jnp.asarray(j3), jnp.asarray(bb), jnp.asarray(w),
        jnp.asarray(valid), jnp.asarray(depth_resize, dtype=jnp.float32),
        CFG, KDH3D_DEPTH,
    )
    np.testing.assert_allclose(out["pafs"], ref_out[1], atol=2e-6)


@pytest.mark.reference
@pytest.mark.parametrize("seed,n_people", [(10, 2), (11, 3)])
def test_encode_targets_pred_vis_golden(seed, n_people):
    """mp-aug variant: prior targets with inferred per-joint visibility."""
    ref_mp = load_cr_module(
        "ref_datasets_kdh3d_mpaug", "third_party_methods/lib/datasets/datasets_kdh3d_mpaug.py"
    )
    rng = np.random.default_rng(seed)
    obj = object.__new__(ref_mp.KDH3D_Keypoints)
    obj.joint_names = ref_mp.get_keypoints()
    obj.limb_ids = ref_mp.kp_connections(obj.joint_names)
    obj.num_joints = CFG.num_joints
    obj.input_x, obj.input_y = CFG.input_x, CFG.input_y
    obj.stride, obj.strideZ, obj.strideA = CFG.stride, CFG.stride_z, CFG.stride_align
    obj.stride_prior = CFG.stride_prior
    obj.anchors = np.array(CFG.anchors)
    obj.pose_align = True
    obj.z_radius = CFG.z_radius
    obj.align_radius = CFG.align_radius
    obj.pred_vis = True
    obj.depth_thresh = 0.03

    anns = random_annotations(rng, n_people, oob_frac=0.2)
    depth_resize = rng.uniform(0, 6, (CFG.zgrid_h, CFG.zgrid_w))
    import copy

    ref_out = obj.get_ground_truth(copy.deepcopy(anns), depth_resize)

    j2, j3, bb, w, valid = pack_annotations(anns)
    out = encoders.encode_targets(
        jnp.asarray(j2), jnp.asarray(j3), jnp.asarray(bb), jnp.asarray(w),
        jnp.asarray(valid), jnp.asarray(depth_resize, dtype=jnp.float32),
        CFG, KDH3D_DEPTH, pose_align=True, with_prior=True, pred_vis=True,
    )
    np.testing.assert_allclose(out["zmaps"], ref_out[2], atol=2e-6)
    np.testing.assert_allclose(out["prior_map"], ref_out[6], atol=2e-5)
    np.testing.assert_allclose(out["prior_mask_conf"], ref_out[7], atol=0)
    np.testing.assert_allclose(out["prior_mask_coord"], ref_out[8], atol=0)
