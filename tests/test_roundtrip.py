"""Encoder/decoder round-trips: GT maps decoded back must score ~perfect.

This mirrors the single most test-like artifact in the reference — the
mp-aug dataset's self-check that round-trips prior targets through
parse_prior_pose (reference: datasets_kdh3d.py:639-646) — and extends it to
the full Open-Pose+ path (heatmap/PAF/z decode + eval metrics).
"""

import numpy as np

import jax.numpy as jnp

from popnet_tpu.core.config import EncoderConfig, KDH3D_DEPTH
from popnet_tpu.decode import paf_np, prior, readout
from popnet_tpu.decode.human_list import paf_to_human_list
from popnet_tpu.eval import pck
from popnet_tpu.ops import encoders

CFG = EncoderConfig()


def scene(seed, n_people, spread=180):
    """Well-separated people so decoding is unambiguous."""
    rng = np.random.default_rng(seed)
    j2 = np.full((CFG.max_people, 15, 2), -1e6, dtype=np.float32)
    j3 = np.zeros((CFG.max_people, 15, 3), dtype=np.float32)
    bb = np.zeros((CFG.max_people, 4), dtype=np.float32)
    valid = np.zeros(CFG.max_people, dtype=bool)
    centers = [(60, 60), (170, 60), (60, 170), (170, 170)]
    for p in range(n_people):
        c = np.array(centers[p], dtype=np.float64)
        pts = c + rng.normal(0, 18, size=(15, 2))
        pts = np.clip(pts, 8, 215)
        z = rng.uniform(2.0, 4.5) + rng.normal(0, 0.1, 15)
        j2[p] = pts
        j3[p] = np.stack([(pts[:, 0] - 112) / 504 * z, (pts[:, 1] - 112) / 504 * z, z], 1)
        bb[p] = [pts[:, 0].min() - 8, pts[:, 1].min() - 8, pts[:, 0].max() + 8, pts[:, 1].max() + 8]
        valid[p] = True
    return j2, j3, bb, valid


def test_prior_roundtrip_exact():
    """Encode prior targets, decode them: boxes and joints reconstruct."""
    j2, j3, bb, valid = scene(0, 2)
    w = np.ones(CFG.max_people, np.float32)
    pm, mc, mcd, wm = encoders.encode_prior_targets(
        jnp.asarray(bb), jnp.asarray(j2), jnp.asarray(j3[..., 2]), jnp.asarray(w),
        jnp.asarray(valid), CFG, KDH3D_DEPTH,
    )
    boxes, humans, vis = prior.parse_prior_pose(
        np.asarray(pm)[None], np.array(CFG.anchors, np.float32), 15,
        CFG.input_x, CFG.input_y, KDH3D_DEPTH, conf_threshold=0.5, nms_threshold=0.5,
    )
    assert len(humans[0]) == 2
    got = sorted(humans[0], key=lambda h: h[:, 0].mean())
    want = sorted([np.concatenate([j2[p], j3[p, :, 2:3]], 1) for p in range(2)],
                  key=lambda h: h[:, 0].mean())
    for g, t in zip(got, want):
        np.testing.assert_allclose(g, t, atol=1e-3)


def test_openpose_path_roundtrip_eval():
    """GT dense maps -> decode -> 2D/3D PCK ~= 1 for every scene."""
    gt2d_set, gt3d_set, pred2d_set, pred3d_set = [], [], [], []
    for seed, n_people in [(1, 1), (2, 2), (3, 3)]:
        j2, j3, bb, valid = scene(seed, n_people)
        heat = np.asarray(encoders.encode_heatmaps(jnp.asarray(j2), jnp.asarray(valid), CFG))
        paf = np.asarray(encoders.encode_pafs(jnp.asarray(j2), jnp.asarray(valid), CFG))
        depth_resize = np.full((CFG.zgrid_h, CFG.zgrid_w), 5.9, np.float32)
        zmap, _ = encoders.encode_zmaps(
            jnp.asarray(j2), jnp.asarray(j3[..., 2]), jnp.asarray(valid),
            jnp.asarray(depth_resize), CFG, KDH3D_DEPTH,
        )
        zmap = np.asarray(zmap)

        joint_list, people = paf_np.paf_to_pose(heat.astype(np.float64), paf.astype(np.float64))
        humans, vis, conf = paf_to_human_list(joint_list, people)

        pred3d = []
        for h in humans:
            h = np.asarray(h, dtype=np.float64)
            p3 = []
            for k in range(15):
                if h[k, 0] == -1:
                    p3.append([0.0, 0.0, 0.0])
                    continue
                gx, gy = h[k, 0] / CFG.stride, h[k, 1] / CFG.stride
                zn = readout.retrieve_depth_heat_weighted(
                    (gx, gy), zmap[:, :, k], heat[:, :, k].copy(), radius=1
                )
                z = zn * KDH3D_DEPTH.std + KDH3D_DEPTH.mean
                p3.append([(h[k, 0] - 112) / 504 * z, (h[k, 1] - 112) / 504 * z, z])
            pred3d.append(p3)

        n = int(valid.sum())
        gt2d_set.append([j2[p].tolist() for p in range(n)])
        gt3d_set.append([j3[p].tolist() for p in range(n)])
        pred2d_set.append(humans)
        pred3d_set.append(pred3d)

    _, pck2d = pck.eval_human_dataset_2d(pred2d_set, gt2d_set, dist_th=10.0)
    assert np.mean(pck2d) > 0.95
    _, pck3d = pck.eval_human_dataset_3d(
        pred2d_set, gt2d_set, pred3d_set, gt3d_set, dist_th=0.15
    )
    assert np.mean(pck3d) > 0.9
