"""PoP-Net universe-align readout: device fusion vs the host reference path.

The device "universe" readout composes three exact-semantics host pieces
(decode/align.universe_align_map + readout.retrieve_offsets_heat_weighted +
readout.retrieve_depth_heat_weighted); this golden test checks the batched
XLA version against that composition joint-by-joint on interior positions,
and the e2e test scores both readout mechanisms through the full PoP-Net
eval driver.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from popnet_tpu.core.config import DecodeConfig, EncoderConfig
from popnet_tpu.decode import align as align_np, readout as readout_np
from popnet_tpu.decode.popnet_infer import _int_peaks_batched, popnet_decode

ECFG = EncoderConfig(max_people=6)
DCFG = DecodeConfig()


def host_universe_readout(heat, alignmap_raw, zmap, cx, cy, ecfg, radius=1,
                          ht_thresh=0.5, top_n=16):
    """The composition the device readout must reproduce (one image/joint)."""
    uni = align_np.universe_align_map(
        heat, alignmap_raw, ecfg.num_joints, ecfg.align_radius,
        ht_thresh=ht_thresh, top_n=top_n,
    )
    out = []
    for k in range(ecfg.num_joints):
        field = uni[:, :, 2 * k : 2 * k + 2]
        dx, dy = readout_np.retrieve_offsets_heat_weighted(
            (cx[k], cy[k]), field, heat[:, :, k].copy(), radius=radius
        )
        rx, ry = cx[k] + dx, cy[k] + dy
        z = readout_np.retrieve_depth_heat_weighted(
            (int(rx), int(ry)), zmap[:, :, k], heat[:, :, k].copy(), radius=radius
        )
        out.append((rx, ry, z))
    return np.asarray(out)


def synth_maps(seed):
    """Random smooth heat/align/z maps with a few sharp peaks per joint."""
    rng = np.random.default_rng(seed)
    K = ECFG.num_joints
    H, W = ECFG.agrid_h, ECFG.agrid_w
    heat = rng.uniform(0, 0.3, (H, W, K)).astype(np.float32)
    peaks = []
    for k in range(K):
        pk = rng.integers(3, min(H, W) - 3, size=(rng.integers(1, 4), 2))
        for (py, px) in pk:
            heat[py, px, k] = rng.uniform(0.7, 1.0)
        peaks.append(pk)
    align_raw = rng.uniform(-2.0, 2.0, (H, W, 2 * K)).astype(np.float32)
    zmap = rng.uniform(-1.0, 1.0, (H, W, K)).astype(np.float32)
    return heat, align_raw, zmap, peaks


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_int_peaks_match_host(seed):
    heat, _, _, _ = synth_maps(seed)
    from popnet_tpu.decode.peaks_np import find_peaks

    px, py, valid = _int_peaks_batched(jnp.asarray(heat[None]), 0.5, 16)
    px, py, valid = np.asarray(px)[0], np.asarray(py)[0], np.asarray(valid)[0]
    for k in range(ECFG.num_joints):
        host = find_peaks(0.5, heat[:, :, k].astype(np.float64), top_n=16)
        dev = sorted(zip(px[k][valid[k]], py[k][valid[k]]))
        assert dev == sorted(map(tuple, host))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_universe_readout_matches_host_composition(seed):
    """Drive the full popnet_decode(readout='universe') and check the
    refined joints against the host composition at the same prior centers."""
    from popnet_tpu.core.camera import KDH3D_INTRINSICS
    from popnet_tpu.core.config import KDH3D_DEPTH
    from popnet_tpu.ops import encoders

    heat, align_raw, zmap, _ = synth_maps(seed)
    rng = np.random.default_rng(100 + seed)
    K = ECFG.num_joints
    H, W = ECFG.agrid_h, ECFG.agrid_w

    # one person whose prior joints are interior grid cells
    cx = rng.integers(4, W - 4, size=K)
    cy = rng.integers(4, H - 4, size=K)

    # build a prior map that decodes to exactly those joint positions:
    # centers at the cell centers (in [0,1] image coords)
    jx = (cx + 0.5) / W
    jy = (cy + 0.5) / H
    span = ECFG.align_radius + 0.5

    # build a prior map that decodes back to exactly those joint positions
    j2 = np.full((ECFG.max_people, K, 2), -1e6, np.float32)
    j2[0, :, 0] = jx * ECFG.input_x
    j2[0, :, 1] = jy * ECFG.input_y
    jz = np.full((ECFG.max_people, K), 3.0, np.float32)
    valid = np.zeros(ECFG.max_people, bool)
    valid[0] = True
    x0, y0 = j2[0, :, 0].min(), j2[0, :, 1].min()
    x1, y1 = j2[0, :, 0].max(), j2[0, :, 1].max()
    bboxes = np.zeros((ECFG.max_people, 4), np.float32)
    bboxes[0] = [x0, y0, x1, y1]
    weights = np.ones(ECFG.max_people, np.float32)
    prior_map, _, _, _ = encoders.encode_prior_targets(
        jnp.asarray(bboxes), jnp.asarray(j2), jnp.asarray(jz),
        jnp.asarray(weights), jnp.asarray(valid), ECFG, KDH3D_DEPTH,
    )

    out = popnet_decode(
        jnp.asarray(heat[None]), jnp.asarray(zmap[None]),
        jnp.asarray((align_raw / span)[None]), jnp.asarray(prior_map)[None],
        ECFG, DCFG, KDH3D_DEPTH, KDH3D_INTRINSICS,
        w_out=float(ECFG.input_x), h_out=float(ECFG.input_y),
        readout="universe",
    )
    dvalid = np.asarray(out["valid"])[0]
    assert dvalid[0], "prior person must survive decode"
    j2d = np.asarray(out["joints2d"])[0, 0]  # (K, 2) in input px
    j3d = np.asarray(out["joints3d"])[0, 0]

    # the decoded prior centers: re-derive the actual grid cells the decode
    # used (they may differ from cx/cy by prior quantization)
    gx = j2d[:, 0] / ECFG.input_x * W
    gy = j2d[:, 1] / ECFG.input_y * H

    host = host_universe_readout(
        heat.astype(np.float64), align_raw.astype(np.float64),
        zmap.astype(np.float64), cx, cy, ECFG,
    )
    # compare refined grid coords and z
    np.testing.assert_allclose(gx, host[:, 0], atol=2e-3)
    np.testing.assert_allclose(gy, host[:, 1], atol=2e-3)
    z_host = host[:, 2] * KDH3D_DEPTH.std + KDH3D_DEPTH.mean
    np.testing.assert_allclose(j3d[:, 2], z_host, atol=2e-3)
