"""Golden tests: readouts, universe_align_map, A2J voting vs reference."""

import numpy as np
import pytest

from tests.reference_shim import load_cr_module

import jax.numpy as jnp

from popnet_tpu.decode import readout
from popnet_tpu.decode.align import universe_align_map
from popnet_tpu.decode.a2j import a2j_post_process
from popnet_tpu.models.a2j import generate_anchors, shift_anchors


@pytest.mark.reference
def test_readouts_golden():
    ref = load_cr_module("ref_common2", "third_party_methods/lib/utils/common.py")
    rng = np.random.default_rng(0)
    depth = rng.uniform(0, 6, (28, 28))
    heat = rng.uniform(-0.2, 1, (28, 28))
    align = rng.uniform(-1, 1, (28, 28, 2))
    centers = [(5, 7), (0, 0), (27, 27), (13.4, 2.7), (26, 1)]
    for c in centers:
        c = np.array(c)
        assert readout.retrieve_depth_weighted(c, depth, 1) == pytest.approx(
            ref.retrieve_depth_weighted(c, depth.copy(), 1), rel=1e-12)
        assert readout.retrieve_depth_heat_weighted(c, depth, heat.copy(), 1) == pytest.approx(
            ref.retrieve_depth_heat_weighted(c, depth.copy(), heat.copy(), 1), rel=1e-12)
        assert readout.retrieve_depth_heat_max(c, depth, heat.copy(), 1) == pytest.approx(
            ref.retrieve_depth_heat_max(c, depth.copy(), heat.copy(), 1), rel=1e-12)
        np.testing.assert_allclose(
            readout.retrieve_offsets_heat_weighted(c, align, heat.copy(), 1),
            ref.retrieve_offsets_heat_weighted(c, align.copy(), heat.copy(), 1), rtol=1e-10)
        np.testing.assert_allclose(
            readout.retrieve_offsets_weighted(c, align, 1),
            ref.retrieve_offsets_weighted(c, align.copy(), 1), rtol=1e-10)
        ci = c.astype(int)
        np.testing.assert_allclose(
            readout.retrieve_offsets_nn(ci, align, 1),
            ref.retrieve_offsets_nn(ci, align.copy(), 1), rtol=1e-10)


@pytest.mark.reference
def test_universe_align_map_golden():
    ref = load_cr_module("ref_prior2", "third_party_methods/lib/utils/prior_pose_align.py")
    rng = np.random.default_rng(1)
    K = 4
    heat = np.zeros((28, 28, K))
    for j in range(K):
        for _ in range(rng.integers(1, 3)):
            cx, cy = rng.integers(2, 26, 2)
            xs, ys = np.meshgrid(range(28), range(28))
            heat[:, :, j] += np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / 4.0)
    heat = np.clip(heat, 0, 1)
    align = rng.uniform(-1, 1, (28, 28, 2 * K))
    ours = universe_align_map(heat, align, K, align_radius=2, ht_thresh=0.5)
    theirs = ref.universe_align_map(heat.copy(), align.copy(), K, 2, ht_thresh=0.5)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


@pytest.mark.reference
def test_a2j_postprocess_golden():
    torch = pytest.importorskip("torch")
    ref_anchor = load_cr_module("ref_a2j_anchor", "third_party_methods/A2J_experiments/anchor.py")

    # patch the reference's hard .cuda() calls to no-ops on CPU
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self

    rng = np.random.default_rng(2)
    shape = (4, 4)
    anchors_np = shift_anchors(shape, 16, generate_anchors())
    np.testing.assert_allclose(
        anchors_np,
        ref_anchor.shift(shape, 16, ref_anchor.generate_anchors()),
    )

    N, K, B = anchors_np.shape[0], 15, 2
    cls = rng.normal(0, 1, (B, N, K)).astype(np.float32)
    reg = rng.normal(0, 5, (B, N, K, 2)).astype(np.float32)
    dep = rng.uniform(0, 6, (B, N, K)).astype(np.float32)

    pp = ref_anchor.post_process.__new__(ref_anchor.post_process)
    torch.nn.Module.__init__(pp)
    pp.all_anchors = torch.from_numpy(anchors_np).float()
    pp.thres = torch.tensor(8.0)
    pp.is_3D = True
    ref_out = pp.forward((torch.from_numpy(cls), torch.from_numpy(reg), torch.from_numpy(dep)))

    ours = a2j_post_process(
        (jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(dep)),
        jnp.asarray(anchors_np, dtype=jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=1e-4)
