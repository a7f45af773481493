"""Dynamic-int8 serving path: exactness gates + benchmark-metric parity.

ops/quant.py serves the CNN through s8 x s8 -> s32 MXU convolutions
(per-output-channel weight scales, per-tensor dynamic activation scales).
Like the q16 wire (tests/test_q16_parity.py), the claim is proven at the
BENCHMARK METRIC level: the full PoP-Net pipeline scored through the int8
path must match the exact path within a small tolerance on held-out
synthetic scenes, using the committed trained weights
(examples/results/bench_weights_popnet.npz — the syngen run, held-out
PCK2D 0.997) so both the activation distributions and the metric regime
are realistic.

No reference analogue (the reference serves torch f32 on GPU); the parity
instrument is the same benchmark-metric stack the reference defines
(util/eval_pck.py + util/eval_mAP.py).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.cli import evaluate as ev
from popnet_tpu.core.config import DecodeConfig, EncoderConfig
from popnet_tpu.data.datasets import MPRealDataset
from popnet_tpu.models import PopNet
from popnet_tpu.ops.quant import quantized_apply
from popnet_tpu.serving import variables_from_npz

from tests import synthetic_data

ECFG = EncoderConfig()
DCFG = DecodeConfig()
WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "results", "bench_weights_popnet.npz",
)


def test_fallthrough_is_exact():
    """Convs below the eligibility thresholds take the exact path bitwise."""
    model = PopNet()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (h, z, a, p), _ = model.apply(variables, x, train=False)
    (hq, zq, aq, pq), _ = quantized_apply(
        model, variables, x, train=False, min_contraction=10**9
    )
    for e, q in ((h, hq), (z, zq), (a, aq), (p, pq)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(q))


def test_quantized_outputs_close():
    """Default thresholds: the quantized forward must differ (it really ran
    int8) but stay within a small bound of the exact forward."""
    model = PopNet()
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 64, 64, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (h, z, a, p), _ = model.apply(variables, x, train=False)
    (hq, zq, aq, pq), _ = quantized_apply(model, variables, x, train=False)
    diffs = [float(jnp.max(jnp.abs(e - q)))
             for e, q in ((h, hq), (z, zq), (a, aq), (p, pq))]
    assert max(diffs) > 0.0, "int8 path did not engage"
    assert max(diffs) < 0.05, diffs


def test_int8_pipeline_sharded_matches_single():
    """Batch-sharded int8 serving equals the single-device program exactly
    (the dynamic activation scale is a global max — GSPMD all-reduces it,
    so quantization grids agree across shards)."""
    from popnet_tpu.models import PopNet
    from popnet_tpu.parallel.mesh import make_mesh
    from popnet_tpu.serving import build_popnet_pipeline, init_variables

    frames = jnp.asarray(
        np.random.default_rng(7).uniform(0.5, 6.0, (8, 512, 480)).astype(np.float32)
    )
    variables = init_variables(PopNet(dtype=jnp.float32))
    single = build_popnet_pipeline(variables, dtype=jnp.float32, quant="int8")
    mesh = make_mesh(jax.devices()[:8])
    sharded = build_popnet_pipeline(variables, dtype=jnp.float32, quant="int8",
                                    mesh=mesh)
    a = np.asarray(single(frames))
    b = np.asarray(sharded(frames))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Frozen mp-aug composites from a held-out seed — the distribution the
    committed weights were trained on (same construction as scripts/syngen.py
    and its 0.997-PCK2D val benchmark)."""
    from popnet_tpu.cli.main import main as cli

    root = tmp_path_factory.mktemp("kdh3d_int8")
    scenes = os.path.join(str(root), "scenes")
    frozen = os.path.join(str(root), "frozen")
    synthetic_data.build(scenes, n_images=16, n_locations=5, seed=777)
    cli(["generate-augset", "--kind", "mpaug", "--data-root", scenes,
         "--out-dir", frozen, "--seed", "777"])
    return MPRealDataset(os.path.join(frozen, "depth_maps"),
                         os.path.join(frozen, "labels_test.json"), ecfg=ECFG)


def test_int8_metric_parity(dataset):
    if not os.path.exists(WEIGHTS):
        pytest.skip("trained bench weights not committed")
    variables = variables_from_npz(WEIGHTS)
    model = PopNet()

    def infer_exact(images):
        (heat, z, align, prior), _ = model.apply(variables, images, train=False)
        return heat, z, align, prior

    def infer_int8(images):
        (heat, z, align, prior), _ = quantized_apply(
            model, variables, images, train=False
        )
        return heat, z, align, prior

    res = {}
    for name, infer in (("exact", infer_exact), ("int8", infer_int8)):
        data = ev.run_popnet_eval(jax.jit(infer), dataset, 8, ECFG, DCFG,
                                  readout="universe")
        m = ev.evaluate_eval_data(data, verbose=False)
        res[name] = {k: float(v) for k, v in m.items()
                     if not k.startswith("per_")}

    # the regime must be demanding — comparing zeros proves nothing
    assert res["exact"]["pck2d"] > 0.9, res["exact"]
    assert res["exact"]["map2d"] > 0.9, res["exact"]
    for k in ("pck2d", "pck3d", "map2d", "map3d"):
        assert abs(res["exact"][k] - res["int8"][k]) <= 0.02, (
            k, res["exact"][k], res["int8"][k]
        )
