"""Pins for the committed bench-weight artifacts (VERDICT r2 weak #6).

bench.py defaults to examples/results/bench_weights_{model}.npz so the
committed throughput numbers run with trained weights. These tests keep the
artifacts honest: the seed run's metrics stay above floors, and each npz
actually loads into the model it claims to be for (shape-exact against a
fresh init) — a stale or truncated artifact fails here, not silently at
bench time.
"""

import json
import os

import numpy as np
import pytest

RESULTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "results",
)


def test_bench_seed_metrics_floor():
    path = os.path.join(RESULTS, "bench_seed.json")
    if not os.path.exists(path):
        pytest.skip("bench seed run not generated (scripts/syngen.py)")
    summary = json.load(open(path))
    uni = summary["universe"]
    assert uni["pck2d"] >= 0.95, uni
    assert uni["map3d"] >= 0.70, uni


@pytest.mark.parametrize("name, build", [
    ("bench_weights_popnet.npz", "popnet"),
    ("bench_weights_openpose.npz", "openpose"),
    ("bench_weights_yolo.npz", "yolo"),
    ("bench_weights_a2j.npz", "a2j"),
])
def test_bench_weights_load_shape_exact(name, build):
    path = os.path.join(RESULTS, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not exported (scripts/export_bench_weights.py)")
    import jax
    import jax.numpy as jnp

    from popnet_tpu.models import A2J, PopNet, RTPoseLight3D, YoloPoseNet
    from popnet_tpu.serving import variables_from_npz

    model = {"popnet": PopNet, "openpose": RTPoseLight3D,
             "yolo": YoloPoseNet, "a2j": A2J}[build]()
    size = 288 if build == "a2j" else 224
    fresh = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 1)), train=False
    )
    loaded = variables_from_npz(path)

    fresh_flat = jax.tree_util.tree_flatten_with_path(fresh)[0]
    loaded_flat = jax.tree_util.tree_flatten_with_path(loaded)[0]
    assert len(fresh_flat) == len(loaded_flat)
    n_nonzero = 0
    for (pf, lf), (pl, ll) in zip(fresh_flat, loaded_flat):
        assert pf == pl, (pf, pl)
        assert lf.shape == ll.shape, (pf, lf.shape, ll.shape)
        n_nonzero += bool(np.any(np.asarray(ll)))
    # trained weights, not zeros: most leaves carry signal (some BN running
    # means and tiny values round to zero in the f16 wire format)
    assert n_nonzero >= 0.75 * len(loaded_flat)
