"""6-stage rtpose_vgg GPipe pipeline (parallel/pipeline.py VGG section) vs
the sequential model — the textbook pipeline case the reference's classic
CPM stack implies (lib/network/rtpose_vgg.py:59-250): stages 2..6 are a
uniform program, so they place one per pipe device with NO zero-widening
(unlike the 2-stage depth family). VERDICT r3 item 6.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.models.rtpose_vgg import RTPoseVGG
from popnet_tpu.parallel import pipeline as pp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 5, reason="needs pipe=5 devices"
)

K, L = 18, 19


@pytest.fixture(scope="module")
def setup():
    model = RTPoseVGG(trunk="mobilenet", num_stages=6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    mesh = pp.make_pipe_mesh(5, devices=jax.devices()[:5])
    return model, variables, x, mesh


def _front(model, variables, x):
    """Sequential trunk + stage-1 outputs via intermediate capture."""
    from popnet_tpu.models.rtpose_vgg import MobileNetTrunk

    tv = {"params": variables["params"]["trunk"]}
    if "batch_stats" in variables:
        tv["batch_stats"] = variables["batch_stats"]["trunk"]
    feat = MobileNetTrunk().apply(tv, x, train=False)
    from popnet_tpu.models.layers import CPMBranch

    spec1 = ((128, 3), (128, 3), (128, 3), (512, 1))
    paf1 = CPMBranch(spec1, 2 * L, 1, jnp.float32, act="relu", norm=False).apply(
        {"params": variables["params"]["stage1_paf"]}, feat, train=False
    )
    heat1 = CPMBranch(spec1, K + 1, 1, jnp.float32, act="relu", norm=False).apply(
        {"params": variables["params"]["stage1_heat"]}, feat, train=False
    )
    return paf1, heat1, feat


def test_vgg_pipeline_forward_matches_sequential(setup):
    model, variables, x, mesh = setup
    _, saved_seq = model.apply(variables, x, train=False)

    front_vars, stacked = pp.build_vgg_pipelined_variables(variables)
    assert "batch_stats" not in stacked  # stage branches are norm-free
    paf1, heat1, feat = _front(model, variables, x)
    np.testing.assert_allclose(np.asarray(paf1), np.asarray(saved_seq[0]),
                               atol=1e-5)

    svars = {"params": stacked["params"]}
    saved_pp = jax.jit(
        lambda sv, a, b, f: pp.vgg_pipeline_stages(mesh, sv, a, b, f, n_micro=2)
    )(svars, paf1, heat1, feat)

    assert len(saved_pp) == len(saved_seq) == 12
    for got, want in zip(saved_pp, saved_seq):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_vgg_pipeline_roundtrip_variables(setup):
    model, variables, x, mesh = setup
    front_vars, stacked = pp.build_vgg_pipelined_variables(variables)
    back = pp.unstack_vgg_pipelined_variables(front_vars, stacked)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the round-tripped variables drive the sequential model unchanged
    (pafs, heats), _ = model.apply(back, x, train=False)
    (pafs0, heats0), _ = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(pafs), np.asarray(pafs0))


def test_vgg_pipeline_train_step_updates(setup):
    model, variables, x, mesh = setup
    rng = np.random.default_rng(1)
    batch = {
        "image": x,
        "heat": jnp.asarray(rng.uniform(0, 1, (4, 4, 4, K + 1)).astype(np.float32)),
        "paf": jnp.asarray(rng.uniform(-1, 1, (4, 4, 4, 2 * L)).astype(np.float32)),
    }
    # sequential loss on the same weights, BEFORE the step (the jitted step
    # donates its state, whose front leaves may alias `variables`)
    from popnet_tpu.losses.losses import rtpose_light_loss

    _, saved_seq = model.apply(variables, x, train=False)
    want, _ = rtpose_light_loss(saved_seq, batch["heat"], batch["paf"], 6)

    # copy the leaves: device_put may alias already-placed buffers and the
    # donated step would delete them out from under the fixture
    owned = jax.tree.map(jnp.array, variables)
    state = pp.create_vgg_pipeline_train_state(owned, learning_rate=1e-3)
    state = pp.shard_pipeline_state(state, mesh)
    step = pp.jit_pipeline_step(
        pp.make_vgg_pipeline_train_step(mesh, n_micro=2, trunk="mobilenet"),
        mesh, state,
    )
    p0 = np.asarray(jax.tree.leaves(state.params["stages"])[0])
    state2, logs = step(state, batch)
    assert np.isfinite(float(logs["loss"]))
    p1 = np.asarray(jax.tree.leaves(state2.params["stages"])[0])
    assert not np.array_equal(p0, p1), "pipelined stage weights must update"

    # loss parity vs the sequential objective on the same weights
    np.testing.assert_allclose(float(logs["loss"]), float(want), rtol=1e-5)
