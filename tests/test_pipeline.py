"""Pipeline parallelism (parallel/pipeline.py) vs the sequential model.

Pins, on the virtual CPU mesh:
- forward parity: the GPipe microbatch pipeline over a ("data", "pipe")
  mesh reproduces the sequential RTPoseLight3D's saved_for_loss tensors;
- loss parity + a real sharded train step (stage stacks pipe-sharded,
  optimizer moments alike) that updates the live weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.losses.losses import rtpose_light3d_loss
from popnet_tpu.models.layers import ResPreprocessStem
from popnet_tpu.models.rtpose_light3d import RTPoseLight3D
from popnet_tpu.parallel import pipeline as pp


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    model = RTPoseLight3D()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (4, 32, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    mesh = pp.make_pipe_mesh(2, devices=jax.devices()[:4])
    return model, variables, x, mesh


def _stem_out(variables, x):
    sv = {"params": variables["params"]["stem"]}
    if "batch_stats" in variables:
        sv["batch_stats"] = variables["batch_stats"]["stem"]
    return ResPreprocessStem().apply(sv, x, train=False)


def test_pipeline_forward_matches_sequential(setup):
    model, variables, x, mesh = setup
    _, saved_seq = model.apply(variables, x, train=False)

    stem_vars, stacked = pp.build_pipelined_variables(variables)
    svars = {"params": stacked["params"]}
    if "batch_stats" in stacked:
        svars["batch_stats"] = stacked["batch_stats"]
    stem = _stem_out(variables, x)
    saved_pp = jax.jit(
        lambda sv, so: pp.pipeline_stages(mesh, sv, so, n_micro=2)
    )(svars, stem)

    assert len(saved_pp) == len(saved_seq)
    for got, want in zip(saved_pp, saved_seq):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )


def test_pipeline_four_stages_four_devices():
    """Depth scaling: a 4-stage CPM (classic rtpose runs 6) pipelined over
    pipe=4 with data=2 reproduces the sequential model."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    model = RTPoseLight3D(num_stages=4)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (4, 32, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x[:1], train=False)
    _, saved_seq = model.apply(variables, x, train=False)

    mesh = pp.make_pipe_mesh(4, devices=jax.devices()[:8])
    stem_vars, stacked = pp.build_pipelined_variables(variables, num_stages=4)
    svars = {"params": stacked["params"]}
    if "batch_stats" in stacked:
        svars["batch_stats"] = stacked["batch_stats"]
    stem = _stem_out(variables, x)
    saved_pp = jax.jit(
        lambda sv, so: pp.pipeline_stages(mesh, sv, so, n_micro=2)
    )(svars, stem)

    assert len(saved_pp) == 12  # 4 stages x (paf, heat, z)
    for got, want in zip(saved_pp, saved_seq):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )


def test_pipeline_train_step_loss_parity_and_update(setup):
    model, variables, x, mesh = setup
    rng = np.random.default_rng(1)
    batch = {
        "image": x,
        "heatmaps": jnp.asarray(rng.uniform(0, 1, (4, 4, 4, 16)).astype(np.float32)),
        "pafs": jnp.asarray(rng.uniform(-1, 1, (4, 4, 4, 28)).astype(np.float32)),
        "zmaps": jnp.asarray(rng.uniform(-1, 1, (4, 4, 4, 15)).astype(np.float32)),
    }
    # sequential eval-mode loss on the same weights = the pipeline's loss
    _, saved_seq = model.apply(variables, x, train=False)
    want_loss, _ = rtpose_light3d_loss(
        saved_seq, batch["heatmaps"], batch["pafs"], batch["zmaps"]
    )

    state = pp.create_pipeline_train_state(variables, learning_rate=0.01)
    step = pp.make_pipeline_train_step(
        ResPreprocessStem(), pp.CPMStageUniform(), mesh, n_micro=2
    )
    jstep = pp.jit_pipeline_step(step, mesh, state)
    state = pp.shard_pipeline_state(state, mesh)
    before = np.asarray(
        state.params["stages"]["paf"]["ConvBN_0"]["Conv_0"]["kernel"]
    )
    state2, logs = jstep(state, batch)
    got_loss = float(logs["loss"])
    np.testing.assert_allclose(got_loss, float(want_loss), rtol=1e-5)

    after = np.asarray(
        state2.params["stages"]["paf"]["ConvBN_0"]["Conv_0"]["kernel"]
    )
    # live weights move; stage-1's dead input slice (zero inputs) stays 0
    assert not np.allclose(before, after)
    c_out = pp.stage_channels()
    np.testing.assert_array_equal(after[0, :, :, :c_out, :], 0.0)
