"""Serving-pipeline library surface (popnet_tpu/serving.py).

Covers what bench.py relies on: packed single-buffer outputs, host unpack,
the ordered in-flight drain, and the multi-chip inference path (batch
sharded over the mesh, params replicated) matching the single-device
program exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.core.config import DecodeConfig, EncoderConfig
from popnet_tpu.parallel.mesh import make_mesh
from popnet_tpu.serving import (
    build_openpose_pipeline,
    build_popnet_pipeline,
    init_variables,
    serve_stream,
    unpack_outputs,
)

ECFG = EncoderConfig()
DCFG = DecodeConfig()


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0.5, 6.0, (8, 512, 480)).astype(np.float32))


def test_openpose_pipeline_sharded_matches_single(frames):
    from popnet_tpu.models import RTPoseLight3D

    variables = init_variables(RTPoseLight3D(dtype=jnp.float32))
    single = build_openpose_pipeline(variables, dtype=jnp.float32)
    mesh = make_mesh(jax.devices()[:8])
    sharded = build_openpose_pipeline(variables, dtype=jnp.float32, mesh=mesh)

    a = np.asarray(single(frames))
    b = np.asarray(sharded(frames))
    assert a.shape == b.shape == (8, DCFG.max_people * ECFG.num_joints * 6 + 1)
    np.testing.assert_allclose(a, b, atol=1e-5)

    out = unpack_outputs(a, DCFG.max_people, ECFG.num_joints)
    assert out["joints2d"].shape == (8, DCFG.max_people, ECFG.num_joints, 2)
    assert out["joints3d"].shape == (8, DCFG.max_people, ECFG.num_joints, 3)
    assert out["conf"].shape == (8, DCFG.max_people, ECFG.num_joints)
    assert np.isfinite(a).all()


def test_popnet_pipeline_and_stream(frames):
    pipe = build_popnet_pipeline(dtype=jnp.float32)
    bufs = list(serve_stream(pipe, (frames for _ in range(5)), queue_depth=2))
    assert len(bufs) == 5
    for buf in bufs:
        assert isinstance(buf, np.ndarray)
        np.testing.assert_array_equal(buf, bufs[0])  # same input -> same output
    out = unpack_outputs(bufs[0], DCFG.max_people, ECFG.num_joints)
    assert out["counts"].shape == (8, DCFG.max_people)  # valid mask per row


def test_cnn_stage_truncation(frames):
    pipe = build_openpose_pipeline(dtype=jnp.float32, stage="cnn")
    buf = np.asarray(pipe(frames))
    # heat max (num_joints+1 ch) + paf mean (2*num_limbs ch)
    assert buf.shape == (8, (ECFG.num_joints + 1) + 2 * 14)
    assert np.isfinite(buf).all()
