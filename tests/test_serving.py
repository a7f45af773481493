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


def test_q16_pack_matches_f32(frames):
    """The uint16 wire format reconstructs the f32 outputs within its
    documented quantization (<=1/32 px, <=1/8192 m, <=1/1024 conf)."""
    from popnet_tpu.models import RTPoseLight3D
    from popnet_tpu.serving import unpack_outputs_q16

    variables = init_variables(RTPoseLight3D(dtype=jnp.float32))
    f32 = build_openpose_pipeline(variables, dtype=jnp.float32)
    q16 = build_openpose_pipeline(variables, dtype=jnp.float32, pack="q16")

    a = unpack_outputs(np.asarray(f32(frames)), DCFG.max_people, ECFG.num_joints)
    bbuf = np.asarray(q16(frames))
    assert bbuf.dtype == np.uint16
    b = unpack_outputs_q16(bbuf, DCFG.max_people, ECFG.num_joints)

    np.testing.assert_allclose(b["joints2d"], a["joints2d"], atol=1 / 32 + 1e-6)
    np.testing.assert_allclose(b["conf"], a["conf"], atol=1 / 1024 + 1e-6)
    z_a = a["joints3d"][..., 2]
    z_b = b["joints3d"][..., 2]
    np.testing.assert_allclose(z_b, z_a, atol=1 / 8192 + 1e-6)
    # back-projected X/Y differ by (quantization in x2 and z) * lever arms
    np.testing.assert_allclose(b["joints3d"], a["joints3d"], atol=5e-3)
    np.testing.assert_array_equal(b["counts"][:, 0], a["counts"][:, 0])
    # hole sentinels survive quantization exactly
    holes = a["joints2d"][..., 0] == -1.0
    assert (b["joints2d"][..., 0][holes] == -1.0).all()


def test_cnn_stage_truncation(frames):
    pipe = build_openpose_pipeline(dtype=jnp.float32, stage="cnn")
    buf = np.asarray(pipe(frames))
    # heat max (num_joints+1 ch) + paf mean (2*num_limbs ch)
    assert buf.shape == (8, (ECFG.num_joints + 1) + 2 * 14)
    assert np.isfinite(buf).all()


def test_yolo_pipeline_shapes(frames):
    from popnet_tpu.serving import build_yolo_pipeline, unpack_outputs_q16

    pipe = build_yolo_pipeline(dtype=jnp.float32, pack="q16")
    buf = np.asarray(pipe(frames))
    out = unpack_outputs_q16(buf, DCFG.max_people, ECFG.num_joints)
    assert out["joints2d"].shape == (8, DCFG.max_people, ECFG.num_joints, 2)
    assert out["joints3d"].shape == (8, DCFG.max_people, ECFG.num_joints, 3)
    assert np.isfinite(out["joints3d"]).all()


def test_yolo_a2j_pipeline_shapes():
    from popnet_tpu.serving import build_yolo_a2j_pipeline, unpack_outputs

    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(0.5, 6.0, (2, 512, 480)).astype(np.float32))
    pipe = build_yolo_a2j_pipeline(dtype=jnp.float32, pack="f32", max_crops=2)
    buf = np.asarray(pipe(frames))
    out = unpack_outputs(buf, 2, ECFG.num_joints)
    assert out["joints2d"].shape == (2, 2, ECFG.num_joints, 2)
    assert out["conf"].shape == (2, 2, ECFG.num_joints)
    assert np.isfinite(buf).all()
