"""Spatial (height-sharded) partitioning: sharding is layout, not semantics.

Pins, on the virtual 8-device CPU mesh:

1. forward parity — the spatially-partitioned CNN forward (GSPMD halo
   exchanges through strided/padded convs) equals the unsharded forward;
2. train parity — one PopNet train step under the ("data", "spatial")
   layout produces the same loss as the plain 1-D data-parallel step;
3. the full-resolution motivation — a 512x480 Kinect-native frame
   (reference frames: parse_kinect_raw_mp.py:30-45) flows through the CNN
   height-sharded without host tiling.

SURVEY §2.6/§5: spatial extent is this workload's analog of the
long-context axis; this is its TPU-native (pjit/GSPMD) realization.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.models import PopNet, RTPoseLight3D
from popnet_tpu.parallel import spatial as sp


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return sp.make_spatial_mesh(n_spatial=4)


def test_forward_parity_spatial_vs_single(mesh):
    model = RTPoseLight3D()
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1.5, 1.5, (2, 64, 64, 1)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    def fwd(image):
        (paf, heat, z), _ = model.apply(variables, image, train=False)
        return paf, heat, z

    ref = jax.jit(fwd)(x)
    got = sp.jit_forward_spatial(fwd, mesh)(
        jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", "spatial")))
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=1e-5, atol=1e-5)


def test_full_resolution_frame_height_sharded(mesh):
    # 512x480 Kinect-native frame, never resized on the host
    model = RTPoseLight3D()
    x = jnp.zeros((2, 512, 480, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1, :64, :64], train=False)

    def fwd(image):
        (paf, heat, z), _ = model.apply(variables, image, train=False)
        return heat

    heat = sp.jit_forward_spatial(fwd, mesh)(
        jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", "spatial")))
    )
    assert heat.shape == (2, 64, 60, 16)  # stride 8
    assert np.isfinite(np.asarray(heat)).all()


def test_train_step_loss_parity_dp_vs_spatial(mesh):
    from popnet_tpu.core.config import EncoderConfig, KDH3D_DEPTH
    from popnet_tpu.ops import encoders
    from popnet_tpu.parallel.mesh import make_mesh, shard_batch
    from popnet_tpu.train.state import create_train_state
    from popnet_tpu.train.steps import jit_step_over_mesh, make_popnet_train_step

    cfg = EncoderConfig(input_x=64, input_y=64, max_people=4)
    rng = np.random.default_rng(1)
    B = 8
    j2 = rng.uniform(5, 59, (B, cfg.max_people, 15, 2)).astype(np.float32)
    z = rng.uniform(1, 5, (B, cfg.max_people, 15)).astype(np.float32)
    j3 = np.stack(
        [(j2[..., 0] - 32) / 504 * z, (j2[..., 1] - 32) / 504 * z, z], -1
    ).astype(np.float32)
    bb = np.stack(
        [j2[..., 0].min(-1) - 3, j2[..., 1].min(-1) - 3,
         j2[..., 0].max(-1) + 3, j2[..., 1].max(-1) + 3], -1,
    ).astype(np.float32)
    w = np.ones((B, cfg.max_people), np.float32)
    valid = np.ones((B, cfg.max_people), bool)
    depth_resize = rng.uniform(0, 6, (B, cfg.zgrid_h, cfg.zgrid_w)).astype(np.float32)
    batch = dict(
        jax.vmap(
            lambda a, b, c, d, e, f: encoders.encode_targets(
                a, b, c, d, e, f, cfg, KDH3D_DEPTH, pose_align=True, with_prior=True
            )
        )(jnp.asarray(j2), jnp.asarray(j3), jnp.asarray(bb), jnp.asarray(w),
          jnp.asarray(valid), jnp.asarray(depth_resize))
    )
    batch["image"] = jnp.asarray(
        rng.uniform(-1.5, 1.5, (B, 64, 64, 1)).astype(np.float32)
    )

    def fresh_state():
        return create_train_state(
            PopNet(), jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)),
            learning_rate=0.05,
        )

    step = make_popnet_train_step()

    dp_mesh = make_mesh()
    _, dp_logs = jit_step_over_mesh(step, dp_mesh)(
        fresh_state(), shard_batch(batch, dp_mesh))

    sp_state = sp.replicate_state(fresh_state(), mesh)
    sp_batch = sp.shard_batch_spatial(batch, mesh)
    # image leaf really is height-sharded under the spatial layout
    img_spec = sp_batch["image"].sharding.spec
    assert tuple(img_spec)[:2] == ("data", "spatial")
    _, sp_logs = sp.jit_step_spatial(step, mesh)(sp_state, sp_batch)

    np.testing.assert_allclose(float(dp_logs["loss"]), float(sp_logs["loss"]),
                               rtol=1e-5)
