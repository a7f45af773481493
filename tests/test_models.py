"""Model smoke tests + parameter-count parity against the torch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.models import (
    RTPoseLight3D, RTPoseLight, RTPoseAlign3D, YoloPoseNet, PopNet, A2J,
)

RNG = jax.random.PRNGKey(0)


def init_and_forward(model, hw=(64, 64), chans=1):
    x = jnp.zeros((2, hw[0], hw[1], chans))
    variables = model.init(RNG, x, train=False)
    out = model.apply(variables, x, train=False)
    return variables, out


def n_params(variables):
    return sum(p.size for p in jax.tree.leaves(variables["params"]))


def test_rtpose_light3d_shapes():
    model = RTPoseLight3D(num_parts=15, num_limbs=14)
    variables, ((paf, heat, z), saved) = init_and_forward(model)
    assert paf.shape == (2, 8, 8, 28)
    assert heat.shape == (2, 8, 8, 16)
    assert z.shape == (2, 8, 8, 15)
    assert len(saved) == 6
    assert np.all(np.isfinite(np.asarray(heat)))
    # output casting ranges
    assert float(jnp.max(heat)) <= 1.0 and float(jnp.min(heat)) >= 0.0
    assert float(jnp.max(jnp.abs(paf))) <= 2.0


def test_rtpose_light_shapes():
    model = RTPoseLight()
    _, ((paf, heat), saved) = init_and_forward(model)
    assert paf.shape == (2, 8, 8, 28)
    assert heat.shape == (2, 8, 8, 16)
    assert len(saved) == 4


def test_rtpose_align3d_shapes():
    model = RTPoseAlign3D()
    _, ((paf, heat, z, align), saved) = init_and_forward(model)
    assert paf.shape == (2, 8, 8, 28)
    assert heat.shape == (2, 8, 8, 16)
    assert z.shape == (2, 8, 8, 15)
    assert align.shape == (2, 8, 8, 30)
    assert len(saved) == 8


def test_yolo_posenet_shapes():
    model = YoloPoseNet()
    _, out = init_and_forward(model)
    assert out.shape == (2, 4, 4, 2 * (5 + 45))
    # conf channel in (0, 1)
    r = np.asarray(out).reshape(2, 4, 4, 2, 50)
    assert r[..., 4].min() >= 0 and r[..., 4].max() <= 1


def test_popnet_shapes():
    model = PopNet()
    _, ((heat, z, align, prior), saved) = init_and_forward(model)
    assert heat.shape == (2, 8, 8, 16)
    assert z.shape == (2, 8, 8, 15)
    assert align.shape == (2, 8, 8, 30)
    assert prior.shape == (2, 4, 4, 100)
    assert len(saved) == 7


def test_a2j_shapes():
    model = A2J(num_joints=15)
    _, (cls, reg, dep) = init_and_forward(model, hw=(64, 64))
    n = 4 * 4 * 16  # stride-16 grid of 64x64 input, 16 anchors
    assert cls.shape == (2, n, 15)
    assert reg.shape == (2, n, 15, 2)
    assert dep.shape == (2, n, 15)


def test_a2j_depth_prior_init():
    """A2J(depth_prior=m): the softmax anchor vote predicts ~m at init, so
    the z L1 term starts near zero instead of |m| (the r4 yolo_a2j row's
    near-zero-3D root cause — the reference's zero-bias init makes the vote
    start at z=0, ~3 m of dead ramp on KDH3D). BN-normalized features keep
    the head's conv output small but not exactly zero; the bias dominates."""
    import jax

    for prior in (0.0, 3.0):
        model = A2J(num_joints=15, depth_prior=prior)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 1), jnp.float32), train=False)
        np.testing.assert_allclose(
            np.asarray(v["params"]["depth"]["Conv_4"]["bias"]), prior)
        # train mode: BN batch statistics active, as in the first optimizer
        # steps the init is there to help (eval-mode fresh BN running stats
        # are 0/1 and let deep-ResNet activations blow up at init)
        (cls, _, dep), _ = model.apply(
            v, jnp.asarray(np.random.default_rng(0).normal(
                size=(2, 64, 64, 1)).astype(np.float32)),
            train=True, mutable=["batch_stats"],
        )
        w = jax.nn.softmax(cls, axis=1)
        vote = np.asarray(jnp.sum(w * dep, axis=1))
        np.testing.assert_allclose(vote, prior, atol=0.3)


@pytest.mark.reference
@pytest.mark.parametrize(
    "name", ["rtpose_light3d", "rtpose_light", "rtpose_align3d", "yolo_posenet"]
)
def test_param_count_parity(name):
    """Learnable parameter counts must match the torch reference exactly."""
    torch = pytest.importorskip("torch")
    from tests.reference_shim import load_cr_module

    if name == "rtpose_light3d":
        ref_mod = load_cr_module("ref_m1", "third_party_methods/lib/network/rtpose_light3d.py")
        ref_model = ref_mod.rtpose_light3d(15, 14, 2, input_dim=1)
        ours = RTPoseLight3D()
    elif name == "rtpose_light":
        ref_mod = load_cr_module("ref_m2", "third_party_methods/lib/network/rtpose_light.py")
        ref_model = ref_mod.rtpose_light(15, 14, 2, input_dim=1)
        ours = RTPoseLight()
    elif name == "rtpose_align3d":
        ref_mod = load_cr_module("ref_m3", "third_party_methods/lib/network/rtpose_align3d.py")
        ref_model = ref_mod.rtpose_align3d(15, 14, 2, input_dim=1)
        ours = RTPoseAlign3D()
    else:
        ref_mod = load_cr_module("ref_m4", "third_party_methods/lib/network/yolo_posenet.py")
        ref_model = ref_mod.YoloPoseNet(15, input_dim=1)
        ours = YoloPoseNet()

    ref_count = sum(p.numel() for p in ref_model.parameters())
    if name == "yolo_posenet":
        # the reference registers resnet34 layer3 but never runs it
        ref_count -= sum(p.numel() for p in ref_model.model0.layer3.parameters())
    variables, _ = init_and_forward(ours)
    assert n_params(variables) == ref_count
