"""BatchNorm folding (ops/fold_bn.py): exactness and serving wiring.

The fold is only correct if every BatchNorm_i really consumes Conv_i's
output in the model graphs, so batch_stats and BN affine params are
RANDOMIZED first — a mispaired fold would then diverge loudly instead of
passing vacuously on identity statistics (the same lesson as the round-2
importer tests, NOTES.md §7).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popnet_tpu.models import (
    A2J, PopNet, PopNetRGB, RTPoseAlign3D, RTPoseLight, RTPoseLight3D,
    RTPoseVGG, YoloPoseNet,
)
from popnet_tpu.ops.fold_bn import fold_batchnorm

RESULTS = os.path.join(os.path.dirname(__file__), "..", "examples", "results")


def _randomize_bn(variables, seed=0):
    """Give every BatchNorm nontrivial scale/bias/mean/var so the fold is
    load-bearing."""
    rng = np.random.default_rng(seed)

    def walk(node):
        for key, child in node.items():
            if not isinstance(child, dict):
                continue
            if key.startswith("BatchNorm_"):
                for leaf_key, leaf in child.items():
                    shape = np.shape(leaf)
                    if leaf_key in ("scale", "var"):
                        child[leaf_key] = jnp.asarray(
                            rng.uniform(0.5, 2.0, shape), jnp.float32)
                    else:  # bias / mean
                        child[leaf_key] = jnp.asarray(
                            rng.uniform(-0.5, 0.5, shape), jnp.float32)
            else:
                walk(child)

    variables = jax.tree.map(lambda x: x, variables)  # deep-ish copy of dicts
    if hasattr(variables, "unfreeze"):
        variables = variables.unfreeze()
    walk(variables["params"])
    walk(variables.get("batch_stats", {}))
    return variables


# EVERY exported BN-bearing model family must have a row here — the fold's
# autoname-index pairing is only proven by this randomized parity test
# (ADVICE r3); test_every_bn_family_is_parity_tested enforces the listing.
PARITY_CASES = [
    (RTPoseLight3D(), (64, 64), 1),
    (RTPoseLight(), (64, 64), 1),
    (RTPoseAlign3D(), (64, 64), 1),
    (PopNet(), (64, 64), 1),
    (PopNetRGB(), (64, 64), 3),
    (YoloPoseNet(), (64, 64), 1),
    (A2J(), (96, 96), 1),
    (RTPoseVGG(trunk="mobilenet"), (64, 64), 3),  # vgg19 trunk has no BN
]


@pytest.mark.parametrize(
    "model,hw,cin",
    PARITY_CASES,
    ids=[type(m).__name__ for m, _, _ in PARITY_CASES],
)
def test_fold_activation_parity(model, hw, cin):
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, *hw, cin)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_bn(variables)
    folded, paths = fold_batchnorm(variables)
    assert len(paths) > 0, "no Conv->BN pairs found to fold"

    ref = model.apply(variables, x, train=False)
    out = model.apply(folded, x, train=False)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        a, b = np.asarray(a), np.asarray(b)
        # f32 reassociation noise scales with the tensor's magnitude (A2J's
        # random-init regression heads span +-1e5); tolerate 1e-5 of it
        atol = 1e-4 * max(1.0, float(np.abs(a).max()) * 1e-1)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=atol)


def test_fold_is_idempotent_and_leaves_unpaired_bn():
    """Folding twice is a no-op (the first pass neutralizes every BN)."""
    model = RTPoseLight3D()
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = _randomize_bn(model.init(jax.random.PRNGKey(0), x, train=False))
    once, paths1 = fold_batchnorm(variables)
    twice, paths2 = fold_batchnorm(once)
    assert paths1 == paths2  # same pairs re-visited...
    ref = model.apply(once, x, train=False)
    out = model.apply(twice, x, train=False)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fold_bn_serving_wire_parity():
    """The full PoP-Net pipeline with fold_bn=True emits the same wire
    buffer as the exact path, on the committed trained weights."""
    from popnet_tpu.serving import build_popnet_pipeline, variables_from_npz

    ckpt = os.path.join(RESULTS, "bench_weights_popnet.npz")
    variables = variables_from_npz(ckpt)
    frames = jnp.asarray(
        np.random.default_rng(2).uniform(0.5, 5.5, (2, 128, 120)).astype(np.float32)
    )
    ref = np.asarray(build_popnet_pipeline(variables, dtype=jnp.float32)(frames))
    out = np.asarray(
        build_popnet_pipeline(variables, dtype=jnp.float32, fold_bn=True)(frames)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_fold_covers_every_bn():
    """Every BatchNorm scope in the flagship models is paired with a conv
    and folded — none silently skipped."""
    for model in (RTPoseLight3D(), PopNet(), YoloPoseNet()):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1), jnp.float32),
            train=False,
        )
        n_bn = sum(
            1 for k in jax.tree_util.tree_flatten_with_path(
                variables["batch_stats"])[0]
            for k in [None]
        ) // 2  # mean + var per BN
        _, paths = fold_batchnorm(variables)
        assert len(paths) == n_bn, (type(model).__name__, len(paths), n_bn)


def test_fold_composes_with_int8():
    """fold_bn + dynamic-int8 serving (the documented composition): the
    pipeline runs and stays within the int8 path's own tolerance of the
    exact-f32 wire."""
    from popnet_tpu.serving import build_popnet_pipeline, variables_from_npz

    ckpt = os.path.join(RESULTS, "bench_weights_popnet.npz")
    variables = variables_from_npz(ckpt)
    frames = jnp.asarray(
        np.random.default_rng(3).uniform(0.5, 5.5, (2, 128, 120)).astype(np.float32)
    )
    exact = np.asarray(build_popnet_pipeline(variables, dtype=jnp.float32)(frames))
    both = np.asarray(
        build_popnet_pipeline(
            variables, dtype=jnp.float32, quant="int8", fold_bn=True
        )(frames)
    )
    int8_only = np.asarray(
        build_popnet_pipeline(variables, dtype=jnp.float32, quant="int8")(frames)
    )
    # fold must not widen the int8 path's deviation from exact
    d_both = np.abs(both - exact).max()
    d_int8 = np.abs(int8_only - exact).max()
    assert d_both <= d_int8 + 0.05, (d_both, d_int8)


def test_no_model_overrides_bn_epsilon():
    """ops/fold_bn.py hardcodes the flax default epsilon (_BN_EPS=1e-5); a
    model passing a custom eps would fold silently inexactly — the
    channel-count guard cannot catch it (ADVICE r3). Source-scan every model
    module for an epsilon override."""
    models_dir = os.path.join(
        os.path.dirname(__file__), "..", "popnet_tpu", "models"
    )
    offenders = [
        fname
        for fname in sorted(os.listdir(models_dir))
        if fname.endswith(".py")
        and "epsilon" in open(os.path.join(models_dir, fname)).read()
    ]
    assert not offenders, (
        f"{offenders} override BatchNorm epsilon; thread eps per-module into "
        "ops/fold_bn.py before folding these families"
    )


def test_every_bn_family_is_parity_tested():
    """ADVICE r3: fold pairing is autoname-index based, so the randomized
    parity test above is MANDATORY for every BN-bearing model family. Fail
    loudly when a new exported model carries batch_stats without a
    PARITY_CASES row."""
    import popnet_tpu.models as M

    covered = {type(m).__name__ for m, _, _ in PARITY_CASES}
    exported = [
        name for name in dir(M)
        if not name.startswith("_") and isinstance(getattr(M, name), type)
    ]
    for name in exported:
        cls = getattr(M, name)
        try:
            model = cls()
        except TypeError:
            continue  # not a no-arg model (none today)
        cin = 3 if "RGB" in name or name == "RTPoseVGG" else 1
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, cin), jnp.float32),
            train=False,
        )
        if variables.get("batch_stats") and name not in covered:
            raise AssertionError(
                f"model family {name} has BatchNorms but no randomized "
                "fold-parity row in PARITY_CASES (tests/test_fold_bn.py)"
            )
