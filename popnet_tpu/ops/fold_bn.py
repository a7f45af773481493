"""Inference-time BatchNorm folding for the serving pipelines.

At inference a BatchNorm is an affine per-channel map
``y = (x - mean) * scale / sqrt(var + eps) + beta``; when it directly
follows a convolution the multiplicative part folds into the conv kernel
and the additive part into the conv bias (or stays as a pure bias add when
the conv has none, as in the ResNet trunks). Folding is EXACT — it is an
algebraic identity on the checkpoint, unlike int8 (ops/quant.py) — so it
needs no calibration and composes with any wire format.

Mechanics: this transforms the *variables* pytree only; the Flax module
definitions are untouched. Every model in this repo creates its BatchNorm
immediately after the conv it normalizes inside the same `@nn.compact`
scope (models/layers.py ConvBN/BasicBlock/Bottleneck/ResPreprocessStem,
models/a2j.py, models/rtpose_vgg.py), so Flax autonaming pairs them as
``Conv_i`` / ``BatchNorm_i`` siblings. After folding, the BN parameters are
rewritten to an identity-scale + residual-bias form (scale=1, mean=0,
var=1-eps, bias=carried term); under jit the closed-over variables are
constants, so XLA constant-folds the neutralized normalization away and the
remaining bias add fuses into the conv epilogue.

Safety: a pair is folded only when the BN channel count equals the conv's
output-channel count; anything unpaired is left untouched. Parity is
asserted per model family in tests/test_fold_bn.py (random batch_stats, so
the fold is load-bearing, plus benchmark-metric identity through the full
PoP-Net pipeline on the committed trained weights).

No reference analogue: the reference serves torch models with live
BatchNorm modules (network/rtpose_light3d.py make_stages); folding is a
deployment transform.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fold_batchnorm"]

# flax.linen.BatchNorm default. INVARIANT: every model in this repo uses the
# default epsilon — a custom-eps BatchNorm would fold silently inexactly.
# Enforced by tests/test_fold_bn.py::test_no_model_overrides_bn_epsilon
# (source scan) plus the mandatory randomized-stats parity test per family.
_BN_EPS = 1e-5


def _to_plain(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def _fold_scope(pnode: dict, snode: dict, folded: list, path: str) -> None:
    """Fold every Conv_i / BatchNorm_i sibling pair in this scope, then
    recurse into child scopes."""
    for key in list(pnode.keys()):
        if not key.startswith("BatchNorm_"):
            continue
        conv_key = "Conv_" + key.split("_", 1)[1]
        conv = pnode.get(conv_key)
        bn_p = pnode[key]
        bn_s = snode.get(key)
        if conv is None or bn_s is None or "kernel" not in conv:
            continue
        kernel = jnp.asarray(conv["kernel"])
        scale = jnp.asarray(bn_p["scale"], jnp.float32)
        beta = jnp.asarray(bn_p["bias"], jnp.float32)
        mean = jnp.asarray(bn_s["mean"], jnp.float32)
        var = jnp.asarray(bn_s["var"], jnp.float32)
        if kernel.shape[-1] != scale.shape[0]:
            continue  # BN does not normalize this conv's output; leave it
        k = scale / jnp.sqrt(var + _BN_EPS)
        conv["kernel"] = (kernel.astype(jnp.float32) * k).astype(kernel.dtype)
        if "bias" in conv:
            b = jnp.asarray(conv["bias"], jnp.float32)
            conv["bias"] = ((b - mean) * k + beta).astype(jnp.asarray(conv["bias"]).dtype)
            residual = jnp.zeros_like(beta)
        else:
            # bias-free conv (ResNet trunks): the BN stays as a pure bias add
            residual = beta - mean * k
        bn_p["scale"] = jnp.ones_like(scale)
        bn_p["bias"] = residual
        bn_s["mean"] = jnp.zeros_like(mean)
        bn_s["var"] = jnp.full_like(var, 1.0 - _BN_EPS)  # var + eps == 1
        folded.append(f"{path}/{conv_key}")
    for key, child in pnode.items():
        if isinstance(child, dict):
            _fold_scope(child, snode.get(key, {}), folded, f"{path}/{key}")


def fold_batchnorm(variables):
    """Return a new variables pytree with every Conv->BatchNorm pair folded.

    Accepts the standard Flax collection dict ``{"params": ...,
    "batch_stats": ...}`` (frozen or plain); collections other than those
    two pass through unchanged. Returns ``(variables, folded_paths)`` where
    ``folded_paths`` lists the conv scopes that absorbed a BN.
    """
    variables = _to_plain(variables)
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    folded: list[str] = []
    _fold_scope(params, stats, folded, "")
    return variables, folded
