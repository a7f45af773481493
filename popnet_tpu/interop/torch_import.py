"""Torch state_dict -> Flax variables converter.

Upgrades parameter-COUNT parity into numerical parity: reference-trained
checkpoints (the `module.`-prefixed .pth files every reference eval script
loads, e.g. evaluation_yolo_posenet_kdh3d_mpreal.py:120-123) import
directly into this framework's models, so accuracy can be validated
against reference weights with one command.

Mechanism: both frameworks register parameters in network order — torch by
module registration (state_dict key order), Flax by creation order during
the first trace (dict insertion order). The converter walks both sequences
as typed units (conv / batchnorm / linear) and pairs them 1:1 with strict
shape verification (OIHW->HWIO for convs, transpose for linears), so any
structural drift fails loudly instead of silently misassigning. Activation
parity is sealed by tests/test_torch_import.py against the live reference
models.
"""

from __future__ import annotations

import numpy as np


def strip_module_prefix(state_dict: dict) -> dict:
    """Drop the DataParallel 'module.' prefix (reference idiom:
    state_dict key[key.find('.') + 1:], see evaluation scripts)."""
    out = {}
    for k, v in state_dict.items():
        out[k[len("module."):] if k.startswith("module.") else k] = v
    return out


def _torch_units(state_dict, skip_prefixes=()):
    """Group a state_dict into ordered (kind, name, tensors) units.

    kinds: conv {w[, b]}, bn {w, b, mean, var}, linear {w[, b]}.
    """
    items = [
        (k, np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v))
        for k, v in state_dict.items()
        if "num_batches_tracked" not in k
        and not any(k.startswith(p) for p in skip_prefixes)
    ]
    units = []
    i = 0
    while i < len(items):
        k, v = items[i]
        prefix = k.rsplit(".", 1)[0]
        group = {}
        while i < len(items) and items[i][0].rsplit(".", 1)[0] == prefix:
            group[items[i][0].rsplit(".", 1)[1]] = items[i][1]
            i += 1
        if "running_mean" in group:
            units.append(("bn", prefix, group))
        elif group["weight"].ndim == 4:
            units.append(("conv", prefix, group))
        elif group["weight"].ndim == 2:
            units.append(("linear", prefix, group))
        else:
            raise ValueError(f"unclassifiable torch unit {prefix}: "
                             f"{ {k: v.shape for k, v in group.items()} }")
    return units


def _flax_units(variables):
    """Group flax variables into ordered units mirroring _torch_units."""
    from flax import traverse_util

    params = traverse_util.flatten_dict(variables["params"])
    stats = traverse_util.flatten_dict(variables.get("batch_stats") or {})

    units = []
    seen = set()
    for path in params:
        parent = path[:-1]
        if parent in seen:
            continue
        seen.add(parent)
        group = {p[-1]: p for p in params if p[:-1] == parent}
        if "scale" in group:
            mean = parent + ("mean",)
            var = parent + ("var",)
            if mean not in stats or var not in stats:
                raise ValueError(f"BatchNorm {parent} missing batch_stats")
            units.append(("bn", parent, group, {"mean": mean, "var": var}))
        elif "kernel" in group:
            kind = "conv" if params[group["kernel"]].ndim == 4 else "linear"
            units.append((kind, parent, group, None))
        else:
            raise ValueError(f"unclassifiable flax unit {parent}")
    return units, params, stats


def import_state_dict(variables, state_dict, skip_prefixes=(),
                      reorder_prefixes=None, strict=True):
    """Returns new flax `variables` with values taken from `state_dict`.

    `skip_prefixes`: torch keys to ignore (e.g. YoloPoseNet registers
    resnet34 layer3 but never runs it — pass ("model0.layer3.",)).
    `reorder_prefixes`: when torch registration order differs from the flax
    creation order, an ordered tuple of torch key prefixes giving the flax
    order (units bucket by first matching prefix, stable within buckets).
    """
    from flax import traverse_util

    state_dict = strip_module_prefix(state_dict)
    tunits = _torch_units(state_dict, skip_prefixes)
    if reorder_prefixes:
        buckets = [[] for _ in reorder_prefixes]
        for u in tunits:
            for bi, p in enumerate(reorder_prefixes):
                if u[1].startswith(p):
                    buckets[bi].append(u)
                    break
            else:
                raise ValueError(f"torch unit {u[1]} matches no reorder prefix")
        tunits = [u for b in buckets for u in b]
    funits, params, stats = _flax_units(variables)

    if strict and len(tunits) != len(funits):
        raise ValueError(
            f"unit count mismatch: torch {len(tunits)} vs flax {len(funits)}"
        )

    new_params = dict(params)
    new_stats = dict(stats)
    for (tk, tname, tg), (fk, fname, fg, fstats) in zip(tunits, funits):
        where = f"{tname} -> {'/'.join(fname)}"
        if tk != fk:
            raise ValueError(f"unit kind mismatch at {where}: {tk} vs {fk}")
        if tk == "conv":
            w = tg["weight"].transpose(2, 3, 1, 0)  # OIHW -> HWIO
            _assign(new_params, fg["kernel"], w, where)
            _maybe_bias(new_params, fg, tg, where)
        elif tk == "linear":
            _assign(new_params, fg["kernel"], tg["weight"].T, where)
            _maybe_bias(new_params, fg, tg, where)
        else:  # bn
            _assign(new_params, fg["scale"], tg["weight"], where)
            _assign(new_params, fg["bias"], tg["bias"], where)
            _assign(new_stats, fstats["mean"], tg["running_mean"], where)
            _assign(new_stats, fstats["var"], tg["running_var"], where)

    out = {"params": traverse_util.unflatten_dict(new_params)}
    if stats:
        out["batch_stats"] = traverse_util.unflatten_dict(new_stats)
    return out


def _assign(tree, path, value, where):
    import jax.numpy as jnp

    cur = tree[path]
    if tuple(cur.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {where}: flax {tuple(cur.shape)} "
            f"vs torch {tuple(value.shape)}"
        )
    tree[path] = jnp.asarray(value, dtype=cur.dtype)


def _maybe_bias(new_params, fg, tg, where):
    has_f = "bias" in fg
    has_t = "bias" in tg
    if has_f != has_t:
        raise ValueError(f"bias presence mismatch at {where}: "
                         f"flax={has_f} torch={has_t}")
    if has_f:
        _assign(new_params, fg["bias"], tg["bias"], where)


# -- per-model entry points (the quirks are the reference's, documented) ----

def import_rtpose_light3d(variables, state_dict):
    """rtpose_light3d / rtpose_light / rtpose_align3d: registration order
    equals creation order — the generic walker applies directly."""
    return import_state_dict(variables, state_dict)


import_rtpose_light = import_rtpose_light3d
import_rtpose_align3d = import_rtpose_light3d


def import_yolo_posenet(variables, state_dict):
    """YoloPoseNet registers resnet34 layer3 but never runs it
    (reference: yolo_posenet.py:26-56) — those weights are dead."""
    return import_state_dict(variables, state_dict,
                             skip_prefixes=("model0.layer3.",))


def import_a2j(variables, state_dict):
    """A2J registers heads as (regression, classification, depth) but calls
    classification first (reference: model.py:173-186); reorder to our
    creation order (backbone, classification, regression, depth). The
    backbone registers the WHOLE resnet50 including the dead fc head
    (model.py:149-150) — skipped."""
    return import_state_dict(
        variables, state_dict,
        skip_prefixes=("Backbone.model.fc.",),
        reorder_prefixes=("Backbone.", "classificationModel.",
                          "regressionModel.", "DepthRegressionModel."),
    )


def use_vgg(variables, vgg19_state_dict):
    """Load torchvision-vgg19 ImageNet weights into the RTPoseVGG trunk's
    first 10 convs (conv1_1 .. conv4_2), mirroring the reference's use_vgg
    (reference: rtpose_vgg.py:233-249 — copies the first 20 tensors in
    order). The two CPM reduction convs keep their init."""
    from flax import traverse_util

    names = [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3", "conv3_4",
        "conv4_1", "conv4_2",
    ]
    tensors = [
        np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for v in vgg19_state_dict.values()
    ][: 2 * len(names)]

    params = traverse_util.flatten_dict(variables["params"])
    for i, name in enumerate(names):
        w, b = tensors[2 * i], tensors[2 * i + 1]
        kpath = ("trunk", name, "kernel")
        bpath = ("trunk", name, "bias")
        _assign(params, kpath, w.transpose(2, 3, 1, 0), name)
        _assign(params, bpath, b, name)
    out = dict(variables)
    out["params"] = traverse_util.unflatten_dict(params)
    return out


def align_variables(template_variables, variables):
    """Re-nest `variables` in `template_variables`' key order.

    import/export_state_dict pair units by CREATION order (the first-trace
    dict insertion order of model.init). Orbax restores and npz round trips
    hand back alphabetically-sorted trees, which silently breaks that
    contract — align against a fresh init before exporting such a tree."""
    from flax import traverse_util

    out = {}
    for col in template_variables:
        t = traverse_util.flatten_dict(template_variables[col])
        v = traverse_util.flatten_dict(variables[col])
        if set(t) != set(v):
            missing = set(t) ^ set(v)
            raise ValueError(f"variable tree mismatch in '{col}': {missing}")
        for k in t:
            if tuple(t[k].shape) != tuple(v[k].shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(k)}: template "
                    f"{tuple(t[k].shape)} vs loaded {tuple(v[k].shape)}")
        out[col] = traverse_util.unflatten_dict({k: v[k] for k in t})
    return out


def export_state_dict(variables, template_state_dict, skip_prefixes=(),
                      reorder_prefixes=None):
    """Inverse of import_state_dict: flax variables -> a torch-loadable
    state_dict, keyed and ordered like `template_state_dict` (a fresh
    reference net's state_dict provides the key names and the
    num_batches_tracked counters, which flax has no equivalent for).

    This is the take-your-weights-home direction: a model trained with this
    framework loads straight into the reference's torch nets (and from
    there its .pth tooling). Keys under `skip_prefixes` — the reference's
    dead branches (e.g. YoloPoseNet's unused resnet34 layer3,
    yolo_posenet.py:26-56) — keep the template's values. Same unit pairing
    and strict shape checks as the import; round-trip is pinned by
    tests/test_torch_export.py.
    """
    template_state_dict = strip_module_prefix(template_state_dict)
    tunits = _torch_units(template_state_dict, skip_prefixes)
    if reorder_prefixes:
        buckets = [[] for _ in reorder_prefixes]
        for u in tunits:
            for bi, p in enumerate(reorder_prefixes):
                if u[1].startswith(p):
                    buckets[bi].append(u)
                    break
            else:
                raise ValueError(f"torch unit {u[1]} matches no reorder prefix")
        tunits = [u for b in buckets for u in b]
    funits, params, stats = _flax_units(variables)
    if len(tunits) != len(funits):
        raise ValueError(
            f"unit count mismatch: torch {len(tunits)} vs flax {len(funits)}"
        )

    out = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in template_state_dict.items()
    }
    for (tk, tname, tg), (fk, fname, fg, fstats) in zip(tunits, funits):
        where = f"{'/'.join(fname)} -> {tname}"
        if tk != fk:
            raise ValueError(f"unit kind mismatch at {where}: {tk} vs {fk}")
        if tk == "conv":
            _emit(out, f"{tname}.weight",
                  np.asarray(params[fg["kernel"]]).transpose(3, 2, 0, 1), where)
            _maybe_emit_bias(out, tname, fg, tg, params, where)
        elif tk == "linear":
            _emit(out, f"{tname}.weight",
                  np.asarray(params[fg["kernel"]]).T, where)
            _maybe_emit_bias(out, tname, fg, tg, params, where)
        else:  # bn
            _emit(out, f"{tname}.weight", np.asarray(params[fg["scale"]]), where)
            _emit(out, f"{tname}.bias", np.asarray(params[fg["bias"]]), where)
            _emit(out, f"{tname}.running_mean",
                  np.asarray(stats[fstats["mean"]]), where)
            _emit(out, f"{tname}.running_var",
                  np.asarray(stats[fstats["var"]]), where)
    return out


def _emit(out, key, value, where):
    if key not in out:
        raise ValueError(f"export target key missing at {where}: {key}")
    if tuple(out[key].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {where}: torch {tuple(out[key].shape)} "
            f"vs flax {tuple(value.shape)}"
        )
    out[key] = np.asarray(value, dtype=out[key].dtype)


def _maybe_emit_bias(out, tname, fg, tg, params, where):
    has_f = "bias" in fg
    has_t = "bias" in tg
    if has_f != has_t:
        raise ValueError(f"bias presence mismatch at {where}: "
                         f"flax={has_f} torch={has_t}")
    if has_f:
        _emit(out, f"{tname}.bias", np.asarray(params[fg["bias"]]), where)


def export_rtpose_light3d(variables, template_state_dict):
    """rtpose_light3d / rtpose_light / rtpose_align3d: registration order
    equals creation order — the generic walker applies directly."""
    return export_state_dict(variables, template_state_dict)


export_rtpose_light = export_rtpose_light3d
export_rtpose_align3d = export_rtpose_light3d


def export_yolo_posenet(variables, template_state_dict):
    """The reference's dead resnet34 layer3 keeps the template's values."""
    return export_state_dict(variables, template_state_dict,
                             skip_prefixes=("model0.layer3.",))


def export_a2j(variables, template_state_dict):
    """Mirror of import_a2j's reordering and dead-fc skip."""
    return export_state_dict(
        variables, template_state_dict,
        skip_prefixes=("Backbone.model.fc.",),
        reorder_prefixes=("Backbone.", "classificationModel.",
                          "regressionModel.", "DepthRegressionModel."),
    )


def load_torch_checkpoint(path: str):
    """Load a reference .pth checkpoint into a plain numpy state_dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd
