"""Import helper for golden tests against the read-only reference code.

The reference at /root/reference targets numpy<1.20 / python<3.10; this shim
restores the deprecated aliases it uses so its *behavior* can serve as the
oracle. Nothing from the reference is ever shipped in popnet_tpu.
"""

import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"
THIRD_PARTY = REFERENCE_ROOT + "/third_party_methods"

# numpy 2.x removed these aliases the 2020-era reference relies on.
for _alias, _type in [("int", int), ("float", float), ("bool", bool)]:
    if _alias not in np.__dict__:
        setattr(np, _alias, _type)

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)
if THIRD_PARTY not in sys.path:
    sys.path.insert(0, THIRD_PARTY)


def _stub_module(name: str, **attrs):
    """Install a minimal stand-in for an optional reference dependency."""
    import types

    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _Passthrough:
    def __init__(self, *a, **k):
        pass

    def __call__(self, x):
        return x


# torchvision / thop are not installed; the reference only touches them in
# codepaths (image_transform construction, FLOP profiling) our tests never run.
_tv = _stub_module("torchvision")
_tv_tf = _stub_module("torchvision.transforms")


def _tv_getattr(name):
    if name.startswith("__"):
        raise AttributeError(name)
    return _Passthrough  # any transform -> no-op


_tv_tf.__getattr__ = _tv_getattr
_tv.transforms = _tv_tf
_stub_module("thop", profile=lambda *a, **k: (0, 0), clever_format=lambda *a, **k: "")
# flow_vis is a visualization-only dependency of datasets_mpii_new.py
_stub_module("flow_vis", flow_to_color=lambda *a, **k: None)

import os as _os

_os.environ.setdefault("MPLBACKEND", "Agg")


def load_cr_module(name: str, relpath: str):
    """Load a reference module that uses CR-only (classic-Mac) line endings.

    Python 3 tokenizes CR-only files as one long line, so exec the
    CR-normalized source instead of importing the file directly.
    """
    import types

    path = f"{REFERENCE_ROOT}/{relpath}"
    with open(path, "rb") as f:
        src = f.read().replace(b"\r\n", b"\n").replace(b"\r", b"\n").decode("utf-8")
    mod = types.ModuleType(name)
    mod.__file__ = path
    sys.modules[name] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod
