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
for _alias, _type in [("int", int), ("float", float), ("bool", bool), ("object", object)]:
    if not hasattr(np, _alias):
        setattr(np, _alias, _type)

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)
if THIRD_PARTY not in sys.path:
    sys.path.insert(0, THIRD_PARTY)


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
