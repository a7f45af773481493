"""Interoperability with the reference's torch artifacts."""

from popnet_tpu.interop.torch_import import (  # noqa: F401
    import_state_dict, load_torch_checkpoint, strip_module_prefix,
)
