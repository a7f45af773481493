from popnet_tpu.data.compositing import bg_composite, mp_composite  # noqa: F401
from popnet_tpu.data.labels import (  # noqa: F401
    load_label_file,
    pack_annotations,
    PackedAnnotations,
)
