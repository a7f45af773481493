from popnet_tpu.ops.encoders import (  # noqa: F401
    encode_heatmaps,
    encode_pafs,
    encode_zmaps,
    encode_alignmaps,
    encode_prior_targets,
    encode_targets,
)
from popnet_tpu.ops.resize import downsample_bilinear_cv2, resize_bilinear_cv2  # noqa: F401
