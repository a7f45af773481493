from popnet_tpu.losses.losses import (  # noqa: F401
    weighted_mse,
    weighted_mse_v2,
    weighted_sse,
    rtpose_light3d_loss,
    rtpose_light3d_loss_fgweight,
    rtpose_light_loss,
    yolo_loss,
    popnet_loss,
    popnet_rgb_loss,
    popnet_roi_loss,
    a2j_loss,
)
