from popnet_tpu.viz.draw import (  # noqa: F401
    depth_to_gray,
    draw_humans,
    draw_humans_visibility,
    overlay_seg,
    visualize_gt,
    visualize_pred,
)
