from popnet_tpu.eval.pck import (  # noqa: F401
    eval_human_dataset_2d,
    eval_human_dataset_2d_pckh,
    eval_human_dataset_3d,
    match_humans_2d,
    match_humans_3d,
    compute_bbox_from_humans,
    bbox_ious,
)
from popnet_tpu.eval.map import (  # noqa: F401
    assign_gt_multi,
    get_rpc,
    voc_ap,
    eval_ap_mpii,
    eval_ap_mpii_v2,
    eval_ap_3d,
)
