from popnet_tpu.decode.peaks_np import find_peaks, nms_heatmaps  # noqa: F401
from popnet_tpu.decode.paf_np import (  # noqa: F401
    find_connected_joints,
    group_limbs_of_same_person,
    paf_to_pose,
)
from popnet_tpu.decode.human_list import paf_to_human_list  # noqa: F401
from popnet_tpu.decode.readout import (  # noqa: F401
    retrieve_depth_heat_weighted,
    retrieve_depth_weighted,
    retrieve_depth_heat_max,
    retrieve_offsets_heat_weighted,
)
from popnet_tpu.decode.prior import parse_prior_pose  # noqa: F401
