from popnet_tpu.core import skeleton, camera, config  # noqa: F401
from popnet_tpu.core.skeleton import (  # noqa: F401
    KEYPOINT_NAMES,
    LIMBS,
    NUM_JOINTS,
    NUM_LIMBS,
    ROOT_JOINT,
    HEAD_ID,
    NECK_ID,
    SWAP_INDICES,
    joint_to_zchannel,
)
from popnet_tpu.core.camera import CameraIntrinsics, KDH3D_INTRINSICS, ITOP_INTRINSICS  # noqa: F401
from popnet_tpu.core.config import DepthStats, KDH3D_DEPTH, ITOP_DEPTH  # noqa: F401
