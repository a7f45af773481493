"""Typed configuration for datasets, encoders, models, and decoding.

Replaces the reference's two coexisting config systems (per-script argparse
defaults + yacs CfgNode, reference: lib/config/default.py:10-175) with plain
frozen dataclasses so every jitted function closes over static Python values.
"""

from __future__ import annotations

import dataclasses

from popnet_tpu.core.camera import CameraIntrinsics, KDH3D_INTRINSICS, ITOP_INTRINSICS
from popnet_tpu.core.skeleton import NUM_JOINTS, NUM_LIMBS


@dataclasses.dataclass(frozen=True)
class DepthStats:
    """Depth normalization statistics (reference: util/util_functions.py:10-13)."""

    mean: float = 3.0
    std: float = 2.0
    max: float = 6.0

    def normalize(self, depth):
        return (depth - self.mean) / self.std

    def denormalize(self, z):
        return z * self.std + self.mean


KDH3D_DEPTH = DepthStats(mean=3.0, std=2.0, max=6.0)
# ITOP uses a 5 m clip (reference: lib/datasets/datasets_itop.py:42-47).
ITOP_DEPTH = DepthStats(mean=3.0, std=2.0, max=5.0)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Static geometry of the dense GT targets.

    Defaults follow the KDH3D training recipe
    (reference: lib/datasets/datasets_kdh3d.py:182-237,
    third_party_methods/train_yolo_posenet_kdh3d.py:44-46).
    """

    input_x: int = 224          # network input width
    input_y: int = 224          # network input height
    stride: int = 8             # heatmap/PAF grid stride
    stride_z: int = 8           # z-map grid stride
    stride_align: int = 8       # align-map grid stride
    stride_prior: int = 16      # prior (anchor) grid stride
    sigma: float = 7.0          # heatmap Gaussian sigma (input pixels)
    paf_width: float = 1.0      # PAF limb half-width (grid cells)
    z_radius: int = 2           # z-map box radius (grid cells)
    align_radius: int = 2       # align-map box radius (grid cells)
    num_joints: int = NUM_JOINTS
    num_limbs: int = NUM_LIMBS
    anchors: tuple[tuple[float, float], ...] = ((6.0, 3.0), (12.0, 6.0))
    max_people: int = 8         # static cap on people per image

    @property
    def grid_w(self) -> int:
        return self.input_x // self.stride

    @property
    def grid_h(self) -> int:
        return self.input_y // self.stride

    @property
    def zgrid_w(self) -> int:
        return self.input_x // self.stride_z

    @property
    def zgrid_h(self) -> int:
        return self.input_y // self.stride_z

    @property
    def agrid_w(self) -> int:
        return self.input_x // self.stride_align

    @property
    def agrid_h(self) -> int:
        return self.input_y // self.stride_align

    @property
    def prior_w(self) -> int:
        return self.input_x // self.stride_prior

    @property
    def prior_h(self) -> int:
        return self.input_y // self.stride_prior

    @property
    def num_anchors(self) -> int:
        return len(self.anchors)


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Inference post-processing thresholds.

    Reference: lib/config/default.py (TEST.THRESH_HEATMAP=0.1,
    THRESH_PAF=0.05, NUM_INTERMED_PTS=10, MODEL.DOWNSAMPLE=8).
    """

    downsample: int = 8             # heatmap->image upsample factor
    thresh_heatmap: float = 0.1     # peak detection threshold
    thresh_paf: float = 0.05        # PAF sample score threshold
    num_intermed_pts: int = 10      # PAF line-integral samples
    win_size: int = 2               # subpixel refinement patch half-size
    max_peaks: int = 16             # static cap on peaks per joint type
    max_people: int = 16            # static cap on decoded people
    min_parts: int = 3              # drop people with fewer joints
    min_score: float = 0.2          # drop people with lower mean score
    # Prior (YOLO) decode thresholds
    # (reference: evaluate/evaluation_yolo_posenet_kdh3d_mpreal.py:157-165).
    conf_threshold: float = 0.5
    nms_threshold: float = 0.5
    vis_margin: int = 0


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """Static description of a depth-pose dataset."""

    name: str = "kdh3d"
    width: int = 480
    height: int = 512
    intrinsics: CameraIntrinsics = KDH3D_INTRINSICS
    depth: DepthStats = KDH3D_DEPTH
    joint2box_margin: float = 25.0


KDH3D_DATASET = DatasetConfig()
ITOP_DATASET = DatasetConfig(
    name="itop", width=320, height=240, intrinsics=ITOP_INTRINSICS, depth=ITOP_DEPTH
)
