"""The 15-joint ITOP body model shared by all datasets and models.

Centralizes the skeleton constants the reference duplicates per module
(reference: util/util_functions.py:17-55, lib/datasets/datasets_kdh3d.py:57-134).
"""

from __future__ import annotations

import numpy as np

# Joint order is the ITOP convention (reference: util/util_functions.py:37-55).
KEYPOINT_NAMES: tuple[str, ...] = (
    "head",
    "neck",
    "right_shoulder",
    "left_shoulder",
    "right_elbow",
    "left_elbow",
    "right_wrist",
    "left_wrist",
    "torso",
    "right_hip",
    "left_hip",
    "right_knee",
    "left_knee",
    "right_ankle",
    "left_ankle",
)

NUM_JOINTS = len(KEYPOINT_NAMES)  # 15

ROOT_JOINT = "torso"
ROOT_ID = KEYPOINT_NAMES.index(ROOT_JOINT)  # 8
HEAD_ID = KEYPOINT_NAMES.index("head")  # 0
NECK_ID = KEYPOINT_NAMES.index("neck")  # 1


def _limbs() -> tuple[tuple[int, int], ...]:
    """The 14 limb (src, dst) pairs (reference: util/util_functions.py:17-34)."""
    i = KEYPOINT_NAMES.index
    return (
        (i("torso"), i("right_hip")),
        (i("right_hip"), i("right_knee")),
        (i("right_knee"), i("right_ankle")),
        (i("torso"), i("left_hip")),
        (i("left_hip"), i("left_knee")),
        (i("left_knee"), i("left_ankle")),
        (i("torso"), i("neck")),
        (i("neck"), i("right_shoulder")),
        (i("right_shoulder"), i("right_elbow")),
        (i("right_elbow"), i("right_wrist")),
        (i("neck"), i("left_shoulder")),
        (i("left_shoulder"), i("left_elbow")),
        (i("left_elbow"), i("left_wrist")),
        (i("neck"), i("head")),
    )


LIMBS: tuple[tuple[int, int], ...] = _limbs()
NUM_LIMBS = len(LIMBS)  # 14

# Left/right joint swap used by horizontal flip augmentation
# (reference: lib/datasets/datasets_kdh3d.py:112-174 get_swap_part_indices).
_SWAP_PAIRS = (
    ("right_shoulder", "left_shoulder"),
    ("right_elbow", "left_elbow"),
    ("right_wrist", "left_wrist"),
    ("right_hip", "left_hip"),
    ("right_knee", "left_knee"),
    ("right_ankle", "left_ankle"),
)


def _swap_indices() -> tuple[int, ...]:
    mapping = {}
    for a, b in _SWAP_PAIRS:
        mapping[a] = KEYPOINT_NAMES.index(b)
        mapping[b] = KEYPOINT_NAMES.index(a)
    return tuple(mapping.get(name, i) for i, name in enumerate(KEYPOINT_NAMES))


SWAP_INDICES: tuple[int, ...] = _swap_indices()


def joint_to_zchannel() -> np.ndarray:
    """Map joint id -> channel in the (num_limbs+1)-channel pose-depth map.

    Channel 0 is the root joint; limb k's destination joint maps to channel
    k+1 (reference: lib/datasets/datasets_kdh3d.py:77-88 get_joint2chn).
    """
    out = np.zeros(NUM_JOINTS, dtype=np.int32)
    out[ROOT_ID] = 0
    for k, (_, dst) in enumerate(LIMBS):
        out[dst] = k + 1
    return out


# Drawing colors for visualization (reference: util/util_functions.py:6-8).
JOINT_COLORS = (
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85), (85, 255, 85),
)
