"""Pinhole camera geometry shared by datasets, decode, and eval.

Works on NumPy or JAX arrays alike (pure arithmetic, no indexing tricks).
Reference semantics: util/util_functions.py:4,111-119,219-256.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    fx: float
    fy: float
    cx: float
    cy: float

    def matrix(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float64,
        )


# Kinect Azure intrinsics of the MP-3DHP capture rig
# (reference: util/util_functions.py:4).
KDH3D_INTRINSICS = CameraIntrinsics(
    fx=504.1189880371094, fy=504.042724609375, cx=231.7421875, cy=320.62640380859375
)

# ITOP camera model (reference: lib/datasets/datasets_itop.py:37-41).
ITOP_INTRINSICS = CameraIntrinsics(fx=1.0 / 0.0035, fy=1.0 / 0.0035, cx=160.0, cy=120.0)


def back_project(x_2d, y_2d, z, cam: CameraIntrinsics):
    """Back-project pixel coords + metric depth into camera-frame 3D.

    Returns a (..., 3) stack [X, Y, Z]
    (reference: util/util_functions.py:111-119 pos_3d_from_2d_and_depth).
    """
    x = np.asarray(x_2d) if isinstance(x_2d, (list, tuple)) else x_2d
    y = np.asarray(y_2d) if isinstance(y_2d, (list, tuple)) else y_2d
    X = (x - cam.cx) / cam.fx * z
    Y = (y - cam.cy) / cam.fy * z
    if hasattr(X, "shape") and not isinstance(X, np.ndarray):
        import jax.numpy as jnp

        return jnp.stack([X, Y, z], axis=-1)
    return np.stack([np.broadcast_to(X, np.shape(z)), np.broadcast_to(Y, np.shape(z)),
                     np.asarray(z)], axis=-1)


def project(points_3d, cam: CameraIntrinsics):
    """Project camera-frame 3D points to pixels.

    points_3d: (..., 3). Returns (..., 2)
    (reference: util/util_functions.py:219-230 projective_camera).
    """
    x = points_3d[..., 0] / points_3d[..., 2] * cam.fx + cam.cx
    y = points_3d[..., 1] / points_3d[..., 2] * cam.fy + cam.cy
    if isinstance(points_3d, np.ndarray):
        return np.stack([x, y], axis=-1)
    import jax.numpy as jnp

    return jnp.stack([x, y], axis=-1)


def approx_root_orientation(hip_left_pt, hip_right_pt, neck_pt) -> np.ndarray:
    """Pelvis-frame rotation from hips + neck.

    X-axis: left->right hip; Y-axis: (right->left hip) x (left hip->neck);
    Z-axis: X x Y. Returns (N, 3, 3) with axes as columns
    (reference: util/util_functions.py:122-149).
    """
    hip_left = np.asarray(hip_left_pt, dtype=np.float64).reshape(-1, 3)
    hip_right = np.asarray(hip_right_pt, dtype=np.float64).reshape(-1, 3)
    neck = np.asarray(neck_pt, dtype=np.float64).reshape(-1, 3)

    x_axis = hip_right - hip_left
    x_axis = x_axis / (np.linalg.norm(x_axis, axis=1, keepdims=True) + 1e-9)
    y_axis = np.cross(-x_axis, neck - hip_left)
    y_axis = y_axis / (np.linalg.norm(y_axis, axis=1, keepdims=True) + 1e-9)
    z_axis = np.cross(x_axis, y_axis)
    return np.concatenate(
        [x_axis.reshape(-1, 3, 1), y_axis.reshape(-1, 3, 1), z_axis.reshape(-1, 3, 1)],
        axis=2,
    )


def transform_3d(points_3d: np.ndarray, R: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Apply rigid transform [R|T] to (N, 3) points
    (reference: util/util_functions.py:246-256)."""
    return points_3d @ R.T + T.reshape(1, 3)
