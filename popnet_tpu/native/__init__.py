"""Native host components (C++ via ctypes — no SWIG, no generated bindings).

The shared library is built on demand with the toolchain's g++; when the
build is unavailable the callers fall back to the NumPy assembler
(popnet_tpu/decode/assemble.py), which is behavior-identical.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpopnet_native.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.popnet_assemble_batch.restype = ctypes.c_int
    lib.popnet_assemble_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


def assemble_batch_native(
    peaks: np.ndarray,       # (B, K, M, 3) float32
    peak_valid: np.ndarray,  # (B, K, M) bool/uint8
    scores: np.ndarray,      # (B, L, M, M) float32
    ok: np.ndarray,          # (B, L, M, M) bool/uint8
    limbs,                   # (L, 2)
    max_people: int = 16,
    min_parts: int = 3,
    min_score: float = 0.2,
):
    """C++ greedy assembly; returns (joints (B, max_people, K, 3), counts (B,)).

    joints rows are (x, y, conf) with (-1, -1, 0) holes; counts gives the
    number of assembled people per image.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable; use decode.assemble")

    peaks = np.ascontiguousarray(peaks, dtype=np.float32)
    valid = np.ascontiguousarray(peak_valid, dtype=np.uint8)
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    ok = np.ascontiguousarray(ok, dtype=np.uint8)
    limbs_arr = np.ascontiguousarray(np.asarray(limbs), dtype=np.int32)

    B, K, M, _ = peaks.shape
    L = scores.shape[1]
    out_joints = np.zeros((B, max_people, K, 3), dtype=np.float32)
    out_counts = np.zeros((B,), dtype=np.int32)

    lib.popnet_assemble_batch(
        B, K, L, M, max_people,
        limbs_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        peaks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_float(min_score), min_parts,
        out_joints.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_joints, out_counts
