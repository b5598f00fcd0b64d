"""ctypes bindings for the native host data-path library (native/qv2x_host.cc).

Auto-builds the .so on first use if a toolchain is available; every entry
point has a pure-python fallback so the package works without it.
"""

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libqv2x_host.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.qv2x_load_bin.restype = ctypes.c_int64
    lib.qv2x_load_bin.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64,
                                  ctypes.c_void_p]
    lib.qv2x_voxelize.restype = ctypes.c_int64
    lib.qv2x_voxelize.argtypes = [f32p, ctypes.c_int64, f32p, f32p,
                                  ctypes.c_int32, ctypes.c_int32,
                                  f32p, i32p, i32p]
    lib.qv2x_iou_matrix.restype = None
    lib.qv2x_iou_matrix.argtypes = [f32p, ctypes.c_int64, f32p,
                                    ctypes.c_int64, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_bin(path: str, max_points: int = 200000,
             lidar_range: Optional[tuple] = None) -> np.ndarray:
    """Fast .bin reader (NaN scrub + optional range filter)."""
    lib = _load()
    if lib is None:
        from quantv2x_tpu.data.dataset import load_lidar
        pts = load_lidar(path)
        if lidar_range is not None:
            r = lidar_range
            m = ((pts[:, 0] >= r[0]) & (pts[:, 0] < r[3])
                 & (pts[:, 1] >= r[1]) & (pts[:, 1] < r[4])
                 & (pts[:, 2] >= r[2]) & (pts[:, 2] < r[5]))
            pts = pts[m]
        return pts[:max_points]
    out = np.empty((max_points, 4), np.float32)
    rng_arr = (np.asarray(lidar_range, np.float32)
               if lidar_range is not None else None)
    n = lib.qv2x_load_bin(
        path.encode(), out, max_points,
        rng_arr.ctypes.data if rng_arr is not None else None,
    )
    if n < 0:
        raise IOError(f"failed to read {path}")
    return out[:n]


def voxelize_host(points: np.ndarray, lidar_range, voxel_size,
                  max_points_per_voxel: int, max_voxels: int):
    """Reference-exact CPU voxelizer (first-come pillar order)."""
    lib = _load()
    pts = np.ascontiguousarray(points[:, :4], np.float32)
    if lib is None:
        raise RuntimeError("native library unavailable")
    vf = np.zeros((max_voxels, max_points_per_voxel, 4), np.float32)
    vc = np.zeros((max_voxels, 3), np.int32)
    vn = np.zeros((max_voxels,), np.int32)
    n = lib.qv2x_voxelize(
        pts, len(pts), np.asarray(lidar_range, np.float32),
        np.asarray(voxel_size, np.float32), max_points_per_voxel, max_voxels,
        vf, vc, vn,
    )
    return {
        "voxel_features": vf, "voxel_coords": vc, "voxel_num_points": vn,
        "num_voxels": int(n),
    }


def iou_matrix_host(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    out = np.empty((len(a), len(b)), np.float32)
    lib.qv2x_iou_matrix(a, len(a), b, len(b), out)
    return out
