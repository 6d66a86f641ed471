"""Native (C++) host-side kernels, built on demand and loaded via ctypes.

Falls back to the pure-numpy implementations when no compiler is available
(`available()` reports which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cc")
_LIB_PATH = os.path.join(_DIR, "_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    for cc in ("g++", "c++", "clang++"):
        try:
            result = subprocess.run(
                [
                    cc,
                    "-O3",
                    "-march=native",
                    "-shared",
                    "-fPIC",
                    "-std=c++17",
                    _SRC,
                    "-o",
                    _LIB_PATH,
                ],
                capture_output=True,
                timeout=120,
            )
            if result.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.voxel_filter_indices.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ray_to_pixel_mask.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.ray_to_pixel_mask.restype = ctypes.c_int64
        lib.accumulate_cells_2d.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rotational_histogram.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def voxel_filter_indices(points: np.ndarray, resolution: float) -> np.ndarray:
    """Boolean keep-mask, one point per voxel (first occurrence)."""
    lib = _load()
    points = np.ascontiguousarray(points[:, :3], np.float32)
    n = len(points)
    if lib is None or n == 0:
        from cartographer_tpu.sensor.voxel_filter import (
            voxel_filter_indices as np_impl,
        )

        return np_impl(points, resolution)
    out = np.zeros(n, np.uint8)
    lib.voxel_filter_indices(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        resolution,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def ray_to_pixel_mask(
    begin: np.ndarray, end: np.ndarray, subpixel_scale: int
) -> np.ndarray:
    """All pixels crossed by the segment (subpixel int coords), shape (K, 2)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    max_out = int(
        4
        + 2
        * (
            abs(int(end[0]) - int(begin[0])) // subpixel_scale
            + abs(int(end[1]) - int(begin[1])) // subpixel_scale
            + 2
        )
    )
    out = np.zeros((max_out, 2), np.int32)
    k = lib.ray_to_pixel_mask(
        int(begin[0]),
        int(begin[1]),
        int(end[0]),
        int(end[1]),
        subpixel_scale,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_out,
    )
    assert k >= 0, "ray_to_pixel_mask overflow"
    return out[:k]


def rotational_histogram(points: np.ndarray, histogram_size: int):
    """Rotational scan-matcher histogram (gravity-aligned (N, 3) cloud) —
    native when available, else None (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points[:, :3], np.float32)
    out = np.zeros(histogram_size, np.float32)
    lib.rotational_histogram(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(points),
        histogram_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def accumulate_cells_2d(
    points_cells: np.ndarray, height: int, width: int
) -> np.ndarray:
    lib = _load()
    points_cells = np.ascontiguousarray(points_cells[:, :2], np.float32)
    grid = np.zeros((height, width), np.int32)
    if lib is None or len(points_cells) == 0:
        ix = np.floor(points_cells[:, 0]).astype(int)
        iy = np.floor(points_cells[:, 1]).astype(int)
        m = (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
        np.add.at(grid, (iy[m], ix[m]), 1)
        return grid
    lib.accumulate_cells_2d(
        points_cells.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(points_cells),
        height,
        width,
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return grid
