"""ctypes wrapper for the native 3D loop-closure search (bnb3d_native.cc).

Hybrid placement for 3D (mirrors native/bnb.py): yaw-pruned DFS
branch-and-bound with the low-resolution leaf veto fans across host
cores while the frontend, SPA solves, and the dual-grid GN refinement
stay on the TPU. Reference:
internal/3d/scan_matching/fast_correlative_scan_matcher_3d.cc:112-444,
internal/constraints/constraint_builder_3d.cc.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bnb3d_native.cc")
_LIB_PATH = os.path.join(_DIR, "_bnb3d_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_F = ctypes.POINTER(ctypes.c_float)
_I32 = ctypes.POINTER(ctypes.c_int32)
_I64 = ctypes.POINTER(ctypes.c_int64)


def _build() -> bool:
    for cc in ("g++", "c++", "clang++"):
        try:
            result = subprocess.run(
                [cc, "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", "-pthread", _SRC, "-o", _LIB_PATH],
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
        lib.bnb3_submap_create.restype = ctypes.c_void_p
        lib.bnb3_submap_create.argtypes = [
            _F, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _F, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.bnb3_submap_destroy.argtypes = [ctypes.c_void_p]
        lib.bnb3_match_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
            _F, _I64, _I32,
            _F, _I64, _I32,
            _F, _I64, _I32,
            _F, _F, _I32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeSubmap3D:
    """Owns one 3D submap's native octave pyramid + low-res volume."""

    def __init__(
        self,
        high_prob: np.ndarray,
        low_prob: np.ndarray,
        depth: int,
        full_resolution_depth: int = 3,
    ):
        lib = _load()
        assert lib is not None, "native 3D BnB backend unavailable"
        high_prob = np.ascontiguousarray(high_prob, np.float32)
        low_prob = np.ascontiguousarray(low_prob, np.float32)
        self._lib = lib
        self.depth = depth
        self.shape = high_prob.shape
        self.handle = lib.bnb3_submap_create(
            high_prob.ctypes.data_as(_F), *high_prob.shape,
            low_prob.ctypes.data_as(_F), *low_prob.shape,
            depth, full_resolution_depth,
        )

    def __del__(self):  # pragma: no cover - interpreter shutdown order
        try:
            if getattr(self, "handle", None):
                self._lib.bnb3_submap_destroy(self.handle)
                self.handle = None
        except Exception:
            pass


def _flatten(clouds: Sequence[np.ndarray], width: int):
    """Identity-deduplicated flat concatenation; per-item offset/count."""
    n = len(clouds)
    offsets = np.zeros(n, np.int64)
    counts = np.zeros(n, np.int32)
    uniq: dict = {}
    parts = []
    total = 0
    for i, c in enumerate(clouds):
        hit = uniq.get(id(c))
        if hit is None:
            part = np.ascontiguousarray(c[:, :width], np.float32)
            hit = (total, len(part))
            uniq[id(c)] = hit
            parts.append(part)
            total += len(part)
        offsets[i], counts[i] = hit
    flat = (
        np.concatenate(parts)
        if parts
        else np.zeros((0, width), np.float32)
    )
    return np.ascontiguousarray(flat, np.float32), offsets, counts


def match_batch(
    submaps: List[NativeSubmap3D],
    high_clouds: List[np.ndarray],  # per search [n_i, 3] f32
    low_clouds: List[np.ndarray],  # per search [nl_i, 3] f32
    angle_lists: List[np.ndarray],  # per search pre-pruned yaws f32
    params: np.ndarray,  # [n, 19] f32 (see bnb3d_native.cc)
    num_threads: int = 0,
    seed: bool = True,
    simd: bool = True,
):
    """Run n independent 3D searches across host threads.

    `seed=False` disables the leaf-probe incumbent seeding, and
    `simd=False` pins the scalar scoring loops — together the exact
    reference DFS per core, used by the bench's single-core anchor
    (the production path keeps both on).

    Returns (out [n, 6] f32: score/low_score/a/x/y/z, found [n] i32)."""
    lib = _load()
    assert lib is not None, "native 3D BnB backend unavailable"
    n = len(submaps)
    handles = (ctypes.c_void_p * n)(*[s.handle for s in submaps])
    high, off_h, cnt_h = _flatten(high_clouds, 3)
    low, off_l, cnt_l = _flatten(low_clouds, 3)
    off_a = np.zeros(n, np.int64)
    cnt_a = np.zeros(n, np.int32)
    parts = []
    total = 0
    for i, a in enumerate(angle_lists):
        parts.append(np.ascontiguousarray(a, np.float32))
        off_a[i], cnt_a[i] = total, len(a)
        total += len(a)
    angles = (
        np.concatenate(parts) if parts else np.zeros((0,), np.float32)
    )
    params = np.ascontiguousarray(params, np.float32)
    out = np.zeros((n, 6), np.float32)
    found = np.zeros(n, np.int32)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    lib.bnb3_match_batch(
        handles, n,
        high.ctypes.data_as(_F), off_h.ctypes.data_as(_I64),
        cnt_h.ctypes.data_as(_I32),
        low.ctypes.data_as(_F), off_l.ctypes.data_as(_I64),
        cnt_l.ctypes.data_as(_I32),
        angles.ctypes.data_as(_F), off_a.ctypes.data_as(_I64),
        cnt_a.ctypes.data_as(_I32),
        params.ctypes.data_as(_F),
        out.ctypes.data_as(_F), found.ctypes.data_as(_I32),
        int(num_threads), int(bool(seed)), int(bool(simd)),
    )
    return out, found
