"""ctypes wrapper for the native loop-closure search (bnb_native.cc).

Hybrid-placement rationale: branch-and-bound constraint search is
L1/L2-cache-resident pointer-chasing — measured at ~300-500 windowed
depth-7 matches/s per host core, versus ~5 matches/s for a 256-search
drain through the gather-bound XLA:TPU formulation. ConstraintBuilder2D
therefore offers `loop_closure_backend="native"`: BnB searches fan out
across host cores (this module) while the frontend, SPA solves, and the
batched GN refinement stay on the TPU. Mirrors the reference's
ThreadPool fan-out (constraint_builder_2d.cc:102-136).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bnb_native.cc")
_LIB_PATH = os.path.join(_DIR, "_bnb_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


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
        lib.bnb_pyramid_create.restype = ctypes.c_void_p
        lib.bnb_pyramid_create.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.bnb_pyramid_destroy.argtypes = [ctypes.c_void_p]
        lib.bnb_match_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativePyramid:
    """Owns one submap's native precomputation pyramid."""

    def __init__(self, prob: np.ndarray, depth: int):
        lib = _load()
        assert lib is not None, "native BnB backend unavailable"
        prob = np.ascontiguousarray(prob, np.float32)
        self._lib = lib
        self.h, self.w = prob.shape
        self.depth = depth
        self.handle = lib.bnb_pyramid_create(
            prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.h,
            self.w,
            depth,
        )

    def __del__(self):  # pragma: no cover - interpreter shutdown order
        try:
            if getattr(self, "handle", None):
                self._lib.bnb_pyramid_destroy(self.handle)
                self.handle = None
        except Exception:
            pass


def match_batch(
    pyramids: List[NativePyramid],
    clouds: List[np.ndarray],  # per search [n_i, 2] f32
    params: np.ndarray,  # [n, 9] f32 (see bnb_native.cc)
    num_threads: int = 0,
):
    """Run n independent searches across host threads.

    Clouds are deduplicated by object identity (one node is searched
    against many submaps per drain) before the flat upload to the C++
    layer — searches carry (offset, count) references into the unique
    concatenation.

    Returns (out [n, 4] f32: score/x/y/theta, found [n] i32)."""
    lib = _load()
    assert lib is not None, "native BnB backend unavailable"
    n = len(pyramids)
    handles = (ctypes.c_void_p * n)(*[p.handle for p in pyramids])
    offsets = np.zeros(n, np.int64)
    counts = np.zeros(n, np.int32)
    uniq: dict = {}
    flat_parts = []
    total = 0
    for i, c in enumerate(clouds):
        key = id(c)
        hit = uniq.get(key)
        if hit is None:
            part = np.ascontiguousarray(c[:, :2], np.float32)
            hit = (total, len(part))
            uniq[key] = hit
            flat_parts.append(part)
            total += len(part)
        offsets[i], counts[i] = hit
    flat = (
        np.concatenate(flat_parts)
        if flat_parts
        else np.zeros((0, 2), np.float32)
    )
    flat = np.ascontiguousarray(flat, np.float32)
    params = np.ascontiguousarray(params, np.float32)
    out = np.zeros((n, 4), np.float32)
    found = np.zeros(n, np.int32)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    lib.bnb_match_batch(
        handles,
        n,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        found.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(num_threads),
    )
    return out, found
