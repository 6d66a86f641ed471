"""Measure the CPU loop-closure anchor (matches/s on one core of this host).

Compiles tools/cpu_anchor/bnb_anchor.cc (a faithful single-threaded C++
implementation of the reference's fast-correlative BnB matcher — pyramid +
DFS, re-derived, not copied) and runs it on a caller-supplied workload.
bench.py uses the result as the measured `vs_baseline` denominator for the
loop-closure row instead of a documented estimate; tests use it to
cross-check that the C++ DFS and the device beam search find the same pose
on identical inputs (the reference's BnB-vs-exhaustive agreement strategy,
fast_correlative_scan_matcher_2d_test.cc).
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bnb_anchor.cc")


def compile_anchor() -> str:
    """Build (once) and return the anchor binary path."""
    out = os.path.join(_DIR, ".build", "bnb_anchor")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-o", out, _SRC],
        check=True,
        capture_output=True,
        text=True,
    )
    return out


def write_input(
    path: str,
    prob: np.ndarray,  # [H, W] f32 probability, unknown -> 0.1
    resolution: float,
    origin: np.ndarray,  # [2]
    points: np.ndarray,  # [N, 2] gravity-aligned scan
    initial_pose: np.ndarray,  # [3]
    linear_window: float,
    angular_window: float,
    min_score: float,
    depth: int,
    repeats: int,
) -> None:
    prob = np.ascontiguousarray(prob, np.float32)
    points = np.ascontiguousarray(points[:, :2], np.float32)
    h, w = prob.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<5i", h, w, depth, len(points), repeats))
        f.write(
            struct.pack(
                "<9f",
                resolution,
                float(origin[0]),
                float(origin[1]),
                float(initial_pose[0]),
                float(initial_pose[1]),
                float(initial_pose[2]),
                linear_window,
                angular_window,
                min_score,
            )
        )
        f.write(prob.tobytes())
        f.write(points.tobytes())


def run_anchor(
    prob: np.ndarray,
    resolution: float,
    origin: np.ndarray,
    points: np.ndarray,
    initial_pose: np.ndarray,
    linear_window: float = 7.0,
    angular_window: float = np.radians(30.0),
    min_score: float = 0.3,
    depth: int = 7,
    repeats: int = 20,
) -> dict:
    """Returns the anchor JSON: matches_per_sec, ms_per_match, score, pose."""
    binary = compile_anchor()
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as tf:
        path = tf.name
    try:
        write_input(
            path,
            prob,
            resolution,
            origin,
            points,
            initial_pose,
            linear_window,
            angular_window,
            min_score,
            depth,
            repeats,
        )
        out = subprocess.run(
            [binary, path],
            check=True,
            capture_output=True,
            text=True,
            timeout=600,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    finally:
        os.unlink(path)
