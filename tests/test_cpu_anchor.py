"""CPU anchor (tools/cpu_anchor): compile + agreement with the device BnB.

The anchor binary is a faithful single-core C++ implementation of the
reference's fast-correlative BnB (pyramid + DFS). These tests assert it
(a) builds with the baked toolchain and (b) finds the same match as the
TPU-native beam search on identical inputs — the same agreement strategy
the reference uses between its BnB and exhaustive matchers
(fast_correlative_scan_matcher_2d_test.cc).
"""

import math
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.cpu_anchor.run_anchor import compile_anchor, run_anchor  # noqa: E402


def _make_workload(seed=3):
    """A wall-like occupancy grid + a scan observing it from the center."""
    import jax.numpy as jnp

    from cartographer_tpu.mapping import probability_values as pv
    from cartographer_tpu.mapping.grid_2d import Grid2D

    rng = np.random.default_rng(seed)
    size, res = 256, 0.05
    center = np.array([0.5 * size * res, 0.5 * size * res])
    # Scan: points on a wavy circle of ~4 m radius around the center.
    thetas = np.linspace(-math.pi, math.pi, 400, endpoint=False)
    radii = 4.0 + 0.5 * np.sin(3 * thetas) + 0.05 * rng.normal(size=len(thetas))
    scan = np.stack([radii * np.cos(thetas), radii * np.sin(thetas)], 1)

    log_odds = np.zeros((size, size), np.float32)
    known = np.zeros((size, size), bool)
    wall_world = scan + center
    ix = np.clip(np.floor(wall_world[:, 0] / res).astype(int), 0, size - 1)
    iy = np.clip(np.floor(wall_world[:, 1] / res).astype(int), 0, size - 1)
    log_odds[iy, ix] = pv.MAX_LOG_ODDS
    known[iy, ix] = True
    # Sprinkle observed free space so mismatched placements score lower.
    free = rng.integers(0, size, size=(4000, 2))
    fy, fx = free[:, 0], free[:, 1]
    hit = known[fy, fx] & (log_odds[fy, fx] > 0)
    log_odds[fy[~hit], fx[~hit]] = pv.MIN_LOG_ODDS
    known[fy[~hit], fx[~hit]] = True

    grid = Grid2D(
        log_odds=jnp.asarray(log_odds),
        known=jnp.asarray(known),
        origin=jnp.zeros(2, jnp.float32),
        resolution=res,
    )
    return grid, scan.astype(np.float32), center


def test_anchor_compiles():
    assert compile_anchor()


def test_anchor_agrees_with_device_matcher():
    from cartographer_tpu.common.config import (
        FastCorrelativeScanMatcherOptions2D,
    )
    from cartographer_tpu.ops.scan_matching.fast_correlative_2d import (
        FastCorrelativeScanMatcher2D,
    )

    grid, scan, center = _make_workload()
    depth = 5
    linear, angular, min_score = 1.0, math.radians(15.0), 0.2
    # Perturbed initial pose: the matcher must recover the true placement.
    initial = np.array([center[0] + 0.35, center[1] - 0.25, 0.05])

    matcher = FastCorrelativeScanMatcher2D(
        grid,
        FastCorrelativeScanMatcherOptions2D(
            branch_and_bound_depth=depth,
            linear_search_window=linear,
            angular_search_window=angular,
        ),
    )
    dev = matcher._match_with_window(initial, scan, min_score, linear, angular)
    assert dev is not None

    cpu = run_anchor(
        np.asarray(grid.probability()),
        grid.resolution,
        np.asarray(grid.origin),
        scan,
        initial,
        linear_window=linear,
        angular_window=angular,
        min_score=min_score,
        depth=depth,
        repeats=1,
    )
    assert cpu["found"]
    # Same search lattice on both sides: agreement within one cell / one
    # angular step absorbs float32-vs-double rounding at cell boundaries.
    res = grid.resolution
    assert abs(cpu["pose"][0] - dev.pose[0]) <= res + 1e-6
    assert abs(cpu["pose"][1] - dev.pose[1]) <= res + 1e-6
    assert abs(cpu["pose"][2] - dev.pose[2]) <= 0.01
    assert abs(cpu["score"] - dev.score) <= 5e-3
    # The recovered placement is the true one.
    assert abs(dev.pose[0] - center[0]) <= 2 * res
    assert abs(dev.pose[1] - center[1]) <= 2 * res
