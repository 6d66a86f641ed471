"""2D scan matcher tests (model: real_time_correlative_scan_matcher_2d_test.cc
and ceres_scan_matcher_2d_test.cc: recover known perturbations)."""

import numpy as np
import pytest

from cartographer_tpu.common.config import (
    CeresScanMatcherOptions2D,
    GridOptions2D,
    RealTimeCorrelativeScanMatcherOptions,
    SolverOptions,
    SubmapsOptions2D,
)
from cartographer_tpu.mapping.scan_matching_2d import (
    CeresScanMatcher2D,
    RealTimeCorrelativeScanMatcher2D,
)
from cartographer_tpu.mapping.submap_2d import ActiveSubmaps2D
from cartographer_tpu.ops.scan_matching.gauss_newton_2d import interp_bicubic
from cartographer_tpu.transform import rigid2
from tests.test_grid_2d import make_range_data, small_options

import jax.numpy as jnp


def build_world():
    """Insert a scan of a wall several times to sharpen the grid, return
    (grid, points). Points describe an L-shaped wall around the origin."""
    xs = np.linspace(-2.0, 2.0, 60)
    wall1 = np.stack([xs, np.full_like(xs, 2.0)], axis=1)
    ys = np.linspace(-1.0, 2.0, 45)
    wall2 = np.stack([np.full_like(ys, 2.5), ys], axis=1)
    points = np.concatenate([wall1, wall2], axis=0)
    active = ActiveSubmaps2D(small_options(grid_size=256, resolution=0.05, num_range_data=100))
    for _ in range(8):
        active.insert_range_data(make_range_data((0.0, 0.0), points))
    return active.submaps()[0].grid, points


class TestBicubic:
    def test_interpolates_exactly_at_centers(self):
        rng = np.random.default_rng(0)
        grid = rng.uniform(0.1, 0.9, size=(16, 16)).astype(np.float32)
        for (v, u) in [(3, 4), (5, 5), (10, 2)]:
            val = float(interp_bicubic(jnp.asarray(grid), jnp.float32(u), jnp.float32(v)))
            assert val == pytest.approx(grid[v, u], abs=1e-5)

    def test_smooth_between_centers(self):
        grid = np.zeros((8, 8), np.float32)
        grid[4, 4] = 1.0
        mid = float(interp_bicubic(jnp.asarray(grid), jnp.float32(4.5), jnp.float32(4.0)))
        assert 0.4 < mid < 0.7


class TestRealTimeCorrelative:
    def test_recovers_translation(self):
        grid, points = build_world()
        matcher = RealTimeCorrelativeScanMatcher2D(
            RealTimeCorrelativeScanMatcherOptions(
                linear_search_window=0.2, angular_search_window=np.radians(10.0)
            )
        )
        true_pose = rigid2.make([0.0, 0.0], 0.0)
        # Perturb and ask the matcher to find the way back: the scan is the
        # wall seen from the true pose; we give an offset initial estimate.
        initial = rigid2.make([0.12, -0.08], 0.0)
        score, pose = matcher.match(initial, points, grid)
        assert score > 0.3
        np.testing.assert_allclose(pose[:2], true_pose[:2], atol=0.06)

    def test_recovers_rotation(self):
        grid, points = build_world()
        matcher = RealTimeCorrelativeScanMatcher2D(
            RealTimeCorrelativeScanMatcherOptions(
                linear_search_window=0.1, angular_search_window=np.radians(10.0)
            )
        )
        theta = np.radians(3.0)
        # Scan observed from a rotated pose: points' = R(-theta) p.
        rotated_scan = rigid2.apply(rigid2.make([0.0, 0.0], -theta), points)
        initial = rigid2.make([0.0, 0.0], 0.0)
        score, pose = matcher.match(initial, rotated_scan, grid)
        # Tolerance: the angular grid step is ~0.9 deg and the sharp grid can
        # prefer a neighboring discrete angle paired with a linear offset.
        assert pose[2] == pytest.approx(theta, abs=np.radians(2.0))


class TestCeresScanMatcher:
    def test_refines_small_perturbation(self):
        grid, points = build_world()
        matcher = CeresScanMatcher2D(
            CeresScanMatcherOptions2D(
                occupied_space_weight=1.0,
                translation_weight=0.1,
                rotation_weight=0.1,
                ceres_solver_options=SolverOptions(max_num_iterations=30),
            )
        )
        initial = rigid2.make([0.05, -0.04], np.radians(1.0))
        pose, cost = matcher.match(np.zeros(2), initial, points, grid)
        # The synthetic single-insert wall has a noisy sub-resolution cost
        # surface (bicubic minima off the exact wall); the converged local
        # optimum shifts by backend numerics. Sub-cell accuracy (< grid
        # resolution 5 cm) is the contract here.
        np.testing.assert_allclose(pose[:2], [0.0, 0.0], atol=0.045)
        assert abs(pose[2]) < np.radians(1.0)

    def test_stays_at_optimum(self):
        grid, points = build_world()
        matcher = CeresScanMatcher2D(
            CeresScanMatcherOptions2D(
                translation_weight=10.0, rotation_weight=40.0
            )
        )
        initial = rigid2.make([0.0, 0.0], 0.0)
        pose, _ = matcher.match(np.zeros(2), initial, points, grid)
        # Sub-half-cell drift tolerated (see test_refines_small_perturbation).
        np.testing.assert_allclose(pose[:2], [0.0, 0.0], atol=0.025)
        assert abs(pose[2]) < np.radians(0.3)
