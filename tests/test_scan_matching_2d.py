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


class TestBandMatcher:
    """gauss_newton_2d.match_bands: the weight-folded band bilinear-form
    formulation must agree with the 4x4 patch LM (`match`) — same residuals
    and normal equations up to MXU rounding — and recover perturbations."""

    def _cost_grid_args(self, grid, points, initial, max_it=30):
        import jax.numpy as jnp

        prob = np.where(
            np.asarray(grid.known),
            1.0 / (1.0 + np.exp(-np.asarray(grid.log_odds))),
            0.1,
        ).astype(np.float32)
        from cartographer_tpu.mapping.scan_matching_2d import pad_points_2d

        points_p, point_mask = pad_points_2d(np.asarray(points))
        return (
            jnp.asarray(1.0 - prob),
            jnp.asarray(grid.origin),
            jnp.asarray(initial, jnp.float32),
            jnp.asarray(initial[:2], jnp.float32),
            jnp.asarray(points_p),
            jnp.asarray(point_mask),
            grid.resolution,
            1.0,
            0.1,
            0.1,
            max_it,
        )

    def test_agrees_with_patch_matcher(self):
        from cartographer_tpu.ops.scan_matching import gauss_newton_2d as gn

        grid, points = build_world()
        for seed in range(3):
            rng = np.random.default_rng(seed)
            initial = rigid2.make(rng.normal(0, 0.04, 2), rng.normal(0, 0.02))
            args = self._cost_grid_args(grid, points, initial)
            p1, c1 = gn.match(*args)
            p2, c2 = gn.match_bands(*args)
            # Same LM trajectory up to matmul rounding; on the structured
            # world both land on the same optimum to sub-millimeter.
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p2), atol=5e-3
            )
            assert float(c2) == pytest.approx(float(c1), rel=0.02, abs=1e-3)

    def test_recovers_perturbation(self):
        from cartographer_tpu.ops.scan_matching import gauss_newton_2d as gn

        grid, points = build_world()
        initial = rigid2.make([0.05, -0.04], np.radians(1.0))
        args = self._cost_grid_args(grid, points, initial)
        pose, _ = gn.match_bands(*args)
        pose = np.asarray(pose)
        np.testing.assert_allclose(pose[:2], [0.0, 0.0], atol=0.045)
        assert abs(pose[2]) < np.radians(1.0)

    def test_out_of_grid_points_cost_max(self):
        """Points fully outside the grid must contribute the max
        correspondence cost with zero gradient (kPadding semantics):
        match_bands must agree with the patch path there too."""
        import jax.numpy as jnp
        from cartographer_tpu.ops.scan_matching import gauss_newton_2d as gn

        grid, points = build_world()
        far = points + np.array([50.0, 50.0])  # entirely off-grid
        initial = rigid2.make([0.01, 0.02], 0.0)
        args = self._cost_grid_args(grid, far, initial, max_it=5)
        p1, c1 = gn.match(*args)
        p2, c2 = gn.match_bands(*args)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
        assert float(c2) == pytest.approx(float(c1), rel=1e-3)


class TestNonmonotonicSteps:
    """use_nonmonotonic_steps (Ceres TrustRegionStepEvaluator) — the
    reference's default for loop-closure refinement (pose_graph.lua:35)."""

    def test_converges_with_nonmonotonic_acceptance(self):
        grid, points = build_world()
        matcher = CeresScanMatcher2D(
            CeresScanMatcherOptions2D(
                occupied_space_weight=1.0,
                translation_weight=0.1,
                rotation_weight=0.1,
                ceres_solver_options=SolverOptions(
                    max_num_iterations=30, use_nonmonotonic_steps=True
                ),
            )
        )
        initial = rigid2.make([0.05, -0.04], np.radians(1.0))
        pose, cost = matcher.match(np.zeros(2), initial, points, grid)
        np.testing.assert_allclose(pose[:2], [0.0, 0.0], atol=0.045)
        assert abs(pose[2]) < np.radians(1.0)
        assert np.isfinite(cost)

    def test_evaluator_accepts_worsening_step_within_window(self):
        """A step that worsens the current cost but improves on the lagging
        reference cost has positive quality — the defining property of the
        nonmonotonic trust region (rejected outright by monotonic
        acceptance)."""
        from cartographer_tpu.ops.scan_matching.gauss_newton_2d import (
            nonmonotonic_accepted,
            nonmonotonic_init,
            nonmonotonic_quality,
        )

        ev = nonmonotonic_init(jnp.float32(100.0))
        # First accepted step improves: cost 100 -> 50, mcc 40.
        q1 = nonmonotonic_quality(ev, 100.0, 50.0, 40.0)
        assert float(q1) > 1e-3
        ev = nonmonotonic_accepted(ev, jnp.float32(50.0), 40.0, True)
        # Next candidate WORSENS the current cost (50 -> 60) but still
        # beats the reference (100): historical quality is positive.
        q2 = nonmonotonic_quality(ev, 50.0, 60.0, 20.0)
        assert float(q2) > 1e-3  # accepted nonmonotonically
        assert (50.0 - 60.0) / 20.0 < 0  # monotonic quality would reject
        ev = nonmonotonic_accepted(ev, jnp.float32(60.0), 20.0, True)
        # The minimum cost is retained, not overwritten by the worse step.
        assert float(ev[0]) == 50.0

    def test_reference_promotion_after_window(self):
        """After max_consecutive_nonmonotonic_steps accepted nonmonotonic
        steps, the reference cost drops to the candidate cost, bounding
        how long the cost may keep worsening."""
        from cartographer_tpu.ops.scan_matching.gauss_newton_2d import (
            _MAX_CONSECUTIVE_NONMONOTONIC_STEPS,
            nonmonotonic_accepted,
            nonmonotonic_init,
            nonmonotonic_quality,
        )

        ev = nonmonotonic_init(jnp.float32(100.0))
        ev = nonmonotonic_accepted(ev, jnp.float32(50.0), 10.0, True)
        cost = 50.0
        for k in range(_MAX_CONSECUTIVE_NONMONOTONIC_STEPS):
            cost += 1.0  # worsens every step
            ev = nonmonotonic_accepted(ev, jnp.float32(cost), 10.0, True)
        # Reference was promoted away from the initial 100 to the worst
        # accepted candidate; further worsening steps now score against it.
        assert float(ev[1]) < 100.0
        q = nonmonotonic_quality(ev, cost, cost + 1.0, 10.0)
        assert float(q) < 1e-3  # the window is exhausted: step rejected
