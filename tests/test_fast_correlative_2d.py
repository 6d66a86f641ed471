"""Fast correlative matcher tests (model:
fast_correlative_scan_matcher_2d_test.cc — pyramid correctness, exact
agreement with exhaustive search, recovery of known perturbations)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cartographer_tpu.common.config import FastCorrelativeScanMatcherOptions2D
from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.ops.scan_matching.fast_correlative_2d import (
    FastCorrelativeScanMatcher2D,
    _u8_to_prob,
    compute_pyramid,
)


from cartographer_tpu.mapping.submap_2d import ActiveSubmaps2D
from cartographer_tpu.transform import rigid2
from tests.test_grid_2d import make_range_data, small_options


def quantize_probs(prob):
    """The matcher's uint8 cell quantization (PrecomputationGrid2D
    semantics) applied host-side for expected values."""
    scale = 255.0 / (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY)
    return np.clip(
        np.round((prob - pv.MIN_PROBABILITY) * scale), 0, 255
    ).astype(np.uint8)


class TestPyramid:
    def test_pooling_matches_naive(self):
        rng = np.random.default_rng(0)
        prob = rng.uniform(0.1, 0.9, size=(32, 32)).astype(np.float32)
        pyr = np.asarray(compute_pyramid(jnp.asarray(prob), 4))  # uint8
        q = quantize_probs(prob)
        for level in range(4):
            w = 1 << level
            padded = np.zeros((32 + w, 32 + w), np.uint8)
            padded[:32, :32] = q
            expected = np.zeros((32, 32), np.uint8)
            for y in range(32):
                for x in range(32):
                    expected[y, x] = padded[y : y + w, x : x + w].max()
            np.testing.assert_array_equal(pyr[level], expected)

    def test_admissible_bound(self):
        # Pooled value at (x, y) >= any cell in the w x w window: the BnB
        # bound property.
        rng = np.random.default_rng(1)
        prob = rng.uniform(0.1, 0.9, size=(64, 64)).astype(np.float32)
        pyr = np.asarray(compute_pyramid(jnp.asarray(prob), 5))
        for level in range(1, 5):
            w = 1 << level
            for _ in range(50):
                y, x = rng.integers(0, 64, 2)
                dy, dx = rng.integers(0, w, 2)
                if y + dy < 64 and x + dx < 64:
                    # Admissibility holds at the quantized precision.
                    assert (
                        pyr[level][y, x]
                        >= quantize_probs(prob)[y + dy, x + dx]
                    )


def build_grid_and_scan():
    xs = np.linspace(-2.5, 2.5, 80)
    wall1 = np.stack([xs, np.full_like(xs, 2.0)], axis=1)
    ys = np.linspace(-2.0, 2.0, 60)
    wall2 = np.stack([np.full_like(ys, 2.8), ys], axis=1)
    wall3 = np.stack([xs * 0.6 - 1.0, -1.5 + 0.3 * np.sin(xs * 2)], axis=1)
    points = np.concatenate([wall1, wall2, wall3], axis=0)
    active = ActiveSubmaps2D(small_options(grid_size=256, resolution=0.05, num_range_data=100))
    for _ in range(10):
        active.insert_range_data(make_range_data((0.0, 0.0), points))
    return active.submaps()[0].grid, points


def exhaustive_best(matcher, grid, points, initial, window_cells, angular_window):
    """Brute force over the same candidate space the matcher searches."""
    from cartographer_tpu.ops.scan_matching.correlative_2d import compute_angular_step

    rot = rigid2.make(np.zeros(2), initial[2])
    rotated = rigid2.apply(rot, points[:, :2])
    max_range = float(np.max(np.linalg.norm(rotated, axis=1)))
    step = compute_angular_step(grid.resolution, max_range)
    num_angular = int(np.ceil(angular_window / step))
    angles = (np.arange(2 * num_angular + 1) - num_angular) * step
    # Score in the matcher's uint8-quantized probability domain so the
    # comparison with the BnB result is exact (same discretization).
    scale = 255.0 / (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY)
    prob = (
        np.clip(
            np.round(
                (np.asarray(grid.probability()) - pv.MIN_PROBABILITY) * scale
            ),
            0,
            255,
        ).astype(np.float32)
        / scale
        + pv.MIN_PROBABILITY
    )
    origin = np.asarray(grid.origin)
    h, w = prob.shape
    best = (-1.0, None)
    for ai, ang in enumerate(angles):
        c, s = np.cos(ang), np.sin(ang)
        wx = c * rotated[:, 0] - s * rotated[:, 1] + initial[0]
        wy = s * rotated[:, 0] + c * rotated[:, 1] + initial[1]
        ix = np.floor((wx - origin[0]) / grid.resolution).astype(int)
        iy = np.floor((wy - origin[1]) / grid.resolution).astype(int)
        for dx in range(-window_cells, window_cells + 1):
            for dy in range(-window_cells, window_cells + 1):
                cx = ix + dx
                cy = iy + dy
                inb = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
                vals = np.where(inb, prob[np.clip(cy, 0, h - 1), np.clip(cx, 0, w - 1)], pv.MIN_PROBABILITY)
                score = vals.mean()
                if score > best[0]:
                    best = (score, (ai, dx, dy))
    return best


class TestFastCorrelative:
    def test_agrees_with_exhaustive(self):
        grid, points = build_grid_and_scan()
        options = FastCorrelativeScanMatcherOptions2D(
            linear_search_window=0.4,
            angular_search_window=np.radians(5.0),
            branch_and_bound_depth=4,
        )
        matcher = FastCorrelativeScanMatcher2D(grid, options)
        initial = rigid2.make([0.07, -0.05], 0.0)
        result = matcher.match(initial, points, min_score=0.1)
        assert result is not None
        window_cells = int(np.ceil(0.4 / grid.resolution))
        exp_score, _ = exhaustive_best(
            matcher, grid, points, initial, window_cells, np.radians(5.0)
        )
        assert result.score == pytest.approx(exp_score, abs=1e-4)

    def test_recovers_perturbation(self):
        grid, points = build_grid_and_scan()
        options = FastCorrelativeScanMatcherOptions2D(
            linear_search_window=1.0,
            angular_search_window=np.radians(20.0),
            branch_and_bound_depth=5,
        )
        matcher = FastCorrelativeScanMatcher2D(grid, options)
        # The scan was taken from the origin; start the search offset.
        initial = rigid2.make([0.4, -0.3], np.radians(6.0))
        # Observed scan from a slightly rotated/translated pose.
        result = matcher.match(initial, points, min_score=0.4)
        assert result is not None
        np.testing.assert_allclose(result.pose[:2], [0.0, 0.0], atol=0.08)
        assert abs(result.pose[2]) < np.radians(1.5)

    def test_rejects_on_min_score(self):
        grid, points = build_grid_and_scan()
        options = FastCorrelativeScanMatcherOptions2D(
            linear_search_window=0.2,
            angular_search_window=np.radians(5.0),
            branch_and_bound_depth=3,
        )
        matcher = FastCorrelativeScanMatcher2D(grid, options)
        # Garbage scan far from anything known.
        rng = np.random.default_rng(0)
        garbage = rng.uniform(4.5, 6.0, size=(50, 2))
        result = matcher.match(rigid2.make([0.0, 0.0], 0.0), garbage, min_score=0.6)
        assert result is None

    def test_match_full_submap(self):
        grid, points = build_grid_and_scan()
        options = FastCorrelativeScanMatcherOptions2D(branch_and_bound_depth=5)
        matcher = FastCorrelativeScanMatcher2D(grid, options)
        result = matcher.match_full_submap(points, min_score=0.5)
        assert result is not None
        np.testing.assert_allclose(result.pose[:2], [0.0, 0.0], atol=0.08)
        assert abs(rigid2.normalize_angle(result.pose[2])) < np.radians(2.0)


class TestBatchedSearch:
    def test_batch_matches_single(self):
        """batch_match_device (one vmapped program per drain) returns
        exactly what per-search match_device does, including full-submap
        windows, staged device clouds, and batch padding rows."""
        from cartographer_tpu.ops.scan_matching.fast_correlative_2d import (
            batch_match_device,
        )

        grid, points = build_grid_and_scan()
        options = FastCorrelativeScanMatcherOptions2D(
            linear_search_window=0.6,
            angular_search_window=np.radians(10.0),
            branch_and_bound_depth=4,
        )
        matcher = FastCorrelativeScanMatcher2D(grid, options)
        rng = np.random.default_rng(7)
        searches = []
        singles = []
        for i in range(5):
            if i == 3:
                initial = None  # full submap
                min_score = 0.2
            else:
                initial = rigid2.make(rng.normal(0, 0.1, 2), rng.normal(0, 0.05))
                min_score = 0.1
            staged = (
                FastCorrelativeScanMatcher2D.stage_points(points)
                if i % 2 == 0
                else None
            )
            searches.append(
                dict(
                    matcher=matcher, initial_pose=initial, point_cloud=points,
                    device_points=staged, min_score=min_score,
                )
            )
            packed, ctx = matcher.match_device(
                initial, points, min_score,
                full_submap=initial is None, device_points=staged,
            )
            singles.append(matcher.decode(np.asarray(packed), ctx))

        packed_all, ctxs = batch_match_device(searches)
        assert packed_all.shape[0] == len(searches)
        for row, ctx, single in zip(packed_all, ctxs, singles):
            batched = matcher.decode(row, ctx)
            assert (batched is None) == (single is None)
            if single is not None:
                assert batched.score == pytest.approx(single.score, abs=1e-6)
                np.testing.assert_allclose(
                    batched.pose, single.pose, atol=1e-6
                )
