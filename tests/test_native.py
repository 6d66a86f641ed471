"""Native kernel tests: parity with the numpy implementations and the
geometric correctness of the ray traversal."""

import numpy as np
import pytest

from cartographer_tpu import native
from cartographer_tpu.sensor.voxel_filter import voxel_filter_indices as np_voxel


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.available(), "native library must build in this environment"


class TestNativeVoxelFilter:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-20, 20, size=(5000, 3)).astype(np.float32)
        mask_native = native.voxel_filter_indices(pts, 0.5)
        mask_np = np_voxel(pts, 0.5)
        # Same number of voxels kept; representatives may differ only if
        # iteration order differed — both keep first occurrence, so equal.
        np.testing.assert_array_equal(mask_native, mask_np)

    def test_speed_smoke(self):
        import time

        rng = np.random.default_rng(1)
        pts = rng.uniform(-50, 50, size=(200000, 3)).astype(np.float32)
        t0 = time.perf_counter()
        native.voxel_filter_indices(pts, 0.05)
        dt = time.perf_counter() - t0
        assert dt < 1.0  # generous bound; typically ~10ms


class TestRayToPixelMask:
    def _check_ray(self, begin, end, scale):
        pixels = native.ray_to_pixel_mask(
            np.asarray(begin), np.asarray(end), scale
        )
        pixel_set = {tuple(p) for p in pixels}
        # Dense float sampling reference: every sampled pixel must be in the
        # mask, endpoints included.
        b = np.asarray(begin, np.float64)
        e = np.asarray(end, np.float64)
        for t in np.linspace(0, 1, 2000):
            p = b + t * (e - b)
            px = tuple((np.floor(p / scale)).astype(int))
            assert px in pixel_set, (begin, end, px)
        # No duplicates, contiguous path.
        assert len(pixel_set) == len(pixels)

    def test_axis_aligned(self):
        self._check_ray([500, 500], [500, 10500], 1000)
        self._check_ray([500, 500], [10500, 500], 1000)

    def test_diagonals_and_negatives(self):
        self._check_ray([500, 500], [10500, 7500], 1000)
        self._check_ray([10500, 7500], [500, 500], 1000)
        self._check_ray([-500, 500], [9500, -6500], 1000)

    def test_single_pixel(self):
        pixels = native.ray_to_pixel_mask(
            np.array([100, 100]), np.array([900, 900]), 1000
        )
        assert len(pixels) == 1
        assert tuple(pixels[0]) == (0, 0)


class TestAccumulate:
    def test_counts(self):
        pts = np.array([[0.5, 0.5], [0.7, 0.2], [3.5, 2.5], [-1.0, 0.0]], np.float32)
        grid = native.accumulate_cells_2d(pts, 4, 5)
        assert grid[0, 0] == 2
        assert grid[2, 3] == 1
        assert grid.sum() == 3  # out-of-bounds dropped


class TestRotationalHistogram:
    """Native rotational_histogram must agree with the numpy oracle
    (ops/scan_matching/rotational_histogram.compute_histogram_numpy) —
    same slice grouping, centroid filtering, stable angular sort, and
    sequential min/max-distance walk."""

    def test_matches_numpy_oracle(self):
        from cartographer_tpu.ops.scan_matching import (
            rotational_histogram as rh,
        )

        if not native.available():
            import pytest

            pytest.skip("no native compiler")
        rng = np.random.default_rng(7)
        for n in (0, 1, 3, 50, 800, 3000):
            pts = rng.normal(0.0, 3.0, (n, 3)).astype(np.float32)
            if n:
                pts[:, 2] = rng.normal(0.0, 1.0, n)
            h_py = rh.compute_histogram_numpy(pts, 120)
            h_cc = (
                native.rotational_histogram(pts, 120)
                if n
                else np.zeros(120, np.float32)
            )
            np.testing.assert_allclose(h_cc, h_py, atol=1e-5)

    def test_compute_histogram_uses_native(self):
        from cartographer_tpu.ops.scan_matching import (
            rotational_histogram as rh,
        )

        rng = np.random.default_rng(3)
        pts = rng.normal(0.0, 3.0, (500, 3)).astype(np.float32)
        h = rh.compute_histogram(pts, 64)
        np.testing.assert_allclose(
            h, rh.compute_histogram_numpy(pts, 64), atol=1e-5
        )
