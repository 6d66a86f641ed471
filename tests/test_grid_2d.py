"""2D grid + inserter tests (model: mapping/2d/probability_grid_test.cc,
probability_grid_range_data_inserter_2d_test.cc)."""

import numpy as np
import pytest

from cartographer_tpu.common.config import SubmapsOptions2D, GridOptions2D
from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.mapping.grid_2d import compute_cropped, make_grid, world_to_cell
from cartographer_tpu.mapping.submap_2d import ActiveSubmaps2D
from cartographer_tpu.sensor.data import PointCloud, RangeData, empty_point_cloud


def make_range_data(origin, hits, misses=None):
    def cloud(arr):
        if arr is None or len(arr) == 0:
            return empty_point_cloud()
        arr = np.asarray(arr, np.float32)
        return PointCloud(np.concatenate([arr, np.zeros((len(arr), 1), np.float32)], axis=1))

    return RangeData(
        origin=np.asarray(list(origin) + [0.0], np.float32),
        returns=cloud(hits),
        misses=cloud(misses),
    )


def small_options(grid_size=64, resolution=0.1, num_range_data=10):
    return SubmapsOptions2D(
        num_range_data=num_range_data,
        grid_options_2d=GridOptions2D(resolution=resolution, grid_size=grid_size),
    )


def get_probability(grid, x, y):
    cx, cy = np.asarray(world_to_cell(grid, np.array([x, y], np.float32)))
    ix, iy = int(np.floor(cx)), int(np.floor(cy))
    return float(np.asarray(grid.probability())[iy, ix])


def is_known(grid, x, y):
    cx, cy = np.asarray(world_to_cell(grid, np.array([x, y], np.float32)))
    return bool(np.asarray(grid.known)[int(np.floor(cy)), int(np.floor(cx))])


class TestInsertion:
    def test_hit_cell_updated(self):
        active = ActiveSubmaps2D(small_options())
        rd = make_range_data(origin=(0.0, 0.0), hits=[(1.0, 0.0)])
        submaps = active.insert_range_data(rd)
        grid = submaps[0].grid
        # Unknown prior p=0.5, one hit of 0.55:
        expected = pv.probability_from_odds(pv.odds(0.55) * pv.odds(0.5))
        assert get_probability(grid, 1.0, 0.0) == pytest.approx(expected, abs=1e-6)

    def test_miss_cells_along_ray(self):
        active = ActiveSubmaps2D(small_options())
        rd = make_range_data(origin=(0.0, 0.0), hits=[(2.0, 0.0)])
        grid = active.insert_range_data(rd)[0].grid
        expected_miss = pv.probability_from_odds(pv.odds(0.49) * pv.odds(0.5))
        # Cells strictly between origin and hit get the miss update.
        for x in [0.25, 0.75, 1.25, 1.75]:
            assert is_known(grid, x, 0.0)
            assert get_probability(grid, x, 0.0) == pytest.approx(expected_miss, abs=1e-6)
        # Cells beyond the hit remain unknown.
        assert not is_known(grid, 2.6, 0.0)

    def test_hit_priority_over_miss(self):
        # Two rays: one ends in cell C, the other passes through C.
        active = ActiveSubmaps2D(small_options())
        rd = make_range_data(origin=(0.0, 0.0), hits=[(1.0, 0.0), (2.05, 0.0)])
        grid = active.insert_range_data(rd)[0].grid
        expected_hit = pv.probability_from_odds(pv.odds(0.55) * pv.odds(0.5))
        assert get_probability(grid, 1.0, 0.0) == pytest.approx(expected_hit, abs=1e-6)

    def test_once_per_scan_semantics(self):
        # Two hits in the same cell update it ONCE (kUpdateMarker semantics).
        active = ActiveSubmaps2D(small_options())
        rd = make_range_data(origin=(0.0, 0.0), hits=[(1.0, 0.01), (1.0, -0.01), (1.02, 0.0)])
        grid = active.insert_range_data(rd)[0].grid
        expected = pv.probability_from_odds(pv.odds(0.55) * pv.odds(0.5))
        assert get_probability(grid, 1.0, 0.0) == pytest.approx(expected, abs=1e-6)

    def test_missing_echo_ray(self):
        active = ActiveSubmaps2D(small_options())
        rd = make_range_data(origin=(0.0, 0.0), hits=[], misses=[(1.0, 0.0)])
        grid = active.insert_range_data(rd)[0].grid
        expected_miss = pv.probability_from_odds(pv.odds(0.49) * pv.odds(0.5))
        # Endpoint of a missing echo also gets the miss update.
        assert get_probability(grid, 1.0, 0.0) == pytest.approx(expected_miss, abs=1e-6)
        assert get_probability(grid, 0.5, 0.0) == pytest.approx(expected_miss, abs=1e-6)

    def test_repeated_hits_saturate(self):
        opts = small_options(num_range_data=200)
        active = ActiveSubmaps2D(opts)
        for _ in range(60):
            active.insert_range_data(make_range_data((0.0, 0.0), [(1.0, 0.0)]))
        grid = active.submaps()[0].grid
        assert get_probability(grid, 1.0, 0.0) == pytest.approx(pv.MAX_PROBABILITY, abs=1e-5)


class TestActiveSubmaps:
    def test_rotation_schedule(self):
        opts = small_options(num_range_data=4)
        active = ActiveSubmaps2D(opts)
        for i in range(4):
            submaps = active.insert_range_data(make_range_data((i * 0.1, 0.0), [(1.0, 0.0)]))
        assert len(submaps) == 1
        assert submaps[0].num_range_data == 4
        submaps = active.insert_range_data(make_range_data((0.5, 0.0), [(1.0, 0.0)]))
        assert len(submaps) == 2
        assert submaps[0].num_range_data == 5
        assert submaps[1].num_range_data == 1
        for i in range(3):
            submaps = active.insert_range_data(make_range_data((0.5, 0.0), [(1.0, 0.0)]))
        # First submap now has 8 = 2*4 scans -> finished.
        assert submaps[0].insertion_finished
        submaps = active.insert_range_data(make_range_data((0.9, 0.0), [(1.0, 0.0)]))
        assert len(submaps) == 2
        assert not submaps[0].insertion_finished

    def test_local_pose_is_first_origin(self):
        active = ActiveSubmaps2D(small_options())
        active.insert_range_data(make_range_data((1.5, -0.5), [(2.0, 0.0)]))
        np.testing.assert_allclose(active.submaps()[0].local_pose, [1.5, -0.5, 0.0])


class TestCroppedGrid:
    def test_crop(self):
        active = ActiveSubmaps2D(small_options())
        grid = active.insert_range_data(make_range_data((0.0, 0.0), [(1.0, 0.0)]))[0].grid
        cropped = compute_cropped(grid)
        assert cropped.probability.shape[0] >= 1
        assert cropped.known.any()


class TestExtentOverflowObservability:
    def test_undersized_grid_trips_counter(self):
        """An undersized fixed extent must COUNT dropped hit endpoints
        (the reference grows its grids; grid_2d.py documents the fixed
        extent as the TPU deviation — the loss has to be observable)."""
        from cartographer_tpu import metrics as m

        factory = m.enable_collection()
        try:
            active = ActiveSubmaps2D(small_options(grid_size=16, resolution=0.1))
            # Hits 5 m out of a 1.6 m grid.
            hits = [[5.0, 0.0], [0.0, 5.0], [-5.0, 1.0]]
            active.insert_range_data(make_range_data([0.0, 0.0], hits))
            assert m.grid_oob_points.value() >= 3
        finally:
            m.register_family_factory(m.FamilyFactory(real=False))

    def test_well_sized_grid_does_not_trip(self):
        from cartographer_tpu import metrics as m

        factory = m.enable_collection()
        try:
            active = ActiveSubmaps2D(small_options(grid_size=64, resolution=0.1))
            active.insert_range_data(
                make_range_data([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
            )
            assert m.grid_oob_points.value() == 0
        finally:
            m.register_family_factory(m.FamilyFactory(real=False))
