"""TSDF tests (model: tsdf_range_data_inserter_2d_test.cc,
tsdf_2d_test.cc, normal_estimation_2d_test.cc, and the TSDF-parameterized
map_builder_test)."""

import numpy as np
import pytest

from cartographer_tpu.common.config import (
    GridOptions2D,
    NormalEstimationOptions2D,
    RangeDataInserterOptions,
    SubmapsOptions2D,
    TrajectoryBuilder2DOptions,
    TSDFRangeDataInserterOptions2D,
)
from cartographer_tpu.mapping.normal_estimation_2d import (
    estimate_normals,
    sort_range_data_by_angle,
)
from cartographer_tpu.mapping.scan_matching_2d import CeresScanMatcher2D
from cartographer_tpu.common.config import CeresScanMatcherOptions2D, SolverOptions
from cartographer_tpu.mapping.submap_2d import ActiveSubmaps2D
from cartographer_tpu.mapping.local_trajectory_builder_2d import LocalTrajectoryBuilder2D
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid2, rigid3
from tests.test_grid_2d import make_range_data


def tsdf_options(grid_size=128, resolution=0.05, num_range_data=100):
    return SubmapsOptions2D(
        num_range_data=num_range_data,
        grid_options_2d=GridOptions2D(
            grid_type="TSDF", resolution=resolution, grid_size=grid_size
        ),
        range_data_inserter=RangeDataInserterOptions(
            range_data_inserter_type="TSDF_INSERTER_2D",
        ),
    )


def tsd_at(grid, x, y):
    cx, cy = (np.array([x, y]) - np.asarray(grid.origin)) / grid.resolution
    return float(np.asarray(grid.tsd)[int(np.floor(cy)), int(np.floor(cx))])


def weight_at(grid, x, y):
    cx, cy = (np.array([x, y]) - np.asarray(grid.origin)) / grid.resolution
    return float(np.asarray(grid.weight)[int(np.floor(cy)), int(np.floor(cx))])


class TestNormalEstimation:
    def test_flat_wall_normals_point_to_sensor(self):
        xs = np.linspace(-1.0, 1.0, 50)
        wall = np.stack([xs, np.full_like(xs, 2.0)], axis=1)
        origin = np.zeros(2)
        order = sort_range_data_by_angle(wall, origin)
        normals = estimate_normals(
            wall[order], origin, NormalEstimationOptions2D()
        )
        # Wall along x at y=2: normals should point toward -y (to sensor).
        for n in normals[2:-2]:
            assert abs(rigid2.normalize_angle(n - (-np.pi / 2))) < 0.2


class TestTSDFInsertion:
    def test_zero_crossing_at_surface(self):
        active = ActiveSubmaps2D(tsdf_options())
        xs = np.linspace(-1.0, 1.0, 80)
        wall = np.stack([xs, np.full_like(xs, 2.0)], axis=1)
        for _ in range(3):
            active.insert_range_data(make_range_data((0.0, 0.0), wall))
        grid = active.submaps()[0].grid
        # At the wall: tsd ~ 0.
        assert abs(tsd_at(grid, 0.0, 2.0)) < 0.05
        # In front of the wall (toward sensor): positive distance.
        assert tsd_at(grid, 0.0, 1.85) > 0.05
        # Behind the wall: negative.
        assert tsd_at(grid, 0.0, 2.15) < -0.05
        # Weights accumulated near the surface.
        assert weight_at(grid, 0.0, 2.0) > 0.0
        # Far away: unknown.
        assert weight_at(grid, 0.0, 0.5) == 0.0

    def test_weight_capped(self):
        opts = tsdf_options()
        opts.range_data_inserter.tsdf_range_data_inserter.maximum_weight = 2.0
        active = ActiveSubmaps2D(opts)
        wall = np.stack(
            [np.linspace(-1, 1, 50), np.full(50, 2.0)], axis=1
        )
        for _ in range(10):
            active.insert_range_data(make_range_data((0.0, 0.0), wall))
        grid = active.submaps()[0].grid
        assert float(np.asarray(grid.weight).max()) <= 2.0 + 1e-5


class TestTSDFMatching:
    def test_recovers_perturbation(self):
        active = ActiveSubmaps2D(tsdf_options(grid_size=256))
        xs = np.linspace(-2.0, 2.0, 100)
        wall1 = np.stack([xs, np.full_like(xs, 2.0)], axis=1)
        ys = np.linspace(-1.0, 2.0, 80)
        wall2 = np.stack([np.full_like(ys, 2.5), ys], axis=1)
        points = np.concatenate([wall1, wall2])
        for _ in range(6):
            active.insert_range_data(make_range_data((0.0, 0.0), points))
        grid = active.submaps()[0].grid
        matcher = CeresScanMatcher2D(
            CeresScanMatcherOptions2D(
                occupied_space_weight=10.0,
                translation_weight=1.0,
                rotation_weight=1.0,
                ceres_solver_options=SolverOptions(max_num_iterations=50),
            )
        )
        initial = rigid2.make([0.04, -0.03], np.radians(0.5))
        pose, _ = matcher.match(np.zeros(2), initial, points, grid)
        np.testing.assert_allclose(pose[:2], [0.0, 0.0], atol=0.03)


class TestTSDFLocalSlam:
    def test_drift_bounded(self):
        # The reference's TSDF test raises occupied_space_weight to 10
        # (map_builder_test.cc SetOptionsToTSDF2D).
        options = TrajectoryBuilder2DOptions(
            use_imu_data=False,
            max_range=10.0,
            ceres_scan_matcher=CeresScanMatcherOptions2D(occupied_space_weight=10.0),
            submaps=tsdf_options(grid_size=512, resolution=0.05, num_range_data=20),
        )
        builder = LocalTrajectoryBuilder2D(options, {"range"})
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        travel = 1.2
        translation = direction * travel
        measurements = generate_fake_range_measurements(
            translation=translation, duration=4.0, time_step=0.1
        )
        velocity = translation / 4.0
        last = None
        for m in measurements:
            result = builder.add_range_data("range", m)
            if result is not None:
                last = result
        assert last is not None
        expected = rigid3.translation((last.time - FAKE_START_TIME) * velocity)
        err = np.linalg.norm(rigid3.trans(last.local_pose) - rigid3.trans(expected))
        assert err < 0.1 * travel
