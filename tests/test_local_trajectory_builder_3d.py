"""3D local SLAM end-to-end test (model: map_builder_test.cc LocalSlam3D)."""

import numpy as np
import pytest

from cartographer_tpu.common.config import (
    AdaptiveVoxelFilterOptions,
    MotionFilterOptions,
    SubmapsOptions3D,
    TrajectoryBuilder3DOptions,
)
from cartographer_tpu.mapping.local_trajectory_builder_3d import LocalTrajectoryBuilder3D
from cartographer_tpu.sensor.data import ImuData
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3

TRAVEL_DISTANCE = 1.0
DURATION = 4.0
TIME_STEP = 0.1


def make_options():
    return TrajectoryBuilder3DOptions(
        min_range=0.1,
        max_range=10.0,
        motion_filter=MotionFilterOptions(
            max_time_seconds=0.5, max_distance_meters=0.05, max_angle_radians=0.004
        ),
        high_resolution_adaptive_voxel_filter=AdaptiveVoxelFilterOptions(
            max_length=2.0, min_num_points=100, max_range=15.0
        ),
        low_resolution_adaptive_voxel_filter=AdaptiveVoxelFilterOptions(
            max_length=4.0, min_num_points=150, max_range=15.0
        ),
        submaps=SubmapsOptions3D(
            num_range_data=10,
            high_resolution=0.10,
            low_resolution=0.45,
            high_resolution_grid_size=192,
            low_resolution_grid_size=96,
        ),
    )


def imu_stream(t0, t1, rate=50.0):
    times = np.arange(t0, t1, 1.0 / rate)
    return [
        ImuData(
            time=t,
            linear_acceleration=np.array([0.0, 0.0, 9.8]),
            angular_velocity=np.zeros(3),
        )
        for t in times
    ]


class TestLocalSlam3D:
    def test_drift_bounded(self):
        builder = LocalTrajectoryBuilder3D(make_options(), {"range"})
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * TRAVEL_DISTANCE
        measurements = generate_fake_range_measurements(
            translation=translation, duration=DURATION, time_step=TIME_STEP
        )
        imu = imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + DURATION + 0.1)
        imu_i = 0
        velocity = translation / DURATION
        last_result = None
        num_results = 0
        for m in measurements:
            while imu_i < len(imu) and imu[imu_i].time <= m.time:
                builder.add_imu_data(imu[imu_i])
                imu_i += 1
            result = builder.add_range_data("range", m)
            if result is not None:
                num_results += 1
                last_result = result
        assert last_result is not None
        assert num_results > 10
        expected = rigid3.translation(
            (last_result.time - FAKE_START_TIME) * velocity
        )
        err = np.linalg.norm(
            rigid3.trans(last_result.local_pose) - rigid3.trans(expected)
        )
        assert err < 0.1 * TRAVEL_DISTANCE

    def test_intensities_pipeline(self):
        options = make_options()
        options.use_intensities = True
        builder = LocalTrajectoryBuilder3D(options, {"range"})
        measurements = generate_fake_range_measurements(
            translation=np.array([0.3, 0.0, 0.0]), duration=1.0, time_step=0.1
        )
        imu = imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + 1.1)
        imu_i = 0
        results = 0
        for m in measurements:
            m.intensities = np.full(m.ranges.size, 20.0, np.float32)
            while imu_i < len(imu) and imu[imu_i].time <= m.time:
                builder.add_imu_data(imu[imu_i])
                imu_i += 1
            if builder.add_range_data("range", m) is not None:
                results += 1
        assert results >= 3
        submap = builder._active_submaps.submaps()[0]
        assert submap.intensity_sum is not None
        assert float(np.asarray(submap.intensity_count).sum()) > 0

    def test_insertion_and_histograms(self):
        builder = LocalTrajectoryBuilder3D(make_options(), {"range"})
        measurements = generate_fake_range_measurements(
            translation=np.array([0.5, 0.0, 0.0]), duration=2.0, time_step=0.1
        )
        imu = imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + 2.1)
        imu_i = 0
        insertions = 0
        for m in measurements:
            while imu_i < len(imu) and imu[imu_i].time <= m.time:
                builder.add_imu_data(imu[imu_i])
                imu_i += 1
            result = builder.add_range_data("range", m)
            if result is not None and result.insertion_result is not None:
                insertions += 1
                ir = result.insertion_result
                assert ir.constant_data.rotational_scan_matcher_histogram.shape == (120,)
                assert ir.constant_data.high_resolution_point_cloud.shape[0] > 0
                for submap in ir.insertion_submaps:
                    assert submap.num_range_data > 0
        assert insertions >= 1
        submap = builder._active_submaps.submaps()[0]
        # Grid got occupancy (active submaps build paged by default).
        from cartographer_tpu.mapping.paged_grid_3d import as_dense

        high = as_dense(submap.high_resolution_grid)
        assert int(np.asarray((high.values != 0).sum())) > 100
        assert np.linalg.norm(submap.rotational_scan_matcher_histogram) > 0
