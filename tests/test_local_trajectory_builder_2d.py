"""2D local SLAM end-to-end test (model: mapping/map_builder_test.cc:38-460
LocalSlam2D: local pose drift < 0.1 * travel distance on synthetic scans)."""

import numpy as np
import pytest

from cartographer_tpu.common.config import (
    GridOptions2D,
    SubmapsOptions2D,
    TrajectoryBuilder2DOptions,
)
from cartographer_tpu.mapping.local_trajectory_builder_2d import LocalTrajectoryBuilder2D
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3

TRAVEL_DISTANCE = 1.2
DURATION = 4.0
TIME_STEP = 0.1


def make_options():
    return TrajectoryBuilder2DOptions(
        use_imu_data=False,
        max_range=10.0,
        submaps=SubmapsOptions2D(
            num_range_data=20,
            grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512),
        ),
    )


class TestLocalSlam2D:
    def test_drift_bounded(self):
        builder = LocalTrajectoryBuilder2D(make_options(), {"range"})
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * TRAVEL_DISTANCE
        measurements = generate_fake_range_measurements(
            translation=translation, duration=DURATION, time_step=TIME_STEP
        )
        velocity = translation / DURATION
        last_result = None
        num_results = 0
        for m in measurements:
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

    def test_insertion_results_produced(self):
        builder = LocalTrajectoryBuilder2D(make_options(), {"range"})
        measurements = generate_fake_range_measurements(
            translation=np.array([1.0, 0.0, 0.0]), duration=2.0, time_step=0.1
        )
        insertions = 0
        for m in measurements:
            result = builder.add_range_data("range", m)
            if result is not None and result.insertion_result is not None:
                insertions += 1
                ir = result.insertion_result
                assert 1 <= len(ir.insertion_submaps) <= 2
                assert ir.constant_data.filtered_gravity_aligned_point_cloud.shape[0] > 0
        assert insertions >= 1
