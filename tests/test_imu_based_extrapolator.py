"""IMU-based extrapolator tests (model: imu_based_pose_extrapolator usage)."""

import numpy as np
import pytest

from cartographer_tpu.common.config import ImuBasedExtrapolatorOptions
from cartographer_tpu.mapping.imu_based_pose_extrapolator import (
    ImuBasedPoseExtrapolator,
)
from cartographer_tpu.sensor.data import ImuData, OdometryData
from cartographer_tpu.transform import rigid3


def imu_at(t, accel=(0.0, 0.0, 9.8), omega=(0.0, 0.0, 0.0)):
    return ImuData(
        time=t,
        linear_acceleration=np.asarray(accel, float),
        angular_velocity=np.asarray(omega, float),
    )


class TestImuBasedExtrapolator:
    def test_straight_line_with_odometry(self):
        opts = ImuBasedExtrapolatorOptions(pose_queue_duration=5.0)
        ex = ImuBasedPoseExtrapolator(opts)
        v = np.array([1.0, 0.0, 0.0])
        for t in np.arange(0.0, 2.01, 0.05):
            ex.add_imu_data(imu_at(t))
            ex.add_odometry_data(
                OdometryData(time=t, pose=rigid3.translation(v * t))
            )
        for t in np.arange(0.0, 2.01, 0.5):
            ex.add_pose(t, rigid3.translation(v * t))
        pose = ex.extrapolate_pose(2.2)
        # Odometry pins the relative motion; extrapolation should continue
        # along x. Tolerance is loose: beyond the data the fit holds the
        # last constrained pose.
        assert pose[0] >= 1.9
        assert abs(pose[1]) < 0.1

    def test_batch_matches_observed_poses(self):
        opts = ImuBasedExtrapolatorOptions()
        ex = ImuBasedPoseExtrapolator(opts)
        for t in np.arange(0.0, 1.01, 0.1):
            ex.add_imu_data(imu_at(t))
        poses = {}
        for t in np.arange(0.0, 1.01, 0.25):
            p = rigid3.translation(np.array([t, 2 * t, 0.0]))
            poses[round(float(t), 6)] = p
            ex.add_pose(t, p)
        out = ex.extrapolate_poses_batch([0.25, 0.5, 0.75])
        for row, t in zip(out, [0.25, 0.5, 0.75]):
            np.testing.assert_allclose(
                row[:3], poses[t][:3], atol=0.05
            )
