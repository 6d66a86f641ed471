"""Pose extrapolator factory (reference: mapping/pose_extrapolator_interface.cc
— choose constant-velocity vs IMU-based from options)."""

from __future__ import annotations

from typing import List, Optional

from cartographer_tpu.common.config import PoseExtrapolatorOptions
from cartographer_tpu.mapping.imu_based_pose_extrapolator import (
    ImuBasedPoseExtrapolator,
)
from cartographer_tpu.mapping.pose_extrapolator import PoseExtrapolator
from cartographer_tpu.sensor.data import ImuData
from cartographer_tpu.transform import rigid3


def create_with_imu_data(
    options: PoseExtrapolatorOptions, imu_data: List[ImuData]
):
    if options.use_imu_based:
        extrapolator = ImuBasedPoseExtrapolator(options.imu_based)
        extrapolator.add_pose(imu_data[-1].time, rigid3.identity())
        for d in imu_data:
            extrapolator.add_imu_data(d)
        return extrapolator
    return PoseExtrapolator.initialize_with_imu(
        options.constant_velocity.pose_queue_duration,
        options.constant_velocity.imu_gravity_time_constant,
        imu_data[-1],
    )


def create_without_imu(options: PoseExtrapolatorOptions, time: float):
    if options.use_imu_based:
        extrapolator = ImuBasedPoseExtrapolator(options.imu_based)
        extrapolator.add_pose(time, rigid3.identity())
        return extrapolator
    extrapolator = PoseExtrapolator(
        options.constant_velocity.pose_queue_duration,
        options.constant_velocity.imu_gravity_time_constant,
    )
    extrapolator.add_pose(time, rigid3.identity())
    return extrapolator
