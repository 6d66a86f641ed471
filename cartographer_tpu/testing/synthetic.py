"""Synthetic-world measurement generation for integration tests.

Reference: mapping/internal/testing/test_helpers.cc:41-80
(GenerateFakeRangeMeasurements): a robot translating at constant velocity
observes a semicircular wall of radius 5 m (angles 0..pi at 0.01 rad, five
heights) with perfectly consistent scans computed from ground-truth poses.
"""

from __future__ import annotations

from typing import List

import numpy as np

from cartographer_tpu.sensor.data import TimedPointCloud, TimedPointCloudData
from cartographer_tpu.transform import rigid3

FAKE_START_TIME = 123.0


def semicircle_wall(radius: float = 5.0) -> np.ndarray:
    angles = np.arange(0.0, np.pi, 0.01)
    heights = np.array([-0.4, -0.2, 0.0, 0.2, 0.4])
    ring = np.stack(
        [radius * np.cos(angles), radius * np.sin(angles)], axis=1
    )  # (A, 2)
    pts = np.concatenate(
        [
            np.repeat(ring, len(heights), axis=0),
            np.tile(heights, len(angles))[:, None],
        ],
        axis=1,
    )
    return pts.astype(np.float32)


def generate_fake_range_measurements(
    travel_distance: float = None,
    duration: float = 10.0,
    time_step: float = 0.1,
    translation: np.ndarray = None,
    local_to_global: np.ndarray = None,
) -> List[TimedPointCloudData]:
    if translation is None:
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * travel_distance
    if local_to_global is None:
        local_to_global = rigid3.identity()
    wall = semicircle_wall().astype(np.float64)
    velocity = np.asarray(translation, np.float64) / duration
    measurements = []
    elapsed = 0.0
    while elapsed < duration:
        time = FAKE_START_TIME + elapsed
        global_pose = rigid3.compose(
            local_to_global, rigid3.translation(elapsed * velocity)
        )
        ranges = rigid3.apply(rigid3.inverse(global_pose), wall)
        measurements.append(
            TimedPointCloudData(
                time=time,
                origin=np.zeros(3, np.float32),
                ranges=TimedPointCloud(
                    points=ranges.astype(np.float32),
                    times=np.zeros(len(wall), np.float32),
                ),
            )
        )
        elapsed += time_step
    return measurements


def ground_truth_poses(measurements: List[TimedPointCloudData], translation, duration):
    velocity = np.asarray(translation, np.float64) / duration
    return [
        rigid3.translation((m.time - FAKE_START_TIME) * velocity)
        for m in measurements
    ]
