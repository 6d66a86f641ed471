"""End-to-end 3D MapBuilder SLAM through the chunked device frontend
(use_chunked_device_frontend): device-resident 3D local SLAM in chunks,
SE(3) pose graph with rotational-histogram + BnB loop closure, final
optimization (model: mapping/map_builder_test.cc GlobalSlam3D)."""

import numpy as np

from cartographer_tpu.common.config import (
    AdaptiveVoxelFilterOptions,
    FastCorrelativeScanMatcherOptions3D,
    MapBuilderOptions,
    MotionFilterOptions,
    PoseGraphOptions,
    SubmapsOptions3D,
    TrajectoryBuilder3DOptions,
    TrajectoryBuilderOptions,
)
from cartographer_tpu.mapping.id import NodeId
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.sensor.data import ImuData
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3

TRAVEL_DISTANCE = 1.0
DURATION = 4.0
TIME_STEP = 0.1


def map_builder_options():
    pose_graph = PoseGraphOptions(optimize_every_n_nodes=12)
    pose_graph.constraint_builder.sampling_ratio = 0.6
    pose_graph.constraint_builder.fast_correlative_scan_matcher_3d = (
        FastCorrelativeScanMatcherOptions3D(
            branch_and_bound_depth=3,
            full_resolution_depth=3,
            linear_xy_search_window=1.0,
            linear_z_search_window=0.4,
            angular_search_window=np.radians(10.0),
            min_rotational_score=0.1,
        )
    )
    return MapBuilderOptions(use_trajectory_builder_3d=True, pose_graph=pose_graph)


def trajectory_options():
    return TrajectoryBuilderOptions(
        trajectory_builder_3d=TrajectoryBuilder3DOptions(
            min_range=0.1,
            max_range=10.0,
            motion_filter=MotionFilterOptions(
                max_time_seconds=0.5,
                max_distance_meters=0.2,
                max_angle_radians=0.2,
            ),
            high_resolution_adaptive_voxel_filter=AdaptiveVoxelFilterOptions(
                max_length=2.0, min_num_points=100, max_range=15.0
            ),
            low_resolution_adaptive_voxel_filter=AdaptiveVoxelFilterOptions(
                max_length=4.0, min_num_points=150, max_range=15.0
            ),
            submaps=SubmapsOptions3D(
                num_range_data=8,
                high_resolution=0.10,
                low_resolution=0.45,
                high_resolution_grid_size=192,
                low_resolution_grid_size=96,
            ),
        ),
        use_chunked_device_frontend=True,
        device_frontend_chunk_size=8,
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


class TestChunkedMapBuilder3D:
    def test_global_slam_consistency(self):
        mb = MapBuilder(map_builder_options())
        results = []
        tid = mb.add_trajectory_builder(
            {"range", "imu"},
            trajectory_options(),
            lambda *a: results.append(a),
        )
        builder = mb.get_trajectory_builder(tid)
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * TRAVEL_DISTANCE
        measurements = generate_fake_range_measurements(
            translation=translation, duration=DURATION, time_step=TIME_STEP
        )
        imu = imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + DURATION + 0.2)
        events = [("imu", d.time, d) for d in imu] + [
            ("range", m.time, m) for m in measurements
        ]
        events.sort(key=lambda e: e[1])
        for kind, _, payload in events:
            builder.add_sensor_data(kind, payload)
        mb.finish_trajectory(tid)
        mb.pose_graph.run_final_optimization()

        assert len(results) > 10
        velocity = translation / DURATION
        nodes = mb.pose_graph.get_trajectory_nodes()
        errs = []
        for node_id, node in nodes.items(NodeId):
            t = node.constant_data.time
            expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
            errs.append(
                np.linalg.norm(
                    rigid3.trans(node.global_pose) - rigid3.trans(expected)
                )
            )
        assert len(errs) > 5
        assert max(errs) < 0.1 * TRAVEL_DISTANCE

        constraints = mb.pose_graph.constraints
        assert any(c.tag == "INTRA_SUBMAP" for c in constraints)


def test_odometry_degrades_observably_not_fatally():
    """A valid odometry stream must not kill a chunked-3D trajectory:
    samples are dropped with a warning and counted
    (mapping_frontend_odometry_samples_dropped) — odometry presence is not
    a config field, so supports() cannot reject it at construction. The
    reference fuses odometry at any time (local_trajectory_builder_3d.cc
    AddOdometryData); the host path (use_chunked_device_frontend=False)
    retains that behavior."""
    from cartographer_tpu import metrics
    from cartographer_tpu.sensor.data import OdometryData

    metrics.enable_collection()
    before = metrics.frontend_odometry_dropped.value()
    mb = MapBuilder(map_builder_options())
    tid = mb.add_trajectory_builder(
        {"range", "imu", "odometry"}, trajectory_options()
    )
    builder = mb.get_trajectory_builder(tid)
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    translation = direction * TRAVEL_DISTANCE
    measurements = generate_fake_range_measurements(
        translation=translation, duration=DURATION, time_step=TIME_STEP
    )
    imu = imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + DURATION + 0.2)
    velocity = translation / DURATION
    odom = [
        OdometryData(
            time=t,
            pose=rigid3.translation((t - FAKE_START_TIME) * velocity),
        )
        for t in np.arange(FAKE_START_TIME, FAKE_START_TIME + DURATION, 0.1)
    ]
    events = (
        [("imu", d.time, d) for d in imu]
        + [("odometry", d.time, d) for d in odom]
        + [("range", m.time, m) for m in measurements]
    )
    events.sort(key=lambda e: e[1])
    for kind, _, payload in events:
        builder.add_sensor_data(kind, payload)
    mb.finish_trajectory(tid)
    mb.pose_graph.run_final_optimization()

    assert metrics.frontend_odometry_dropped.value() - before >= len(odom) // 2
    assert len(list(mb.pose_graph.get_trajectory_nodes().items(NodeId))) > 5
