"""End-to-end MapBuilder SLAM through the chunked device frontend
(use_chunked_device_frontend): full pipeline — device-resident local SLAM
in chunks, pose graph with BnB loop closure, final optimization — must
produce a globally consistent trajectory like the per-scan path
(model: mapping/map_builder_test.cc GlobalSlam2D)."""

import numpy as np

from cartographer_tpu.common.config import (
    FastCorrelativeScanMatcherOptions2D,
    GridOptions2D,
    MapBuilderOptions,
    MotionFilterOptions,
    PoseGraphOptions,
    SubmapsOptions2D,
    TrajectoryBuilder2DOptions,
    TrajectoryBuilderOptions,
)
from cartographer_tpu.mapping.id import NodeId
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3

TRAVEL_DISTANCE = 1.2
DURATION = 6.0
TIME_STEP = 0.05


def map_builder_options():
    pose_graph = PoseGraphOptions(optimize_every_n_nodes=20)
    pose_graph.constraint_builder.fast_correlative_scan_matcher = (
        FastCorrelativeScanMatcherOptions2D(
            linear_search_window=2.0,
            angular_search_window=np.radians(20.0),
            branch_and_bound_depth=4,
        )
    )
    pose_graph.constraint_builder.sampling_ratio = 0.5
    return MapBuilderOptions(
        use_trajectory_builder_2d=True,
        pose_graph=pose_graph,
    )


def trajectory_options():
    return TrajectoryBuilderOptions(
        trajectory_builder_2d=TrajectoryBuilder2DOptions(
            use_imu_data=False,
            max_range=10.0,
            motion_filter=MotionFilterOptions(max_distance_meters=0.04),
            submaps=SubmapsOptions2D(
                num_range_data=8,
                grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512),
            ),
        ),
        use_chunked_device_frontend=True,
        device_frontend_chunk_size=16,
    )


class TestChunkedMapBuilder2D:
    def test_global_slam_consistency(self):
        results = []
        map_builder = MapBuilder(map_builder_options())
        trajectory_id = map_builder.add_trajectory_builder(
            {"range"},
            trajectory_options(),
            lambda tid, time, pose, rd, ins: results.append((time, pose, ins)),
        )
        builder = map_builder.get_trajectory_builder(trajectory_id)

        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * TRAVEL_DISTANCE
        measurements = generate_fake_range_measurements(
            translation=translation, duration=DURATION, time_step=TIME_STEP
        )
        for m in measurements:
            builder.add_sensor_data("range", m)
        map_builder.finish_trajectory(trajectory_id)
        map_builder.pose_graph.run_final_optimization()

        assert len(results) > 20
        velocity = translation / DURATION
        t_last, local_pose_last, _ = results[-1]
        expected = rigid3.translation((t_last - FAKE_START_TIME) * velocity)
        err_local = np.linalg.norm(
            rigid3.trans(local_pose_last) - rigid3.trans(expected)
        )
        assert err_local < 0.1 * TRAVEL_DISTANCE

        nodes = map_builder.pose_graph.get_trajectory_nodes()
        errs = []
        for node_id, node in nodes.items(NodeId):
            t = node.constant_data.time
            expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
            errs.append(
                np.linalg.norm(
                    rigid3.trans(node.global_pose) - rigid3.trans(expected)
                )
            )
        assert max(errs) < 0.1 * TRAVEL_DISTANCE

        constraints = map_builder.pose_graph.constraints
        assert any(c.tag == "INTRA_SUBMAP" for c in constraints)
        assert any(c.tag == "INTER_SUBMAP" for c in constraints)
