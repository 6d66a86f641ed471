"""End-to-end MapBuilder tests (model: mapping/map_builder_test.cc:38-460:
LocalSlam2D, GlobalSlam2D, pure localization)."""

import numpy as np
import pytest

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


def trajectory_options(grid_type="PROBABILITY_GRID"):
    # Parameterized by grid type like the reference test matrix
    # (mapping/map_builder_test.cc:135-150).
    options = TrajectoryBuilderOptions(
        trajectory_builder_2d=TrajectoryBuilder2DOptions(
            use_imu_data=False,
            max_range=10.0,
            # Tight motion filter so the short synthetic run produces enough
            # nodes to finish submaps and trigger loop closure.
            motion_filter=MotionFilterOptions(max_distance_meters=0.04),
            submaps=SubmapsOptions2D(
                num_range_data=8,
                grid_options_2d=GridOptions2D(
                    grid_type=grid_type, resolution=0.05, grid_size=512
                ),
            ),
        )
    )
    if grid_type == "TSDF":
        # TSD residuals are weight-normalized and much smaller than
        # probability-grid ones; the reference raises the occupied-space
        # weight for TSDF (map_builder_test.cc SetOptionsToTSDF2D:75-92).
        opts2d = options.trajectory_builder_2d
        opts2d.submaps.range_data_inserter.range_data_inserter_type = (
            "TSDF_INSERTER_2D"
        )
        opts2d.ceres_scan_matcher.occupied_space_weight = 10.0
    return options


class LocalSlamObserver:
    def __init__(self):
        self.results = []

    def __call__(self, trajectory_id, time, local_pose, range_data, insertion_result):
        self.results.append((trajectory_id, time, local_pose, insertion_result))


class TestMapBuilder2D:
    @pytest.mark.parametrize("grid_type", ["PROBABILITY_GRID", "TSDF"])
    def test_global_slam_consistency(self, grid_type):
        observer = LocalSlamObserver()
        options = map_builder_options()
        if grid_type == "TSDF":
            # map_builder_test.cc SetOptionsToTSDF2D:88-91.
            options.pose_graph.constraint_builder.ceres_scan_matcher.occupied_space_weight = (
                50.0
            )
        map_builder = MapBuilder(options)
        trajectory_id = map_builder.add_trajectory_builder(
            {"range"}, trajectory_options(grid_type), observer
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

        assert len(observer.results) > 20
        # Ground truth pose of the last local slam result.
        velocity = translation / DURATION
        _, t_last, local_pose_last, _ = observer.results[-1]
        expected = rigid3.translation((t_last - FAKE_START_TIME) * velocity)
        err_local = np.linalg.norm(
            rigid3.trans(local_pose_last) - rigid3.trans(expected)
        )
        assert err_local < 0.1 * TRAVEL_DISTANCE

        # Global consistency: optimized node poses close to ground truth.
        nodes = map_builder.pose_graph.get_trajectory_nodes()
        from cartographer_tpu.mapping.id import NodeId

        errs = []
        for node_id, node in nodes.items(NodeId):
            t = node.constant_data.time
            expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
            errs.append(
                np.linalg.norm(rigid3.trans(node.global_pose) - rigid3.trans(expected))
            )
        assert max(errs) < 0.1 * TRAVEL_DISTANCE

        # Constraints were created, including loop closures after the first
        # submap finished.
        constraints = map_builder.pose_graph.constraints
        assert any(c.tag == "INTRA_SUBMAP" for c in constraints)
        assert any(c.tag == "INTER_SUBMAP" for c in constraints)


class TestChunkedFallbackObservable:
    def test_unsupported_chunked_config_falls_back_with_metric(self, caplog):
        """use_chunked_device_frontend with a TSDF config lands on the
        per-scan host path OBSERVABLY: a warning at construction and a
        per-scan counter (mapping_frontend_slow_path_scans) instead of a
        silent ~6x throughput cliff."""
        import logging

        from cartographer_tpu import metrics

        metrics.enable_collection()
        before = metrics.frontend_slow_path_scans.value()
        options = trajectory_options("TSDF")
        options.use_chunked_device_frontend = True
        map_builder = MapBuilder(map_builder_options())
        with caplog.at_level(logging.WARNING):
            tid = map_builder.add_trajectory_builder({"range"}, options)
        assert any(
            "use_chunked_device_frontend requested but unsupported"
            in r.message
            for r in caplog.records
        )
        builder = map_builder.get_trajectory_builder(tid)
        measurements = generate_fake_range_measurements(
            translation=np.array([0.2, 0.1, 0.0]), duration=1.0, time_step=0.1
        )
        for m in measurements:
            builder.add_sensor_data("range", m)
        map_builder.finish_trajectory(tid)
        assert metrics.frontend_slow_path_scans.value() - before == len(
            measurements
        )


class TestMapBuilderNativeLoopClosure:
    def test_global_slam_with_native_backend(self):
        """End-to-end 2D SLAM with the hybrid-placement loop-closure
        backend (ConstraintBuilderOptions.loop_closure_backend="native"):
        threaded C++ BnB on host cores + device-batched GN refinement,
        through the full MapBuilder product path. Same consistency bounds
        as the device-backend test above."""
        observer = LocalSlamObserver()
        options = map_builder_options()
        options.pose_graph.constraint_builder.loop_closure_backend = "native"
        map_builder = MapBuilder(options)
        trajectory_id = map_builder.add_trajectory_builder(
            {"range"}, trajectory_options(), observer
        )
        builder = map_builder.get_trajectory_builder(trajectory_id)

        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * TRAVEL_DISTANCE
        for m in generate_fake_range_measurements(
            translation=translation, duration=DURATION, time_step=TIME_STEP
        ):
            builder.add_sensor_data("range", m)
        map_builder.finish_trajectory(trajectory_id)
        map_builder.pose_graph.run_final_optimization()

        velocity = translation / DURATION
        nodes = map_builder.pose_graph.get_trajectory_nodes()
        from cartographer_tpu.mapping.id import NodeId

        errs = []
        for node_id, node in nodes.items(NodeId):
            t = node.constant_data.time
            expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
            errs.append(
                np.linalg.norm(
                    rigid3.trans(node.global_pose) - rigid3.trans(expected)
                )
            )
        assert len(errs) > 20
        assert max(errs) < 0.1 * TRAVEL_DISTANCE
        constraints = map_builder.pose_graph.constraints
        assert any(c.tag == "INTER_SUBMAP" for c in constraints)
