"""Multi-trajectory (multi-robot, shared pose graph) tests (model:
map_builder_test.cc multi-trajectory paths + pose_graph connectivity)."""

import numpy as np
import pytest

from cartographer_tpu import metrics
from cartographer_tpu.mapping.id import NodeId
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3
from tests.test_map_builder import map_builder_options, trajectory_options


class TestMultiTrajectory:
    def test_two_robots_shared_graph(self):
        mb = MapBuilder(map_builder_options())
        tid0 = mb.add_trajectory_builder({"range"}, trajectory_options())
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        b0 = mb.get_trajectory_builder(tid0)
        for m in generate_fake_range_measurements(
            translation=direction * 1.0, duration=4.0, time_step=0.05
        ):
            b0.add_sensor_data("range", m)
        mb.finish_trajectory(tid0)

        # Second robot starts later, same world, known initial pose.
        tid1 = mb.add_trajectory_builder({"range"}, trajectory_options())
        mb.pose_graph.set_initial_trajectory_pose(
            tid1, tid0, rigid3.identity(), FAKE_START_TIME + 50.0
        )
        b1 = mb.get_trajectory_builder(tid1)
        for m in generate_fake_range_measurements(
            translation=direction * 1.0, duration=4.0, time_step=0.05
        ):
            m.time += 50.0
            b1.add_sensor_data("range", m)
        mb.finish_trajectory(tid1)
        mb.pose_graph.run_final_optimization()

        velocity = direction * 1.0 / 4.0
        nodes = mb.pose_graph.get_trajectory_nodes()
        errs = {0: [], 1: []}
        for node_id, node in nodes.items(NodeId):
            t = node.constant_data.time - (50.0 if node_id.trajectory_id == tid1 else 0.0)
            expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
            errs[node_id.trajectory_id].append(
                np.linalg.norm(rigid3.trans(node.global_pose) - rigid3.trans(expected))
            )
        assert len(errs[tid1]) > 10
        assert max(errs[tid0]) < 0.12
        assert max(errs[tid1]) < 0.12
        # Cross-trajectory loop closure connected the two robots.
        assert any(
            c.tag == "INTER_SUBMAP"
            and c.submap_id.trajectory_id != c.node_id.trajectory_id
            for c in mb.pose_graph.constraints
        )
        # Connectivity reflects it.
        assert mb.pose_graph._connectivity.transitively_connected(tid0, tid1)


class TestMetricsCollection:
    def test_real_metrics_count(self):
        factory = metrics.enable_collection()
        try:
            mb = MapBuilder(map_builder_options())
            tid = mb.add_trajectory_builder({"range"}, trajectory_options())
            b = mb.get_trajectory_builder(tid)
            direction = np.array([2.0, 1.0, 0.0])
            direction /= np.linalg.norm(direction)
            for m in generate_fake_range_measurements(
                translation=direction * 0.8, duration=3.0, time_step=0.05
            ):
                b.add_sensor_data("range", m)
            mb.finish_trajectory(tid)
            assert metrics.constraints_searched.value() > 0
            assert metrics.optimization_runs.value() >= 1
        finally:
            metrics.register_family_factory(metrics.FamilyFactory(real=False))
