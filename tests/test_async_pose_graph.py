"""Asynchronous global SLAM test: the work queue drains on background
threads (reference DrainWorkQueue) while the frontend keeps feeding."""

import numpy as np
import pytest

from cartographer_tpu.mapping.id import NodeId
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3
from tests.test_map_builder import map_builder_options, trajectory_options


class TestAsyncPoseGraph:
    def test_async_matches_ground_truth(self):
        options = map_builder_options()
        options.async_pose_graph = True
        options.num_background_threads = 2
        mb = MapBuilder(options)
        tid = mb.add_trajectory_builder({"range"}, trajectory_options())
        builder = mb.get_trajectory_builder(tid)
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        travel = 1.2
        for m in generate_fake_range_measurements(
            translation=direction * travel, duration=6.0, time_step=0.05
        ):
            builder.add_sensor_data("range", m)
        mb.finish_trajectory(tid)
        mb.pose_graph.run_final_optimization()

        velocity = direction * travel / 6.0
        nodes = mb.pose_graph.get_trajectory_nodes()
        errs = []
        for node_id, node in nodes.items(NodeId):
            t = node.constant_data.time
            expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
            errs.append(
                np.linalg.norm(rigid3.trans(node.global_pose) - rigid3.trans(expected))
            )
        assert len(errs) > 20
        assert max(errs) < 0.1 * travel
        assert any(c.tag == "INTER_SUBMAP" for c in mb.pose_graph.constraints)


class TestAsyncPoseGraphStress:
    def test_concurrent_feed_and_queries(self):
        """Stress the concurrent drain: the frontend hammers add_node
        (via add_sensor_data) while background pool threads drain loop
        closure + optimization and a second thread issues the public
        queries that take the work lock. Catches lock-ordering and
        data-race regressions in the async path (reference: thread-safety
        annotations + ASAN over pose_graph_2d.cc:174-190,520-544)."""
        import threading

        options = map_builder_options()
        options.async_pose_graph = True
        options.num_background_threads = 4
        # Optimize often so drains overlap the feed.
        options.pose_graph.optimize_every_n_nodes = 5
        mb = MapBuilder(options)
        tid = mb.add_trajectory_builder({"range"}, trajectory_options())
        builder = mb.get_trajectory_builder(tid)

        errors = []
        stop = threading.Event()

        def query_loop():
            try:
                while not stop.is_set():
                    pg = mb.pose_graph
                    pg.get_local_to_global_transform(tid)
                    list(pg.constraints)
                    nodes = pg.get_trajectory_nodes()
                    for node_id, node in nodes.items(NodeId):
                        np.asarray(node.global_pose)
                    pg.get_all_submap_data()
            except Exception as e:  # pragma: no cover
                errors.append(e)

        query_threads = [
            threading.Thread(target=query_loop, daemon=True) for _ in range(2)
        ]
        for t in query_threads:
            t.start()
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        travel = 1.2
        try:
            for m in generate_fake_range_measurements(
                translation=direction * travel, duration=6.0, time_step=0.05
            ):
                builder.add_sensor_data("range", m)
            mb.finish_trajectory(tid)
            mb.pose_graph.run_final_optimization()
        finally:
            stop.set()
            for t in query_threads:
                t.join(timeout=30)
        assert not errors, errors
        assert all(not t.is_alive() for t in query_threads)

        velocity = direction * travel / 6.0
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
        assert len(errs) > 20
        assert max(errs) < 0.1 * travel


class TestAsyncPoseGraph3D:
    def test_async_3d_matches_ground_truth(self):
        import tests.test_map_builder_3d as t3d

        options = t3d.map_builder_options()
        options.async_pose_graph = True
        options.num_background_threads = 2
        mb = MapBuilder(options)
        tid = mb.add_trajectory_builder(
            {"range", "imu"}, t3d.trajectory_options()
        )
        builder = mb.get_trajectory_builder(tid)
        imu = t3d.imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + 4.1)
        translation = np.array([0.8, 0.4, 0.0])
        measurements = generate_fake_range_measurements(
            translation=translation, duration=4.0, time_step=0.1
        )
        events = [("imu", d.time, d) for d in imu] + [
            ("range", m.time, m) for m in measurements
        ]
        events.sort(key=lambda e: e[1])
        for kind, _, payload in events:
            builder.add_sensor_data(kind, payload)
        mb.finish_trajectory(tid)
        mb.pose_graph.run_final_optimization()

        velocity = translation / 4.0
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
        assert len(errs) > 10
        assert max(errs) < 0.1 * np.linalg.norm(translation) + 0.05


class TestDrainLockDiscipline:
    @pytest.mark.parametrize("dim", ["2d", "3d"])
    def test_drain_searches_do_not_hold_the_work_lock(self, dim):
        """The async backend's entire purpose is that the sensor feed
        never blocks on a loop-closure drain — so the multi-second
        search phase must run OUTSIDE the work lock (taken by add_node),
        with only merge+optimize locked. Regression test for the
        round-4 finding that the drain held the lock end to end and the
        feed stalled anyway (reference: searches are thread-pool tasks,
        HandleWorkQueue locks bookkeeping only,
        constraint_builder_2d.cc:102-136)."""
        import threading
        import time

        if dim == "2d":
            options = map_builder_options()
        else:
            import tests.test_map_builder_3d as t3d

            options = t3d.map_builder_options()
        options.async_pose_graph = True
        mb = MapBuilder(options)
        pg = mb.pose_graph
        cb = pg._constraint_builder
        orig = cb.run_pending
        in_search = threading.Event()
        release = threading.Event()

        def slow_run_pending():
            in_search.set()
            release.wait(timeout=10.0)
            return orig()

        cb.run_pending = slow_run_pending
        try:
            pg._dispatch_work_queue()
            assert in_search.wait(timeout=10.0), "drain task never ran"
            # While the search phase is in flight, the work lock must be
            # immediately acquirable (else every add_node would stall for
            # the search duration).
            t0 = time.perf_counter()
            acquired = pg._work_lock.acquire(timeout=2.0)
            dt = time.perf_counter() - t0
            if acquired:
                pg._work_lock.release()
        finally:
            release.set()
            cb.run_pending = orig
        pg.wait_for_all_computations()
        assert acquired, "work lock held during the drain's search phase"
        assert dt < 1.0
