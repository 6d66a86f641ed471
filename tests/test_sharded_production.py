"""The PRODUCTION pose-graph paths running sharded over the 8-device mesh.

Reference scaling story: thread-fanned constraint search
(internal/constraints/constraint_builder_2d.cc:102-136) + one server owning
the pose graph. TPU equivalent (SURVEY.md section 2.10.4): the drained
loop-closure search batch and the SPA residual tables shard over a
jax.sharding.Mesh. These tests drive MapBuilder/PoseGraph/Optimization-
Problem themselves with a mesh — not standalone kernels — and check both
numerical agreement with the unsharded path and that the sharded dispatch
actually happened (metrics counters).
"""

import numpy as np
import pytest

from cartographer_tpu import metrics
from cartographer_tpu.mapping.constraint_builder_2d import (
    INTER_SUBMAP,
    INTRA_SUBMAP,
    Constraint,
    ConstraintPose,
)
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.parallel import sharded
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid2, rigid3
from tests.test_map_builder import map_builder_options, trajectory_options


class TestSharded2DEndToEnd:
    def test_production_drain_sharded_over_mesh(self):
        mesh = sharded.make_mesh()
        assert mesh.devices.size == 8
        metrics.enable_collection()
        batches0 = metrics.sharded_constraint_batches.value()
        solves0 = metrics.sharded_spa_solves.value()

        options = map_builder_options()
        # This test certifies the SHARDED DEVICE search path across the
        # mesh; pin it (the default "auto" prefers the native host
        # backend wherever the C++ toolchain built it).
        options.pose_graph.constraint_builder.loop_closure_backend = "device"
        mb = MapBuilder(options, mesh=mesh)
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

        # The sharded production programs ran.
        assert metrics.sharded_constraint_batches.value() > batches0
        assert metrics.sharded_spa_solves.value() > solves0
        # Loop closure found inter constraints through the sharded search.
        assert any(c.tag == INTER_SUBMAP for c in mb.pose_graph.constraints)

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


def _spa_2d_problem(mesh):
    """A deterministic noisy pose chain with a loop-closure constraint."""
    from cartographer_tpu.common.config import OptimizationProblemOptions
    from cartographer_tpu.mapping.optimization_problem_2d import (
        NodeSpec2D,
        OptimizationProblem2D,
    )

    rng = np.random.default_rng(7)
    problem = OptimizationProblem2D(OptimizationProblemOptions(), mesh=mesh)
    n = 24
    problem.add_submap(0, np.zeros(3))
    constraints = []
    for i in range(n):
        true = np.array([0.1 * i, 0.05 * i, 0.0])
        noisy = true + rng.normal(0, 0.03, 3)
        problem.add_trajectory_node(
            0,
            NodeSpec2D(
                time=float(i),
                local_pose_2d=true,
                global_pose_2d=noisy,
                gravity_alignment=np.array([1.0, 0, 0, 0]),
            ),
        )
        constraints.append(
            Constraint(
                SubmapId(0, 0),
                NodeId(0, i),
                ConstraintPose(true, 50.0, 60.0),
                INTRA_SUBMAP if i % 2 == 0 else INTER_SUBMAP,
            )
        )
    return problem, constraints


class TestShardedSpaParity:
    def test_2d_spa_sharded_matches_unsharded(self):
        mesh = sharded.make_mesh()
        solved = {}
        for key, m in (("unsharded", None), ("sharded", mesh)):
            problem, constraints = _spa_2d_problem(m)
            problem.solve(constraints, set())
            solved[key] = np.stack(
                [
                    problem.node_data.at(NodeId(0, i)).global_pose_2d
                    for i in range(24)
                ]
            )
        np.testing.assert_allclose(
            solved["sharded"], solved["unsharded"], rtol=1e-4, atol=1e-5
        )

    def test_3d_spa_sharded_matches_unsharded(self):
        from cartographer_tpu.common.config import OptimizationProblemOptions
        from cartographer_tpu.mapping.optimization_problem_3d import (
            NodeSpec3D,
            OptimizationProblem3D,
        )

        mesh = sharded.make_mesh()
        rng = np.random.default_rng(3)
        n = 16
        trues = [
            rigid3.make([0.2 * i, 0.1 * i, 0.02 * i], [1, 0, 0, 0])
            for i in range(n)
        ]
        noise = rng.normal(0, 0.05, (n, 3))

        solved = {}
        for key, m in (("unsharded", None), ("sharded", mesh)):
            problem = OptimizationProblem3D(
                OptimizationProblemOptions(), mesh=m
            )
            problem.add_submap(0, rigid3.identity())
            constraints = []
            for i, true in enumerate(trues):
                noisy = np.array(true, np.float64)
                noisy[:3] += noise[i]
                problem.add_trajectory_node(
                    0,
                    NodeSpec3D(
                        time=float(i), local_pose=true, global_pose=noisy
                    ),
                )
                constraints.append(
                    Constraint(
                        SubmapId(0, 0),
                        NodeId(0, i),
                        ConstraintPose(np.asarray(true), 40.0, 40.0),
                        INTRA_SUBMAP if i % 2 == 0 else INTER_SUBMAP,
                    )
                )
            problem.solve(constraints, set())
            solved[key] = np.stack(
                [
                    problem.node_data.at(NodeId(0, i)).global_pose[:3]
                    for i in range(n)
                ]
            )
        np.testing.assert_allclose(
            solved["sharded"], solved["unsharded"], rtol=1e-4, atol=1e-5
        )
        # And the solve actually pulled the poses toward the truth.
        err = np.linalg.norm(
            solved["sharded"] - np.stack([t[:3] for t in trues]), axis=1
        )
        assert err.max() < 0.04


class TestSharded3DEndToEnd:
    def test_3d_production_drain_sharded_over_mesh(self):
        """The 3D MapBuilder with a mesh: the REAL constraint-builder
        drain runs its BnB search batches sharded
        (constraint_builder_3d.py -> batch_match_device_3d(mesh)), and
        the optimized trajectory still tracks ground truth. Parity
        partner: the unsharded run in
        test_map_builder_chunked_3d.TestChunkedMapBuilder3D."""
        from tests.test_map_builder_chunked_3d import (
            DURATION,
            TIME_STEP,
            TRAVEL_DISTANCE,
            imu_stream,
            map_builder_options as mb3d_options,
            trajectory_options as traj3d_options,
        )

        mesh = sharded.make_mesh()
        metrics.enable_collection()
        batches0 = metrics.sharded_constraint_batches.value()
        searched0 = metrics.constraints_searched.value()

        mb_options = mb3d_options()
        mb_options.pose_graph.constraint_builder.sampling_ratio = 1.0
        # Pin the sharded device search path (see the 2D twin above).
        mb_options.pose_graph.constraint_builder.loop_closure_backend = "device"

        # Dense nodes + small submaps so submaps FINISH and the drain has
        # (node, finished submap) pairs to search (the base chunked-3D
        # options only ever produce INTRA constraints).
        traj_options = traj3d_options()
        traj_options.trajectory_builder_3d.motion_filter.max_distance_meters = 0.02
        traj_options.trajectory_builder_3d.motion_filter.max_angle_radians = 0.02
        traj_options.trajectory_builder_3d.motion_filter.max_time_seconds = 0.09
        traj_options.trajectory_builder_3d.submaps.num_range_data = 4

        mb = MapBuilder(mb_options, mesh=mesh)
        tid = mb.add_trajectory_builder({"range", "imu"}, traj_options)
        builder = mb.get_trajectory_builder(tid)
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * TRAVEL_DISTANCE
        measurements = generate_fake_range_measurements(
            translation=translation, duration=DURATION, time_step=TIME_STEP
        )
        imu = imu_stream(
            FAKE_START_TIME - 0.5, FAKE_START_TIME + DURATION + 0.2
        )
        events = [("imu", d.time, d) for d in imu] + [
            ("range", m.time, m) for m in measurements
        ]
        events.sort(key=lambda e: e[1])
        for kind, _, payload in events:
            builder.add_sensor_data(kind, payload)
        mb.finish_trajectory(tid)
        mb.pose_graph.run_final_optimization()

        # The sharded 3D search batches actually ran.
        assert metrics.constraints_searched.value() > searched0
        assert metrics.sharded_constraint_batches.value() > batches0

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
