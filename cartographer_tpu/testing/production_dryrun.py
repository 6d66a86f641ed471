"""The production pose-graph drain on a device mesh, reusable by the
driver dryrun (__graft_entry__.dryrun_multichip) and the multi-host worker
(tools/multihost_worker --production) so that single-chip CI, the N-virtual-
device dryrun, and the real 2-process jax.distributed test all exercise the
SAME code path: MapBuilder -> PoseGraph2D -> ConstraintBuilder2D batched
branch-and-bound drain -> SPA solve, with the search batch and residual
tables sharded over the mesh (parallel/sharded.py).

Reference equivalent: the ThreadPool-fanned constraint search and
single-server pose graph (constraint_builder_2d.cc:102-136,
cloud/internal/map_builder_server.h:77-146).
"""

from __future__ import annotations

import numpy as np


def run_production_drain_2d(mesh, travel: float = 0.9, duration: float = 4.5):
    """Run a small synthetic-world 2D SLAM problem end to end with the
    pose-graph backend sharded over `mesh`. Deterministic: every process
    of a multi-controller run computes identical host state. Returns a
    stats dict (sharded dispatch counts, inter constraints, max node
    error, pose digest for cross-process equality checks)."""
    from cartographer_tpu import metrics
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

    metrics.enable_collection()
    batches0 = metrics.sharded_constraint_batches.value()
    solves0 = metrics.sharded_spa_solves.value()

    pose_graph = PoseGraphOptions(optimize_every_n_nodes=12)
    pose_graph.constraint_builder.fast_correlative_scan_matcher = (
        FastCorrelativeScanMatcherOptions2D(
            linear_search_window=2.0,
            angular_search_window=np.radians(20.0),
            branch_and_bound_depth=4,
        )
    )
    pose_graph.constraint_builder.sampling_ratio = 0.5
    options = MapBuilderOptions(
        use_trajectory_builder_2d=True, pose_graph=pose_graph
    )
    trajectory_options = TrajectoryBuilderOptions(
        trajectory_builder_2d=TrajectoryBuilder2DOptions(
            use_imu_data=False,
            max_range=10.0,
            motion_filter=MotionFilterOptions(max_distance_meters=0.04),
            submaps=SubmapsOptions2D(
                num_range_data=8,
                grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512),
            ),
        )
    )

    mb = MapBuilder(options, mesh=mesh)
    tid = mb.add_trajectory_builder({"range"}, trajectory_options)
    builder = mb.get_trajectory_builder(tid)
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    for m in generate_fake_range_measurements(
        translation=direction * travel, duration=duration, time_step=0.05
    ):
        builder.add_sensor_data("range", m)
    mb.finish_trajectory(tid)
    mb.pose_graph.run_final_optimization()

    velocity = direction * travel / duration
    errs = []
    poses = []
    for node_id, node in mb.pose_graph.get_trajectory_nodes().items(NodeId):
        t = node.constant_data.time
        expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
        poses.append(np.asarray(rigid3.trans(node.global_pose)))
        errs.append(
            np.linalg.norm(
                rigid3.trans(node.global_pose) - rigid3.trans(expected)
            )
        )
    inter = sum(
        1 for c in mb.pose_graph.constraints if c.tag == "INTER_SUBMAP"
    )
    return {
        "sharded_search_batches": int(
            metrics.sharded_constraint_batches.value() - batches0
        ),
        "sharded_spa_solves": int(metrics.sharded_spa_solves.value() - solves0),
        "inter_constraints": inter,
        "num_nodes": len(errs),
        "max_node_error_m": float(max(errs)) if errs else float("nan"),
        "travel_m": travel,
        # Digest of optimized node positions: equal across the processes of
        # an SPMD run iff they computed the same drain.
        "pose_digest": float(np.sum(np.round(np.stack(poses), 6))),
    }
