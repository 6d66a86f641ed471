"""Extended benchmark suite for the BASELINE.md measurement plan.

Measures, on the attached TPU:
  1. full-pipeline local SLAM throughput (scans/s/chip) — same as bench.py;
  2. loop-closure candidate matches/sec (BnB FastCorrelativeScanMatcher2D
     full-submap searches, the reference's hot backend path —
     internal/2d/scan_matching/fast_correlative_scan_matcher_2d.cc);
  3. SPA solve wall time vs graph size (device LM+CG,
     internal/optimization/optimization_problem_2d.cc analog).

Prints one JSON object per metric (one per line). bench.py remains the
single-line driver benchmark; this suite records the fuller table
(results archived in docs/STATUS.md).

Run from the repo root: python tools/bench_suite.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def emit(r):
    print(json.dumps(r), flush=True)


def main() -> None:

    from cartographer_tpu.common.config import (
        FastCorrelativeScanMatcherOptions2D,
        GridOptions2D,
        SubmapsOptions2D,
        TrajectoryBuilder2DOptions,
    )
    from cartographer_tpu.mapping.chunked_frontend_2d import (
        ChunkedLocalTrajectoryBuilder2D,
    )
    from cartographer_tpu.testing.synthetic import (
        generate_fake_range_measurements,
    )

    # -- 1. local SLAM throughput -------------------------------------------
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    measurements = generate_fake_range_measurements(
        translation=direction * 10.0, duration=60.0, time_step=0.05
    )
    builder = ChunkedLocalTrajectoryBuilder2D(
        TrajectoryBuilder2DOptions(
            use_imu_data=False,
            max_range=10.0,
            submaps=SubmapsOptions2D(
                num_range_data=40,
                grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512),
            ),
        ),
        {"range"},
        chunk_size=32,
    )
    warmup = 256
    for m in measurements[:warmup]:
        builder.add_range_data("range", m)
    t0 = time.perf_counter()
    for m in measurements[warmup:]:
        builder.add_range_data("range", m)
    builder.flush()
    dt = time.perf_counter() - t0
    emit(
        {
            "metric": "local_slam_2d_full_pipeline_scans_per_sec_per_chip",
            "value": round((len(measurements) - warmup) / dt, 2),
            "unit": "scans/s",
        }
    )

    # -- 1b. 3D local SLAM throughput (chunked device frontend) ---------------
    from cartographer_tpu.common.config import (
        AdaptiveVoxelFilterOptions as _AVF,
        MotionFilterOptions,
        SubmapsOptions3D,
        TrajectoryBuilder3DOptions,
    )
    from cartographer_tpu.mapping.chunked_frontend_3d import (
        ChunkedLocalTrajectoryBuilder3D,
    )
    from cartographer_tpu.sensor.data import ImuData
    from cartographer_tpu.testing.synthetic import FAKE_START_TIME

    duration_3d = 30.0
    measurements_3d = generate_fake_range_measurements(
        translation=direction * 5.0, duration=duration_3d, time_step=0.1
    )
    builder3d = ChunkedLocalTrajectoryBuilder3D(
        TrajectoryBuilder3DOptions(
            min_range=0.1,
            max_range=10.0,
            motion_filter=MotionFilterOptions(
                max_time_seconds=0.5,
                max_distance_meters=0.2,
                max_angle_radians=0.2,
            ),
            high_resolution_adaptive_voxel_filter=_AVF(
                max_length=2.0, min_num_points=100, max_range=15.0
            ),
            low_resolution_adaptive_voxel_filter=_AVF(
                max_length=4.0, min_num_points=150, max_range=15.0
            ),
            submaps=SubmapsOptions3D(
                num_range_data=40,
                high_resolution=0.10,
                low_resolution=0.45,
                high_resolution_grid_size=256,
                low_resolution_grid_size=128,
            ),
        ),
        {"range"},
        chunk_size=16,
    )
    imu_times = np.arange(
        FAKE_START_TIME - 0.5, FAKE_START_TIME + duration_3d + 0.2, 0.02
    )
    imu_3d = [
        ImuData(
            time=t,
            linear_acceleration=np.array([0.0, 0.0, 9.8]),
            angular_velocity=np.zeros(3),
        )
        for t in imu_times
    ]
    imu_i = 0
    warm3d = 64
    t0 = None
    for k, m in enumerate(measurements_3d):
        while imu_i < len(imu_3d) and imu_3d[imu_i].time <= m.time:
            builder3d.add_imu_data(imu_3d[imu_i])
            imu_i += 1
        if k == warm3d:
            t0 = time.perf_counter()
        builder3d.add_range_data("range", m)
    builder3d.flush()
    dt = time.perf_counter() - t0
    emit(
        {
            "metric": "local_slam_3d_full_pipeline_scans_per_sec_per_chip",
            "value": round((len(measurements_3d) - warm3d) / dt, 2),
            "unit": "scans/s",
            "note": "device-resident 3D pipeline (IMU fusion, dual 256^3/"
            "128^3 grids, LM match, bounded-free-space insert)",
        }
    )

    # -- 2. loop-closure full-submap matches/sec (BnB) ------------------------
    from cartographer_tpu.ops.scan_matching.fast_correlative_2d import (
        FastCorrelativeScanMatcher2D,
    )

    grid = builder._submaps[0].grid
    matcher = FastCorrelativeScanMatcher2D(
        grid,
        FastCorrelativeScanMatcherOptions2D(
            branch_and_bound_depth=7,
            linear_search_window=7.0,
            angular_search_window=np.radians(30.0),
        ),
    )
    import cartographer_tpu.transform.rigid2 as rigid2
    from cartographer_tpu.common.config import AdaptiveVoxelFilterOptions
    from cartographer_tpu.sensor.data import PointCloud
    from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter

    # The constraint builder matches the node's loop-closure-filtered cloud
    # (trajectory_builder_2d.lua loop_closure_adaptive_voxel_filter).
    cloud = adaptive_voxel_filter(
        PointCloud(measurements[-1].ranges.points),
        AdaptiveVoxelFilterOptions(
            max_length=0.9, min_num_points=100, max_range=50.0
        ),
    ).points[:, :2]
    center = np.asarray(grid.origin) + 0.5 * 0.05 * 512
    initial = rigid2.make(center, 0.1)
    matcher.match(initial, cloud, min_score=0.3)  # warm up / compile
    n_matches = 20
    t0 = time.perf_counter()
    for _ in range(n_matches):
        matcher.match(initial, cloud, min_score=0.3)
    dt = time.perf_counter() - t0
    emit(
        {
            "metric": "loop_closure_bnb_matches_per_sec_per_chip",
            "value": round(n_matches / dt, 2),
            "unit": "matches/s",
            "note": "BnB depth 7, 7 m / 30 deg window per match "
            "(constraint-builder hot path)",
        }
    )

    # -- 2b. batched constraint searches (two round trips per batch) ----------
    from cartographer_tpu.common.config import ConstraintBuilderOptions
    from cartographer_tpu.mapping.constraint_builder_2d import ConstraintBuilder2D
    from cartographer_tpu.mapping.id import NodeId, SubmapId
    from cartographer_tpu.mapping.trajectory_node import TrajectoryNodeData

    cb_opts = ConstraintBuilderOptions()
    cb_opts.sampling_ratio = 1.0
    cb_opts.max_constraint_distance = 1e6
    cb_opts.min_score = 0.3
    cb_opts.fast_correlative_scan_matcher = FastCorrelativeScanMatcherOptions2D(
        branch_and_bound_depth=7,
        linear_search_window=7.0,
        angular_search_window=np.radians(30.0),
    )
    cb = ConstraintBuilder2D(cb_opts)
    sid = SubmapId(0, 0)
    cb.set_submap_local_pose(sid, np.zeros(3))
    cloud3 = np.concatenate([cloud, np.zeros((len(cloud), 1))], axis=1).astype(
        np.float32
    )
    batch = 16
    from cartographer_tpu.transform import rigid3 as r3

    def enqueue():
        for k in range(batch):
            cb.maybe_add_constraint(
                sid,
                grid,
                NodeId(0, k),
                TrajectoryNodeData(
                    time=0.0,
                    gravity_alignment=np.array([1.0, 0, 0, 0]),
                    filtered_gravity_aligned_point_cloud=cloud3,
                    local_pose=r3.identity(),
                ),
                rigid2.make(center, 0.1),
            )

    enqueue()
    cb.run_pending()  # warm up / compile
    enqueue()
    t0 = time.perf_counter()
    found = cb.run_pending()
    dt = time.perf_counter() - t0
    emit(
        {
            "metric": "loop_closure_batched_matches_per_sec_per_chip",
            "value": round(batch / dt, 2),
            "unit": "matches/s",
            "note": f"batch of {batch} BnB searches + GN refinements, "
            f"{len(found)} constraints found, two host round trips total",
        }
    )

    # -- 3. SPA solve time vs graph size --------------------------------------
    import jax.numpy as jnp

    from cartographer_tpu.ops import spa_solver

    rng = np.random.default_rng(0)
    for n_nodes in (1000, 10000):
        n_submaps = max(2, n_nodes // 90)
        n_con = n_nodes * 3
        problem = spa_solver.SpaProblem(
            submap_poses=jnp.asarray(
                rng.normal(0, 5, (n_submaps, 3)).astype(np.float32)
            ),
            node_poses=jnp.asarray(rng.normal(0, 5, (n_nodes, 3)).astype(np.float32)),
            free_submap=jnp.asarray(np.array([False] + [True] * (n_submaps - 1))),
            free_node=jnp.ones((n_nodes,), bool),
            c_submap=jnp.asarray(
                rng.integers(0, n_submaps, n_con).astype(np.int32)
            ),
            c_node=jnp.asarray(rng.integers(0, n_nodes, n_con).astype(np.int32)),
            c_z=jnp.asarray(rng.normal(0, 1, (n_con, 3)).astype(np.float32)),
            c_weight=jnp.ones((n_con, 2), jnp.float32) * 1e4,
            c_huber=jnp.ones((n_con,), bool),
            c_mask=jnp.ones((n_con,), bool),
            n_a=jnp.asarray((np.arange(n_nodes - 1)).astype(np.int32)),
            n_b=jnp.asarray((np.arange(n_nodes - 1) + 1).astype(np.int32)),
            n_z=jnp.asarray(rng.normal(0, 0.1, (n_nodes - 1, 3)).astype(np.float32)),
            n_weight=jnp.ones((n_nodes - 1, 2), jnp.float32) * 1e5,
            n_mask=jnp.ones((n_nodes - 1,), bool),
        )
        sp, npo, cost = spa_solver.solve(
            problem, jnp.float32(1e3), max_iterations=20, cg_iterations=50
        )
        np.asarray(cost)  # compile + settle
        t0 = time.perf_counter()
        sp, npo, cost = spa_solver.solve(
            problem, jnp.float32(1e3), max_iterations=20, cg_iterations=50
        )
        np.asarray(cost)
        dt = time.perf_counter() - t0
        emit(
            {
                "metric": f"spa_solve_seconds_{n_nodes}_nodes",
                "value": round(dt, 4),
                "unit": "s",
                "note": f"{n_submaps} submaps, {n_con} inter constraints, "
                "20 LM iterations x 50 CG",
            }
        )

    pass


if __name__ == "__main__":
    main()
