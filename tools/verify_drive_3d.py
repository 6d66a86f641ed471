"""Verify drive: end-to-end 3D SLAM through the chunked device frontend
on the real attached TPU (MapBuilder surface, synthetic world).

Run from the repo root: python tools/verify_drive_3d.py
"""

from __future__ import annotations

import time

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

TRAVEL_DISTANCE = 2.0
DURATION = 8.0
TIME_STEP = 0.1


def main() -> None:
    import jax

    print("devices:", jax.devices(), flush=True)
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
    mb = MapBuilder(
        MapBuilderOptions(use_trajectory_builder_3d=True, pose_graph=pose_graph)
    )
    topts = TrajectoryBuilderOptions(
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
                num_range_data=10,
                high_resolution=0.10,
                low_resolution=0.45,
                high_resolution_grid_size=256,
                low_resolution_grid_size=128,
            ),
        ),
        use_chunked_device_frontend=True,
        device_frontend_chunk_size=16,
    )
    results = []
    tid = mb.add_trajectory_builder(
        {"range", "imu"}, topts, lambda *a: results.append(a)
    )
    builder = mb.get_trajectory_builder(tid)
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    translation = direction * TRAVEL_DISTANCE
    measurements = generate_fake_range_measurements(
        translation=translation, duration=DURATION, time_step=TIME_STEP
    )
    imu_times = np.arange(
        FAKE_START_TIME - 0.5, FAKE_START_TIME + DURATION + 0.2, 0.02
    )
    events = [
        (
            "imu",
            t,
            ImuData(
                time=t,
                linear_acceleration=np.array([0.0, 0.0, 9.8]),
                angular_velocity=np.zeros(3),
            ),
        )
        for t in imu_times
    ] + [("range", m.time, m) for m in measurements]
    events.sort(key=lambda e: e[1])
    t0 = time.perf_counter()
    for kind, _, payload in events:
        builder.add_sensor_data(kind, payload)
    mb.finish_trajectory(tid)
    t_frontend = time.perf_counter() - t0
    mb.pose_graph.run_final_optimization()

    velocity = translation / DURATION
    nodes = mb.pose_graph.get_trajectory_nodes()
    errs = []
    for node_id, node in nodes.items(NodeId):
        t = node.constant_data.time
        expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
        errs.append(
            np.linalg.norm(rigid3.trans(node.global_pose) - rigid3.trans(expected))
        )
    print(
        f"scans={len(measurements)} results={len(results)} nodes={len(errs)} "
        f"frontend_wall={t_frontend:.2f}s "
        f"({len(measurements) / t_frontend:.1f} scans/s incl. compile)"
    )
    print(f"max node error = {max(errs):.4f} m (bound {0.1 * TRAVEL_DISTANCE} m)")
    assert len(errs) > 5
    assert max(errs) < 0.1 * TRAVEL_DISTANCE
    intra = sum(1 for c in mb.pose_graph.constraints if c.tag == "INTRA_SUBMAP")
    inter = sum(1 for c in mb.pose_graph.constraints if c.tag == "INTER_SUBMAP")
    print(f"constraints: intra={intra} inter={inter}")
    assert intra > 0
    print("VERIFY DRIVE 3D: OK")


if __name__ == "__main__":
    main()
