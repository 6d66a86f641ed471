"""Scaled multi-loop world: drift accumulates, loop closure snaps it shut.

The reference's canonical end-to-end test covers 1.2 m
(map_builder_test.cc:34-36); this drives a figure-eight with full yaw
rotation through a pillared hall (testing/synthetic.generate_loop_world),
long enough for local SLAM to accumulate real drift, and asserts that the
pose graph's loop closures + final optimization reduce the global error
below the pre-closure local drift. bench.py's scaled-world extra runs the
same world larger (~100 m travel, hundreds of nodes) on TPU.
"""

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
from cartographer_tpu.testing.synthetic import generate_loop_world
from cartographer_tpu.transform import rigid3


def run_loop_world(laps=1.15, duration_per_lap=24.0, time_step=0.05):
    measurements, true_poses = generate_loop_world(
        half_width=5.0,
        half_height=3.5,
        laps=laps,
        duration_per_lap=duration_per_lap,
        time_step=time_step,
        # ~1k beams/rev keeps wall samples at or under the 5 cm cell
        # size out to max range (sparser sampling starves the matchers).
        num_beams=1024,
        max_range=10.0,
        noise_std=0.01,
    )
    pose_graph = PoseGraphOptions(optimize_every_n_nodes=25)
    pose_graph.constraint_builder.sampling_ratio = 0.5
    pose_graph.constraint_builder.min_score = 0.5
    pose_graph.constraint_builder.max_constraint_distance = 8.0
    pose_graph.constraint_builder.fast_correlative_scan_matcher = (
        FastCorrelativeScanMatcherOptions2D(
            linear_search_window=3.0,
            angular_search_window=np.radians(25.0),
            branch_and_bound_depth=5,
        )
    )
    mb = MapBuilder(
        MapBuilderOptions(use_trajectory_builder_2d=True, pose_graph=pose_graph)
    )
    local_results = []
    tid = mb.add_trajectory_builder(
        {"range"},
        TrajectoryBuilderOptions(
            trajectory_builder_2d=TrajectoryBuilder2DOptions(
                use_imu_data=False,
                max_range=10.0,
                # The figure-eight rotates continuously (unlike the tiny
                # translating reference world); the online correlative
                # pre-match keeps the LM refinement inside its basin, as
                # in the reference for rotation-rich platforms.
                use_online_correlative_scan_matching=True,
                motion_filter=MotionFilterOptions(
                    max_distance_meters=0.15, max_angle_radians=0.08
                ),
                submaps=SubmapsOptions2D(
                    num_range_data=20,
                    grid_options_2d=GridOptions2D(
                        resolution=0.05, grid_size=512
                    ),
                ),
            ),
            use_chunked_device_frontend=True,
            device_frontend_chunk_size=16,
        ),
        lambda tid_, time_, local_pose, *_: local_results.append(
            (time_, local_pose)
        ),
    )
    builder = mb.get_trajectory_builder(tid)
    for m in measurements:
        builder.add_sensor_data("range", m)
    mb.finish_trajectory(tid)
    mb.pose_graph.run_final_optimization()
    return mb, measurements, true_poses, local_results


def test_loop_closes_after_drift():
    mb, measurements, true_poses, local_results = run_loop_world()

    time_to_truth = {
        round(m.time, 6): p for m, p in zip(measurements, true_poses)
    }
    # SLAM starts at identity at the robot's true initial pose; compose it
    # back on so estimates and ground truth share a frame.
    truth0 = true_poses[0]

    def err_of(time, pose):
        truth = time_to_truth[round(time, 6)]
        est = rigid3.compose(truth0, np.asarray(pose, np.float64))
        return float(
            np.linalg.norm(rigid3.trans(est)[:2] - rigid3.trans(truth)[:2])
        )

    # Pre-closure drift: the raw local-SLAM trajectory over the last
    # quarter of the run (after a full lap, where drift has accumulated).
    assert len(local_results) > 40
    tail = local_results[-len(local_results) // 4 :]
    local_drift = max(err_of(t, p) for t, p in tail)

    # Post-closure error: optimized global node poses.
    errs = []
    for _, node in mb.pose_graph.get_trajectory_nodes().items(NodeId):
        errs.append(err_of(node.constant_data.time, node.global_pose))
    final_max = max(errs)
    final_mean = float(np.mean(errs))

    inter = [c for c in mb.pose_graph.constraints if c.tag == "INTER_SUBMAP"]
    assert len(inter) >= 3, "expected loop-closure constraints across laps"
    assert final_mean < 0.15, f"optimized mean error {final_mean:.3f} m"
    # The closure must actually snap the loop shut: optimized error well
    # below the accumulated local drift (or the drift itself was already
    # sub-resolution, in which case the world was too easy — fail loudly
    # so the scale gets bumped rather than silently testing nothing).
    assert local_drift > 0.05, (
        f"local drift {local_drift:.3f} m too small to exercise closure"
    )
    assert final_max < 0.75 * local_drift, (
        f"final max {final_max:.3f} m vs pre-closure drift {local_drift:.3f} m"
    )
