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


def run_loop_world(
    laps=1.15,
    duration_per_lap=24.0,
    time_step=0.05,
    num_beams=768,
    noise_std=0.02,
    num_range_data=12,
    optimize_every_n_nodes=15,
):
    measurements, true_poses = generate_loop_world(
        half_width=5.0,
        half_height=3.5,
        laps=laps,
        duration_per_lap=duration_per_lap,
        time_step=time_step,
        # 768 beams/rev + 2 cm range noise: enough scan quality to track,
        # sparse/noisy enough that local SLAM accumulates REAL drift for
        # loop closure to fix (1024 beams/1 cm makes drift sub-resolution
        # and the closure assertions vacuous).
        num_beams=num_beams,
        max_range=10.0,
        noise_std=noise_std,
    )
    pose_graph = PoseGraphOptions(optimize_every_n_nodes=optimize_every_n_nodes)
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
                # Small submaps bound the within-submap drift the final
                # optimization cannot remove (constraints tie nodes to
                # whole submaps).
                submaps=SubmapsOptions2D(
                    num_range_data=num_range_data,
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


from cartographer_tpu.evaluation.trajectory_metrics import (  # noqa: E402
    aligned_ate,
    revisit_relation_errors,
)


def test_loop_closes_after_drift():
    mb, measurements, true_poses, local_results = run_loop_world()

    time_to_truth = {
        round(m.time, 6): p for m, p in zip(measurements, true_poses)
    }
    # SLAM starts at identity at the robot's true initial pose; compose it
    # back on so estimates and ground truth share a frame.
    truth0 = true_poses[0]

    def est_xy_of(time, pose):
        est = rigid3.compose(truth0, np.asarray(pose, np.float64))
        return rigid3.trans(est)[:2]

    nodes = [
        (n.constant_data.time, n.global_pose)
        for _, n in mb.pose_graph.get_trajectory_nodes().items(NodeId)
    ]
    assert len(nodes) > 100
    times = np.array([t for t, _ in nodes])
    est = np.stack([est_xy_of(t, p) for t, p in nodes])
    tru = np.stack(
        [rigid3.trans(time_to_truth[round(t, 6)])[:2] for t, _ in nodes]
    )

    inter = [c for c in mb.pose_graph.constraints if c.tag == "INTER_SUBMAP"]
    assert len(inter) >= 10, "expected loop-closure constraints across laps"

    # Gauge-invariant accuracy of the optimized graph (measured regime:
    # aligned ATE mean ~0.06 m, optimized revisit median ~0.11 m over a
    # ~34 m figure-eight at 768 beams / 2 cm range noise).
    opt_ate = aligned_ate(est, tru)
    opt_rel = revisit_relation_errors(times, est, tru)
    assert len(opt_rel) > 50, "world produced too few revisit pairs"
    assert float(np.mean(opt_ate)) < 0.10, (
        f"aligned ATE mean {np.mean(opt_ate):.3f} m"
    )
    # The ATE MAX is asserted with its structure (tools/ate_forensics.py,
    # round-5 forensics): the worst nodes are the FIRST ~5 — an
    # odometry-free startup transient. The synthetic platform is already
    # at full speed at t=0 with no IMU/odometry, so the extrapolator has
    # no velocity estimate and the first scans unwarp wrongly and insert
    # into the nascent first submap at biased poses; final optimization
    # cannot undo what was inserted (the reference behaves the same at
    # bootstrap). Measured decay in this world: 1.8, 1.1, 0.55, 0.27,
    # 0.13, then <= ~0.05 m — geometric, gone within ~8 nodes (~4% of
    # the run; CPU/TPU float paths shift the decay by a couple nodes).
    # Steady state must be of the same order as the mean.
    assert float(np.max(opt_ate[8:])) < 0.15, (
        f"post-startup aligned ATE max {np.max(opt_ate[8:]):.3f} m"
    )
    assert float(np.max(opt_ate[:8])) < 2.5, (
        f"startup transient {np.max(opt_ate[:8]):.3f} m exceeded its bound"
    )
    opt_median = float(np.median(opt_rel))
    assert opt_median < 0.13, f"revisit relation median {opt_median:.3f} m"

    # Loop closure must work against REAL drift: the raw local-SLAM
    # trajectory accumulates revisit error (guarded below so this test
    # cannot silently become vacuous), and the optimized graph must
    # reduce it. The residual floor is the within-submap distortion
    # (constraints tie nodes to whole submaps), so the requirement is a
    # strict reduction, not perfection.
    lt = np.array([t for t, _ in local_results])
    lest = np.stack([est_xy_of(t, p) for t, p in local_results])
    ltru = np.stack(
        [rigid3.trans(time_to_truth[round(t, 6)])[:2] for t, _ in local_results]
    )
    loc_rel = revisit_relation_errors(lt, lest, ltru)
    assert len(loc_rel) > 50
    local_median = float(np.median(loc_rel))
    assert local_median > 0.05, (
        f"local revisit error {local_median:.3f} m too small to exercise "
        "closure (world too easy — bump the scale)"
    )
    assert opt_median < 0.9 * local_median, (
        f"closure did not reduce revisit error: optimized median "
        f"{opt_median:.3f} m vs local {local_median:.3f} m"
    )
