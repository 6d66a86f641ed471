"""Scaled-world ATE tail forensics (round-4 verdict item 4).

Runs the SAME scaled world as bench.py's scaled_world row, then answers:
which node carries the max aligned-ATE error, where in the run it sits,
how far it is from the nearest loop-closure-constrained node, and what
its error was BEFORE final optimization — so the recorded max is
explained (pre-closure gauge on early nodes vs a corrupted constraint).

Usage: python tools/ate_forensics.py  (runs on the default JAX backend)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
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
    from cartographer_tpu.evaluation.trajectory_metrics import aligned_ate
    from cartographer_tpu.mapping.id import NodeId
    from cartographer_tpu.mapping.map_builder import MapBuilder
    from cartographer_tpu.testing.synthetic import generate_loop_world
    from cartographer_tpu.transform import rigid3

    measurements, true_poses = generate_loop_world(
        half_width=8.0,
        half_height=6.0,
        laps=2.0,
        duration_per_lap=50.0,
        time_step=0.05,
        num_beams=1024,
        max_range=12.0,
        noise_std=0.01,
    )
    pose_graph = PoseGraphOptions(optimize_every_n_nodes=40)
    pose_graph.constraint_builder.sampling_ratio = 0.4
    pose_graph.constraint_builder.loop_closure_backend = "native"
    pose_graph.constraint_builder.min_score = 0.55
    pose_graph.constraint_builder.max_constraint_distance = 10.0
    pose_graph.constraint_builder.fast_correlative_scan_matcher = (
        FastCorrelativeScanMatcherOptions2D(
            linear_search_window=4.0,
            angular_search_window=np.radians(30.0),
            branch_and_bound_depth=6,
        )
    )
    mb = MapBuilder(
        MapBuilderOptions(use_trajectory_builder_2d=True, pose_graph=pose_graph)
    )
    tid = mb.add_trajectory_builder(
        {"range"},
        TrajectoryBuilderOptions(
            trajectory_builder_2d=TrajectoryBuilder2DOptions(
                use_imu_data=False,
                max_range=12.0,
                motion_filter=MotionFilterOptions(
                    max_distance_meters=0.15, max_angle_radians=0.08
                ),
                submaps=SubmapsOptions2D(
                    num_range_data=30,
                    grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512),
                ),
            ),
            use_chunked_device_frontend=True,
            device_frontend_chunk_size=32,
        ),
    )
    builder = mb.get_trajectory_builder(tid)
    t0 = time.perf_counter()
    for m in measurements:
        builder.add_sensor_data("range", m)
    mb.finish_trajectory(tid)
    feed_s = time.perf_counter() - t0

    time_to_truth = {round(m.time, 6): p for m, p in zip(measurements, true_poses)}
    truth0 = true_poses[0]

    def snapshot():
        node_ids, times, est_xy, true_xy = [], [], [], []
        for nid, node in mb.pose_graph.get_trajectory_nodes().items(NodeId):
            t = node.constant_data.time
            truth = time_to_truth[round(t, 6)]
            est = rigid3.compose(truth0, np.asarray(node.global_pose, np.float64))
            node_ids.append(nid)
            times.append(t)
            est_xy.append(rigid3.trans(est)[:2])
            true_xy.append(rigid3.trans(truth)[:2])
        return node_ids, np.asarray(times), np.stack(est_xy), np.stack(true_xy)

    ids_pre, t_pre, est_pre, true_pre = snapshot()
    ate_pre = aligned_ate(est_pre, true_pre)

    t0 = time.perf_counter()
    mb.pose_graph.run_final_optimization()
    opt_s = time.perf_counter() - t0

    node_ids, times, est_xy, true_xy = snapshot()
    ate = aligned_ate(est_xy, true_xy)
    i_max = int(np.argmax(ate))
    inter = [c for c in mb.pose_graph.constraints if c.tag == "INTER_SUBMAP"]
    id_to_index = {nid: i for i, nid in enumerate(node_ids)}
    constrained = sorted({id_to_index[c.node_id] for c in inter if c.node_id in id_to_index})
    near = min(abs(i_max - j) for j in constrained) if constrained else None

    # Error profile around the max node and over the run.
    k0, k1 = max(0, i_max - 5), min(len(ate), i_max + 6)
    order = np.argsort(ate)[::-1][:10]
    out = {
        "num_nodes": len(node_ids),
        "feed_seconds": round(feed_s, 1),
        "final_opt_seconds": round(opt_s, 1),
        "ate_mean_m": round(float(np.mean(ate)), 4),
        "ate_max_m": round(float(np.max(ate)), 4),
        "ate_pre_final_max_m": round(float(np.max(ate_pre)), 4),
        "ate_pre_at_max_node_m": round(float(ate_pre[i_max]), 4)
        if i_max < len(ate_pre)
        else None,
        "i_max": i_max,
        "run_fraction": round(i_max / (len(node_ids) - 1), 3),
        "time_at_max": round(float(times[i_max]), 2),
        "nodes_to_nearest_inter": near,
        "num_inter": len(inter),
        "ate_window_around_max": [round(float(a), 4) for a in ate[k0:k1]],
        "top10_ate": [
            {"i": int(i), "ate_m": round(float(ate[i]), 4),
             "frac": round(int(i) / (len(node_ids) - 1), 3)}
            for i in order
        ],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
