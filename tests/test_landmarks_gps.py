"""Landmark + fixed-frame (GPS) residual tests (model:
landmark_cost_function_2d_test.cc and optimization_problem_2d GPS path)."""

import numpy as np
import pytest

from cartographer_tpu.common.config import OptimizationProblemOptions
from cartographer_tpu.mapping.constraint_builder_2d import (
    Constraint,
    ConstraintPose,
    INTRA_SUBMAP,
)
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.optimization_problem_2d import (
    NodeSpec2D,
    OptimizationProblem2D,
)
from cartographer_tpu.sensor.data import FixedFramePoseData
from cartographer_tpu.transform import rigid2, rigid3


def identity_quat():
    return np.array([1.0, 0.0, 0.0, 0.0])


def build_problem_with_nodes(node_poses, times):
    problem = OptimizationProblem2D(
        OptimizationProblemOptions(
            local_slam_pose_translation_weight=1e3,
            local_slam_pose_rotation_weight=1e3,
            fixed_frame_pose_translation_weight=1e2,
            fixed_frame_pose_rotation_weight=1.0,
        )
    )
    problem.add_submap(0, rigid2.make([0.0, 0.0], 0.0))
    for t, pose in zip(times, node_poses):
        problem.add_trajectory_node(
            0,
            NodeSpec2D(
                time=t,
                local_pose_2d=np.asarray(pose),
                global_pose_2d=np.asarray(pose),
                gravity_alignment=identity_quat(),
            ),
        )
    constraints = [
        Constraint(
            SubmapId(0, 0),
            NodeId(0, i),
            ConstraintPose(np.asarray(node_poses[i]), 30.0, 30.0),
            INTRA_SUBMAP,
        )
        for i in range(len(node_poses))
    ]
    return problem, constraints


class TestLandmarks:
    def test_landmark_pose_estimated(self):
        poses = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]]
        times = [0.0, 1.0, 2.0]
        problem, constraints = build_problem_with_nodes(poses, times)
        true_landmark = rigid2.make([1.5, 2.0], 0.0)
        landmark_nodes = {"lm_0": {"observations": [], "global_pose": None}}
        for t, pose in zip(times, poses):
            rel = rigid2.relative(np.asarray(pose), true_landmark)
            landmark_nodes["lm_0"]["observations"].append(
                {
                    "trajectory_id": 0,
                    "time": t + 0.25,  # between nodes
                    "landmark_to_tracking_transform": rigid3.embed_3d(rel),
                    "translation_weight": 100.0,
                    "rotation_weight": 10.0,
                }
            )
        problem.solve(constraints, set(), landmark_nodes)
        assert "lm_0" in problem.landmark_data
        est = problem.landmark_data["lm_0"]
        # Observation times are offset by 0.25 from nodes while the synthetic
        # relative poses were generated at node poses; with constant velocity
        # the interpolated pose shifts by 0.25m -> tolerance.
        np.testing.assert_allclose(est[:2], true_landmark[:2], atol=0.3)

    def test_nodes_stay_with_consistent_landmarks(self):
        poses = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
        times = [0.0, 1.0]
        problem, constraints = build_problem_with_nodes(poses, times)
        landmark_nodes = {
            "lm": {
                "observations": [
                    {
                        "trajectory_id": 0,
                        "time": 0.0,
                        "landmark_to_tracking_transform": rigid3.embed_3d(
                            rigid2.make([0.0, 1.0], 0.0)
                        ),
                        "translation_weight": 10.0,
                        "rotation_weight": 1.0,
                    }
                ],
                "global_pose": None,
            }
        }
        problem.solve(constraints, set(), landmark_nodes)
        np.testing.assert_allclose(
            problem.node_data.at(NodeId(0, 0)).global_pose_2d[:2],
            [0.0, 0.0],
            atol=0.05,
        )


class TestFixedFrame:
    def test_gps_anchors_trajectory(self):
        # Nodes along x; GPS observations in a fixed frame offset by (10, 5).
        n = 5
        poses = [[i * 1.0, 0.0, 0.0] for i in range(n)]
        times = [float(i) for i in range(n)]
        problem, constraints = build_problem_with_nodes(poses, times)
        offset = rigid2.make([10.0, 5.0], 0.0)
        for t, pose in zip(times, poses):
            # GPS measures node pose in the fixed frame.
            gps_pose = rigid2.compose(rigid2.inverse(offset), np.asarray(pose))
            problem.add_fixed_frame_pose_data(
                0,
                FixedFramePoseData(time=t, pose=rigid3.embed_3d(gps_pose)),
            )
        problem.solve(constraints, set())
        # The fixed frame origin should converge to the offset.
        assert 0 in problem.fixed_frame_origin_in_map
        np.testing.assert_allclose(
            problem.fixed_frame_origin_in_map[0][:2], offset[:2], atol=0.1
        )


# -- 3D (landmark_cost_function_3d.h, optimization_problem_3d.cc:510-570) --


def build_problem_3d(node_poses, times):
    from cartographer_tpu.mapping.optimization_problem_3d import (
        NodeSpec3D,
        OptimizationProblem3D,
    )

    problem = OptimizationProblem3D(
        OptimizationProblemOptions(
            local_slam_pose_translation_weight=1e3,
            local_slam_pose_rotation_weight=1e3,
            fixed_frame_pose_translation_weight=1e2,
            fixed_frame_pose_rotation_weight=1.0,
        )
    )
    problem.add_submap(0, rigid3.identity())
    for t, pose in zip(times, node_poses):
        problem.add_trajectory_node(
            0,
            NodeSpec3D(
                time=t,
                local_pose=np.asarray(pose),
                global_pose=np.asarray(pose),
            ),
        )
    constraints = [
        Constraint(
            SubmapId(0, 0),
            NodeId(0, i),
            ConstraintPose(np.asarray(node_poses[i]), 30.0, 30.0),
            INTRA_SUBMAP,
        )
        for i in range(len(node_poses))
    ]
    return problem, constraints


class TestLandmarks3D:
    def test_landmark_pose_estimated_3d(self):
        poses = [
            rigid3.make([0.0, 0.0, 0.0], [1, 0, 0, 0]),
            rigid3.make([1.0, 0.0, 0.0], [1, 0, 0, 0]),
            rigid3.make([2.0, 0.0, 0.0], [1, 0, 0, 0]),
        ]
        times = [0.0, 1.0, 2.0]
        problem, constraints = build_problem_3d(poses, times)
        true_landmark = rigid3.make([1.5, 2.0, 0.5], [1, 0, 0, 0])
        landmark_nodes = {"lm_0": {"observations": [], "global_pose": None}}
        for t, pose in zip(times, poses):
            rel = rigid3.relative(np.asarray(pose), true_landmark)
            landmark_nodes["lm_0"]["observations"].append(
                {
                    "trajectory_id": 0,
                    "time": t + 0.25,
                    "landmark_to_tracking_transform": rel,
                    "translation_weight": 100.0,
                    "rotation_weight": 10.0,
                }
            )
        problem.solve(constraints, set(), landmark_nodes)
        assert "lm_0" in problem.landmark_data
        est = problem.landmark_data["lm_0"]
        # Observations were generated at node poses but stamped 0.25 between
        # nodes; with 1 m node spacing the interpolated pose shifts 0.25 m.
        np.testing.assert_allclose(est[:3], true_landmark[:3], atol=0.3)

    def test_landmark_interpolated_observation_exact(self):
        # Observation exactly halfway between two nodes: landmark estimate
        # should land on the pose implied by the interpolated node pose.
        poses = [
            rigid3.make([0.0, 0.0, 0.0], [1, 0, 0, 0]),
            rigid3.make([2.0, 0.0, 0.0], [1, 0, 0, 0]),
        ]
        times = [0.0, 1.0]
        problem, constraints = build_problem_3d(poses, times)
        landmark_nodes = {
            "lm": {
                "observations": [
                    {
                        "trajectory_id": 0,
                        "time": 0.5,
                        "landmark_to_tracking_transform": rigid3.make(
                            [0.0, 1.0, 0.0], [1, 0, 0, 0]
                        ),
                        "translation_weight": 100.0,
                        "rotation_weight": 10.0,
                    }
                ],
                "global_pose": None,
            }
        }
        problem.solve(constraints, set(), landmark_nodes)
        est = problem.landmark_data["lm"]
        np.testing.assert_allclose(est[:3], [1.0, 1.0, 0.0], atol=0.05)


class TestFixedFrame3D:
    def test_gps_anchors_trajectory_3d(self):
        n = 5
        poses = [rigid3.make([i * 1.0, 0.0, 0.0], [1, 0, 0, 0]) for i in range(n)]
        times = [float(i) for i in range(n)]
        problem, constraints = build_problem_3d(poses, times)
        offset = rigid3.make([10.0, 5.0, 0.0], [1, 0, 0, 0])
        for t, pose in zip(times, poses):
            gps_pose = rigid3.compose(rigid3.inverse(offset), np.asarray(pose))
            problem.add_fixed_frame_pose_data(
                0, FixedFramePoseData(time=t, pose=gps_pose)
            )
        problem.solve(constraints, set())
        assert 0 in problem.fixed_frame_origin_in_map
        np.testing.assert_allclose(
            problem.fixed_frame_origin_in_map[0][:3], offset[:3], atol=0.1
        )

    def test_pose_graph_3d_landmark_api(self):
        # PoseGraph3D::AddLandmarkData -> solve -> GetLandmarkPoses.
        from cartographer_tpu.common.config import PoseGraphOptions
        from cartographer_tpu.mapping.pose_graph_3d import PoseGraph3D
        from cartographer_tpu.sensor.data import LandmarkData, LandmarkObservation

        graph = PoseGraph3D(PoseGraphOptions())
        graph.add_trajectory_if_needed(0)
        graph.add_landmark_data(
            0,
            LandmarkData(
                time=0.5,
                landmark_observations=[
                    LandmarkObservation(
                        id="beacon",
                        landmark_to_tracking_transform=rigid3.make(
                            [0.0, 1.0, 0.0], [1, 0, 0, 0]
                        ),
                        translation_weight=10.0,
                        rotation_weight=1.0,
                    )
                ],
            ),
        )
        assert "beacon" in graph._landmark_nodes
