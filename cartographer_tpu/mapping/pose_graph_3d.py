"""3D global SLAM backend.

Reference: internal/3d/pose_graph_3d.cc:50-1320. Same structure as
PoseGraph2D (pose_graph_2d.py) in SE(3): poses are full rigid transforms,
IMU data feeds the optimization problem, and loop-closure constraints come
from the 3D branch-and-bound matcher via ConstraintBuilder3D.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Set

import numpy as np

from cartographer_tpu import metrics
from cartographer_tpu.common.config import PoseGraphOptions
from cartographer_tpu.common.fixed_ratio_sampler import FixedRatioSampler
from cartographer_tpu.common.time import Time
from cartographer_tpu.mapping.connectivity import TrajectoryConnectivityState
from cartographer_tpu.mapping.constraint_builder_2d import (
    INTRA_SUBMAP,
    Constraint,
    ConstraintPose,
)
from cartographer_tpu.mapping.constraint_builder_3d import ConstraintBuilder3D
from cartographer_tpu.mapping.id import MapById, NodeId, SubmapId
from cartographer_tpu.mapping.optimization_problem_3d import (
    NodeSpec3D,
    OptimizationProblem3D,
)
from cartographer_tpu.mapping.pose_graph_2d import SubmapState, TrajectoryState
from cartographer_tpu.mapping.submap_3d import Submap3D
from cartographer_tpu.mapping.trajectory_node import TrajectoryNode, TrajectoryNodeData
from cartographer_tpu.sensor.data import FixedFramePoseData, ImuData, OdometryData
from cartographer_tpu.transform import rigid3


@dataclasses.dataclass
class InternalSubmapData3D:
    submap: Submap3D
    state: SubmapState = SubmapState.NO_CONSTRAINT_SEARCH
    node_ids: Set[NodeId] = dataclasses.field(default_factory=set)


class PoseGraph3D:
    def __init__(self, options: PoseGraphOptions, thread_pool=None, mesh=None):
        """thread_pool: optional common.task.ThreadPool — when given, the
        loop-closure/optimization work queue drains on pool threads (the
        reference's asynchronous global SLAM, pose_graph_3d.cc
        DrainWorkQueue); otherwise draining is inline and deterministic.

        mesh: optional jax.sharding.Mesh — the drained loop-closure search
        batch and the SE(3) SPA residual tables run sharded over it
        (parallel/sharded.py); None = single-chip behavior."""
        import threading

        self._options = options
        self._thread_pool = thread_pool
        self._work_lock = threading.RLock()
        self._pending_task = None
        self._global_slam_optimization_callback = None
        self._constraint_builder = ConstraintBuilder3D(
            options.constraint_builder, mesh=mesh
        )
        self._optimization_problem = OptimizationProblem3D(
            options.optimization_problem, mesh=mesh
        )
        self._submap_data: MapById = MapById()
        self._trajectory_nodes: MapById = MapById()
        self._constraints: List[Constraint] = []
        self._trajectory_states: Dict[int, TrajectoryState] = {}
        self._connectivity = TrajectoryConnectivityState()
        self._global_localization_samplers: Dict[int, FixedRatioSampler] = {}
        self._num_nodes_since_last_loop_closure = 0
        self._trimmers: List = []
        self._initial_trajectory_poses: Dict[int, tuple] = {}
        self._landmark_nodes: Dict[str, dict] = {}

    @property
    def constraints(self) -> List[Constraint]:
        return list(self._constraints)

    def add_trajectory_if_needed(self, trajectory_id: int) -> None:
        if trajectory_id not in self._trajectory_states:
            self._trajectory_states[trajectory_id] = TrajectoryState.ACTIVE
            self._connectivity.add(trajectory_id)
            self._global_localization_samplers.setdefault(
                trajectory_id,
                FixedRatioSampler(self._options.global_sampling_ratio),
            )

    def add_node(
        self,
        constant_data: TrajectoryNodeData,
        trajectory_id: int,
        insertion_submaps: List[Submap3D],
    ) -> NodeId:
        with self._work_lock:
            return self._add_node_locked(
                constant_data, trajectory_id, insertion_submaps
            )

    def _add_node_locked(
        self,
        constant_data: TrajectoryNodeData,
        trajectory_id: int,
        insertion_submaps: List[Submap3D],
    ) -> NodeId:
        optimized_pose = rigid3.compose(
            self.get_local_to_global_transform(trajectory_id),
            constant_data.local_pose,
        )
        self.add_trajectory_if_needed(trajectory_id)
        node_id = NodeId(
            *self._trajectory_nodes.append(
                trajectory_id, TrajectoryNode(constant_data, optimized_pose)
            )
        )
        traj_submaps = self._submap_data.trajectory(trajectory_id)
        if not traj_submaps or (
            self._submap_data.at(
                SubmapId(trajectory_id, traj_submaps[-1][0])
            ).submap
            is not insertion_submaps[-1]
        ):
            self._submap_data.append(
                trajectory_id, InternalSubmapData3D(insertion_submaps[-1])
            )
        newly_finished = insertion_submaps[0].insertion_finished
        self._compute_constraints_for_node(node_id, insertion_submaps, newly_finished)
        return node_id

    def add_imu_data(self, trajectory_id: int, imu_data: ImuData) -> None:
        self._optimization_problem.add_imu_data(trajectory_id, imu_data)

    def add_odometry_data(self, trajectory_id: int, odometry_data: OdometryData) -> None:
        self._optimization_problem.add_odometry_data(trajectory_id, odometry_data)

    def add_fixed_frame_pose_data(self, trajectory_id: int, data: FixedFramePoseData) -> None:
        self._optimization_problem.add_fixed_frame_pose_data(trajectory_id, data)

    def add_landmark_data(self, trajectory_id: int, landmark_data) -> None:
        """Reference PoseGraph3D::AddLandmarkData: one LandmarkNode per id
        accumulating observations."""
        for obs in landmark_data.landmark_observations:
            node = self._landmark_nodes.setdefault(
                obs.id, {"observations": [], "global_pose": None}
            )
            node["observations"].append(
                {
                    "trajectory_id": trajectory_id,
                    "time": landmark_data.time,
                    "landmark_to_tracking_transform": obs.landmark_to_tracking_transform,
                    "translation_weight": obs.translation_weight,
                    "rotation_weight": obs.rotation_weight,
                }
            )

    def get_landmark_poses(self):
        return {
            lid: np.asarray(pose)
            for lid, pose in self._optimization_problem.landmark_data.items()
        }

    def set_landmark_pose(
        self, landmark_id: str, global_pose: np.ndarray, frozen: bool = False
    ) -> None:
        """Reference PoseGraph3D::SetLandmarkPose; frozen landmarks keep the
        set pose across solves."""
        node = self._landmark_nodes.setdefault(
            landmark_id, {"observations": [], "global_pose": None}
        )
        node["global_pose"] = np.asarray(global_pose, np.float64)
        node["frozen"] = frozen
        self._optimization_problem.landmark_data[landmark_id] = np.asarray(
            global_pose, np.float64
        )

    def set_global_slam_optimization_callback(self, callback) -> None:
        self._global_slam_optimization_callback = callback

    def delete_trajectory(self, trajectory_id: int) -> None:
        """Reference PoseGraph3D::DeleteTrajectory: remove the trajectory's
        nodes, submaps, and constraints."""
        self.wait_for_all_computations()
        self._trajectory_states[trajectory_id] = TrajectoryState.DELETED
        self._constraints = [
            c
            for c in self._constraints
            if c.submap_id.trajectory_id != trajectory_id
            and c.node_id.trajectory_id != trajectory_id
        ]
        for index, _ in list(self._submap_data.trajectory(trajectory_id)):
            submap_id = SubmapId(trajectory_id, index)
            self._submap_data.trim(submap_id)
            if self._optimization_problem.submap_data.get(submap_id) is not None:
                self._optimization_problem.trim_submap(submap_id)
        for index, _ in list(self._trajectory_nodes.trajectory(trajectory_id)):
            node_id = NodeId(trajectory_id, index)
            self._trajectory_nodes.trim(node_id)
            if self._optimization_problem.node_data.get(node_id) is not None:
                self._optimization_problem.trim_trajectory_node(node_id)

    def add_trimmer(self, trimmer) -> None:
        self._trimmers.append(trimmer)

    def finish_trajectory(self, trajectory_id: int) -> None:
        self.wait_for_all_computations()
        with self._work_lock:
            self._trajectory_states[trajectory_id] = TrajectoryState.FINISHED
            for index, data in self._submap_data.trajectory(trajectory_id):
                submap_id = SubmapId(trajectory_id, index)
                if data.state == SubmapState.NO_CONSTRAINT_SEARCH:
                    self._finish_submap(submap_id)
            self._handle_work_queue()

    def freeze_trajectory(self, trajectory_id: int) -> None:
        self.add_trajectory_if_needed(trajectory_id)
        self._trajectory_states[trajectory_id] = TrajectoryState.FROZEN

    def is_trajectory_frozen(self, trajectory_id: int) -> bool:
        return self._trajectory_states.get(trajectory_id) == TrajectoryState.FROZEN

    def is_trajectory_finished(self, trajectory_id: int) -> bool:
        return self._trajectory_states.get(trajectory_id) == TrajectoryState.FINISHED

    def run_final_optimization(self) -> None:
        self.wait_for_all_computations()
        with self._work_lock:
            self._run_final_optimization_locked()

    def _run_final_optimization_locked(self) -> None:
        self._drain_constraints()
        self._optimization_problem.set_max_num_iterations(
            self._options.max_num_final_iterations
        )
        self.run_optimization()
        self._optimization_problem.set_max_num_iterations(
            self._options.optimization_problem.ceres_solver_options.max_num_iterations
        )

    def get_local_to_global_transform(self, trajectory_id: int) -> np.ndarray:
        items = self._submap_data.trajectory(trajectory_id)
        if not items:
            if trajectory_id in self._initial_trajectory_poses:
                to_id, pose, _ = self._initial_trajectory_poses[trajectory_id]
                return rigid3.compose(
                    self.get_local_to_global_transform(to_id), pose
                )
            return rigid3.identity()
        last_index, data = items[-1]
        spec = self._optimization_problem.submap_data.get(
            SubmapId(trajectory_id, last_index)
        )
        if spec is None:
            return rigid3.identity()
        return rigid3.compose(
            spec.global_pose, rigid3.inverse(np.asarray(data.submap.local_pose))
        )

    def get_trajectory_nodes(self) -> MapById:
        return self._trajectory_nodes

    def get_all_submap_data(self) -> MapById:
        return self._submap_data

    def set_initial_trajectory_pose(
        self, from_trajectory_id: int, to_trajectory_id: int, pose: np.ndarray, time: Time
    ) -> None:
        self._initial_trajectory_poses[from_trajectory_id] = (
            to_trajectory_id,
            np.asarray(pose),
            time,
        )

    # -- internals ----------------------------------------------------------

    def _compute_constraints_for_node(
        self,
        node_id: NodeId,
        insertion_submaps: List[Submap3D],
        newly_finished_submap: bool,
    ) -> None:
        node = self._trajectory_nodes.at(node_id)
        constant_data = node.constant_data
        submap_ids = self._initialize_global_submap_poses(
            node_id.trajectory_id, constant_data.time, insertion_submaps
        )
        matching_id = submap_ids[0]
        matching_submap = insertion_submaps[0]
        local_pose = np.asarray(constant_data.local_pose)
        global_pose = rigid3.compose(
            self._optimization_problem.submap_data.at(matching_id).global_pose,
            rigid3.compose(
                rigid3.inverse(np.asarray(matching_submap.local_pose)), local_pose
            ),
        )
        self._optimization_problem.insert_trajectory_node(
            node_id,
            NodeSpec3D(
                time=constant_data.time,
                local_pose=local_pose,
                global_pose=global_pose,
            ),
        )
        for submap_id, submap in zip(submap_ids, insertion_submaps):
            self._submap_data.at(submap_id).node_ids.add(node_id)
            constraint_pose = rigid3.relative(
                np.asarray(submap.local_pose), local_pose
            )
            self._constraints.append(
                Constraint(
                    submap_id=submap_id,
                    node_id=node_id,
                    pose=ConstraintPose(
                        zbar_ij=constraint_pose,
                        translation_weight=self._options.matcher_translation_weight,
                        rotation_weight=self._options.matcher_rotation_weight,
                    ),
                    tag=INTRA_SUBMAP,
                )
            )
        for submap_id, _ in self._submap_data.items(SubmapId):
            if self._submap_data.at(submap_id).state == SubmapState.FINISHED:
                self._compute_constraint(node_id, submap_id)
        if newly_finished_submap:
            finished_submap_id = submap_ids[0]
            data = self._submap_data.at(finished_submap_id)
            data.state = SubmapState.FINISHED
            for old_node_id, _ in self._trajectory_nodes.items(NodeId):
                if old_node_id not in data.node_ids:
                    self._compute_constraint(old_node_id, finished_submap_id)
        self._num_nodes_since_last_loop_closure += 1
        if (
            self._options.optimize_every_n_nodes > 0
            and self._num_nodes_since_last_loop_closure
            >= self._options.optimize_every_n_nodes
        ):
            self._dispatch_work_queue()

    def _dispatch_work_queue(self) -> None:
        if self._thread_pool is None:
            self._handle_work_queue()
            return
        from cartographer_tpu.common.task import Task, TaskState

        if (
            self._pending_task is not None
            and self._pending_task.state != TaskState.COMPLETED
        ):
            return
        task = Task(self._locked_handle_work_queue)
        self._pending_task = task
        self._thread_pool.schedule(task)

    def _locked_handle_work_queue(self) -> None:
        # Searches run OUTSIDE the work lock (pure compute over data
        # staged at enqueue time) so add_node never blocks on a drain;
        # only the merge/optimize/trim phase takes the lock. See the 2D
        # twin for the full rationale (pose_graph_2d.py).
        new_constraints = self._constraint_builder.run_pending()
        with self._work_lock:
            self._merge_constraints(new_constraints)
            self._finish_work_queue()

    def wait_for_all_computations(self, timeout: float = 600.0) -> None:
        """Reference WaitForAllComputations (pose_graph_3d.cc): block on
        drain-task completion with progress logging (see pose_graph_2d)."""
        if self._thread_pool is None:
            return
        import logging
        import time as _t

        from cartographer_tpu.common.task import TaskState

        deadline = _t.monotonic() + timeout
        last_log = _t.monotonic()
        while _t.monotonic() < deadline:
            task = self._pending_task
            if task is not None and task.state != TaskState.COMPLETED:
                if not task.wait(
                    timeout=min(5.0, max(0.0, deadline - _t.monotonic()))
                ):
                    if _t.monotonic() - last_log >= 5.0:
                        logging.info(
                            "Waiting for the pose graph drain: %d constraint "
                            "searches pending.",
                            self._constraint_builder.num_pending(),
                        )
                        last_log = _t.monotonic()
                    continue
            if self._constraint_builder.num_pending() == 0:
                return
            self._dispatch_work_queue()

    def _compute_constraint(self, node_id: NodeId, submap_id: SubmapId) -> None:
        submap_data = self._submap_data.at(submap_id)
        if submap_data.state != SubmapState.FINISHED:
            return
        node = self._trajectory_nodes.at(node_id)
        node_time = node.constant_data.time
        last_connection = self._connectivity.last_connection_time(
            node_id.trajectory_id, submap_id.trajectory_id
        )
        spec = self._optimization_problem.node_data.get(node_id)
        sub_spec = self._optimization_problem.submap_data.get(submap_id)
        if spec is None or sub_spec is None:
            return
        # Node pose in the submap frame (matching happens there in 3D).
        global_node_pose_in_submap = rigid3.relative(
            sub_spec.global_pose, spec.global_pose
        )
        gravity_yaw = rigid3.get_yaw(
            rigid3.quat_multiply(
                rigid3.quat(global_node_pose_in_submap),
                rigid3.quat_conjugate(
                    np.asarray(node.constant_data.gravity_alignment)
                ),
            )
        )
        if (
            node_id.trajectory_id == submap_id.trajectory_id
            or node_time
            < last_connection + self._options.global_constraint_search_after_n_seconds
        ):
            self._constraint_builder.maybe_add_constraint(
                submap_id,
                submap_data.submap,
                node_id,
                node.constant_data,
                global_node_pose_in_submap,
                float(gravity_yaw),
            )
        elif self._global_localization_samplers[node_id.trajectory_id].pulse():
            self._constraint_builder.maybe_add_global_constraint(
                submap_id,
                submap_data.submap,
                node_id,
                node.constant_data,
                float(gravity_yaw),
            )

    def _initialize_global_submap_poses(
        self, trajectory_id: int, time: Time, insertion_submaps: List[Submap3D]
    ) -> List[SubmapId]:
        submap_data = self._optimization_problem.submap_data
        if len(insertion_submaps) == 1:
            if submap_data.size_of_trajectory_or_zero(trajectory_id) == 0:
                if trajectory_id in self._initial_trajectory_poses:
                    to_id, pose, t = self._initial_trajectory_poses[trajectory_id]
                    self._connectivity.connect(trajectory_id, to_id, t)
                first_global = rigid3.compose(
                    self.get_local_to_global_transform(trajectory_id),
                    np.asarray(insertion_submaps[0].local_pose, np.float64),
                )
                self._optimization_problem.add_submap(trajectory_id, first_global)
            submap_id = SubmapId(
                trajectory_id, self._submap_data.trajectory(trajectory_id)[0][0]
            )
            return [submap_id]
        assert len(insertion_submaps) == 2
        items = self._submap_data.trajectory(trajectory_id)
        last_submap_id = SubmapId(trajectory_id, items[-1][0])
        if self._optimization_problem.submap_data.get(last_submap_id) is None:
            prev_submap_id = SubmapId(trajectory_id, items[-2][0])
            prev_spec = self._optimization_problem.submap_data.at(prev_submap_id)
            prev_submap = self._submap_data.at(prev_submap_id).submap
            first_global = rigid3.compose(
                prev_spec.global_pose,
                rigid3.relative(
                    np.asarray(prev_submap.local_pose),
                    np.asarray(insertion_submaps[-1].local_pose),
                ),
            )
            self._optimization_problem.insert_submap(last_submap_id, first_global)
        prev_submap_id = SubmapId(trajectory_id, items[-2][0])
        return [prev_submap_id, last_submap_id]

    def _finish_submap(self, submap_id: SubmapId) -> None:
        data = self._submap_data.at(submap_id)
        if data.state == SubmapState.FINISHED:
            return
        data.submap.finish()
        data.state = SubmapState.FINISHED
        for node_id, _ in self._trajectory_nodes.items(NodeId):
            if node_id not in data.node_ids:
                self._compute_constraint(node_id, submap_id)

    def _drain_constraints(self) -> None:
        self._merge_constraints(self._constraint_builder.run_pending())

    def _merge_constraints(self, new_constraints) -> None:
        for c in new_constraints:
            self._constraints.append(c)
            if c.node_id.trajectory_id != c.submap_id.trajectory_id:
                time = self._trajectory_nodes.at(c.node_id).constant_data.time
                self._connectivity.connect(
                    c.node_id.trajectory_id, c.submap_id.trajectory_id, time
                )

    def _handle_work_queue(self) -> None:
        self._drain_constraints()
        self._finish_work_queue()

    def _finish_work_queue(self) -> None:
        self.run_optimization()
        self._num_nodes_since_last_loop_closure = 0
        from cartographer_tpu.mapping.pose_graph_2d import TrimmingHandle

        for trimmer in list(self._trimmers):
            trimmer.trim(TrimmingHandle(self))
            if trimmer.is_finished():
                self._trimmers.remove(trimmer)

    def run_optimization(self) -> None:
        if self._optimization_problem.node_data.empty():
            return
        frozen = {
            t
            for t, s in self._trajectory_states.items()
            if s == TrajectoryState.FROZEN
        }
        self._optimization_problem.solve(
            self._constraints, frozen, self._landmark_nodes
        )
        for lid, lnode in self._landmark_nodes.items():
            if lnode.get("frozen") and lnode.get("global_pose") is not None:
                self._optimization_problem.landmark_data[lid] = np.asarray(
                    lnode["global_pose"], np.float64
                )
        metrics.optimization_runs.increment()
        for trajectory_id in self._trajectory_nodes.trajectory_ids():
            last_optimized_index = -1
            for index, spec in self._optimization_problem.node_data.trajectory(
                trajectory_id
            ):
                node = self._trajectory_nodes.at(NodeId(trajectory_id, index))
                node.global_pose = np.asarray(spec.global_pose)
                last_optimized_index = index
            local_to_new_global = self.get_local_to_global_transform(trajectory_id)
            for index, node in self._trajectory_nodes.trajectory(trajectory_id):
                if index > last_optimized_index:
                    node.global_pose = rigid3.compose(
                        local_to_new_global, node.constant_data.local_pose
                    )
        if getattr(self, "_global_slam_optimization_callback", None) is not None:
            last_submaps = {}
            last_nodes = {}
            for tid in self._optimization_problem.submap_data.trajectory_ids():
                items = self._optimization_problem.submap_data.trajectory(tid)
                if items:
                    last_submaps[tid] = SubmapId(tid, items[-1][0])
            for tid in self._optimization_problem.node_data.trajectory_ids():
                items = self._optimization_problem.node_data.trajectory(tid)
                if items:
                    last_nodes[tid] = NodeId(tid, items[-1][0])
            self._global_slam_optimization_callback(last_submaps, last_nodes)
