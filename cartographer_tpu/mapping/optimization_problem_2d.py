"""2D optimization problem: host store feeding the device SPA solver.

Reference: internal/optimization/optimization_problem_2d.cc:204-470. Keeps
per-node specs (time, gravity-aligned local pose, global pose), per-submap
global poses, and per-trajectory odometry logs; Solve() assembles the
residual tables (constraints + consecutive-node local-SLAM/odometry pairs),
pads them to static shapes, and runs ops/spa_solver.solve on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.common.config import OptimizationProblemOptions
from cartographer_tpu.common.time import Time
from cartographer_tpu.mapping.constraint_builder_2d import (
    INTER_SUBMAP,
    Constraint,
)
from cartographer_tpu.mapping.id import MapById, NodeId, SubmapId
from cartographer_tpu.ops.spa_solver import SpaProblem, solve
from cartographer_tpu.sensor.data import OdometryData
from cartographer_tpu.sensor.map_by_time import MapByTime
from cartographer_tpu.transform import rigid2, rigid3


@dataclasses.dataclass
class NodeSpec2D:
    time: Time
    local_pose_2d: np.ndarray  # (3,)
    global_pose_2d: np.ndarray  # (3,)
    gravity_alignment: np.ndarray  # quaternion


@dataclasses.dataclass
class SubmapSpec2D:
    global_pose: np.ndarray  # (3,)


def _pad_pow2(n: int, minimum: int = 8) -> int:
    v = minimum
    while v < n:
        v *= 2
    return v


class OptimizationProblem2D:
    def __init__(self, options: OptimizationProblemOptions):
        self._options = options
        self.node_data: MapById = MapById()
        self.submap_data: MapById = MapById()
        self._odometry_data = MapByTime()
        self._max_num_iterations = options.ceres_solver_options.max_num_iterations

    # -- feeds --------------------------------------------------------------

    def add_odometry_data(self, trajectory_id: int, odometry_data: OdometryData) -> None:
        self._odometry_data.append(trajectory_id, odometry_data)

    def add_trajectory_node(self, trajectory_id: int, node_data: NodeSpec2D) -> NodeId:
        return NodeId(*self.node_data.append(trajectory_id, node_data))

    def insert_trajectory_node(self, node_id: NodeId, node_data: NodeSpec2D) -> None:
        self.node_data.insert(node_id, node_data)

    def trim_trajectory_node(self, node_id: NodeId) -> None:
        self.node_data.trim(node_id)

    def add_submap(self, trajectory_id: int, global_submap_pose: np.ndarray) -> SubmapId:
        return SubmapId(
            *self.submap_data.append(trajectory_id, SubmapSpec2D(global_submap_pose))
        )

    def insert_submap(self, submap_id: SubmapId, global_submap_pose: np.ndarray) -> None:
        self.submap_data.insert(submap_id, SubmapSpec2D(global_submap_pose))

    def trim_submap(self, submap_id: SubmapId) -> None:
        self.submap_data.trim(submap_id)

    def set_max_num_iterations(self, max_num_iterations: int) -> None:
        self._max_num_iterations = max_num_iterations

    # -- odometry interpolation (CalculateOdometryBetweenNodes) -------------

    def _interpolate_odometry(self, trajectory_id: int, time: Time) -> Optional[np.ndarray]:
        data = self._odometry_data.trajectory(trajectory_id)
        if not data or time < data[0].time or time > data[-1].time:
            return None
        import bisect

        times = [d.time for d in data]
        i = bisect.bisect_left(times, time)
        if i < len(times) and times[i] == time:
            return data[i].pose
        lo, hi = data[i - 1], data[i]
        factor = (time - lo.time) / (hi.time - lo.time)
        return rigid3.interpolate(lo.pose, hi.pose, factor)

    def _odometry_between_nodes(
        self, trajectory_id: int, first: NodeSpec2D, second: NodeSpec2D
    ) -> Optional[np.ndarray]:
        first_odom = self._interpolate_odometry(trajectory_id, first.time)
        second_odom = self._interpolate_odometry(trajectory_id, second.time)
        if first_odom is None or second_odom is None:
            return None
        # Gravity-align the odometry poses like the reference
        # (optimization_problem_2d.cc:430-470): relative odometry in the
        # gravity-aligned frame of each node.
        first_aligned = rigid3.compose(
            first_odom, rigid3.rotation(rigid3.quat_conjugate(first.gravity_alignment))
        )
        second_aligned = rigid3.compose(
            second_odom, rigid3.rotation(rigid3.quat_conjugate(second.gravity_alignment))
        )
        rel = rigid3.relative(first_aligned, second_aligned)
        return rigid3.project_2d(rel)

    # -- solve --------------------------------------------------------------

    def solve(
        self,
        constraints: List[Constraint],
        frozen_trajectories: Set[int],
        landmark_nodes=None,
    ) -> None:
        if self.node_data.empty():
            return

        submap_ids = self.submap_data.ids(SubmapId)
        node_ids = self.node_data.ids(NodeId)
        sub_index = {sid: i for i, sid in enumerate(submap_ids)}
        node_index = {nid: i for i, nid in enumerate(node_ids)}
        S, N = len(submap_ids), len(node_ids)

        sp = np.zeros((_pad_pow2(S), 3), np.float32)
        free_s = np.zeros(len(sp), bool)
        first_submap = True
        for i, sid in enumerate(submap_ids):
            sp[i] = self.submap_data.at(sid).global_pose
            frozen = sid.trajectory_id in frozen_trajectories
            free_s[i] = not (first_submap or frozen)
            if first_submap:
                first_submap = False
        npo = np.zeros((_pad_pow2(N), 3), np.float32)
        free_n = np.zeros(len(npo), bool)
        for i, nid in enumerate(node_ids):
            npo[i] = self.node_data.at(nid).global_pose_2d
            free_n[i] = nid.trajectory_id not in frozen_trajectories

        # Submap-node constraint table.
        rows = []
        for c in constraints:
            if c.submap_id not in sub_index or c.node_id not in node_index:
                continue
            rows.append(
                (
                    sub_index[c.submap_id],
                    node_index[c.node_id],
                    c.pose.zbar_ij,
                    c.pose.translation_weight,
                    c.pose.rotation_weight,
                    c.tag == INTER_SUBMAP,
                )
            )
        C = _pad_pow2(max(len(rows), 1))
        c_sub = np.zeros(C, np.int32)
        c_node = np.zeros(C, np.int32)
        c_z = np.zeros((C, 3), np.float32)
        c_w = np.ones((C, 2), np.float32)
        c_h = np.zeros(C, bool)
        c_m = np.zeros(C, bool)
        for i, (si, ni, z, wt, wr, huber) in enumerate(rows):
            c_sub[i], c_node[i] = si, ni
            c_z[i] = z
            c_w[i] = (wt, wr)
            c_h[i] = huber
            c_m[i] = True

        # Consecutive-node residuals per trajectory (local SLAM + odometry).
        nn_rows = []
        for trajectory_id in self.node_data.trajectory_ids():
            if trajectory_id in frozen_trajectories:
                continue
            items = self.node_data.trajectory(trajectory_id)
            for (idx_a, a), (idx_b, b) in zip(items, items[1:]):
                if idx_b != idx_a + 1:
                    continue
                ia = node_index[NodeId(trajectory_id, idx_a)]
                ib = node_index[NodeId(trajectory_id, idx_b)]
                rel_odom = self._odometry_between_nodes(trajectory_id, a, b)
                if rel_odom is not None:
                    nn_rows.append(
                        (
                            ia,
                            ib,
                            rel_odom,
                            self._options.odometry_translation_weight,
                            self._options.odometry_rotation_weight,
                        )
                    )
                rel_local = rigid2.relative(a.local_pose_2d, b.local_pose_2d)
                nn_rows.append(
                    (
                        ia,
                        ib,
                        rel_local,
                        self._options.local_slam_pose_translation_weight,
                        self._options.local_slam_pose_rotation_weight,
                    )
                )
        K = _pad_pow2(max(len(nn_rows), 1))
        n_a = np.zeros(K, np.int32)
        n_b = np.zeros(K, np.int32)
        n_z = np.zeros((K, 3), np.float32)
        n_w = np.ones((K, 2), np.float32)
        n_m = np.zeros(K, bool)
        for i, (a, b, z, wt, wr) in enumerate(nn_rows):
            n_a[i], n_b[i] = a, b
            n_z[i] = z
            n_w[i] = (wt, wr)
            n_m[i] = True

        problem = SpaProblem(
            submap_poses=jnp.asarray(sp),
            node_poses=jnp.asarray(npo),
            free_submap=jnp.asarray(free_s),
            free_node=jnp.asarray(free_n),
            c_submap=jnp.asarray(c_sub),
            c_node=jnp.asarray(c_node),
            c_z=jnp.asarray(c_z),
            c_weight=jnp.asarray(c_w),
            c_huber=jnp.asarray(c_h),
            c_mask=jnp.asarray(c_m),
            n_a=jnp.asarray(n_a),
            n_b=jnp.asarray(n_b),
            n_z=jnp.asarray(n_z),
            n_weight=jnp.asarray(n_w),
            n_mask=jnp.asarray(n_m),
        )
        new_sp, new_np, _ = solve(
            problem,
            huber_scale=self._options.huber_scale,
            max_iterations=self._max_num_iterations,
        )
        new_sp = np.asarray(new_sp, np.float64)
        new_np = np.asarray(new_np, np.float64)
        for i, sid in enumerate(submap_ids):
            self.submap_data.at(sid).global_pose = new_sp[i]
        for i, nid in enumerate(node_ids):
            self.node_data.at(nid).global_pose_2d = new_np[i]
