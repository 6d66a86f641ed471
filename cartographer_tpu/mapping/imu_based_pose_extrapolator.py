"""IMU-based pose extrapolation: sliding-window batch fit.

Reference: mapping/internal/imu_based_pose_extrapolator.cc:38-439 — instead
of constant-velocity extrapolation, a small Ceres problem over the recent
pose window (pose_queue_duration) fits poses to pose observations, IMU
preintegration (rotation + acceleration) and odometry, then extrapolates.

Implementation: the window is posed as an SE(3) SPA problem on the existing
device solver (ops/spa_solver_3d): an anchored virtual "submap" at identity
turns pose observations into submap-node constraints; IMU rotation /
acceleration residual tables and odometry node-node constraints are built
exactly as in optimization_problem_3d.
"""

from __future__ import annotations

import collections
from typing import Deque, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.common.config import ImuBasedExtrapolatorOptions
from cartographer_tpu.common.time import TIME_MIN, Time
from cartographer_tpu.mapping.optimization_problem_3d import integrate_imu
from cartographer_tpu.mapping.pose_extrapolator import ExtrapolationResult
from cartographer_tpu.ops.spa_solver_3d import SpaProblem3D, solve_3d
from cartographer_tpu.sensor.data import ImuData, OdometryData
from cartographer_tpu.transform import rigid3


def _pad(n: int, minimum: int = 4) -> int:
    v = minimum
    while v < n:
        v *= 2
    return v


class ImuBasedPoseExtrapolator:
    def __init__(self, options: ImuBasedExtrapolatorOptions):
        self._options = options
        self._timed_poses: Deque = collections.deque()  # (time, pose)
        self._imu_data: List[ImuData] = []
        self._odometry_data: List[OdometryData] = []
        self._last_extrapolated_time: Time = TIME_MIN
        self._gravity_from_tracking = np.array([1.0, 0.0, 0.0, 0.0])

    # -- feeds --------------------------------------------------------------

    def add_pose(self, time: Time, pose: np.ndarray) -> None:
        self._timed_poses.append((time, np.asarray(pose)))
        horizon = time - self._options.pose_queue_duration
        while len(self._timed_poses) > 2 and self._timed_poses[1][0] <= horizon:
            self._timed_poses.popleft()
        self._trim_sensor_data()

    def add_imu_data(self, imu_data: ImuData) -> None:
        self._imu_data.append(imu_data)
        self._trim_sensor_data()

    def add_odometry_data(self, odometry_data: OdometryData) -> None:
        self._odometry_data.append(odometry_data)
        self._trim_sensor_data()

    def _trim_sensor_data(self) -> None:
        if not self._timed_poses:
            return
        horizon = self._timed_poses[0][0]
        while len(self._imu_data) > 1 and self._imu_data[1].time <= horizon:
            self._imu_data.pop(0)
        while len(self._odometry_data) > 2 and self._odometry_data[1].time <= horizon:
            self._odometry_data.pop(0)

    def get_last_pose_time(self) -> Time:
        return self._timed_poses[-1][0] if self._timed_poses else TIME_MIN

    def get_last_extrapolated_time(self) -> Time:
        return max(self._last_extrapolated_time, self.get_last_pose_time())

    # -- queries ------------------------------------------------------------

    def extrapolate_pose(self, time: Time) -> np.ndarray:
        return self._solve([time])[0]

    def extrapolate_poses_batch(self, times: Sequence[Time]) -> np.ndarray:
        return self._solve(list(times))

    def extrapolate_poses_with_gravity(self, times: Sequence[Time]) -> ExtrapolationResult:
        poses = self._solve(list(times))
        velocity = np.zeros(3)
        if len(self._timed_poses) >= 2:
            (t0, p0), (t1, p1) = self._timed_poses[-2], self._timed_poses[-1]
            if t1 > t0:
                velocity = (rigid3.trans(p1) - rigid3.trans(p0)) / (t1 - t0)
        return ExtrapolationResult(
            previous_poses=list(poses[:-1]),
            current_pose=poses[-1],
            current_velocity=velocity,
            gravity_from_tracking=self._gravity_from_tracking,
        )

    def estimate_gravity_orientation(self, time: Time) -> np.ndarray:
        return self._gravity_from_tracking

    # -- the batch fit ------------------------------------------------------

    def _solve(self, query_times: List[Time]) -> np.ndarray:
        assert self._timed_poses, "ImuBasedPoseExtrapolator needs poses first."
        self._last_extrapolated_time = max(
            self._last_extrapolated_time, query_times[-1]
        )
        opts = self._options

        # Node times: window poses + query times (sorted unique).
        obs_times = [t for t, _ in self._timed_poses]
        all_times = sorted(set(obs_times) | set(float(t) for t in query_times))
        n = len(all_times)
        time_index = {t: i for i, t in enumerate(all_times)}

        # Initial values: interpolate/extrapolate from observed poses.
        obs_poses = {t: p for t, p in self._timed_poses}
        init = []
        for t in all_times:
            if t in obs_poses:
                init.append(obs_poses[t])
            elif t > obs_times[-1]:
                init.append(obs_poses[obs_times[-1]])
            else:
                init.append(obs_poses[obs_times[0]])
        init = np.stack(init)

        Np = _pad(n)
        node_t = np.zeros((Np, 3), np.float32)
        node_q = np.tile(np.array([1, 0, 0, 0], np.float32), (Np, 1))
        node_t[:n] = init[:, :3]
        node_q[:n] = init[:, 3:7]
        free_n = np.zeros(Np, bool)
        free_n[:n] = True

        # Pose observations as anchored constraints.
        c_rows = []
        for t, p in self._timed_poses:
            c_rows.append(
                (
                    time_index[t],
                    p,
                    opts.pose_translation_weight,
                    opts.pose_rotation_weight,
                )
            )
        C = _pad(max(len(c_rows), 1))
        c_sub = np.zeros(C, np.int32)
        c_node = np.zeros(C, np.int32)
        c_z_t = np.zeros((C, 3), np.float32)
        c_z_q = np.tile(np.array([1, 0, 0, 0], np.float32), (C, 1))
        c_w = np.ones((C, 2), np.float32)
        c_m = np.zeros(C, bool)
        for i, (ni, p, wt, wr) in enumerate(c_rows):
            c_node[i] = ni
            c_z_t[i] = p[:3]
            c_z_q[i] = p[3:7]
            c_w[i] = (wt, wr)
            c_m[i] = True

        # Odometry between consecutive node times.
        nn_rows = []
        if len(self._odometry_data) >= 2:
            odo_times = [d.time for d in self._odometry_data]
            import bisect

            def odo_at(t):
                if t < odo_times[0] or t > odo_times[-1]:
                    return None
                i = bisect.bisect_left(odo_times, t)
                if i < len(odo_times) and odo_times[i] == t:
                    return self._odometry_data[i].pose
                lo, hi = self._odometry_data[i - 1], self._odometry_data[i]
                f = (t - lo.time) / (hi.time - lo.time)
                return rigid3.interpolate(lo.pose, hi.pose, f)

            for a, b in zip(all_times, all_times[1:]):
                pa, pb = odo_at(a), odo_at(b)
                if pa is None or pb is None:
                    continue
                nn_rows.append(
                    (
                        time_index[a],
                        time_index[b],
                        rigid3.relative(pa, pb),
                        opts.odometry_translation_weight,
                        opts.odometry_rotation_weight,
                    )
                )
        K = _pad(max(len(nn_rows), 1))
        n_a = np.zeros(K, np.int32)
        n_b = np.zeros(K, np.int32)
        n_z_t = np.zeros((K, 3), np.float32)
        n_z_q = np.tile(np.array([1, 0, 0, 0], np.float32), (K, 1))
        n_w = np.ones((K, 2), np.float32)
        n_m = np.zeros(K, bool)
        for i, (a, b, z, wt, wr) in enumerate(nn_rows):
            n_a[i], n_b[i] = a, b
            n_z_t[i] = z[:3]
            n_z_q[i] = z[3:7]
            n_w[i] = (wt, wr)
            n_m[i] = True

        # IMU rotation + acceleration residuals between consecutive times.
        rot_rows, acc_rows = [], []
        if self._imu_data and self._imu_data[0].time <= all_times[0]:
            imu_end = self._imu_data[-1].time
            for k in range(len(all_times) - 1):
                a, b = all_times[k], all_times[k + 1]
                if b > imu_end or b <= a:
                    continue
                _, drot = integrate_imu(self._imu_data, a, b)
                rot_rows.append(
                    (
                        time_index[a],
                        time_index[b],
                        drot,
                        opts.imu_rotation_weight / max(b - a, 1e-3),
                    )
                )
                if k + 2 < len(all_times):
                    c = all_times[k + 2]
                    if c <= imu_end and c > b:
                        dt1, dt2 = b - a, c - b
                        _, rot_ab = integrate_imu(self._imu_data, a, b)
                        dv_fc, rot_fc = integrate_imu(
                            self._imu_data, a, a + dt1 / 2
                        )
                        dv_cc, _ = integrate_imu(
                            self._imu_data, a + dt1 / 2, b + dt2 / 2
                        )
                        dv = rigid3.quat_rotate(
                            rigid3.quat_multiply(
                                rigid3.quat_conjugate(rot_ab), rot_fc
                            ),
                            dv_cc,
                        )
                        acc_rows.append(
                            (
                                time_index[a],
                                time_index[b],
                                time_index[c],
                                dv,
                                dt1,
                                dt2,
                                opts.imu_acceleration_weight / (dt1 + dt2),
                            )
                        )
        R = _pad(max(len(rot_rows), 1))
        r_a = np.zeros(R, np.int32)
        r_b = np.zeros(R, np.int32)
        r_dq = np.tile(np.array([1, 0, 0, 0], np.float32), (R, 1))
        r_w = np.zeros(R, np.float32)
        r_m = np.zeros(R, bool)
        for i, (a, b, dq, w) in enumerate(rot_rows):
            r_a[i], r_b[i] = a, b
            r_dq[i] = dq
            r_w[i] = w
            r_m[i] = True
        A = _pad(max(len(acc_rows), 1))
        a_first = np.zeros(A, np.int32)
        a_mid = np.zeros(A, np.int32)
        a_last = np.zeros(A, np.int32)
        a_dv = np.zeros((A, 3), np.float32)
        a_dt1 = np.ones(A, np.float32)
        a_dt2 = np.ones(A, np.float32)
        a_w = np.zeros(A, np.float32)
        a_m = np.zeros(A, bool)
        for i, (f_, m_, l_, dv, d1, d2, w) in enumerate(acc_rows):
            a_first[i], a_mid[i], a_last[i] = f_, m_, l_
            a_dv[i] = dv
            a_dt1[i], a_dt2[i] = d1, d2
            a_w[i] = w
            a_m[i] = True

        problem = SpaProblem3D(
            submap_t=jnp.zeros((1, 3), jnp.float32),
            submap_q=jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
            node_t=jnp.asarray(node_t),
            node_q=jnp.asarray(node_q),
            free_submap=jnp.zeros(1, bool),
            free_node=jnp.asarray(free_n),
            fix_z=jnp.asarray(False),
            c_submap=jnp.asarray(c_sub),
            c_node=jnp.asarray(c_node),
            c_z_t=jnp.asarray(c_z_t),
            c_z_q=jnp.asarray(c_z_q),
            c_weight=jnp.asarray(c_w),
            c_huber=jnp.zeros(C, bool),
            c_mask=jnp.asarray(c_m),
            n_a=jnp.asarray(n_a),
            n_b=jnp.asarray(n_b),
            n_z_t=jnp.asarray(n_z_t),
            n_z_q=jnp.asarray(n_z_q),
            n_weight=jnp.asarray(n_w),
            n_mask=jnp.asarray(n_m),
            r_a=jnp.asarray(r_a),
            r_b=jnp.asarray(r_b),
            r_dq=jnp.asarray(r_dq),
            r_weight=jnp.asarray(r_w),
            r_traj=jnp.zeros(R, jnp.int32),
            r_mask=jnp.asarray(r_m),
            a_first=jnp.asarray(a_first),
            a_mid=jnp.asarray(a_mid),
            a_last=jnp.asarray(a_last),
            a_dv=jnp.asarray(a_dv),
            a_dt1=jnp.asarray(a_dt1),
            a_dt2=jnp.asarray(a_dt2),
            a_weight=jnp.asarray(a_w),
            a_traj=jnp.zeros(A, jnp.int32),
            a_mask=jnp.asarray(a_m),
            gravity=jnp.asarray([opts.gravity_constant], jnp.float32),
            calib_q=jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
            optimize_calibration=jnp.asarray(False),
        )
        _, _, nt, nq, _, _, _ = solve_3d(
            problem,
            huber_scale=1e3,
            max_iterations=opts.solver_options.max_num_iterations,
            cg_iterations=16,
        )
        nt = np.asarray(nt, np.float64)
        nq = np.asarray(nq, np.float64)
        # Gravity estimate from the last pose's orientation vs integrated IMU.
        if rot_rows:
            self._gravity_from_tracking = rigid3.quat_conjugate(
                nq[time_index[all_times[-1]]]
            )
        return np.stack(
            [
                np.concatenate([nt[time_index[float(t)]], nq[time_index[float(t)]]])
                for t in query_times
            ]
        )
