"""SE(3) sparse pose adjustment with IMU residuals, on device.

Reference: internal/optimization/optimization_problem_3d.cc:150-633 with
residuals from spa_cost_function_3d.h (relative-pose error: rotated
translation delta + angle-axis of conj(q_end) q_start z, Huber on INTER),
acceleration_cost_function_3d.h (IMU preintegrated delta-velocity vs
discrete second difference of positions, with optimizable gravity constant
and online IMU extrinsic calibration), and rotation_cost_function_3d.h
(gyro-integrated relative rotation, vector part of the quaternion error).

Parameterization: each pose is a fixed base quaternion q0 (taken at solve
entry) composed with an exponential-map delta, plus a translation — i.e.
parameters are [dt(3), dr(3)] per pose (globally valid; replaces Ceres'
quaternion manifold). Matrix-free Levenberg-Marquardt with CG, exactly like
the 2D solver (ops/spa_solver.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SpaProblem3D(NamedTuple):
    # Poses: translations + base quaternions (fixed during the solve).
    submap_t: jax.Array  # f32 [S, 3]
    submap_q: jax.Array  # f32 [S, 4]
    node_t: jax.Array  # f32 [N, 3]
    node_q: jax.Array  # f32 [N, 4]
    free_submap: jax.Array  # bool [S]
    free_node: jax.Array  # bool [N]
    fix_z: jax.Array  # bool [] — optimization_problem fix_z_in_3d
    # Submap-node constraints.
    c_submap: jax.Array  # i32 [C]
    c_node: jax.Array  # i32 [C]
    c_z_t: jax.Array  # f32 [C, 3]
    c_z_q: jax.Array  # f32 [C, 4]
    c_weight: jax.Array  # f32 [C, 2] (translation, rotation)
    c_huber: jax.Array  # bool [C]
    c_mask: jax.Array  # bool [C]
    # Node-node constraints (odometry, local slam, fixed frame pending).
    n_a: jax.Array  # i32 [K]
    n_b: jax.Array
    n_z_t: jax.Array  # f32 [K, 3]
    n_z_q: jax.Array  # f32 [K, 4]
    n_weight: jax.Array  # f32 [K, 2]
    n_mask: jax.Array  # bool [K]
    # IMU rotation residuals between consecutive nodes.
    r_a: jax.Array  # i32 [R]
    r_b: jax.Array
    r_dq: jax.Array  # f32 [R, 4] gyro-integrated delta rotation (imu frame)
    r_weight: jax.Array  # f32 [R]
    r_traj: jax.Array  # i32 [R] trajectory index (for imu calibration)
    r_mask: jax.Array  # bool [R]
    # IMU acceleration residuals over node triples.
    a_first: jax.Array  # i32 [A]
    a_mid: jax.Array
    a_last: jax.Array
    a_dv: jax.Array  # f32 [A, 3] preintegrated delta velocity (imu frame)
    a_dt1: jax.Array  # f32 [A]
    a_dt2: jax.Array  # f32 [A]
    a_weight: jax.Array  # f32 [A]
    a_traj: jax.Array  # i32 [A]
    a_mask: jax.Array  # bool [A]
    # Per-trajectory IMU state.
    gravity: jax.Array  # f32 [T] gravity constant per trajectory
    calib_q: jax.Array  # f32 [T, 4] base imu calibration quaternion
    optimize_calibration: jax.Array  # bool []


def _qmul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def _qconj(q):
    return jnp.stack([q[..., 0], -q[..., 1], -q[..., 2], -q[..., 3]], axis=-1)


def _qrot(q, v):
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def _qexp(r):
    theta2 = jnp.sum(r * r, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + 1e-32)
    half = 0.5 * theta
    small = theta2 < 1e-12
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small[..., 0], 1.0 - theta2[..., 0] / 8.0, jnp.cos(half[..., 0]))
    return jnp.concatenate([w[..., None], r * k], axis=-1)


def _qlog(q):
    """Quaternion -> angle-axis vector (w kept positive)."""
    sign = jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    q = q * sign
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    sin_half = jnp.linalg.norm(q[..., 1:4] + 1e-32, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    scale = jnp.where(sin_half < 1e-8, 2.0, angle / jnp.maximum(sin_half, 1e-32))
    return q[..., 1:4] * scale[..., None]


@functools.partial(jax.jit, static_argnames=("max_iterations", "cg_iterations"))
def solve_3d(
    p: SpaProblem3D,
    huber_scale: float,
    max_iterations: int = 50,
    cg_iterations: int = 64,
):
    """Returns (submap_t, submap_q, node_t, node_q, gravity, calib_q, cost)."""
    S = p.submap_t.shape[0]
    N = p.node_t.shape[0]
    T = p.gravity.shape[0]

    free_s = p.free_submap[:, None].astype(jnp.float32)
    free_n = p.free_node[:, None].astype(jnp.float32)
    z_scale_t = jnp.where(
        p.fix_z, jnp.asarray([1.0, 1.0, 0.0]), jnp.ones(3)
    )

    def poses_of(params):
        s_dt, s_dr, n_dt, n_dr, grav, calib_dr = params
        st = p.submap_t + s_dt * free_s * z_scale_t[None, :]
        sq = _qmul(p.submap_q, _qexp(s_dr * free_s))
        nt = p.node_t + n_dt * free_n * z_scale_t[None, :]
        nq = _qmul(p.node_q, _qexp(n_dr * free_n))
        calib = _qmul(
            p.calib_q,
            _qexp(
                jnp.where(p.optimize_calibration, 1.0, 0.0) * calib_dr
            ),
        )
        return st, sq, nt, nq, grav, calib

    def relative_error(t_i, q_i, t_j, q_j, z_t, z_q):
        """cost_helpers_impl.h ComputeUnscaledError (3D)."""
        h_t = _qrot(_qconj(q_i), t_j - t_i)
        err_t = z_t - h_t
        err_r = _qlog(_qmul(_qmul(_qconj(q_j), q_i), z_q))
        return err_t, err_r

    def weighted_res(params):
        st, sq, nt, nq, grav, calib = poses_of(params)
        # Submap-node constraints.
        et, er = relative_error(
            st[p.c_submap], sq[p.c_submap], nt[p.c_node], nq[p.c_node],
            p.c_z_t, p.c_z_q,
        )
        r_c = jnp.concatenate(
            [et * p.c_weight[:, 0:1], er * p.c_weight[:, 1:2]], axis=-1
        ) * p.c_mask[:, None]
        # Huber IRLS (safe-where; see 2D solver).
        s = jnp.sum(r_c * r_c, axis=-1)
        delta2 = huber_scale * huber_scale
        apply = p.c_huber & (s > delta2)
        s_safe = jnp.where(apply, s, delta2)
        factor = jnp.where(
            apply,
            jnp.sqrt((2.0 * huber_scale * jnp.sqrt(s_safe) - delta2) / s_safe),
            1.0,
        )
        r_c = r_c * factor[:, None]

        # Node-node constraints.
        et2, er2 = relative_error(
            nt[p.n_a], nq[p.n_a], nt[p.n_b], nq[p.n_b], p.n_z_t, p.n_z_q
        )
        r_n = jnp.concatenate(
            [et2 * p.n_weight[:, 0:1], er2 * p.n_weight[:, 1:2]], axis=-1
        ) * p.n_mask[:, None]

        # IMU rotation: vector part of conj(q_b) q_a calib dq conj(calib).
        calib_r = calib[p.r_traj]
        q_err = _qmul(
            _qmul(_qconj(nq[p.r_b]), nq[p.r_a]),
            _qmul(_qmul(calib_r, p.r_dq), _qconj(calib_r)),
        )
        r_rot = q_err[:, 1:4] * p.r_weight[:, None] * p.r_mask[:, None]

        # IMU acceleration (acceleration_cost_function_3d.h).
        calib_a = calib[p.a_traj]
        imu_dv = _qrot(
            _qmul(nq[p.a_mid], calib_a), p.a_dv
        ) - grav[p.a_traj][:, None] * (
            0.5 * (p.a_dt1 + p.a_dt2)
        )[:, None] * jnp.asarray([0.0, 0.0, 1.0])[None, :]
        start_v = (nt[p.a_mid] - nt[p.a_first]) / p.a_dt1[:, None]
        end_v = (nt[p.a_last] - nt[p.a_mid]) / p.a_dt2[:, None]
        r_acc = (
            (imu_dv - (end_v - start_v))
            * p.a_weight[:, None]
            * p.a_mask[:, None]
        )

        return (
            r_c.reshape(-1),
            r_n.reshape(-1),
            r_rot.reshape(-1),
            r_acc.reshape(-1),
        )

    def res_flat(params):
        return jnp.concatenate(weighted_res(params))

    def cost_of(params):
        r = res_flat(params)
        return 0.5 * jnp.sum(r * r)

    def project(params):
        s_dt, s_dr, n_dt, n_dr, grav, calib_dr = params
        return (
            s_dt * free_s,
            s_dr * free_s,
            n_dt * free_n,
            n_dr * free_n,
            grav,
            calib_dr * jnp.where(p.optimize_calibration, 1.0, 0.0),
        )

    def outer_step(carry, _):
        params, lam, cost = carry

        r0 = res_flat(params)
        _, vjp_fn = jax.vjp(res_flat, params)
        grad = project(vjp_fn(r0)[0])

        def hvp(v):
            pv_ = project(v)
            _, jv = jax.jvp(res_flat, (params,), (pv_,))
            jtv = project(vjp_fn(jv)[0])
            # lam damping on free dims, identity on fixed dims.
            out = []
            for a, b, raw in zip(jtv, pv_, v):
                out.append(a + lam * b + (raw - b))
            return tuple(out)

        neg_grad = jax.tree_util.tree_map(lambda g: -g, grad)
        dx, _ = jax.scipy.sparse.linalg.cg(
            hvp, neg_grad, maxiter=cg_iterations, tol=1e-6
        )
        dx = project(dx)
        new_params = jax.tree_util.tree_map(lambda a, b: a + b, params, dx)
        new_cost = cost_of(new_params)
        accept = new_cost < cost
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), params, new_params
        )
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8), lam * 5.0)
        return (params, lam, cost), None

    init_params = (
        jnp.zeros((S, 3), jnp.float32),
        jnp.zeros((S, 3), jnp.float32),
        jnp.zeros((N, 3), jnp.float32),
        jnp.zeros((N, 3), jnp.float32),
        p.gravity,
        jnp.zeros((T, 3), jnp.float32),
    )
    (params, _, cost), _ = jax.lax.scan(
        outer_step,
        (init_params, jnp.float32(1e-4), cost_of(init_params)),
        None,
        length=max_iterations,
    )
    st, sq, nt, nq, grav, calib = poses_of(params)

    def norm(q):
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    return st, norm(sq), nt, norm(nq), jnp.maximum(grav, 1e-3), norm(calib), cost
