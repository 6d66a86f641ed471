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


class SpaExtras3D(NamedTuple):
    """Optional SE(3) landmark + fixed-frame (GPS) residual tables.

    Landmarks (landmark_cost_function_3d.h:56-95): each observation ties a
    free SE(3) landmark pose to the pose interpolated (lerp translation,
    geodesic slerp rotation — InterpolateNodes3D) between the two nodes
    bracketing the observation time. Fixed frame
    (optimization_problem_3d.cc:510-570): a per-trajectory free fixed-frame
    origin (translation + yaw-only rotation, YawOnlyQuaternionPlus) with an
    SPA residual against each node using the interpolated GPS observation
    as z; optional Ceres TolerantLoss."""

    # Landmarks: free SE(3) poses.
    l_t: jax.Array  # f32 [L, 3]
    l_q: jax.Array  # f32 [L, 4]
    l_free: jax.Array  # bool [L]
    o_node_a: jax.Array  # i32 [O] bracketing node indices
    o_node_b: jax.Array  # i32 [O]
    o_factor: jax.Array  # f32 [O] interpolation factor in [0, 1]
    o_landmark: jax.Array  # i32 [O]
    o_z_t: jax.Array  # f32 [O, 3] observed tracking->landmark translation
    o_z_q: jax.Array  # f32 [O, 4] observed tracking->landmark rotation
    o_weight: jax.Array  # f32 [O, 2] (translation, rotation)
    o_mask: jax.Array  # bool [O]
    # Fixed-frame origins (one per trajectory with GPS data).
    f_t: jax.Array  # f32 [F, 3]
    f_q: jax.Array  # f32 [F, 4] base quaternion (pure yaw at entry)
    f_free: jax.Array  # bool [F]
    g_node: jax.Array  # i32 [G]
    g_traj: jax.Array  # i32 [G] index into the fixed-frame tables
    g_z_t: jax.Array  # f32 [G, 3] fixed-frame observation of the node
    g_z_q: jax.Array  # f32 [G, 4]
    g_weight: jax.Array  # f32 [G, 2]
    g_mask: jax.Array  # bool [G]
    g_tolerant: jax.Array  # bool [] use TolerantLoss on GPS residuals
    g_loss_a: jax.Array  # f32 [] TolerantLoss a
    g_loss_b: jax.Array  # f32 [] TolerantLoss b


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
    """Quaternion -> angle-axis vector (w kept positive).

    Gradient-safe at identity: sum-of-squares of the vector part underflows
    to 0 in f32 near identity, so sqrt/atan2 only see inputs from lanes
    where sin^2 is bounded away from 0 (safe-where); small lanes use the
    series 2/w (1 - s2 / (3 w^2)) which matches 2 atan2(s, w)/s to O(s^4)."""
    sign = jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    q = q * sign
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    s2 = jnp.sum(q[..., 1:4] * q[..., 1:4], axis=-1)
    small = s2 < 1e-10
    s2_safe = jnp.where(small, 1.0, s2)
    sin_half = jnp.sqrt(s2_safe)
    angle_over_sin = 2.0 * jnp.arctan2(sin_half, w) / sin_half
    w_safe = jnp.maximum(w, 1e-6)
    series = 2.0 / w_safe * (1.0 - s2 / (3.0 * w_safe * w_safe))
    scale = jnp.where(small, series, angle_over_sin)
    return q[..., 1:4] * scale[..., None]


# See ops/spa_solver.py for the Ceres references; float32 radii make
# Ceres's 1e-32 min_trust_region_radius unreachable, so 1e-10 is the
# practical equivalent (documented deviation).
_MIN_TRUST_REGION_RADIUS = 1e-10
_MAX_CONSECUTIVE_NONMONOTONIC_STEPS = 5


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations",
        "cg_iterations",
        "use_nonmonotonic_steps",
    ),
)
def solve_3d(
    p: SpaProblem3D,
    huber_scale: float,
    max_iterations: int = 50,
    cg_iterations: int = 64,
    extras: SpaExtras3D | None = None,
    use_nonmonotonic_steps: bool = False,
):
    """Returns (submap_t, submap_q, node_t, node_q, gravity, calib_q, cost)
    — plus, when `extras` is given, (landmark_t, landmark_q, fixed_t,
    fixed_q) appended before cost.

    Trust-region dynamics follow Ceres (rho-based acceptance, radius
    growth/shrink); damping is (1/radius) * I — IDENTITY scaling, not
    Ceres's Jacobi-scaled D^T D/radius (the 2D solver has the scaled
    form; here the local-parameterization tangent basis keeps parameter
    magnitudes comparable, and the deviation is documented rather than
    claimed exact). `use_nonmonotonic_steps` enables Ceres's
    TrustRegionStepEvaluator (see ops/spa_solver.py)."""
    S = p.submap_t.shape[0]
    N = p.node_t.shape[0]
    T = p.gravity.shape[0]
    has_extras = extras is not None

    free_s = p.free_submap[:, None].astype(jnp.float32)
    free_n = p.free_node[:, None].astype(jnp.float32)
    if has_extras:
        free_l = extras.l_free[:, None].astype(jnp.float32)
        free_f = extras.f_free[:, None].astype(jnp.float32)
    z_scale_t = jnp.where(
        p.fix_z, jnp.asarray([1.0, 1.0, 0.0]), jnp.ones(3)
    )

    def poses_of(params):
        s_dt, s_dr, n_dt, n_dr, grav, calib_dr = params[:6]
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
        if not has_extras:
            return st, sq, nt, nq, grav, calib
        l_dt, l_dr, f_dt, f_dyaw = params[6:]
        lt = extras.l_t + l_dt * free_l
        lq = _qmul(extras.l_q, _qexp(l_dr * free_l))
        ft = extras.f_t + f_dt * free_f
        # YawOnlyQuaternionPlus (rotation_parameterization.h): the delta is a
        # pure z rotation; the base quaternion is pure yaw so order commutes.
        yaw_vec = jnp.concatenate(
            [jnp.zeros_like(f_dyaw), jnp.zeros_like(f_dyaw), f_dyaw], axis=-1
        )
        fq = _qmul(extras.f_q, _qexp(yaw_vec * free_f))
        return st, sq, nt, nq, grav, calib, lt, lq, ft, fq

    def relative_error(t_i, q_i, t_j, q_j, z_t, z_q):
        """cost_helpers_impl.h ComputeUnscaledError (3D)."""
        h_t = _qrot(_qconj(q_i), t_j - t_i)
        err_t = z_t - h_t
        err_r = _qlog(_qmul(_qmul(_qconj(q_j), q_i), z_q))
        return err_t, err_r

    def weighted_res(params):
        poses = poses_of(params)
        st, sq, nt, nq, grav, calib = poses[:6]
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

        if not has_extras:
            return (
                r_c.reshape(-1),
                r_n.reshape(-1),
                r_rot.reshape(-1),
                r_acc.reshape(-1),
            )

        lt, lq, ft, fq = poses[6:]
        # Landmark residuals (landmark_cost_function_3d.h:56-76): interpolate
        # the bracketing node poses (lerp translation + geodesic slerp
        # rotation, InterpolateNodes3D) and compute the SPA error from the
        # interpolated pose to the landmark with the observation as z.
        ta, qa = nt[extras.o_node_a], nq[extras.o_node_a]
        tb, qb = nt[extras.o_node_b], nq[extras.o_node_b]
        f = extras.o_factor[:, None]
        t_i = ta + f * (tb - ta)
        q_i = _qmul(qa, _qexp(f * _qlog(_qmul(_qconj(qa), qb))))
        e_lt, e_lr = relative_error(
            t_i, q_i, lt[extras.o_landmark], lq[extras.o_landmark],
            extras.o_z_t, extras.o_z_q,
        )
        r_l = jnp.concatenate(
            [e_lt * extras.o_weight[:, 0:1], e_lr * extras.o_weight[:, 1:2]],
            axis=-1,
        ) * extras.o_mask[:, None]

        # Fixed-frame residuals (optimization_problem_3d.cc:560-570): SPA
        # error with the fixed-frame origin as start, the node as end, and
        # the interpolated GPS observation as z.
        e_ft, e_fr = relative_error(
            ft[extras.g_traj], fq[extras.g_traj],
            nt[extras.g_node], nq[extras.g_node],
            extras.g_z_t, extras.g_z_q,
        )
        r_f = jnp.concatenate(
            [e_ft * extras.g_weight[:, 0:1], e_fr * extras.g_weight[:, 1:2]],
            axis=-1,
        ) * extras.g_mask[:, None]
        # Ceres TolerantLoss(a, b): rho(s) = b softplus((s-a)/b) - b
        # softplus(-a/b); IRLS residual scaling sqrt(rho(s)/s). Safe-where:
        # sqrt only sees inputs bounded away from 0 so its gradient stays
        # finite in masked lanes (0 * inf = NaN otherwise).
        sf = jnp.sum(r_f * r_f, axis=-1)
        a, b = extras.g_loss_a, extras.g_loss_b
        apply_tol = extras.g_tolerant & (sf > 1e-12)
        sf_safe = jnp.where(apply_tol, sf, 1.0)
        rho = b * (
            jax.nn.softplus((sf_safe - a) / b) - jax.nn.softplus(-a / b)
        )
        tol_factor = jnp.where(
            apply_tol,
            jnp.sqrt(jnp.maximum(rho, 1e-20) / sf_safe),
            1.0,
        )
        r_f = r_f * tol_factor[:, None]

        return (
            r_c.reshape(-1),
            r_n.reshape(-1),
            r_rot.reshape(-1),
            r_acc.reshape(-1),
            r_l.reshape(-1),
            r_f.reshape(-1),
        )

    def res_flat(params):
        return jnp.concatenate(weighted_res(params))

    def cost_of(params):
        r = res_flat(params)
        return 0.5 * jnp.sum(r * r)

    def project(params):
        s_dt, s_dr, n_dt, n_dr, grav, calib_dr = params[:6]
        out = [
            s_dt * free_s,
            s_dr * free_s,
            n_dt * free_n,
            n_dr * free_n,
            grav,
            calib_dr * jnp.where(p.optimize_calibration, 1.0, 0.0),
        ]
        if has_extras:
            l_dt, l_dr, f_dt, f_dyaw = params[6:]
            out += [
                l_dt * free_l,
                l_dr * free_l,
                f_dt * free_f,
                f_dyaw * free_f,
            ]
        return tuple(out)

    def outer_step(carry):
        params, radius, decrease_factor, cost, it, done, ev = carry
        lam = 1.0 / radius

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
        # Ceres trust-region step quality (trust_region_minimizer.cc):
        # model cost change from the linearized residuals r0 + J dx,
        # rho = actual/model reduction, accept iff rho >
        # min_relative_decrease (1e-3, the Ceres default).
        _, jdx = jax.jvp(res_flat, (params,), (dx,))
        model_cost_change = -(jnp.sum(r0 * jdx) + 0.5 * jnp.sum(jdx * jdx))
        valid = model_cost_change > 0.0
        mcc = jnp.maximum(model_cost_change, 1e-30)
        relative_decrease = (cost - new_cost) / mcc
        if use_nonmonotonic_steps:
            # Ceres TrustRegionStepEvaluator::StepQuality (see the 2D
            # solver for the full reference notes).
            minimum_cost, reference_cost, candidate_cost, acc_ref, acc_cand, n_nonmono = ev
            historical = (reference_cost - new_cost) / (acc_ref + mcc)
            rho = jnp.maximum(relative_decrease, historical)
        else:
            rho = relative_decrease
        accept = valid & (rho > 1e-3)
        if use_nonmonotonic_steps:
            improved = new_cost < minimum_cost
            n_new = jnp.where(improved, 0, n_nonmono + 1)
            cand_new = jnp.where(
                improved | (new_cost > candidate_cost), new_cost, candidate_cost
            )
            acc_cand_new = jnp.where(
                improved | (new_cost > candidate_cost), 0.0, acc_cand
            )
            promote = n_new == _MAX_CONSECUTIVE_NONMONOTONIC_STEPS
            ref_new = jnp.where(promote, cand_new, reference_cost)
            acc_ref_new = jnp.where(promote, acc_cand_new, acc_ref)
            ev = (
                jnp.where(accept & improved, new_cost, minimum_cost),
                jnp.where(accept, ref_new, reference_cost),
                jnp.where(accept, cand_new, candidate_cost),
                jnp.where(accept, acc_ref_new + mcc, acc_ref),
                jnp.where(accept, acc_cand_new + mcc, acc_cand),
                jnp.where(accept, n_new, n_nonmono),
            )
        # Radius dynamics (levenberg_marquardt_strategy.cc StepAccepted /
        # StepRejected): grow by up to 3x on high-quality steps, shrink
        # by a doubling decrease factor on rejections.
        radius_acc = jnp.minimum(
            radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            1e16,
        )
        new_radius = jnp.where(accept, radius_acc, radius / decrease_factor)
        decrease_factor = jnp.where(accept, 2.0, decrease_factor * 2.0)
        # Termination: relative cost change below the function tolerance,
        # or the trust region collapsed (_MIN_TRUST_REGION_RADIUS).
        converged = (
            accept & (jnp.abs(cost - new_cost) <= 1e-7 * cost)
        ) | (new_radius < _MIN_TRUST_REGION_RADIUS)
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), params, new_params
        )
        cost = jnp.where(accept, new_cost, cost)
        return (params, new_radius, decrease_factor, cost, it + 1, converged, ev)

    def outer_cond(carry):
        it, done = carry[4], carry[5]
        return (it < max_iterations) & ~done

    init_params = [
        jnp.zeros((S, 3), jnp.float32),
        jnp.zeros((S, 3), jnp.float32),
        jnp.zeros((N, 3), jnp.float32),
        jnp.zeros((N, 3), jnp.float32),
        p.gravity,
        jnp.zeros((T, 3), jnp.float32),
    ]
    if has_extras:
        L = extras.l_t.shape[0]
        F = extras.f_t.shape[0]
        init_params += [
            jnp.zeros((L, 3), jnp.float32),
            jnp.zeros((L, 3), jnp.float32),
            jnp.zeros((F, 3), jnp.float32),
            jnp.zeros((F, 1), jnp.float32),
        ]
    init_params = tuple(init_params)
    cost0 = cost_of(init_params)
    ev0 = (
        cost0, cost0, cost0,
        jnp.float32(0.0), jnp.float32(0.0), jnp.int32(0),
    )
    params, _, _, cost, _, _, _ = jax.lax.while_loop(
        outer_cond,
        outer_step,
        (
            init_params, jnp.float32(1e4), jnp.float32(2.0),
            cost0, jnp.int32(0), jnp.asarray(False), ev0,
        ),
    )
    poses = poses_of(params)
    st, sq, nt, nq, grav, calib = poses[:6]

    def norm(q):
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    out = (st, norm(sq), nt, norm(nq), jnp.maximum(grav, 1e-3), norm(calib))
    if has_extras:
        lt, lq, ft, fq = poses[6:]
        out = out + (lt, norm(lq), ft, norm(fq))
    return out + (cost,)
