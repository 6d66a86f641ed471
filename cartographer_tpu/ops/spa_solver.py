"""Sparse pose adjustment (SPA) solver on device.

Reference: internal/optimization/optimization_problem_2d.cc:204-470 — Ceres
nonlinear least squares over (x, y, theta) per submap and node with:
* intra/inter submap constraints (spa_cost_function_2d.cc residual
  z - (T_submap^{-1} T_node), Huber loss on INTER constraints),
* consecutive-node local-SLAM and odometry relative-pose residuals,
* first submap (and frozen trajectories) held constant.

TPU-native replacement for Ceres: matrix-free Levenberg-Marquardt with
Ceres's trust-region dynamics (trust_region_minimizer.cc /
levenberg_marquardt_strategy.cc — rho = actual/model cost reduction from
the linearized residuals, accept iff rho > min_relative_decrease, radius
grown by up to 3x on high-quality steps and shrunk by a doubling
decrease factor on rejections; damping D^T D / radius with D = clamped
sqrt(diag(J^T J)), i.e. Ceres's Jacobi scaling; optional nonmonotonic
step acceptance per TrustRegionStepEvaluator). Each outer iteration
freezes Huber IRLS weights, then solves the damped normal
equations (J^T J + D^T D/radius) dx = -J^T r with conjugate gradients using
jvp/vjp Hessian-vector products — no materialized Jacobian, all residual
blocks evaluated as batched gathers. Fixed parameters are handled by
projecting the search direction. Scales as O(constraints) per CG step and
parallelizes trivially (shard the constraint table, psum the reductions).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SpaExtras(NamedTuple):
    """Optional landmark + fixed-frame (GPS) residual tables.

    Landmarks (landmark_cost_function_2d.h): each observation ties the
    landmark pose to the pose interpolated between two bracketing nodes.
    Fixed frame (optimization_problem_2d.cc:352-400): per-trajectory fixed
    frame origin optimized jointly, SPA residual against each node with an
    interpolated fixed-frame observation."""

    # Landmarks.
    l_poses: jax.Array  # f32 [L, 3] initial landmark global poses
    l_free: jax.Array  # bool [L]
    o_node_a: jax.Array  # i32 [O] bracketing node indices
    o_node_b: jax.Array  # i32 [O]
    o_factor: jax.Array  # f32 [O] interpolation factor in [0, 1]
    o_landmark: jax.Array  # i32 [O]
    o_z: jax.Array  # f32 [O, 3] observed tracking->landmark (2D projection)
    o_weight: jax.Array  # f32 [O, 2]
    o_mask: jax.Array  # bool [O]
    # Fixed frame.
    f_pose: jax.Array  # f32 [T, 3] fixed frame origin in map, per trajectory
    f_free: jax.Array  # bool [T]
    g_node: jax.Array  # i32 [G]
    g_traj: jax.Array  # i32 [G]
    g_z: jax.Array  # f32 [G, 3] fixed-frame observation of the node
    g_weight: jax.Array  # f32 [G, 2]
    g_mask: jax.Array  # bool [G]


class SpaProblem(NamedTuple):
    """Padded, masked problem arrays (see pose_graph_2d for construction)."""

    submap_poses: jax.Array  # f32 [S, 3]
    node_poses: jax.Array  # f32 [N, 3]
    free_submap: jax.Array  # bool [S] (False: held constant / padding)
    free_node: jax.Array  # bool [N]
    # submap-node constraints
    c_submap: jax.Array  # i32 [C]
    c_node: jax.Array  # i32 [C]
    c_z: jax.Array  # f32 [C, 3] observed T_submap^-1 T_node
    c_weight: jax.Array  # f32 [C, 2] (translation, rotation)
    c_huber: jax.Array  # bool [C] apply Huber (INTER constraints)
    c_mask: jax.Array  # bool [C]
    # node-node constraints (odometry / local slam consecutive pairs)
    n_a: jax.Array  # i32 [K]
    n_b: jax.Array  # i32 [K]
    n_z: jax.Array  # f32 [K, 3]
    n_weight: jax.Array  # f32 [K, 2]
    n_mask: jax.Array  # bool [K]


def _normalize_angle(a):
    return a - 2.0 * jnp.pi * jnp.ceil((a - jnp.pi) / (2.0 * jnp.pi))


def _spa_error(start, end, z):
    """cost_helpers_impl.h ComputeUnscaledError (2D)."""
    c = jnp.cos(start[..., 2])
    s = jnp.sin(start[..., 2])
    dx = end[..., 0] - start[..., 0]
    dy = end[..., 1] - start[..., 1]
    h0 = c * dx + s * dy
    h1 = -s * dx + c * dy
    h2 = end[..., 2] - start[..., 2]
    return jnp.stack(
        [
            z[..., 0] - h0,
            z[..., 1] - h1,
            _normalize_angle(z[..., 2] - h2),
        ],
        axis=-1,
    )


def _weighted(r_c, r_n, p: SpaProblem, huber_scale: float):
    w_c = jnp.stack(
        [p.c_weight[:, 0], p.c_weight[:, 0], p.c_weight[:, 1]], axis=-1
    )
    w_n = jnp.stack(
        [p.n_weight[:, 0], p.n_weight[:, 0], p.n_weight[:, 1]], axis=-1
    )
    r_c = r_c * w_c * p.c_mask[:, None]
    r_n = r_n * w_n * p.n_mask[:, None]
    # Huber IRLS factor on INTER constraints: residual scaled so that
    # ||factor * r||^2 == rho_huber(||r||^2), rho(s) = 2 delta sqrt(s) -
    # delta^2 for s > delta^2 (Ceres HuberLoss with a = huber_scale).
    # Safe-where: sqrt is only evaluated on inputs >= delta^2 so gradients
    # never see sqrt(0).
    s = jnp.sum(r_c * r_c, axis=-1)
    delta2 = huber_scale * huber_scale
    apply = p.c_huber & (s > delta2)
    s_safe = jnp.where(apply, s, delta2)
    factor = jnp.where(
        apply,
        jnp.sqrt(
            (2.0 * huber_scale * jnp.sqrt(s_safe) - delta2) / s_safe
        ),
        1.0,
    )
    r_c = r_c * factor[:, None]
    return r_c, r_n


# Ceres LevenbergMarquardtStrategy clamps diag(J^T J) into
# [min_diagonal=1e-6, max_diagonal=1e32] before damping with D^T D/radius.
_MIN_DIAGONAL = 1e-6
_MAX_DIAGONAL = 1e32
# Trust-region collapse termination. Ceres's min_trust_region_radius
# default is 1e-32; float32 radii underflow far above that, so 1e-10 is
# the practical equivalent here (documented deviation — consecutive
# rejections from the 1e4 start take ~46 halvings to reach it, so the
# solver keeps trying heavily damped steps instead of quitting early).
_MIN_TRUST_REGION_RADIUS = 1e-10
# Ceres TrustRegionStepEvaluator default window for nonmonotonic steps.
_MAX_CONSECUTIVE_NONMONOTONIC_STEPS = 5


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations",
        "cg_iterations",
        "use_nonmonotonic_steps",
    ),
)
def solve(
    p: SpaProblem,
    huber_scale: float,
    max_iterations: int = 50,
    cg_iterations: int = 64,
    extras: SpaExtras | None = None,
    use_nonmonotonic_steps: bool = False,
):
    """Returns (submap_poses, node_poses, final_cost) — plus, when `extras`
    is given, landmark poses and fixed-frame poses appended to the tuple.

    `use_nonmonotonic_steps` enables Ceres's nonmonotonic trust region
    (TrustRegionStepEvaluator, Conn/Gould/Toint Algorithm 10.1.2): step
    quality is the max of the current relative decrease and the decrease
    against a lagging reference cost, so steps that temporarily worsen
    the cost within the reference window are accepted."""

    free_s = p.free_submap[:, None].astype(jnp.float32)
    free_n = p.free_node[:, None].astype(jnp.float32)
    has_extras = extras is not None
    if has_extras:
        free_l = extras.l_free[:, None].astype(jnp.float32)
        free_f = extras.f_free[:, None].astype(jnp.float32)

    def weighted_res(params):
        sp, npo = params[0], params[1]
        r_c = _spa_error(sp[p.c_submap], npo[p.c_node], p.c_z)
        r_n = _spa_error(npo[p.n_a], npo[p.n_b], p.n_z)
        r_c, r_n = _weighted(r_c, r_n, p, huber_scale)
        if not has_extras:
            return (r_c, r_n)
        lp, fp = params[2], params[3]
        # Landmark residuals: interpolate the bracketing node poses
        # (translation lerp + shortest-path angle lerp) and compare the
        # observation against interpolated_pose^{-1} * landmark_pose.
        pa = npo[extras.o_node_a]
        pb = npo[extras.o_node_b]
        f = extras.o_factor[:, None]
        dth = _normalize_angle(pb[:, 2] - pa[:, 2])
        interp = jnp.stack(
            [
                pa[:, 0] + f[:, 0] * (pb[:, 0] - pa[:, 0]),
                pa[:, 1] + f[:, 0] * (pb[:, 1] - pa[:, 1]),
                pa[:, 2] + f[:, 0] * dth,
            ],
            axis=-1,
        )
        r_l = _spa_error(interp, lp[extras.o_landmark], extras.o_z)
        w_l = jnp.stack(
            [
                extras.o_weight[:, 0],
                extras.o_weight[:, 0],
                extras.o_weight[:, 1],
            ],
            axis=-1,
        )
        r_l = r_l * w_l * extras.o_mask[:, None]
        # Fixed-frame residuals: SPA error between the trajectory's fixed
        # frame pose and the node, with the GPS observation as z.
        r_f = _spa_error(fp[extras.g_traj], npo[extras.g_node], extras.g_z)
        w_f = jnp.stack(
            [
                extras.g_weight[:, 0],
                extras.g_weight[:, 0],
                extras.g_weight[:, 1],
            ],
            axis=-1,
        )
        r_f = r_f * w_f * extras.g_mask[:, None]
        return (r_c, r_n, r_l, r_f)

    def cost_of(params):
        return 0.5 * sum(jnp.sum(r * r) for r in weighted_res(params))

    def project(params):
        out = [params[0] * free_s, params[1] * free_n]
        if has_extras:
            out.append(params[2] * free_l)
            out.append(params[3] * free_f)
        return tuple(out)

    def jtj_diag(params):
        """Exact diag(J^T J) via one Hutchinson-free trick: for residual
        r(x) with Jacobian J, diag(J^T J)_k = sum_rows J_rk^2. Computed by
        squaring the per-row parameter-block Jacobians (vmapped jacfwd of
        the row residual over its two incident poses) and scatter-adding
        into the pose tables — O(rows) work, same as one CG step. Used
        both for the Jacobi CG preconditioner and for the Ceres LM
        damping scale D^T D (levenberg_marquardt_strategy.cc: D =
        clamped sqrt(diag), damping = D^T D / radius)."""

        def row_sq(start_end_fn, idx_a, idx_b, table_a, table_b, z, w3, mask):
            def row(a, b, zz):
                return start_end_fn(a, b, zz)

            ja, jb = jax.vmap(jax.jacfwd(row, argnums=(0, 1)))(
                table_a[idx_a], table_b[idx_b], z
            )  # [R, 3, 3] each
            scale = (w3 * mask[:, None])[:, :, None]  # [R, 3, 1]
            sq_a = jnp.sum((ja * scale) ** 2, axis=1)  # [R, 3]
            sq_b = jnp.sum((jb * scale) ** 2, axis=1)
            return sq_a, sq_b

        sp, npo = params[0], params[1]
        w_c = jnp.stack(
            [p.c_weight[:, 0], p.c_weight[:, 0], p.c_weight[:, 1]], axis=-1
        )
        w_n = jnp.stack(
            [p.n_weight[:, 0], p.n_weight[:, 0], p.n_weight[:, 1]], axis=-1
        )
        # Huber factors vary the scale; the preconditioner does not need
        # them exactly (any SPD approximation works), so they are omitted.
        c_sa, c_sb = row_sq(_spa_error, p.c_submap, p.c_node, sp, npo,
                            p.c_z, w_c, p.c_mask)
        n_sa, n_sb = row_sq(_spa_error, p.n_a, p.n_b, npo, npo,
                            p.n_z, w_n, p.n_mask)
        d_s = jnp.zeros_like(sp).at[p.c_submap].add(c_sa)
        d_n = (
            jnp.zeros_like(npo)
            .at[p.c_node].add(c_sb)
            .at[p.n_a].add(n_sa)
            .at[p.n_b].add(n_sb)
        )
        diags = [d_s, d_n]
        if has_extras:
            diags.append(jnp.zeros_like(extras.l_poses))
            diags.append(jnp.zeros_like(extras.f_pose))
        return tuple(diags)

    frees = [free_s, free_n] + ([free_l, free_f] if has_extras else [])

    def outer_step(carry):
        params, radius, decrease_factor, cost, it, done, ev = carry
        diag = jtj_diag(params)
        # Ceres LM damping: D^T D / radius with D = clamped sqrt(diag)
        # (Jacobi scaling — step shape matches Ceres on problems mixing
        # translation/rotation magnitudes, unlike (1/radius) * I).
        damp = tuple(
            jnp.clip(d, _MIN_DIAGONAL, _MAX_DIAGONAL) / radius for d in diag
        )

        def res_flat(pr):
            return jnp.concatenate([r.reshape(-1) for r in weighted_res(pr)])

        r0 = res_flat(params)
        _, vjp_fn = jax.vjp(res_flat, params)
        grad = project(vjp_fn(r0)[0])  # J^T r

        def hvp(v):
            pv_ = project(v)
            _, jv = jax.jvp(res_flat, (params,), (pv_,))
            jtv = project(vjp_fn(jv)[0])
            # Identity on the fixed subspace keeps the operator SPD (the rhs
            # is zero there, so fixed components stay exactly zero).
            return tuple(
                a + dmp * b + (raw - b)
                for a, b, raw, dmp in zip(jtv, pv_, v, damp)
            )

        # Jacobi preconditioner of the damped operator on the free
        # subspace, identity on the fixed one.
        pre = tuple(
            jnp.where(fr > 0, d + dmp, 1.0)
            for d, dmp, fr in zip(diag, damp, frees)
        )

        def apply_pre(v):
            return tuple(a / d for a, d in zip(v, pre))

        neg_grad = tuple(-g for g in grad)
        dx, _ = jax.scipy.sparse.linalg.cg(
            hvp, neg_grad, maxiter=cg_iterations, tol=1e-6, M=apply_pre
        )
        dx = project(dx)
        new_params = tuple(a + b for a, b in zip(params, dx))
        new_cost = cost_of(new_params)
        # Ceres trust-region step quality (trust_region_minimizer.cc
        # ComputeCandidatePointAndEvaluateCost / IsStepSuccessful): model
        # cost change from the linearized residuals r0 + J dx, rho =
        # actual/model reduction, accept iff rho > min_relative_decrease.
        _, jdx = jax.jvp(res_flat, (params,), (dx,))
        model_cost_change = -(jnp.sum(r0 * jdx) + 0.5 * jnp.sum(jdx * jdx))
        valid = model_cost_change > 0.0
        mcc = jnp.maximum(model_cost_change, 1e-30)
        relative_decrease = (cost - new_cost) / mcc
        if use_nonmonotonic_steps:
            # Ceres TrustRegionStepEvaluator::StepQuality: max of the
            # current and the historical (reference-cost) decrease.
            minimum_cost, reference_cost, candidate_cost, acc_ref, acc_cand, n_nonmono = ev
            historical = (reference_cost - new_cost) / (acc_ref + mcc)
            rho = jnp.maximum(relative_decrease, historical)
        else:
            rho = relative_decrease
        accept = valid & (rho > 1e-3)  # Ceres min_relative_decrease
        if use_nonmonotonic_steps:
            # Ceres TrustRegionStepEvaluator::StepAccepted (Conn/Gould/
            # Toint Algorithm 10.1.2): track the best cost, reset the
            # candidate on new minima, promote the candidate to reference
            # after max_consecutive_nonmonotonic_steps.
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
        # StepRejected): grow by up to 3x on high-quality steps, shrink by
        # a doubling decrease factor on rejections.
        radius_acc = jnp.minimum(
            radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            1e16,
        )
        new_radius = jnp.where(accept, radius_acc, radius / decrease_factor)
        decrease_factor = jnp.where(accept, 2.0, decrease_factor * 2.0)
        # Termination: relative cost change below the function tolerance,
        # or the trust region collapsed (see _MIN_TRUST_REGION_RADIUS).
        converged = (
            accept & (jnp.abs(cost - new_cost) <= 1e-7 * cost)
        ) | (new_radius < _MIN_TRUST_REGION_RADIUS)
        params = tuple(
            jnp.where(accept, b, a) for a, b in zip(params, new_params)
        )
        cost = jnp.where(accept, new_cost, cost)
        return (params, new_radius, decrease_factor, cost, it + 1, converged, ev)

    def outer_cond(carry):
        it, done = carry[4], carry[5]
        return (it < max_iterations) & ~done

    init_params = [p.submap_poses, p.node_poses]
    if has_extras:
        init_params += [extras.l_poses, extras.f_pose]
    init_params = tuple(init_params)
    cost0 = cost_of(init_params)
    ev0 = (
        cost0,  # minimum_cost
        cost0,  # reference_cost
        cost0,  # candidate_cost
        jnp.float32(0.0),  # accumulated reference model cost change
        jnp.float32(0.0),  # accumulated candidate model cost change
        jnp.int32(0),  # consecutive nonmonotonic steps
    )
    params, _, _, cost, _, _, _ = jax.lax.while_loop(
        outer_cond,
        outer_step,
        (
            init_params, jnp.float32(1e4), jnp.float32(2.0),
            cost0, jnp.int32(0), jnp.asarray(False), ev0,
        ),
    )
    # Normalize angles on the way out.
    out = tuple(
        x.at[:, 2].set(_normalize_angle(x[:, 2])) for x in params
    )
    return out + (cost,)
