"""Sparse pose adjustment (SPA) solver on device.

Reference: internal/optimization/optimization_problem_2d.cc:204-470 — Ceres
nonlinear least squares over (x, y, theta) per submap and node with:
* intra/inter submap constraints (spa_cost_function_2d.cc residual
  z - (T_submap^{-1} T_node), Huber loss on INTER constraints),
* consecutive-node local-SLAM and odometry relative-pose residuals,
* first submap (and frozen trajectories) held constant.

TPU-native replacement for Ceres: matrix-free Levenberg-Marquardt. Each
outer iteration freezes Huber IRLS weights, then solves the damped normal
equations (J^T J + lambda I) dx = -J^T r with conjugate gradients using
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


@functools.partial(jax.jit, static_argnames=("max_iterations", "cg_iterations"))
def solve(
    p: SpaProblem,
    huber_scale: float,
    max_iterations: int = 50,
    cg_iterations: int = 64,
):
    """Returns (submap_poses, node_poses, final_cost)."""

    free_s = p.free_submap[:, None].astype(jnp.float32)
    free_n = p.free_node[:, None].astype(jnp.float32)

    def weighted_res(params):
        sp, npo = params
        r_c = _spa_error(sp[p.c_submap], npo[p.c_node], p.c_z)
        r_n = _spa_error(npo[p.n_a], npo[p.n_b], p.n_z)
        return _weighted(r_c, r_n, p, huber_scale)

    def cost_of(params):
        r_c, r_n = weighted_res(params)
        return 0.5 * (jnp.sum(r_c * r_c) + jnp.sum(r_n * r_n))

    def project(params):
        sp, npo = params
        return (sp * free_s, npo * free_n)

    def outer_step(carry, _):
        sp, npo, lam, cost = carry
        params = (sp, npo)

        def res_flat(pr):
            r_c, r_n = weighted_res(pr)
            return jnp.concatenate([r_c.reshape(-1), r_n.reshape(-1)])

        r0 = res_flat(params)
        _, vjp_fn = jax.vjp(res_flat, params)
        grad = project(vjp_fn(r0)[0])  # J^T r

        def hvp(v):
            _, jv = jax.jvp(res_flat, (params,), (project(v),))
            jtv = project(vjp_fn(jv)[0])
            # Identity on the fixed subspace keeps the operator SPD (the rhs
            # is zero there, so fixed components stay exactly zero).
            return (
                jtv[0] + lam * v[0] * free_s + v[0] * (1.0 - free_s),
                jtv[1] + lam * v[1] * free_n + v[1] * (1.0 - free_n),
            )

        neg_grad = (-grad[0], -grad[1])
        dx, _ = jax.scipy.sparse.linalg.cg(
            hvp, neg_grad, maxiter=cg_iterations, tol=1e-6
        )
        dx = project(dx)
        new_params = (sp + dx[0], npo + dx[1])
        new_cost = cost_of(new_params)
        accept = new_cost < cost
        sp = jnp.where(accept, new_params[0], sp)
        npo = jnp.where(accept, new_params[1], npo)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8), lam * 5.0)
        return (sp, npo, lam, cost), None

    init = (
        p.submap_poses,
        p.node_poses,
        jnp.float32(1e-4),
        cost_of((p.submap_poses, p.node_poses)),
    )
    (sp, npo, _, cost), _ = jax.lax.scan(
        outer_step, init, None, length=max_iterations
    )
    # Normalize angles on the way out.
    sp = sp.at[:, 2].set(_normalize_angle(sp[:, 2]))
    npo = npo.at[:, 2].set(_normalize_angle(npo[:, 2]))
    return sp, npo, cost
