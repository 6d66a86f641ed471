"""SPA solver tests (model: spa_cost_function_2d_test.cc + graph-level
behavior of optimization_problem_2d)."""

import numpy as np
import jax.numpy as jnp

from cartographer_tpu.ops.spa_solver import SpaProblem, solve
from cartographer_tpu.transform import rigid2


def relative(a, b):
    return rigid2.relative(np.asarray(a, np.float64), np.asarray(b, np.float64))


def build_problem(submap_poses, node_poses, constraints, nn_constraints, fixed_submaps=(0,)):
    S, N = len(submap_poses), len(node_poses)
    C, K = max(len(constraints), 1), max(len(nn_constraints), 1)

    def pad(n, minimum=4):
        v = minimum
        while v < n:
            v *= 2
        return v

    Sp, Np, Cp, Kp = pad(S), pad(N), pad(C), pad(K)
    sp = np.zeros((Sp, 3), np.float32)
    sp[:S] = submap_poses
    npo = np.zeros((Np, 3), np.float32)
    npo[:N] = node_poses
    free_s = np.zeros(Sp, bool)
    free_s[:S] = True
    for i in fixed_submaps:
        free_s[i] = False
    free_n = np.zeros(Np, bool)
    free_n[:N] = True

    c_submap = np.zeros(Cp, np.int32)
    c_node = np.zeros(Cp, np.int32)
    c_z = np.zeros((Cp, 3), np.float32)
    c_w = np.ones((Cp, 2), np.float32)
    c_h = np.zeros(Cp, bool)
    c_m = np.zeros(Cp, bool)
    for i, (si, ni, z, wt, wr, huber) in enumerate(constraints):
        c_submap[i], c_node[i] = si, ni
        c_z[i] = z
        c_w[i] = (wt, wr)
        c_h[i] = huber
        c_m[i] = True

    n_a = np.zeros(Kp, np.int32)
    n_b = np.zeros(Kp, np.int32)
    n_z = np.zeros((Kp, 3), np.float32)
    n_w = np.ones((Kp, 2), np.float32)
    n_m = np.zeros(Kp, bool)
    for i, (a, b, z, wt, wr) in enumerate(nn_constraints):
        n_a[i], n_b[i] = a, b
        n_z[i] = z
        n_w[i] = (wt, wr)
        n_m[i] = True

    return SpaProblem(
        submap_poses=jnp.asarray(sp),
        node_poses=jnp.asarray(npo),
        free_submap=jnp.asarray(free_s),
        free_node=jnp.asarray(free_n),
        c_submap=jnp.asarray(c_submap),
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


class TestSpaSolver:
    def test_consistent_graph_stays_put(self):
        # Ground-truth consistent constraints: solver should not move poses.
        submaps = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.3]])
        nodes = np.array([[0.5, 0.1, 0.0], [1.5, -0.1, 0.2], [2.5, 0.0, 0.4]])
        constraints = []
        for si in range(2):
            for ni in range(3):
                z = relative(submaps[si], nodes[ni])
                constraints.append((si, ni, z, 10.0, 30.0, False))
        p = build_problem(submaps, nodes, constraints, [])
        sp, npo, cost = solve(p, huber_scale=10.0, max_iterations=20)
        np.testing.assert_allclose(np.asarray(sp)[:2], submaps, atol=1e-3)
        np.testing.assert_allclose(np.asarray(npo)[:3], nodes, atol=1e-3)
        assert float(cost) < 1e-6

    def test_corrects_perturbed_node(self):
        submaps = np.array([[0.0, 0.0, 0.0]])
        true_nodes = np.array([[1.0, 0.5, 0.1], [2.0, 1.0, 0.2]])
        constraints = [
            (0, ni, relative(submaps[0], true_nodes[ni]), 5.0, 20.0, False)
            for ni in range(2)
        ]
        start_nodes = true_nodes + np.array([[0.3, -0.2, 0.1], [-0.25, 0.2, -0.15]])
        p = build_problem(submaps, start_nodes, constraints, [])
        sp, npo, cost = solve(p, huber_scale=10.0, max_iterations=30)
        np.testing.assert_allclose(np.asarray(npo)[:2], true_nodes, atol=1e-3)

    def test_loop_closure_distributes_error(self):
        # Chain of nodes with slightly wrong odometry; a loop-closure
        # constraint to submap 0 pins the last node. Optimization should
        # spread the correction along the chain.
        submaps = np.array([[0.0, 0.0, 0.0]])
        n = 6
        drift = 0.05
        nodes = np.array([[i * (1.0 + drift), 0.0, 0.0] for i in range(n)])
        nn = [
            (i, i + 1, [1.0 + drift, 0.0, 0.0], 10.0, 10.0)
            for i in range(n - 1)
        ]
        constraints = [
            (0, 0, [0.0, 0.0, 0.0], 100.0, 100.0, False),
            # Loop closure says the last node is truly at x = n-1.
            (0, n - 1, [float(n - 1), 0.0, 0.0], 100.0, 100.0, True),
        ]
        p = build_problem(submaps, nodes, constraints, nn)
        sp, npo, cost = solve(p, huber_scale=10.0, max_iterations=40)
        npo = np.asarray(npo)
        assert abs(npo[n - 1, 0] - (n - 1)) < 0.05
        assert abs(npo[0, 0]) < 0.02
        # Middle nodes roughly interpolate.
        assert abs(npo[3, 0] - 3.0) < 0.15

    def test_fixed_submap_does_not_move(self):
        submaps = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        nodes = np.array([[0.5, 0.0, 0.0]])
        constraints = [
            (0, 0, [0.6, 0.1, 0.05], 10.0, 10.0, False),
            (1, 0, [-0.4, -0.1, -0.05], 10.0, 10.0, False),
        ]
        p = build_problem(submaps, nodes, constraints, [])
        sp, npo, cost = solve(p, huber_scale=10.0, max_iterations=20)
        np.testing.assert_allclose(np.asarray(sp)[0], [0.0, 0.0, 0.0], atol=1e-7)
        assert not np.allclose(np.asarray(sp)[1], [1.0, 0.0, 0.0], atol=1e-4)
