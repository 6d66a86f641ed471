"""Multi-host worker: run on EVERY host of a slice (same command line).

Measures the sharded constraint-scoring and SPA workloads over the global
mesh and prints a per-host scaling report (BASELINE.md: scaling efficiency
1 chip -> 1 host -> N hosts).

    python -m cartographer_tpu.tools.multihost_worker \
        --coordinator_address=HOST0:1234 --num_processes=H --process_id=I

Without arguments it runs single-process (all local devices), which is
also how the scaling baseline for "1 host" is measured.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--candidates_per_device", type=int, default=4096)
    parser.add_argument("--spa_nodes", type=int, default=10000)
    parser.add_argument("--lm_iterations", type=int, default=20)
    parser.add_argument("--cg_iterations", type=int, default=50)
    parser.add_argument(
        "--production",
        action="store_true",
        help="also drive the PRODUCTION pose-graph drain (MapBuilder -> "
        "PoseGraph2D -> sharded constraint batch + SPA) over the global "
        "mesh — the same entry the driver dryrun exercises",
    )
    args = parser.parse_args(argv)

    import jax

    from cartographer_tpu.ops import spa_solver
    from cartographer_tpu.parallel import multihost, sharded

    ctx = multihost.initialize(
        args.coordinator_address, args.num_processes, args.process_id
    )
    n_dev = len(ctx.mesh.devices.reshape(-1))
    # SPMD discipline: every process passes the SAME global values for
    # replicated/sharded jit inputs (uncommitted numpy arrays — jit
    # device_puts them to the global shardings; a committed process-local
    # jnp array would fail on a multi-process mesh).
    rng = np.random.default_rng(0)

    # -- sharded candidate scoring -------------------------------------------
    score = sharded.make_sharded_score_level(ctx.mesh)
    H = W = 1024
    A, N = 64, 512
    C = args.candidates_per_device * n_dev
    pool = rng.uniform(0.1, 0.9, (H, W)).astype(np.float32)
    ix = rng.integers(0, W, (A, N)).astype(np.int32)
    iy = rng.integers(0, H, (A, N)).astype(np.int32)
    pmask = np.ones((N,), bool)
    cand_args = tuple(
        multihost.make_global_sharded(ctx, a)
        for a in (
            rng.integers(0, A, C).astype(np.int32),
            rng.integers(-64, 64, C).astype(np.int32),
            rng.integers(-64, 64, C).astype(np.int32),
            np.ones((C,), bool),
        )
    )
    scores = score(pool, ix, iy, pmask, *cand_args)
    jax.block_until_ready(scores)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        scores = score(pool, ix, iy, pmask, *cand_args)
    jax.block_until_ready(scores)
    dt = (time.perf_counter() - t0) / reps
    report = multihost.scaling_report(ctx, C, dt)
    report["metric"] = "sharded_candidate_scores"
    print(json.dumps(report))

    # -- sharded SPA ----------------------------------------------------------
    def pad_to(n: int) -> int:
        return ((n + n_dev - 1) // n_dev) * n_dev

    n_nodes = args.spa_nodes
    n_submaps = max(2, n_nodes // 90)
    n_con = pad_to(n_nodes * 3)
    n_odo = pad_to(n_nodes - 1)
    solve = sharded.make_sharded_spa_solve(
        ctx.mesh,
        max_iterations=args.lm_iterations,
        cg_iterations=args.cg_iterations,
    )
    gs = lambda a: multihost.make_global_sharded(ctx, a)
    problem = spa_solver.SpaProblem(
        submap_poses=rng.normal(0, 5, (n_submaps, 3)).astype(np.float32),
        node_poses=rng.normal(0, 5, (n_nodes, 3)).astype(np.float32),
        free_submap=np.array([False] + [True] * (n_submaps - 1)),
        free_node=np.ones((n_nodes,), bool),
        c_submap=gs(rng.integers(0, n_submaps, n_con).astype(np.int32)),
        c_node=gs(rng.integers(0, n_nodes, n_con).astype(np.int32)),
        c_z=gs(rng.normal(0, 1, (n_con, 3)).astype(np.float32)),
        c_weight=gs(np.ones((n_con, 2), np.float32) * 1e4),
        c_huber=gs(np.ones((n_con,), bool)),
        c_mask=gs(np.ones((n_con,), bool)),
        n_a=gs((np.arange(n_odo) % (n_nodes - 1)).astype(np.int32)),
        n_b=gs((np.arange(n_odo) % (n_nodes - 1) + 1).astype(np.int32)),
        n_z=gs(rng.normal(0, 0.1, (n_odo, 3)).astype(np.float32)),
        n_weight=gs(np.ones((n_odo, 2), np.float32) * 1e5),
        n_mask=gs(np.arange(n_odo) < n_nodes - 1),
    )
    sp, npo, cost = solve(problem, np.float32(1e3))
    jax.block_until_ready(cost)
    t0 = time.perf_counter()
    sp, npo, cost = solve(problem, np.float32(1e3))
    jax.block_until_ready(cost)
    dt = time.perf_counter() - t0
    report = multihost.scaling_report(ctx, n_con, dt)
    report["metric"] = "sharded_spa_solve"
    report["seconds"] = round(dt, 4)
    # Replicated outputs: read this process's addressable copy (a global
    # array is not fully addressable under multi-controller).
    report["final_cost"] = float(np.asarray(cost.addressable_data(0)))
    print(json.dumps(report, ), flush=True)

    # -- production pose-graph drain (same entry as dryrun_multichip) --------
    if args.production:
        from cartographer_tpu.testing.production_dryrun import (
            run_production_drain_2d,
        )

        stats = run_production_drain_2d(ctx.mesh)
        stats["metric"] = "production_drain_2d"
        stats["num_processes"] = ctx.num_processes
        stats["process_id"] = ctx.process_id
        stats["num_devices"] = n_dev
        print(json.dumps(stats), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
