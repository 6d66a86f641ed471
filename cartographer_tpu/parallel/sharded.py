"""Multi-chip sharding for the scalable workloads, wired into the product.

The reference scales by threads (ThreadPool constraint search,
constraint_builder_2d.cc:102-136) and a single gRPC server for the shared
pose graph (SURVEY.md section 2.10). The TPU equivalents:

* Loop-closure candidate scoring — embarrassingly parallel over searches
  and candidates: the production drain (constraint_builder_2d.run_pending
  -> fast_correlative_2d.batch_match_device) shards the SEARCH batch axis
  over the mesh; each device runs whole branch-and-bound searches against
  its shard's stacked pyramids.
* SPA solve — residual/constraint tables sharded over the mesh, pose
  vectors replicated; J^T J products reduce across devices (XLA inserts
  the psums from the sharding annotations). Both the 2D and 3D production
  solvers (optimization_problem_{2d,3d}.solve) take this path when the
  pose graph owns a mesh.

Both are expressed as shardings over the same kernels used single-chip; XLA
partitions them (ICI collectives inside a slice, DCN across hosts under
multi-controller jax.distributed). Construction: pass a mesh to MapBuilder
(or PoseGraph2D/3D directly); a single-device mesh degenerates to today's
behavior.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartographer_tpu.ops import spa_solver
from cartographer_tpu.ops.scan_matching import fast_correlative_2d
from cartographer_tpu.parallel.partition import (
    WORKER_AXIS,
    batch_sharding as shard_candidates,
    make_mesh,
    replicated_sharding as replicated,
    shard_namedtuple,
)

__all__ = [
    "WORKER_AXIS",
    "make_mesh",
    "shard_candidates",
    "replicated",
    "shard_spa_problem",
    "shard_spa_extras",
    "shard_spa_problem_3d",
    "shard_spa_extras_3d",
    "make_sharded_score_level",
    "make_sharded_spa_solve",
    "make_sharded_spa_solve_3d",
]


# Field partitioning of the SPA problem tables: residual rows sharded over
# the mesh, pose/parameter tables replicated (ops/spa_solver.SpaProblem).
_SPA2D_SHARDED = frozenset(
    {
        "c_submap", "c_node", "c_z", "c_weight", "c_huber", "c_mask",
        "n_a", "n_b", "n_z", "n_weight", "n_mask",
    }
)
_SPA2D_EXTRAS_SHARDED = frozenset(
    {
        "o_node_a", "o_node_b", "o_factor", "o_landmark", "o_z",
        "o_weight", "o_mask",
        "g_node", "g_traj", "g_z", "g_weight", "g_mask",
    }
)
_SPA3D_SHARDED = frozenset(
    {
        "c_submap", "c_node", "c_z_t", "c_z_q", "c_weight", "c_huber",
        "c_mask",
        "n_a", "n_b", "n_z_t", "n_z_q", "n_weight", "n_mask",
        "r_a", "r_b", "r_dq", "r_weight", "r_traj", "r_mask",
        "a_first", "a_mid", "a_last", "a_dv", "a_dt1", "a_dt2",
        "a_weight", "a_traj", "a_mask",
    }
)
_SPA3D_EXTRAS_SHARDED = frozenset(
    {
        "o_node_a", "o_node_b", "o_factor", "o_landmark", "o_z_t",
        "o_z_q", "o_weight", "o_mask",
        "g_node", "g_traj", "g_z_t", "g_z_q", "g_weight", "g_mask",
    }
)


def shard_spa_problem(mesh: Mesh, problem):
    return shard_namedtuple(mesh, problem, _SPA2D_SHARDED)


def shard_spa_extras(mesh: Mesh, extras):
    return shard_namedtuple(mesh, extras, _SPA2D_EXTRAS_SHARDED)


def shard_spa_problem_3d(mesh: Mesh, problem):
    return shard_namedtuple(mesh, problem, _SPA3D_SHARDED)


def shard_spa_extras_3d(mesh: Mesh, extras):
    return shard_namedtuple(mesh, extras, _SPA3D_EXTRAS_SHARDED)


def make_sharded_score_level(mesh: Mesh):
    """Candidate scoring with the candidate axis sharded over the mesh."""
    cand = shard_candidates(mesh)
    rep = replicated(mesh)
    return jax.jit(
        fast_correlative_2d._score_level.__wrapped__,
        in_shardings=(rep, rep, rep, rep, cand, cand, cand, cand),
        out_shardings=cand,
    )


def make_sharded_spa_solve(mesh: Mesh, max_iterations: int = 20, cg_iterations: int = 32):
    """SPA solve with constraint tables sharded over the mesh and poses
    replicated; gradient/Hessian-vector reductions cross devices."""
    cand = shard_candidates(mesh)
    rep = replicated(mesh)
    problem_shardings = spa_solver.SpaProblem(
        **{
            f: cand if f in _SPA2D_SHARDED else rep
            for f in spa_solver.SpaProblem._fields
        }
    )

    def solve_fn(problem, huber_scale):
        return spa_solver.solve.__wrapped__(
            problem, huber_scale, max_iterations, cg_iterations
        )

    return jax.jit(
        solve_fn,
        in_shardings=(problem_shardings, rep),
        out_shardings=(rep, rep, rep),
    )


def make_sharded_spa_solve_3d(
    mesh: Mesh, max_iterations: int = 20, cg_iterations: int = 32
):
    """SE(3) SPA solve (ops/spa_solver_3d.solve_3d) with every residual
    table — constraints, node-node, IMU rotation and acceleration rows —
    sharded over the mesh and pose/calibration tables replicated."""
    from cartographer_tpu.ops import spa_solver_3d

    cand = shard_candidates(mesh)
    rep = replicated(mesh)
    problem_shardings = spa_solver_3d.SpaProblem3D(
        **{
            f: cand if f in _SPA3D_SHARDED else rep
            for f in spa_solver_3d.SpaProblem3D._fields
        }
    )

    def solve_fn(problem, huber_scale):
        return spa_solver_3d.solve_3d.__wrapped__(
            problem, huber_scale, max_iterations, cg_iterations
        )

    return jax.jit(
        solve_fn,
        in_shardings=(problem_shardings, rep),
        out_shardings=(rep,) * 7,
    )
