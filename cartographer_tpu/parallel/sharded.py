"""Multi-chip sharding for the two scalable workloads.

The reference scales by threads (ThreadPool constraint search) and a single
gRPC server for the shared pose graph (SURVEY.md section 2.10). The TPU
equivalents:

* Loop-closure candidate scoring — embarrassingly parallel over candidates:
  shard the candidate axis over the mesh; each device gathers against a
  replicated submap pyramid level.
* SPA solve — residual tables sharded over the mesh, pose vectors
  replicated; J^T J products reduce across devices (XLA inserts the psums
  from the sharding annotations).

Both are expressed as shardings over the same kernels used single-chip; XLA
partitions them (ICI collectives inside a slice, DCN across hosts under
multi-controller jax.distributed).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartographer_tpu.ops import spa_solver
from cartographer_tpu.ops.scan_matching import fast_correlative_2d

WORKER_AXIS = "workers"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (WORKER_AXIS,))


def shard_candidates(mesh: Mesh):
    return NamedSharding(mesh, P(WORKER_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


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
        submap_poses=rep,
        node_poses=rep,
        free_submap=rep,
        free_node=rep,
        c_submap=cand,
        c_node=cand,
        c_z=cand,
        c_weight=cand,
        c_huber=cand,
        c_mask=cand,
        n_a=cand,
        n_b=cand,
        n_z=cand,
        n_weight=cand,
        n_mask=cand,
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
