"""Multi-host (multi-controller) deployment glue.

The reference's distribution story is one gRPC server holding the pose
graph with robot clients (SURVEY.md §2.10). The TPU-native equivalent is
single-program multi-controller JAX: every host runs this same program,
`jax.distributed` connects them, and the two scalable workloads — batched
loop-closure candidate scoring and the SPA solve — are sharded over the
GLOBAL mesh (ICI inside each slice, DCN between hosts), using the exact
same sharded kernels as single-host (parallel/sharded.py). Host-local
sensor ingestion (the reference's BlockingQueue / gRPC handlers) stays on
each host's CPU; only globally-sharded arrays cross hosts.

Topology:
  host 0..H-1: local frontends (one per robot/bag shard) -> per-host node
  and submap batches -> global constraint search + SPA sharded over all
  devices of all hosts.

This module is exercised single-process in CI (jax.distributed is not
initialized when num_processes == 1); the driver's dryrun validates the
sharded compile path on a virtual mesh. On a real multi-host slice run
`tools/multihost_worker.py` on every host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from cartographer_tpu.parallel import sharded


@dataclasses.dataclass
class MultihostContext:
    process_id: int
    num_processes: int
    mesh: "jax.sharding.Mesh"

    @property
    def is_coordinator(self) -> bool:
        return self.process_id == 0


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> MultihostContext:
    """Connect this host into a multi-controller run and build the global
    mesh. With no arguments (or num_processes in (None, 1)) this is a
    single-process setup — no distributed runtime is started, matching CI
    and the single-chip environment."""
    if coordinator_address is not None and (num_processes or 1) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    mesh = sharded.make_mesh(devices=jax.devices())
    return MultihostContext(
        process_id=jax.process_index(),
        num_processes=jax.process_count(),
        mesh=mesh,
    )


def make_global_batch(ctx: MultihostContext, per_host_rows: np.ndarray):
    """Assemble a globally-sharded array from this host's rows
    (jax.make_array_from_process_local_data): each host contributes its
    local candidates/residual rows; the result is one logical array
    sharded over the global mesh for the sharded kernels."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(ctx.mesh, P(sharded.WORKER_AXIS))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(per_host_rows)
    )


def make_global_sharded(ctx: MultihostContext, value: np.ndarray):
    """Build a worker-axis-sharded global array from a GLOBAL value every
    process holds identically (jax.make_array_from_callback: each process
    materializes only its addressable shards). Multi-process jit rejects
    numpy inputs with non-trivial shardings — this is the sanctioned
    conversion."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    value = np.asarray(value)
    sharding = NamedSharding(ctx.mesh, P(sharded.WORKER_AXIS))
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def scaling_report(ctx: MultihostContext, work_items: int, seconds: float) -> dict:
    """Per-run scaling record (items/sec/device); aggregated across rounds
    by the caller to compute scaling efficiency vs a single-chip run."""
    n_dev = len(ctx.mesh.devices.reshape(-1))
    return {
        "process_id": ctx.process_id,
        "num_processes": ctx.num_processes,
        "num_devices": n_dev,
        "items_per_sec": work_items / max(seconds, 1e-9),
        "items_per_sec_per_device": work_items / max(seconds, 1e-9) / n_dev,
    }
