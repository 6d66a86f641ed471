"""Mesh placement/fetch primitives shared by the production sharded paths.

Kept free of any cartographer_tpu.ops imports so ops modules (the batched
BnB search, the SPA solvers) can use these helpers without an import cycle
through parallel.sharded.

The reference distributes work with a ThreadPool fan-out and a single
pose-graph server (constraint_builder_2d.cc:102-136,
cloud/internal/map_builder_server.h:77-146); here the same workloads run
as SPMD programs over a jax.sharding.Mesh: batch/table axes sharded over
the worker axis, pose vectors and grids replicated, XLA inserting the ICI
collectives. These helpers make that work both single-controller (one
process owns every device — jax.device_put suffices) and multi-controller
(each process owns a slice of the mesh — arrays are assembled from
replicated host data via make_array_from_callback, and results gathered
with process_allgather).
"""

from __future__ import annotations

import numpy as np

WORKER_AXIS = "workers"


def make_mesh(n_devices=None, devices=None):
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (WORKER_AXIS,))


def batch_sharding(mesh):
    """Leading axis split over the worker axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(WORKER_AXIS))


def replicated_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def pad_to_mesh(n: int, mesh, minimum: int = 8) -> int:
    """Smallest power-of-two >= max(n, minimum, mesh size). Power-of-two
    meshes (the only kind we build) always divide the result, so sharded
    table axes never need remainder handling."""
    size = 1 if mesh is None else mesh.devices.size
    v = max(minimum, 1)
    target = max(n, size, 1)
    while v < target:
        v *= 2
    return v


def put(array, sharding):
    """Place an array (host or single-device) onto a mesh sharding.

    Multi-controller meshes are not fully addressable from one process;
    there every process holds the same host values (the pose graph is
    replicated host state driven by identical inputs), so each process
    fills in its local shards from its own copy."""
    import jax

    if sharding.is_fully_addressable:
        return jax.device_put(array, sharding)
    host = np.asarray(array)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def fetch(array) -> np.ndarray:
    """Bring a (possibly cross-process sharded) device array to the host."""
    if getattr(array, "is_fully_addressable", True):
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))


def shard_namedtuple(mesh, value, sharded_fields):
    """Shard the named fields of a NamedTuple of arrays on their leading
    axis; replicate the rest (pose tables, flags, scalars)."""
    cand = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    return type(value)(
        **{
            f: put(getattr(value, f), cand if f in sharded_fields else rep)
            for f in value._fields
        }
    )
