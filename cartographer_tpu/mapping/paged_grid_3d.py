"""Block-sparse (paged) 3D occupancy grids: fixed block pool + dense
block table, the TPU-native replacement for the reference's pointer-tree
HybridGrid (mapping/3d/hybrid_grid.h:66-545, a 3-level sparse voxel tree
with grow-by-doubling and ±8192-cell extent).

Representation (SURVEY §7.4's "fixed block pool" design):

* The virtual extent is V = table_size * 2^block_bits cells per axis,
  centered on the submap origin (e.g. 64 * 16 = 1024 cells = ±51.2 m at
  10 cm — beyond any reference-default submap, configurable higher).
* `table` is a dense int32 [T^3] array mapping block coordinates to pool
  slots (-1 = unallocated). Dense-but-small beats a device hash table:
  the lookup is ONE gather with no probing, and at T=64 the table costs
  1 MB vs 16+ MB for the volume it replaces.
* `pool` is an int8 [P, B^3] array of cell blocks (value semantics
  identical to hybrid_grid.Grid3D: 0 = unknown, v = log-odds
  v * LOG_ODDS_SCALE).
* Blocks are allocated inside the jitted insert by flagging touched
  blocks in table space and ranking new ones with one cumsum over the
  1 MB table; exhausting the pool or leaving the virtual extent DROPS
  the write and counts it in `dropped` (the reference would grow; here
  the failure is observable instead of silent).

Reads are a two-gather chain (table then pool). Writes scatter int8
deltas into a pool-shaped buffer (ordered scatters give hits priority
and set-semantics dedups to one update per cell per scan) followed by a
fused elementwise pass over the pool — the dense-path update pattern at
pool size instead of virtual-volume size, with no sorts.

At submap finish the paged grid converts to a dense `Grid3D` cropped to
the occupied block bounding box (`to_dense`), which is what the BnB
pyramid, constraint refinement, and serialization consume — mirroring
the reference, whose PrecomputationGrid3D also materializes dense
volumes bounded by the obstacle bounding box
(precomputation_grid_3d.cc:54-85).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.mapping.hybrid_grid import LOG_ODDS_SCALE, Grid3D

_I32_MAX = np.int32(2**31 - 1)


@struct.dataclass
class PagedGrid3D:
    """Paged int8 log-odds volume (a jax pytree; geometry is static)."""

    table: jax.Array  # i32 [T^3] flat block table; -1 = unallocated
    pool: jax.Array  # i8 [P, B^3] flat blocks
    num_blocks: jax.Array  # i32 allocated block count
    dropped: jax.Array  # i32 writes dropped (pool full / outside extent)
    origin: jax.Array  # f32 [3] world coords such that cell = round((p-origin)/res)
    resolution: float = struct.field(pytree_node=False)
    block_bits: int = struct.field(pytree_node=False, default=4)
    table_size: int = struct.field(pytree_node=False, default=64)

    @property
    def block_edge(self) -> int:
        return 1 << self.block_bits

    @property
    def virtual_size(self) -> int:
        """Cells per axis of the virtual extent."""
        return self.table_size << self.block_bits

    @property
    def pool_blocks(self) -> int:
        return self.pool.shape[0]

    # Grid3D-compatible surface used by generic code paths.
    @property
    def shape(self):
        v = self.virtual_size
        return (v, v, v)


def make_paged_grid_3d(
    center_xyz,
    resolution: float,
    block_bits: int = 4,
    table_size: int = 64,
    pool_blocks: int = 4096,
) -> PagedGrid3D:
    center = jnp.asarray(center_xyz, dtype=jnp.float32)
    half = 0.5 * (table_size << block_bits) * resolution
    b3 = 1 << (3 * block_bits)
    return PagedGrid3D(
        table=jnp.full((table_size**3,), -1, jnp.int32),
        pool=jnp.zeros((pool_blocks, b3), jnp.int8),
        num_blocks=jnp.int32(0),
        dropped=jnp.int32(0),
        origin=center - half,
        resolution=resolution,
        block_bits=block_bits,
        table_size=table_size,
    )


def cell_key(grid: PagedGrid3D, cells: jax.Array) -> jax.Array:
    """Block-major flat key of integer cells [..., 3] (x, y, z): sorting
    by it groups cells of the same block contiguously. Caller masks cells
    outside [0, V)^3."""
    bits = grid.block_bits
    b_edge = grid.block_edge
    t = grid.table_size
    b = cells >> bits
    o = cells & (b_edge - 1)
    bf = (b[..., 2] * t + b[..., 1]) * t + b[..., 0]
    of = (o[..., 2] * b_edge + o[..., 1]) * b_edge + o[..., 0]
    return bf * (b_edge**3) + of


def gather_values(grid: PagedGrid3D, zi, yi, xi) -> jax.Array:
    """int8 cell values at integer coords; out-of-extent or unallocated
    reads return 0 (unknown)."""
    v = grid.virtual_size
    t = grid.table_size
    bits = grid.block_bits
    b_edge = grid.block_edge
    oob = (xi < 0) | (xi >= v) | (yi < 0) | (yi >= v) | (zi < 0) | (zi >= v)
    cx = jnp.clip(xi, 0, v - 1)
    cy = jnp.clip(yi, 0, v - 1)
    cz = jnp.clip(zi, 0, v - 1)
    bf = ((cz >> bits) * t + (cy >> bits)) * t + (cx >> bits)
    of = (
        (cz & (b_edge - 1)) * b_edge + (cy & (b_edge - 1))
    ) * b_edge + (cx & (b_edge - 1))
    slot = grid.table[bf]
    pool_flat = grid.pool.reshape(-1)
    vidx = jnp.clip(slot, 0, grid.pool_blocks - 1) * (b_edge**3) + of
    vals = pool_flat[vidx]
    return jnp.where(oob | (slot < 0), jnp.int8(0), vals)


def gather_probability(vol, zi, yi, xi) -> jax.Array:
    """Probability at integer cells with OOB/unknown -> MIN_PROBABILITY.
    `vol` may be a dense f32 probability volume, a dense int8 log-odds
    volume (Grid3D.values), or a PagedGrid3D — the one grid-read helper
    every 3D matcher shares."""
    if isinstance(vol, PagedGrid3D):
        vals = gather_values(vol, zi, yi, xi)
        l = vals.astype(jnp.float32) * LOG_ODDS_SCALE
        return jnp.where(
            vals != 0, 1.0 / (1.0 + jnp.exp(-l)), pv.MIN_PROBABILITY
        )
    d, h, w = vol.shape
    oob = (xi < 0) | (xi >= w) | (yi < 0) | (yi >= h) | (zi < 0) | (zi >= d)
    vals = vol[
        jnp.clip(zi, 0, d - 1), jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)
    ]
    if vol.dtype == jnp.int8:
        l = vals.astype(jnp.float32) * LOG_ODDS_SCALE
        vals = jnp.where(
            vals != 0, 1.0 / (1.0 + jnp.exp(-l)), pv.MIN_PROBABILITY
        )
    return jnp.where(oob, pv.MIN_PROBABILITY, vals)


def insert_cells_paged(
    table: jax.Array,  # i32 [T^3]
    pool: jax.Array,  # i8 [P, B^3]
    num_blocks: jax.Array,  # i32
    dropped: jax.Array,  # i32
    origin_cell: jax.Array,  # i32 [3]
    hit_cells: jax.Array,  # i32 [N, 3]
    valid: jax.Array,  # bool [N]
    hit_delta,
    miss_delta,
    num_free_space_voxels: int,
    *,
    block_bits: int,
    table_size: int,
):
    """Raw-array core of insert_scan_3d_paged (vmappable across slot/grid
    lanes — hit_delta/miss_delta may be traced per-lane scalars). Sort-free:
    block allocation = scatter-min leader election in table space + a cumsum
    over the M touched cells; cell updates = two ordered sparse scatters on
    the pool (duplicates of the same type write identical values, so
    scatter-set is exact one-update-per-cell dedup with hits winning shared
    cells). Returns (table, pool, num_blocks, dropped)."""
    b_edge = 1 << block_bits
    b3 = b_edge**3
    v = table_size << block_bits
    t = table_size
    t3 = table.shape[0]
    p_blocks = pool.shape[0]
    n = hit_cells.shape[0]
    k = num_free_space_voxels

    # Bounded free-space samples (reference integer formula).
    delta = hit_cells - origin_cell[None, :]
    num_samples = jnp.max(jnp.abs(delta), axis=-1)  # [N]
    ks = jnp.arange(k)
    position = jnp.maximum(0, num_samples[:, None] - k) + ks[None, :]
    pos_valid = (position < num_samples[:, None]) & valid[:, None]
    safe_n = jnp.maximum(num_samples, 1)[:, None, None]
    num = delta[:, None, :] * position[:, :, None]
    quot = jnp.sign(num) * (jnp.abs(num) // safe_n)
    miss_cells = origin_cell[None, None, :] + quot  # [N, K, 3]

    cells = jnp.concatenate([hit_cells, miss_cells.reshape(-1, 3)], axis=0)
    is_hit = jnp.concatenate(
        [jnp.ones(n, bool), jnp.zeros(n * k, bool)]
    )
    sel_base = jnp.concatenate([valid, pos_valid.reshape(-1)])
    in_extent = jnp.all((cells >= 0) & (cells < v), axis=-1)
    sel = sel_base & in_extent
    oob_dropped = jnp.sum(sel_base & ~in_extent)

    bits = block_bits
    b = cells >> bits
    o = cells & (b_edge - 1)
    bf = (b[:, 2] * t + b[:, 1]) * t + b[:, 0]  # [M] block index
    of = (o[:, 2] * b_edge + o[:, 1]) * b_edge + o[:, 0]  # [M] in-block
    bf_c = jnp.clip(bf, 0, t3 - 1)

    # Allocate: elect one leader cell per first-seen unallocated block
    # (scatter-min of cell positions into table space), rank leaders with
    # a cumsum over the M touched cells (cheap — table-space cumsums cost
    # ~0.3 ms each on TPU), scatter the new slots sparsely.
    m_cells = cells.shape[0]
    iota = jnp.arange(m_cells, dtype=jnp.int32)
    unalloc = sel & (table[bf_c] < 0)
    first_buf = (
        jnp.full(t3, m_cells, jnp.int32)
        .at[jnp.where(unalloc, bf, t3)]
        .min(iota, mode="drop")
    )
    leader = unalloc & (first_buf[bf_c] == iota)
    rank = jnp.cumsum(leader.astype(jnp.int32)) - 1
    new_slot = num_blocks + rank
    ok_alloc = leader & (new_slot < p_blocks)
    table = table.at[jnp.where(ok_alloc, bf, t3)].set(new_slot, mode="drop")
    num_blocks = jnp.minimum(
        num_blocks + jnp.sum(leader.astype(jnp.int32)), p_blocks
    )

    # Update: every duplicate of a cell with the same type computes the
    # SAME value old + delta (old read from the pre-scan pool), so plain
    # scatter-set is exact one-update-per-cell dedup; scattering misses
    # first and hits second makes hits win shared cells (sequential
    # scatters are ordered). O(touched) gather/scatter traffic — no sort
    # (costs ~ms/scan inside the frontend's lax.scan) and no pool-wide
    # temporaries.
    slot = table[bf_c]
    ok_cell = sel & (slot >= 0)
    pool_dropped = jnp.sum(sel & (slot < 0))
    sidx = jnp.clip(slot, 0, p_blocks - 1)
    old = pool[sidx, of].astype(jnp.int16)  # pre-scan values [M]
    dv = jnp.where(
        is_hit, jnp.int16(hit_delta), jnp.int16(miss_delta)
    ) * jnp.ones((), jnp.int16)
    new = jnp.clip(old + dv, -127, 127)
    # Keep the unknown sentinel unambiguous: a touched voxel never lands
    # on 0 (hybrid_grid.py semantics).
    new = jnp.where(new == 0, jnp.where(dv > 0, 1, -1), new).astype(jnp.int8)
    drop_s = jnp.full_like(sidx, p_blocks)
    pool = (
        pool
        .at[jnp.where(ok_cell & ~is_hit, sidx, drop_s), of]
        .set(jnp.where(is_hit, jnp.int8(0), new), mode="drop")
        .at[jnp.where(ok_cell & is_hit, sidx, drop_s), of]
        .set(jnp.where(is_hit, new, jnp.int8(0)), mode="drop")
    )
    return table, pool, num_blocks, dropped + oob_dropped + pool_dropped


@functools.partial(jax.jit, static_argnames=("num_free_space_voxels",))
def insert_scan_3d_paged(
    grid: PagedGrid3D,
    origin_cell: jax.Array,  # i32 [3] sensor origin cell
    hit_cells: jax.Array,  # i32 [N, 3]
    valid: jax.Array,  # bool [N]
    hit_delta: int,
    miss_delta: int,
    num_free_space_voxels: int,
) -> PagedGrid3D:
    """Same semantics as raycast_3d.insert_scan_3d (bounded free space,
    hit priority, one update per voxel per scan —
    range_data_inserter_3d.cc:27-116), with block allocation on demand
    (see insert_cells_paged and the module docstring)."""
    table, pool, num_blocks, dropped = insert_cells_paged(
        grid.table,
        grid.pool,
        grid.num_blocks,
        grid.dropped,
        origin_cell,
        hit_cells,
        valid,
        hit_delta,
        miss_delta,
        num_free_space_voxels,
        block_bits=grid.block_bits,
        table_size=grid.table_size,
    )
    return grid.replace(
        table=table, pool=pool, num_blocks=num_blocks, dropped=dropped
    )


def to_dense(grid: PagedGrid3D) -> Grid3D:
    """Materialize a dense Grid3D cropped to the occupied block bounding
    box (host-side; called when a submap finishes or serializes)."""
    t = grid.table_size
    b = grid.block_edge
    table = np.asarray(grid.table).reshape(t, t, t)  # [bz, by, bx]
    occ = np.argwhere(table >= 0)
    if len(occ) == 0:
        return Grid3D(
            values=jnp.zeros((b, b, b), jnp.int8),
            origin=grid.origin,
            resolution=grid.resolution,
        )
    lo = occ.min(axis=0)
    hi = occ.max(axis=0) + 1
    shape = (hi - lo) * b
    dense = np.zeros(tuple(shape), np.int8)
    pool = np.asarray(grid.pool)
    for bz, by, bx in occ:
        slot = table[bz, by, bx]
        dense[
            (bz - lo[0]) * b: (bz - lo[0] + 1) * b,
            (by - lo[1]) * b: (by - lo[1] + 1) * b,
            (bx - lo[2]) * b: (bx - lo[2] + 1) * b,
        ] = pool[slot].reshape(b, b, b)
    # origin shifts by the cropped min corner ((x, y, z) = reversed block
    # coords; cell = round((p - origin)/res) convention is preserved).
    origin = np.asarray(grid.origin) + (
        np.array([lo[2], lo[1], lo[0]], np.float64) * b * grid.resolution
    )
    return Grid3D(
        values=jnp.asarray(dense),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=grid.resolution,
    )


def as_dense(grid) -> Grid3D:
    """Grid3D passthrough / PagedGrid3D conversion."""
    if isinstance(grid, PagedGrid3D):
        return to_dense(grid)
    return grid
