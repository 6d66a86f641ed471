"""Ray-cast range-data insertion into 2D probability grids (device).

Reference behavior: mapping/2d/probability_grid_range_data_inserter_2d.cc:
33-133 — per scan, each hit cell gets one odds(hit) update; every cell
crossed by a ray from the origin to a hit (or to a missing-echo endpoint)
gets one odds(miss) update; hits take priority over misses in the same cell;
the update marker guarantees at most one update per cell per scan.

TPU-native formulation: instead of sequential subpixel Bresenham
(internal/2d/ray_to_pixel_mask.cc), build per-scan boolean hit/miss masks
with vectorized scatter and apply a single clipped log-odds addition per
cell. Rays are sampled at <= resolution/2 spacing (uniform samples along each
segment, deduplicated by the scatter), which visits every cell the ray
passes through except rare corner-clip cases whose miss update (|log odds|
~0.04) is negligible.

All coordinates here are *fractional cell units* — callers convert world
points with grid_2d.world_to_cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cartographer_tpu.mapping import probability_values as pv


@functools.partial(jax.jit, static_argnames=("num_steps", "insert_free_space"))
def insert_scan(
    log_odds: jax.Array,  # f32 [H, W]
    known: jax.Array,  # bool [H, W]
    origin_cell: jax.Array,  # f32 [2] (cx, cy)
    ends_cell: jax.Array,  # f32 [N, 2] hit + missing-echo endpoints
    is_hit: jax.Array,  # bool [N]
    valid: jax.Array,  # bool [N] padding mask
    hit_log_odds: float,
    miss_log_odds: float,
    num_steps: int,
    insert_free_space: bool = True,
):
    """One range-data insertion; returns (log_odds', known')."""
    h, w = log_odds.shape

    end_ix = jnp.floor(ends_cell[:, 0]).astype(jnp.int32)
    end_iy = jnp.floor(ends_cell[:, 1]).astype(jnp.int32)
    in_bounds = (end_ix >= 0) & (end_ix < w) & (end_iy >= 0) & (end_iy < h)

    # Hit mask: one per hit endpoint.
    hit_sel = valid & is_hit & in_bounds
    hit_grid = jnp.zeros((h, w), bool)
    hit_grid = hit_grid.at[
        jnp.where(hit_sel, end_iy, h), jnp.where(hit_sel, end_ix, w)
    ].set(True, mode="drop")

    if insert_free_space:
        # Miss mask: EXACT supercover of every cell each ray passes through
        # (parity with the reference's subpixel Bresenham,
        # internal/2d/ray_to_pixel_mask.cc). Every visited cell other than
        # the start cell is entered through an integer x- or y-boundary, so
        # scattering the two cells adjacent to every boundary crossing
        # (plus the start and end cells) covers the path exactly.
        delta = ends_cell - origin_cell[None, :]  # [N, 2]
        miss_grid = jnp.zeros((h, w), bool)

        def crossings(axis):
            """Cells adjacent to integer crossings along `axis`."""
            o = origin_cell[axis]
            d = delta[:, axis]  # [N]
            o_other = origin_cell[1 - axis]
            d_other = delta[:, 1 - axis]
            step = jnp.where(d >= 0, 1.0, -1.0)
            first = jnp.where(
                d >= 0, jnp.floor(o) + 1.0, jnp.ceil(o) - 1.0
            )
            ks = first[:, None] + step[:, None] * jnp.arange(
                num_steps, dtype=jnp.float32
            )[None, :]  # [N, S] boundary coordinates
            safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
            ts = (ks - o) / safe_d[:, None]
            t_valid = (ts > 0.0) & (ts <= 1.0) & (jnp.abs(d) > 1e-9)[:, None]
            other = o_other + ts * d_other[:, None]
            fo = jnp.floor(other).astype(jnp.int32)
            ki = ks.astype(jnp.int32)
            # Two cells adjacent to the boundary: coordinates k-1 and k
            # along `axis` (for negative direction: k and k-1 swapped —
            # same set).
            cells_a = (ki - 1, fo) if axis == 0 else (fo, ki - 1)
            cells_b = (ki, fo) if axis == 0 else (fo, ki)
            return cells_a, cells_b, t_valid

        def scatter(grid, cx, cy, sel):
            s = sel & (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
            return grid.at[
                jnp.where(s, cy, h), jnp.where(s, cx, w)
            ].set(True, mode="drop")

        for axis in (0, 1):
            (ax_, ay_), (bx_, by_), t_valid = crossings(axis)
            sel = t_valid & valid[:, None]
            miss_grid = scatter(miss_grid, ax_, ay_, sel)
            miss_grid = scatter(miss_grid, bx_, by_, sel)

        # Start cell (shared by all rays) and end cells.
        oix = jnp.floor(origin_cell[0]).astype(jnp.int32)
        oiy = jnp.floor(origin_cell[1]).astype(jnp.int32)
        o_in = (oix >= 0) & (oix < w) & (oiy >= 0) & (oiy < h)
        miss_grid = miss_grid.at[
            jnp.where(o_in, oiy, h), jnp.where(o_in, oix, w)
        ].set(True, mode="drop")
        end_sel = valid & in_bounds
        miss_grid = miss_grid.at[
            jnp.where(end_sel, end_iy, h), jnp.where(end_sel, end_ix, w)
        ].set(True, mode="drop")
        miss_grid = miss_grid & ~hit_grid
    else:
        miss_grid = jnp.zeros((h, w), bool)

    update = jnp.where(
        hit_grid, hit_log_odds, jnp.where(miss_grid, miss_log_odds, 0.0)
    )
    touched = hit_grid | miss_grid
    new_log_odds = jnp.where(
        touched,
        jnp.clip(log_odds + update, pv.MIN_LOG_ODDS, pv.MAX_LOG_ODDS),
        log_odds,
    )
    new_known = known | touched
    return new_log_odds, new_known


# Batched over leading submap axis (grids at different origins, same scan in
# local frame -> per-submap origin/end cell coordinates precomputed by caller).
insert_scan_batch = jax.jit(
    jax.vmap(
        insert_scan.__wrapped__,
        in_axes=(0, 0, 0, 0, None, None, None, None, None, None),
    ),
    static_argnums=(8, 9),
)


# -- bitmask rasterization (scatter-free) -------------------------------------
#
# TPU scatter serializes (~100 M updates/s) and the supercover above issues
# millions of scatter-sets per scan. This formulation computes the same cell
# set with zero scatters: for every (ray, grid row) pair the ray's supercover
# within that row is one contiguous COLUMN INTERVAL (the segment's t-span
# inside the row slab maps to [x_lo, x_hi]); each interval becomes packed
# 32-bit masks and an OR-reduction over rays yields the grid. Everything is
# dense VPU work on an [N, H, W/32] lattice — XLA fuses the mask generation
# into the reduction, so nothing big materializes.


def _or_reduce_rays(words: jax.Array) -> jax.Array:
    """OR-reduce a [N, H, NW] uint32 lattice over rays."""
    return jax.lax.reduce(
        words, jnp.uint32(0), jax.lax.bitwise_or, (0,)
    )


def _interval_words(x0, x1, rowvalid, num_words: int) -> jax.Array:
    """Packed column-interval masks.

    x0, x1: [N, H] int32 inclusive column range per (ray, row);
    rowvalid: [N, H] bool. Returns [H, NW] uint32 (OR over rays)."""
    word_base = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, num_words), 2) * 32
    )
    lo = jnp.clip(x0[:, :, None] - word_base, 0, 32)
    hi = jnp.clip(x1[:, :, None] + 1 - word_base, 0, 32)
    ones = jnp.uint32(0xFFFFFFFF)
    m_lo = jnp.where(lo >= 32, jnp.uint32(0), ones << lo.astype(jnp.uint32))
    m_hi = jnp.where(
        hi >= 32, ones, ~(ones << jnp.maximum(hi, 0).astype(jnp.uint32))
    )
    word = jnp.where(rowvalid[:, :, None] & (hi > lo), m_lo & m_hi, jnp.uint32(0))
    return _or_reduce_rays(word)


def _unpack_bits(words: jax.Array, width: int) -> jax.Array:
    """[H, NW] uint32 -> [H, NW*32] bool, cropped to width."""
    bits = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
    unpacked = (words[:, :, None] >> bits) & jnp.uint32(1)
    h = words.shape[0]
    return unpacked.reshape(h, -1)[:, :width].astype(bool)


@functools.partial(jax.jit, static_argnames=("insert_free_space",))
def insert_scan_dense(
    log_odds: jax.Array,  # f32 [H, W]
    known: jax.Array,  # bool [H, W]
    origin_cell: jax.Array,  # f32 [2] (cx, cy)
    ends_cell: jax.Array,  # f32 [N, 2]
    is_hit: jax.Array,  # bool [N]
    valid: jax.Array,  # bool [N]
    hit_log_odds: float,
    miss_log_odds: float,
    insert_free_space: bool = True,
):
    """insert_scan with the scatter-free bitmask rasterizer; same semantics
    (supercover free space, hits override misses, one update per cell per
    scan — probability_grid_range_data_inserter_2d.cc:52-96)."""
    h, w = log_odds.shape
    num_words = (w + 31) // 32
    y_iota = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)  # [1, H]

    end_ix = jnp.floor(ends_cell[:, 0]).astype(jnp.int32)
    end_iy = jnp.floor(ends_cell[:, 1]).astype(jnp.int32)
    in_bounds = (end_ix >= 0) & (end_ix < w) & (end_iy >= 0) & (end_iy < h)

    hit_sel = valid & is_hit & in_bounds
    hit_words = _interval_words(
        jnp.broadcast_to(end_ix[:, None], (end_ix.shape[0], h)),
        jnp.broadcast_to(end_ix[:, None], (end_ix.shape[0], h)),
        hit_sel[:, None] & (y_iota == end_iy[:, None]),
        num_words,
    )
    hit_grid = _unpack_bits(hit_words, w)

    if insert_free_space:
        ox, oy = origin_cell[0], origin_cell[1]
        dx = ends_cell[:, 0] - ox  # [N]
        dy = ends_cell[:, 1] - oy
        yf = y_iota.astype(jnp.float32)  # [1, H]
        # Segment ∩ row slab [y, y+1] in parameter t ∈ [0, 1].
        near_zero = jnp.abs(dy) < 1e-9
        safe_dy = jnp.where(near_zero, 1.0, dy)[:, None]
        ta = (yf - oy) / safe_dy
        tb = (yf + 1.0 - oy) / safe_dy
        t0 = jnp.minimum(ta, tb)
        t1 = jnp.maximum(ta, tb)
        # Horizontal rays live entirely in row floor(oy).
        oy_row = jnp.floor(oy).astype(jnp.int32)
        t0 = jnp.where(near_zero[:, None], jnp.where(y_iota == oy_row, 0.0, 2.0), t0)
        t1 = jnp.where(near_zero[:, None], jnp.where(y_iota == oy_row, 1.0, -1.0), t1)
        t0 = jnp.maximum(t0, 0.0)
        t1 = jnp.minimum(t1, 1.0)
        rowvalid = (t1 >= t0) & valid[:, None]
        xa = ox + t0 * dx[:, None]
        xb = ox + t1 * dx[:, None]
        x0 = jnp.floor(jnp.minimum(xa, xb)).astype(jnp.int32)
        x1 = jnp.floor(jnp.maximum(xa, xb)).astype(jnp.int32)
        rowvalid = rowvalid & (x1 >= 0) & (x0 < w)
        x0 = jnp.maximum(x0, 0)
        x1 = jnp.minimum(x1, w - 1)
        miss_words = _interval_words(x0, x1, rowvalid, num_words)
        miss_grid = _unpack_bits(miss_words, w) & ~hit_grid
    else:
        miss_grid = jnp.zeros((h, w), bool)

    update = jnp.where(
        hit_grid, hit_log_odds, jnp.where(miss_grid, miss_log_odds, 0.0)
    )
    touched = hit_grid | miss_grid
    new_log_odds = jnp.where(
        touched,
        jnp.clip(log_odds + update, pv.MIN_LOG_ODDS, pv.MAX_LOG_ODDS),
        log_odds,
    )
    new_known = known | touched
    return new_log_odds, new_known
