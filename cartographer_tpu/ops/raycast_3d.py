"""3D range-data insertion (device).

Reference: mapping/3d/range_data_inserter_3d.cc:27-116 — every hit voxel gets
one odds(hit) update; only the last `num_free_space_voxels` voxels before
each hit along the ray get odds(miss) updates (bounded free-space carving);
hits take priority; one update per voxel per scan.

Vectorized: hit cells and the K=num_free_space_voxels miss samples per ray
are computed in closed form (miss_cell = origin_cell + delta * position /
num_samples, exactly the reference's integer formula), scattered into
boolean masks, then one clipped int8 add per touched voxel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_free_space_voxels",))
def insert_scan_3d(
    values: jax.Array,  # i8 [D, H, W]
    origin_cell: jax.Array,  # i32 [3] (x, y, z) cell of the sensor origin
    hit_cells: jax.Array,  # i32 [N, 3] (x, y, z)
    valid: jax.Array,  # bool [N]
    hit_delta: int,  # int8 log-odds delta (quantized)
    miss_delta: int,
    num_free_space_voxels: int,
):
    d, h, w = values.shape

    def in_bounds(c):
        return (
            (c[..., 0] >= 0)
            & (c[..., 0] < w)
            & (c[..., 1] >= 0)
            & (c[..., 1] < h)
            & (c[..., 2] >= 0)
            & (c[..., 2] < d)
        )

    def scatter_mask(cells, sel):
        mask = jnp.zeros((d, h, w), bool)
        zi = jnp.where(sel, cells[..., 2], d)
        yi = jnp.where(sel, cells[..., 1], h)
        xi = jnp.where(sel, cells[..., 0], w)
        return mask.at[zi, yi, xi].set(True, mode="drop")

    hit_sel = valid & in_bounds(hit_cells)
    hit_mask = scatter_mask(hit_cells, hit_sel)

    # Misses: positions max(0, n-k)..n-1 along each ray, n = Chebyshev length.
    delta = hit_cells - origin_cell[None, :]
    num_samples = jnp.max(jnp.abs(delta), axis=-1)  # [N]
    ks = jnp.arange(num_free_space_voxels)  # [K]
    position = jnp.maximum(0, num_samples[:, None] - num_free_space_voxels) + ks[None, :]
    pos_valid = (position < num_samples[:, None]) & valid[:, None]
    safe_n = jnp.maximum(num_samples, 1)[:, None, None]
    num = delta[:, None, :] * position[:, :, None]
    # C++ integer division truncates toward zero (reference formula).
    quot = jnp.sign(num) * (jnp.abs(num) // safe_n)
    miss_cells = origin_cell[None, None, :] + quot  # [N, K, 3]
    miss_sel = pos_valid & in_bounds(miss_cells)
    miss_mask = scatter_mask(miss_cells, miss_sel) & ~hit_mask

    update = jnp.where(
        hit_mask,
        jnp.int32(hit_delta),
        jnp.where(miss_mask, jnp.int32(miss_delta), 0),
    )
    new_values = jnp.clip(values.astype(jnp.int32) + update, -127, 127)
    # Keep the unknown sentinel unambiguous: a touched voxel never lands on 0.
    touched = hit_mask | miss_mask
    new_values = jnp.where(
        touched & (new_values == 0),
        jnp.where(update > 0, 1, -1),
        new_values,
    )
    return new_values.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=())
def insert_intensities_3d(
    intensity_sum: jax.Array,  # f32 [D, H, W]
    intensity_count: jax.Array,  # f32 [D, H, W]
    hit_cells: jax.Array,  # i32 [N, 3]
    intensities: jax.Array,  # f32 [N]
    valid: jax.Array,  # bool [N]
):
    """Running-average intensity per voxel (IntensityHybridGrid.AddIntensity)."""
    d, h, w = intensity_sum.shape
    sel = (
        valid
        & (hit_cells[:, 0] >= 0)
        & (hit_cells[:, 0] < w)
        & (hit_cells[:, 1] >= 0)
        & (hit_cells[:, 1] < h)
        & (hit_cells[:, 2] >= 0)
        & (hit_cells[:, 2] < d)
    )
    zi = jnp.where(sel, hit_cells[:, 2], d)
    yi = jnp.where(sel, hit_cells[:, 1], h)
    xi = jnp.where(sel, hit_cells[:, 0], w)
    new_sum = intensity_sum.at[zi, yi, xi].add(
        jnp.where(sel, intensities, 0.0), mode="drop"
    )
    new_count = intensity_count.at[zi, yi, xi].add(
        jnp.where(sel, 1.0, 0.0), mode="drop"
    )
    return new_sum, new_count
