"""TSDF range-data insertion (device).

Reference: mapping/internal/2d/tsdf_range_data_inserter_2d.cc:100-245. Per
hit: update cells along the ray within the +-truncation band around the hit
(or the full ray when update_free_space); the signed distance is range -
distance(cell, origin), or projected onto the estimated scan normal; update
weight combines range, normal-to-ray-angle and distance-to-hit Gaussian
kernels; cells take at most one update per scan — the FIRST hit ray (in
bearing-sorted order) wins (CellIsUpdated).

Vectorized: samples along each ray band are generated in closed form; the
first-ray-wins dedup is a scatter-min of the hit index followed by a gather
compare; then one weighted-average update per cell. Updates are
    tsd' = (tsd * w + d * uw) / (w + uw),  w' = min(w + uw, max_weight)
exactly as UpdateCell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_steps",
        "update_free_space",
        "range_exponent",
        "angle_bandwidth",
        "distance_bandwidth",
    ),
)
def insert_scan_tsdf(
    tsd: jax.Array,  # f32 [H, W]
    weight: jax.Array,  # f32 [H, W]
    origin_cell: jax.Array,  # f32 [2] fractional cell coords of origin
    hits_cell: jax.Array,  # f32 [N, 2] fractional cell coords of hits
    normals: jax.Array,  # f32 [N] normal angles (world frame)
    valid: jax.Array,  # bool [N]
    ranges: jax.Array,  # f32 [N] metric range per hit
    resolution: float,
    truncation_distance: float,
    max_weight: float,
    angle_bandwidth: float,
    distance_bandwidth: float,
    range_exponent: int,
    num_steps: int,
    update_free_space: bool = False,
):
    h, w = tsd.shape
    trunc_cells = truncation_distance / resolution

    delta = hits_cell - origin_cell[None, :]  # cells
    ray_len = jnp.linalg.norm(delta, axis=-1)  # cells
    direction = delta / jnp.maximum(ray_len, 1e-6)[:, None]
    valid = valid & (ranges >= truncation_distance)

    # Sample parameters along the ray in cell units: from band start to
    # range + truncation (half-cell spacing like the probability inserter).
    if update_free_space:
        start = jnp.zeros_like(ray_len)
    else:
        start = ray_len - trunc_cells
    end = ray_len + trunc_cells
    ts = jnp.linspace(0.0, 1.0, num_steps)[None, :]  # [1, S]
    s_param = start[:, None] + ts * (end - start)[:, None]  # [N, S] in cells
    samples = origin_cell[None, None, :] + s_param[..., None] * direction[:, None, :]
    six = jnp.floor(samples[..., 0]).astype(jnp.int32)
    siy = jnp.floor(samples[..., 1]).astype(jnp.int32)
    s_in = (six >= 0) & (six < w) & (siy >= 0) & (siy < h) & valid[:, None]

    # First-ray-wins dedup (CellIsUpdated): scatter-min of hit index.
    n = hits_cell.shape[0]
    hit_idx = jax.lax.broadcasted_iota(jnp.int32, (n, num_steps), 0)
    owner = jnp.full((h, w), n, jnp.int32)
    owner = owner.at[
        jnp.where(s_in, siy, h), jnp.where(s_in, six, w)
    ].min(hit_idx, mode="drop")
    mine = s_in & (owner[jnp.clip(siy, 0, h - 1), jnp.clip(six, 0, w - 1)] == hit_idx)

    # Signed distance per sample.
    cell_center = jnp.floor(samples) + 0.5  # cell units
    dist_cell_origin = (
        jnp.linalg.norm(cell_center - origin_cell[None, None, :], axis=-1)
        * resolution
    )
    update_tsd_ray = ranges[:, None] - dist_cell_origin
    # Projection onto the scan normal (project_sdf_distance_to_scan_normal).
    normal_vec = jnp.stack([jnp.cos(normals), jnp.sin(normals)], axis=-1)
    to_hit = (cell_center - hits_cell[:, None, :]) * resolution
    update_tsd_normal = jnp.sum(to_hit * normal_vec[:, None, :], axis=-1)
    use_normal = ~jnp.isnan(normals)
    update_tsd = jnp.where(
        use_normal[:, None], update_tsd_normal, update_tsd_ray
    )
    update_tsd = jnp.clip(update_tsd, -truncation_distance, truncation_distance)

    # Weight kernels.
    ranges_m = ranges
    if range_exponent != 0:
        weight_range = (truncation_distance ** range_exponent) / jnp.maximum(
            ranges_m ** range_exponent, 1e-6
        )
    else:
        weight_range = jnp.ones_like(ranges_m)
    if angle_bandwidth != 0.0:
        ray_angle = jnp.arctan2(-direction[:, 1], -direction[:, 0])
        d_angle = normals - ray_angle
        d_angle = d_angle - 2.0 * jnp.pi * jnp.ceil((d_angle - jnp.pi) / (2.0 * jnp.pi))
        weight_angle = jnp.exp(-0.5 * jnp.square(d_angle / angle_bandwidth))
        weight_angle = jnp.where(use_normal, weight_angle, 1.0)
    else:
        weight_angle = jnp.ones_like(ranges_m)
    uw = (weight_range * weight_angle)[:, None] * jnp.ones((1, num_steps))
    if distance_bandwidth != 0.0:
        uw = uw * jnp.exp(-0.5 * jnp.square(update_tsd / distance_bandwidth))

    uw = jnp.where(mine, uw, 0.0)

    # One update per cell: accumulate (duplicate samples of the SAME ray in
    # one cell average together, matching the once-per-cell semantics since
    # their tsd values are near-identical at half-cell spacing).
    yi = jnp.where(mine, siy, h)
    xi = jnp.where(mine, six, w)
    sum_w = jnp.zeros((h, w), jnp.float32).at[yi, xi].add(uw, mode="drop")
    sum_wd = (
        jnp.zeros((h, w), jnp.float32).at[yi, xi].add(uw * update_tsd, mode="drop")
    )
    count = jnp.zeros((h, w), jnp.float32).at[yi, xi].add(
        jnp.where(mine, 1.0, 0.0), mode="drop"
    )
    # Mean update of the owning ray's samples in this cell.
    upd_w = jnp.where(count > 0, sum_w / jnp.maximum(count, 1.0), 0.0)
    upd_d = jnp.where(sum_w > 0, sum_wd / jnp.maximum(sum_w, 1e-12), 0.0)

    new_weight_raw = weight + upd_w
    new_tsd = jnp.where(
        upd_w > 0,
        (tsd * weight + upd_d * upd_w) / jnp.maximum(new_weight_raw, 1e-12),
        tsd,
    )
    new_weight = jnp.minimum(new_weight_raw, max_weight)
    return new_tsd, new_weight
