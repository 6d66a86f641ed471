"""Real-time correlative scan matching in 3D (device).

Reference: internal/3d/scan_matching/real_time_correlative_scan_matcher_3d.cc
— exhaustive search over (+-xyz voxel offsets) x (rotations about the z
axis), scoring mean grid probability with the same translation/rotation
penalty as 2D.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cartographer_tpu.mapping.paged_grid_3d import gather_probability


@functools.partial(jax.jit, static_argnames=("num_linear",))
def score_candidates_3d(
    prob: jax.Array,  # f32 [D, H, W] dense, int8 log-odds, or PagedGrid3D
    origin: jax.Array,  # f32 [3]
    points: jax.Array,  # f32 [N, 3] in the search frame (initial pose applied)
    point_mask: jax.Array,  # bool [N]
    angles: jax.Array,  # f32 [A]
    angle_mask: jax.Array,  # bool [A]
    init_translation: jax.Array,  # f32 [3]
    resolution: float,
    translation_delta_cost_weight: float,
    rotation_delta_cost_weight: float,
    num_linear: int,
):
    """Returns (scores [A, D3, D3, D3] flat argmax info)."""
    cos_a = jnp.cos(angles)[:, None]
    sin_a = jnp.sin(angles)[:, None]
    px, py, pz = points[:, 0][None, :], points[:, 1][None, :], points[:, 2][None, :]
    rx = cos_a * px - sin_a * py + init_translation[0]
    ry = sin_a * px + cos_a * py + init_translation[1]
    rz = jnp.broadcast_to(pz + init_translation[2], rx.shape)
    # Voxel centers at origin + idx * res: index = round((p - origin)/res).
    ix = jnp.floor((rx - origin[0]) / resolution + 0.5).astype(jnp.int32)  # [A, N]
    iy = jnp.floor((ry - origin[1]) / resolution + 0.5).astype(jnp.int32)
    iz = jnp.floor((rz - origin[2]) / resolution + 0.5).astype(jnp.int32)

    offs = jnp.arange(-num_linear, num_linear + 1, dtype=jnp.int32)
    D3 = offs.shape[0]
    # [A, Dz, Dy, Dx, N]
    czi = iz[:, None, None, None, :] + offs[None, :, None, None, None]
    cyi = iy[:, None, None, None, :] + offs[None, None, :, None, None]
    cxi = ix[:, None, None, None, :] + offs[None, None, None, :, None]
    czi, cyi, cxi = jnp.broadcast_arrays(czi, cyi, cxi)
    vals = gather_probability(prob, czi, cyi, cxi)
    count = jnp.maximum(jnp.sum(point_mask), 1)
    mean_prob = jnp.sum(vals * point_mask, axis=-1) / count  # [A, Dz, Dy, Dx]

    t_norm = (
        jnp.sqrt(
            (offs[:, None, None] * resolution) ** 2
            + (offs[None, :, None] * resolution) ** 2
            + (offs[None, None, :] * resolution) ** 2
        )
        * translation_delta_cost_weight
    )
    penalty = jnp.exp(
        -jnp.square(
            t_norm[None]
            + jnp.abs(angles)[:, None, None, None] * rotation_delta_cost_weight
        )
    )
    scores = mean_prob * penalty
    scores = jnp.where(angle_mask[:, None, None, None], scores, -jnp.inf)
    best = jnp.argmax(scores)
    return scores, best, scores.reshape(-1)[best]
