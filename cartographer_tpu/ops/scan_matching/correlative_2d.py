"""Real-time correlative scan matching (device, exhaustive window search).

Reference: internal/2d/scan_matching/real_time_correlative_scan_matcher_2d.cc
:61-176 and correlative_scan_matcher_2d.cc:27-111. For every (angle, dx, dy)
candidate, score = mean grid probability at the shifted discretized scan,
weighted by exp(-(|t|*tw + |dtheta|*rw)^2).

TPU formulation: all candidates scored in one batched gather-reduce —
probabilities[A, D, D, N] -> mean over N -> argmax. The angular step is
data-dependent (resolution / max scan range, correlative_scan_matcher_2d.cc
:27-55), so angles arrive as a padded device array with a mask.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from cartographer_tpu.mapping import probability_values as pv


def compute_angular_step(resolution: float, max_scan_range: float) -> float:
    """correlative_scan_matcher_2d.cc:34-43 (safety-margined arccos formula)."""
    max_scan_range = max(max_scan_range, 3.0 * resolution)
    safety_margin = 1.0 - 1e-3
    return safety_margin * math.acos(
        1.0 - resolution**2 / (2.0 * max_scan_range**2)
    )


@functools.partial(jax.jit, static_argnames=("num_linear",))
def score_candidates(
    prob: jax.Array,  # f32 [H, W] probability (unknown -> 0.1)
    origin: jax.Array,  # f32 [2]
    points: jax.Array,  # f32 [N, 2] in local frame, pre-rotated by initial yaw
    point_mask: jax.Array,  # bool [N]
    angles: jax.Array,  # f32 [A] delta angles (padded)
    angle_mask: jax.Array,  # bool [A]
    init_xy: jax.Array,  # f32 [2] initial translation
    resolution: float,
    translation_delta_cost_weight: float,
    rotation_delta_cost_weight: float,
    num_linear: int,  # offsets in [-num_linear, num_linear]
):
    """Returns (scores [A, D, D], best flat index, best score)."""
    h, w = prob.shape
    cos_a = jnp.cos(angles)[:, None]
    sin_a = jnp.sin(angles)[:, None]
    px, py = points[:, 0][None, :], points[:, 1][None, :]
    wx = cos_a * px - sin_a * py + init_xy[0]
    wy = sin_a * px + cos_a * py + init_xy[1]
    ix = jnp.floor((wx - origin[0]) / resolution).astype(jnp.int32)  # [A, N]
    iy = jnp.floor((wy - origin[1]) / resolution).astype(jnp.int32)

    offs = jnp.arange(-num_linear, num_linear + 1, dtype=jnp.int32)  # [D]
    idx_y = iy[:, None, None, :] + offs[None, :, None, None]  # [A, D, 1, N]
    idx_x = ix[:, None, None, :] + offs[None, None, :, None]  # [A, 1, D, N]
    idx_y, idx_x = jnp.broadcast_arrays(idx_y, idx_x)
    # Negative indices wrap in JAX gathers; mask them out explicitly.
    oob = (idx_x < 0) | (idx_x >= w) | (idx_y < 0) | (idx_y >= h)
    vals = prob[jnp.clip(idx_y, 0, h - 1), jnp.clip(idx_x, 0, w - 1)]
    vals = jnp.where(oob, pv.MIN_PROBABILITY, vals)
    count = jnp.maximum(jnp.sum(point_mask), 1)
    mean_prob = (
        jnp.sum(vals * point_mask[None, None, None, :], axis=-1) / count
    )  # [A, D, D]

    t_norm = (
        jnp.hypot(offs[:, None] * resolution, offs[None, :] * resolution)
        * translation_delta_cost_weight
    )
    penalty = jnp.exp(
        -jnp.square(
            t_norm[None, :, :]
            + jnp.abs(angles)[:, None, None] * rotation_delta_cost_weight
        )
    )
    scores = mean_prob * penalty
    scores = jnp.where(angle_mask[:, None, None], scores, -jnp.inf)
    best = jnp.argmax(scores)
    return scores, best, scores.reshape(-1)[best]
