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


@functools.partial(jax.jit, static_argnames=("num_linear", "use_pallas"))
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
    use_pallas: bool = False,
):
    """Returns (scores [A, D, D], best flat index, best score)."""
    cos_a = jnp.cos(angles)[:, None]
    sin_a = jnp.sin(angles)[:, None]
    px, py = points[:, 0][None, :], points[:, 1][None, :]
    wx = cos_a * px - sin_a * py + init_xy[0]
    wy = sin_a * px + cos_a * py + init_xy[1]
    ix = jnp.floor((wx - origin[0]) / resolution).astype(jnp.int32)  # [A, N]
    iy = jnp.floor((wy - origin[1]) / resolution).astype(jnp.int32)
    sums = window_sums(prob, ix, iy, point_mask, num_linear, use_pallas)
    count = jnp.maximum(jnp.sum(point_mask), 1)
    mean_prob = sums / count  # [A, D, D]
    offs = jnp.arange(-num_linear, num_linear + 1, dtype=jnp.int32)

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


def _window_sums_xla(prob, ix, iy, point_mask, num_linear: int):
    """Summed window scores [A, D, D] via the batched gather formulation."""
    h, w = prob.shape
    offs = jnp.arange(-num_linear, num_linear + 1, dtype=jnp.int32)
    idx_y = iy[:, None, None, :] + offs[None, :, None, None]
    idx_x = ix[:, None, None, :] + offs[None, None, :, None]
    idx_y, idx_x = jnp.broadcast_arrays(idx_y, idx_x)
    oob = (idx_x < 0) | (idx_x >= w) | (idx_y < 0) | (idx_y >= h)
    vals = prob[jnp.clip(idx_y, 0, h - 1), jnp.clip(idx_x, 0, w - 1)]
    vals = jnp.where(oob, pv.MIN_PROBABILITY, vals)
    return jnp.sum(vals * point_mask[None, None, None, :], axis=-1)


def window_sums(prob, ix, iy, point_mask, num_linear: int, use_pallas: bool):
    """Summed window scores [A, D, D]; the Pallas kernel keeps the grid
    VMEM-resident and skips the [A, D, D, N] gather (ops/pallas_kernels),
    the XLA path is the portable fallback."""
    if use_pallas:
        from cartographer_tpu.ops import pallas_kernels

        return pallas_kernels.correlative_score_windows.__wrapped__(
            prob, ix, iy, point_mask, num_linear
        )
    return _window_sums_xla(prob, ix, iy, point_mask, num_linear)


def best_candidate_pose(
    prob: jax.Array,  # f32 [H, W]
    origin: jax.Array,  # f32 [2]
    points: jax.Array,  # f32 [N, 2] local frame (NOT pre-rotated)
    point_mask: jax.Array,  # bool [N]
    initial_pose: jax.Array,  # f32 [3]
    num_angular: jax.Array,  # i32 <= a_cap (data-dependent)
    angular_step: jax.Array,  # f32
    resolution: float,
    translation_delta_cost_weight: float,
    rotation_delta_cost_weight: float,
    num_linear: int,
    a_cap: int,
    use_pallas: bool = False,
):
    """The whole RealTimeCorrelativeScanMatcher2D::Match as one traced
    computation (rotate per candidate angle, discretize, score window,
    penalty, argmax) with STATIC angle capacity `a_cap` — usable inside
    the chunked frontend's scan body. Returns (best_score, pose [3])."""
    a = 2 * a_cap + 1
    aidx = jnp.arange(a, dtype=jnp.int32) - a_cap
    angles = aidx.astype(jnp.float32) * angular_step
    angle_mask = jnp.abs(aidx) <= num_angular
    full = initial_pose[2] + angles
    ca, sa = jnp.cos(full)[:, None], jnp.sin(full)[:, None]
    px, py = points[None, :, 0], points[None, :, 1]
    wx = ca * px - sa * py + initial_pose[0]
    wy = sa * px + ca * py + initial_pose[1]
    ix = jnp.floor((wx - origin[0]) / resolution).astype(jnp.int32)
    iy = jnp.floor((wy - origin[1]) / resolution).astype(jnp.int32)

    sums = window_sums(prob, ix, iy, point_mask, num_linear, use_pallas)
    count = jnp.maximum(jnp.sum(point_mask), 1)
    mean_prob = sums / count
    offs = jnp.arange(-num_linear, num_linear + 1, dtype=jnp.int32)
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
    scores = jnp.where(
        angle_mask[:, None, None], mean_prob * penalty, -jnp.inf
    )
    best = jnp.argmax(scores)
    d = 2 * num_linear + 1
    ai, rem = jnp.divmod(best, d * d)
    dyi, dxi = jnp.divmod(rem, d)
    pose = jnp.stack(
        [
            initial_pose[0] + (dxi - num_linear).astype(jnp.float32) * resolution,
            initial_pose[1] + (dyi - num_linear).astype(jnp.float32) * resolution,
            initial_pose[2] + angles[ai],
        ]
    )
    return scores.reshape(-1)[best], pose
