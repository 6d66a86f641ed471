"""Host-facing 2D scan matcher interfaces over the device kernels.

Mirrors the reference classes RealTimeCorrelativeScanMatcher2D
(real_time_correlative_scan_matcher_2d.cc:117-176) and CeresScanMatcher2D
(ceres_scan_matcher_2d.cc:63-107); handles padding to static shapes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.common.config import (
    CeresScanMatcherOptions2D,
    RealTimeCorrelativeScanMatcherOptions,
)
from cartographer_tpu.mapping.grid_2d import Grid2D
from cartographer_tpu.ops.scan_matching import correlative_2d, gauss_newton_2d
from cartographer_tpu.transform import rigid2


def round_up_pow2(n: int, minimum: int = 64) -> int:
    v = minimum
    while v < n:
        v *= 2
    return v


def pad_points_2d(points: np.ndarray, minimum: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    n = len(points)
    n_pad = round_up_pow2(max(n, 1), minimum)
    out = np.zeros((n_pad, 2), np.float32)
    if n:
        out[:n] = points[:, :2]
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    return out, mask


class RealTimeCorrelativeScanMatcher2D:
    def __init__(self, options: RealTimeCorrelativeScanMatcherOptions):
        self._options = options

    def match(
        self,
        initial_pose_estimate: np.ndarray,  # SE(2) (3,)
        point_cloud: np.ndarray,  # (N, 2+) local frame
        grid: Grid2D,
    ) -> Tuple[float, np.ndarray]:
        """Returns (score, pose_estimate)."""
        opts = self._options
        initial_rotation = float(initial_pose_estimate[2])
        # Rotate the cloud by the initial yaw; the angular search is relative.
        rot = rigid2.make(np.zeros(2), initial_rotation)
        rotated = rigid2.apply(rot, np.asarray(point_cloud[:, :2], np.float64))
        max_scan_range = float(
            np.max(np.linalg.norm(rotated, axis=1), initial=3.0 * grid.resolution)
        )
        step = correlative_2d.compute_angular_step(grid.resolution, max_scan_range)
        num_angular = int(math.ceil(opts.angular_search_window / step))
        num_scans = 2 * num_angular + 1
        angles = (np.arange(num_scans) - num_angular) * step
        a_pad = round_up_pow2(num_scans, 16)
        angles_p = np.zeros(a_pad, np.float32)
        angles_p[:num_scans] = angles
        angle_mask = np.zeros(a_pad, bool)
        angle_mask[:num_scans] = True

        num_linear = int(math.ceil(opts.linear_search_window / grid.resolution))
        points_p, point_mask = pad_points_2d(rotated.astype(np.float32))

        # The Pallas window scorer keeps the grid VMEM-resident (one grid
        # read instead of an [A, D, D, N] gather) when the window fits its
        # accumulator tile; XLA gather is the portable fallback.
        import jax as _jax

        use_pallas = (
            _jax.default_backend() == "tpu"
            and 2 * num_linear + 1 <= 8
            and grid.size >= 128
        )
        _, best, best_score = correlative_2d.score_candidates(
            grid.probability(),
            grid.origin,
            jnp.asarray(points_p),
            jnp.asarray(point_mask),
            jnp.asarray(angles_p),
            jnp.asarray(angle_mask),
            jnp.asarray(initial_pose_estimate[:2], jnp.float32),
            grid.resolution,
            opts.translation_delta_cost_weight,
            opts.rotation_delta_cost_weight,
            num_linear,
            use_pallas=use_pallas,
        )
        best = int(best)
        d = 2 * num_linear + 1
        ai, rem = divmod(best, d * d)
        dyi, dxi = divmod(rem, d)
        dx = (dxi - num_linear) * grid.resolution
        dy = (dyi - num_linear) * grid.resolution
        dtheta = float(angles_p[ai])
        pose = rigid2.make(
            np.asarray(initial_pose_estimate[:2], np.float64) + [dx, dy],
            rigid2.normalize_angle(initial_rotation + dtheta),
        )
        return float(best_score), pose


class CeresScanMatcher2D:
    def __init__(self, options: CeresScanMatcherOptions2D):
        self._options = options

    def match(
        self,
        target_translation: np.ndarray,  # (2,)
        initial_pose_estimate: np.ndarray,  # SE(2) (3,)
        point_cloud: np.ndarray,  # (N, 2+)
        grid: Grid2D,
    ) -> Tuple[np.ndarray, float]:
        """Returns (pose_estimate, final_cost)."""
        from cartographer_tpu.mapping.tsdf_2d import TSDF2D

        opts = self._options
        points_p, point_mask = pad_points_2d(np.asarray(point_cloud))
        if isinstance(grid, TSDF2D):
            pose, cost = gauss_newton_2d.match_tsdf(
                grid.tsd,
                grid.weight,
                grid.origin,
                jnp.asarray(initial_pose_estimate, jnp.float32),
                jnp.asarray(target_translation, jnp.float32),
                jnp.asarray(points_p),
                jnp.asarray(point_mask),
                grid.resolution,
                grid.truncation_distance,
                opts.occupied_space_weight,
                opts.translation_weight,
                opts.rotation_weight,
                opts.ceres_solver_options.max_num_iterations,
                bool(opts.ceres_solver_options.use_nonmonotonic_steps),
            )
            pose = np.asarray(pose, np.float64)
            pose[2] = rigid2.normalize_angle(pose[2])
            return pose, float(cost)
        pose, cost = gauss_newton_2d.match_log_odds(
            grid.log_odds,
            grid.known,
            grid.origin,
            jnp.asarray(initial_pose_estimate, jnp.float32),
            jnp.asarray(target_translation, jnp.float32),
            jnp.asarray(points_p),
            jnp.asarray(point_mask),
            grid.resolution,
            opts.occupied_space_weight,
            opts.translation_weight,
            opts.rotation_weight,
            opts.ceres_solver_options.max_num_iterations,
            bool(opts.ceres_solver_options.use_nonmonotonic_steps),
        )
        pose, cost = jax.device_get((pose, cost))
        pose = np.asarray(pose, np.float64)
        pose[2] = rigid2.normalize_angle(pose[2])
        return pose, float(cost)

    def match_device(
        self,
        target_translation: np.ndarray,
        initial_pose_estimate: np.ndarray,
        point_cloud: np.ndarray,
        grid: Grid2D,
    ):
        """Dispatch the refinement without fetching: returns a (4,) device
        vector [x, y, theta, cost] for callers that batch many matches into
        one host round trip (probability grids only)."""
        opts = self._options
        points_p, point_mask = pad_points_2d(np.asarray(point_cloud))
        pose, cost = gauss_newton_2d.match_log_odds(
            grid.log_odds,
            grid.known,
            grid.origin,
            jnp.asarray(initial_pose_estimate, jnp.float32),
            jnp.asarray(target_translation, jnp.float32),
            jnp.asarray(points_p),
            jnp.asarray(point_mask),
            grid.resolution,
            opts.occupied_space_weight,
            opts.translation_weight,
            opts.rotation_weight,
            opts.ceres_solver_options.max_num_iterations,
            bool(opts.ceres_solver_options.use_nonmonotonic_steps),
        )
        return jnp.concatenate([pose, cost[None]])

    @staticmethod
    def decode(packed: np.ndarray):
        pose = np.asarray(packed[:3], np.float64)
        pose[2] = rigid2.normalize_angle(pose[2])
        return pose, float(packed[3])
