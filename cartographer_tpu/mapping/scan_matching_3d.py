"""Host-facing 3D scan matcher interfaces over the device kernels.

Mirrors RealTimeCorrelativeScanMatcher3D
(real_time_correlative_scan_matcher_3d.cc) and CeresScanMatcher3D
(ceres_scan_matcher_3d.cc); handles padding to static shapes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.common.config import (
    CeresScanMatcherOptions3D,
    RealTimeCorrelativeScanMatcherOptions,
)
from cartographer_tpu.mapping.hybrid_grid import Grid3D
from cartographer_tpu.mapping.paged_grid_3d import PagedGrid3D
from cartographer_tpu.ops.scan_matching import correlative_3d, gauss_newton_3d
from cartographer_tpu.ops.scan_matching.correlative_2d import compute_angular_step
from cartographer_tpu.transform import rigid3


def _round_up_pow2(n: int, minimum: int = 64) -> int:
    v = minimum
    while v < n:
        v *= 2
    return v


def _vol(grid):
    """Grid-read argument for the device matchers: the paged struct
    itself, or the dense int8 log-odds volume (probability conversion
    happens per gathered corner either way)."""
    return grid if isinstance(grid, PagedGrid3D) else grid.values


def pad_points_3d(points: np.ndarray, minimum: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    n = len(points)
    n_pad = _round_up_pow2(max(n, 1), minimum)
    out = np.zeros((n_pad, 3), np.float32)
    if n:
        out[:n] = points[:, :3]
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    return out, mask


class RealTimeCorrelativeScanMatcher3D:
    def __init__(self, options: RealTimeCorrelativeScanMatcherOptions):
        self._options = options

    def match(
        self,
        initial_pose: np.ndarray,  # SE(3) (7,) in submap frame
        point_cloud: np.ndarray,  # (N, 3) tracking frame
        grid: Grid3D,
    ) -> Tuple[float, np.ndarray]:
        opts = self._options
        # Rotate the cloud by the initial rotation; search delta yaw on top.
        rotated = rigid3.quat_rotate(
            rigid3.quat(np.asarray(initial_pose, np.float64))[None, :],
            np.asarray(point_cloud[:, :3], np.float64),
        )
        max_scan_range = float(
            np.max(np.linalg.norm(rotated, axis=1), initial=3.0 * grid.resolution)
        )
        step = compute_angular_step(grid.resolution, max_scan_range)
        num_angular = int(math.ceil(opts.angular_search_window / step))
        num_scans = 2 * num_angular + 1
        angles = (np.arange(num_scans) - num_angular) * step
        a_pad = _round_up_pow2(num_scans, 8)
        angles_p = np.zeros(a_pad, np.float32)
        angles_p[:num_scans] = angles
        angle_mask = np.zeros(a_pad, bool)
        angle_mask[:num_scans] = True
        num_linear = int(math.ceil(opts.linear_search_window / grid.resolution))
        points_p, point_mask = pad_points_3d(rotated.astype(np.float32))

        _, best, best_score = correlative_3d.score_candidates_3d(
            _vol(grid),
            grid.origin,
            jnp.asarray(points_p),
            jnp.asarray(point_mask),
            jnp.asarray(angles_p),
            jnp.asarray(angle_mask),
            jnp.asarray(initial_pose[:3], jnp.float32),
            grid.resolution,
            opts.translation_delta_cost_weight,
            opts.rotation_delta_cost_weight,
            num_linear,
        )
        best = int(best)
        d = 2 * num_linear + 1
        ai, rem = divmod(best, d * d * d)
        dzi, rem = divmod(rem, d * d)
        dyi, dxi = divmod(rem, d)
        delta_t = (
            np.array([dxi, dyi, dzi], np.float64) - num_linear
        ) * grid.resolution
        dyaw = float(angles_p[ai])
        half = 0.5 * dyaw
        q_delta = np.array([np.cos(half), 0.0, 0.0, np.sin(half)])
        pose = rigid3.make(
            np.asarray(initial_pose[:3], np.float64) + delta_t,
            rigid3.quat_normalize(
                rigid3.quat_multiply(q_delta, rigid3.quat(np.asarray(initial_pose)))
            ),
        )
        return float(best_score), pose


class CeresScanMatcher3D:
    def __init__(self, options: CeresScanMatcherOptions3D):
        self._options = options

    def match(
        self,
        target_translation: np.ndarray,  # (3,)
        initial_pose: np.ndarray,  # SE(3) (7,) in submap frame
        high_resolution_cloud: np.ndarray,  # (N0, 3) tracking frame
        high_resolution_grid: Grid3D,
        low_resolution_cloud: np.ndarray,  # (N1, 3)
        low_resolution_grid: Grid3D,
        intensity_avg=None,  # f32 [D, H, W] average-intensity grid
        high_intensities: np.ndarray = None,  # (N0,)
    ) -> Tuple[np.ndarray, float]:
        opts = self._options
        hp, hm = pad_points_3d(np.asarray(high_resolution_cloud))
        lp, lm = pad_points_3d(np.asarray(low_resolution_cloud))
        if intensity_avg is not None and high_intensities is not None:
            hi = np.zeros(len(hm), np.float32)
            hi[: len(high_intensities)] = high_intensities
            iopts = opts.intensity_cost_function_options_0
            packed = gauss_newton_3d.match_3d_intensity(
                _vol(high_resolution_grid),
                high_resolution_grid.origin,
                _vol(low_resolution_grid),
                low_resolution_grid.origin,
                intensity_avg,
                jnp.asarray(initial_pose[:3], jnp.float32),
                jnp.asarray(initial_pose[3:7], jnp.float32),
                jnp.asarray(target_translation, jnp.float32),
                jnp.asarray(hp),
                jnp.asarray(hm),
                jnp.asarray(hi),
                jnp.asarray(lp),
                jnp.asarray(lm),
                high_resolution_grid.resolution,
                low_resolution_grid.resolution,
                opts.occupied_space_weight_0,
                opts.occupied_space_weight_1,
                iopts.weight,
                iopts.huber_scale,
                iopts.intensity_threshold,
                opts.translation_weight,
                opts.rotation_weight,
                opts.ceres_solver_options.max_num_iterations,
                opts.only_optimize_yaw,
                bool(opts.ceres_solver_options.use_nonmonotonic_steps),
            )
            packed = np.asarray(packed, np.float64)  # single round trip
            return packed[:7], float(packed[7])
        packed = gauss_newton_3d.match_3d(
            _vol(high_resolution_grid),
            high_resolution_grid.origin,
            _vol(low_resolution_grid),
            low_resolution_grid.origin,
            jnp.asarray(initial_pose[:3], jnp.float32),
            jnp.asarray(initial_pose[3:7], jnp.float32),
            jnp.asarray(target_translation, jnp.float32),
            jnp.asarray(hp),
            jnp.asarray(hm),
            jnp.asarray(lp),
            jnp.asarray(lm),
            high_resolution_grid.resolution,
            low_resolution_grid.resolution,
            opts.occupied_space_weight_0,
            opts.occupied_space_weight_1,
            opts.translation_weight,
            opts.rotation_weight,
            opts.ceres_solver_options.max_num_iterations,
            opts.only_optimize_yaw,
            bool(opts.ceres_solver_options.use_nonmonotonic_steps),
        )
        packed = np.asarray(packed, np.float64)  # single round trip
        return packed[:7], float(packed[7])

    def match_device(
        self,
        target_translation: np.ndarray,
        initial_pose_estimate: np.ndarray,
        high_resolution_cloud: np.ndarray,
        high_resolution_grid,
        low_resolution_cloud: np.ndarray,
        low_resolution_grid,
    ):
        """Dispatch the dual-grid refinement without fetching; returns the
        packed (8,) device vector [t(3), q(4), cost] for callers batching
        matches into one host round trip (no intensity cost)."""
        opts = self._options
        hp, hm = pad_points_3d(np.asarray(high_resolution_cloud))
        lp, lm = pad_points_3d(np.asarray(low_resolution_cloud))
        return gauss_newton_3d.match_3d(
            _vol(high_resolution_grid),
            high_resolution_grid.origin,
            _vol(low_resolution_grid),
            low_resolution_grid.origin,
            jnp.asarray(initial_pose_estimate[:3], jnp.float32),
            jnp.asarray(initial_pose_estimate[3:7], jnp.float32),
            jnp.asarray(target_translation, jnp.float32),
            jnp.asarray(hp),
            jnp.asarray(hm),
            jnp.asarray(lp),
            jnp.asarray(lm),
            high_resolution_grid.resolution,
            low_resolution_grid.resolution,
            opts.occupied_space_weight_0,
            opts.occupied_space_weight_1,
            opts.translation_weight,
            opts.rotation_weight,
            opts.ceres_solver_options.max_num_iterations,
            opts.only_optimize_yaw,
            bool(opts.ceres_solver_options.use_nonmonotonic_steps),
        )

    @staticmethod
    def decode(packed: np.ndarray):
        packed = np.asarray(packed, np.float64)
        return packed[:7], float(packed[7])
