"""3D loop-closure matching: octave max pyramid + yaw-pruned branch-and-bound.

Reference: internal/3d/scan_matching/fast_correlative_scan_matcher_3d.cc
:112-444 with precomputation_grid_3d.cc:54-85 (octave max-pools of the
hybrid grid into uint8) and low_resolution_matcher.cc (leaf veto on the
low-resolution grid); candidate yaws pre-pruned by the rotational histogram
(rotational_scan_matcher.cc, min_rotational_score).

TPU-native reformulation (mirrors the 2D design in fast_correlative_2d.py):
* Pyramid: octave levels — level l has shape ceil(size/2^l)^3, each cell the
  max over its 2^l cube; built by 3 shift-max reductions per level.
* Bound lookup: a candidate window [c, c+2^l) with unaligned base spans at
  most 2 octave cells per axis, so the admissible bound is the max over the
  2x2x2 octave neighborhood — exactness preserved.
* BnB: level-synchronous beam over (yaw, x, y, z) with offsets on the
  2^(depth-1) lattice, full-resolution leaf probes for lower bounds, prune
  bound <= best, expand survivors into 8 children.
* Leaf acceptance requires the low-resolution score
  (>= min_low_resolution_score) like the reference's low-resolution matcher.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.common.config import FastCorrelativeScanMatcherOptions3D
from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.mapping.hybrid_grid import Grid3D
from cartographer_tpu.ops.scan_matching import rotational_histogram
from cartographer_tpu.ops.scan_matching.correlative_2d import compute_angular_step
from cartographer_tpu.transform import rigid3

_MAX_CANDIDATES = 1 << 14
_LEAF_PROBE = 128


def _pool_octave(prob: jax.Array) -> jax.Array:
    """Halve each axis, max over 2x2x2 (pad odd dims with MIN_PROBABILITY)."""
    d, h, w = prob.shape
    pd, ph, pw = (d + 1) // 2 * 2, (h + 1) // 2 * 2, (w + 1) // 2 * 2
    x = jnp.pad(
        prob,
        ((0, pd - d), (0, ph - h), (0, pw - w)),
        constant_values=pv.MIN_PROBABILITY,
    )
    x = x.reshape(pd // 2, 2, ph // 2, 2, pw // 2, 2)
    return x.max(axis=(1, 3, 5))


@functools.partial(jax.jit, static_argnames=("depth",))
def compute_octave_pyramid(prob: jax.Array, depth: int):
    """Returns a tuple of arrays, level l of shape ~size/2^l per axis."""
    levels = [prob]
    for _ in range(1, depth):
        levels.append(_pool_octave(levels[-1]))
    return tuple(levels)


@functools.partial(jax.jit, static_argnames=("level",))
def _score_level_3d(
    pool: jax.Array,  # [Dl, Hl, Wl] octave level
    cells: jax.Array,  # i32 [A, N, 3] full-res cells per pruned angle
    point_mask: jax.Array,  # [N]
    angle_idx: jax.Array,  # [C]
    ox: jax.Array,  # [C] full-res offsets
    oy: jax.Array,
    oz: jax.Array,
    cand_mask: jax.Array,
    level: int,
):
    d, h, w = pool.shape
    base = cells[angle_idx]  # [C, N, 3]
    cx = (base[..., 0] + ox[:, None]) >> level
    cy = (base[..., 1] + oy[:, None]) >> level
    cz = (base[..., 2] + oz[:, None]) >> level

    def at(zi, yi, xi):
        oob = (xi < 0) | (xi >= w) | (yi < 0) | (yi >= h) | (zi < 0) | (zi >= d)
        vals = pool[
            jnp.clip(zi, 0, d - 1), jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)
        ]
        return jnp.where(oob, pv.MIN_PROBABILITY, vals)

    if level == 0:
        vals = at(cz, cy, cx)
    else:
        # Unaligned window: admissible bound = max over 2x2x2 neighbors.
        vals = at(cz, cy, cx)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    if dz == dy == dx == 0:
                        continue
                    vals = jnp.maximum(vals, at(cz + dz, cy + dy, cx + dx))
    count = jnp.maximum(jnp.sum(point_mask), 1)
    scores = jnp.sum(vals * point_mask[None, :], axis=-1) / count
    return jnp.where(cand_mask, scores, -jnp.inf)


def _pad_pow2(arr: np.ndarray, minimum: int = 128, fill=0):
    n = len(arr)
    size = minimum
    while size < n:
        size *= 2
    out = np.full((size,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[:n] = arr
    mask = np.zeros(size, bool)
    mask[:n] = True
    return out, mask


@dataclasses.dataclass
class MatchResult3D:
    score: float
    low_resolution_score: float
    rotational_score: float
    pose: np.ndarray  # SE(3) (7,) node pose in the submap frame


class FastCorrelativeScanMatcher3D:
    def __init__(
        self,
        high_resolution_grid: Grid3D,
        low_resolution_grid: Grid3D,
        submap_histogram: np.ndarray,
        options: FastCorrelativeScanMatcherOptions3D,
    ):
        self._options = options
        self._depth = options.branch_and_bound_depth
        self._resolution = high_resolution_grid.resolution
        self._origin = np.asarray(high_resolution_grid.origin)
        self._shape = high_resolution_grid.values.shape
        self._pyramid = compute_octave_pyramid(
            high_resolution_grid.probability(), self._depth
        )
        self._low_grid = low_resolution_grid
        self._submap_histogram = submap_histogram

    def match(
        self,
        global_node_pose_in_submap: np.ndarray,  # SE(3) (7,)
        node_histogram: np.ndarray,
        node_gravity_yaw: float,
        point_cloud: np.ndarray,  # (N, 3) high-res cloud, node frame
        low_resolution_point_cloud: np.ndarray,
        min_score: float,
        full_submap: bool = False,
    ) -> Optional[MatchResult3D]:
        opts = self._options
        if full_submap:
            linear_xy = 0.5 * self._shape[2] * self._resolution
            linear_z = 0.5 * self._shape[0] * self._resolution
            angular = math.pi
        else:
            linear_xy = opts.linear_xy_search_window
            linear_z = opts.linear_z_search_window
            angular = opts.angular_search_window

        initial_pose = np.asarray(global_node_pose_in_submap, np.float64)
        max_scan_range = float(
            np.max(np.linalg.norm(point_cloud[:, :3], axis=1), initial=3.0 * self._resolution)
        )
        step = compute_angular_step(self._resolution, max_scan_range)
        num_angular = int(math.ceil(angular / step))
        angles = (np.arange(2 * num_angular + 1) - num_angular) * step

        # Yaw pruning by rotational histogram
        # (fast_correlative_scan_matcher_3d.cc ComputeAngularSearchWindow +
        # rotational matcher scores per candidate yaw).
        rot_scores = rotational_histogram.match_angles(
            self._submap_histogram, node_histogram, node_gravity_yaw, angles
        )
        keep_angles = rot_scores >= opts.min_rotational_score
        if not keep_angles.any():
            return None
        angles_kept = angles[keep_angles]
        rot_scores_kept = rot_scores[keep_angles]

        # Discretize the rotated+posed cloud per surviving yaw.
        q0 = rigid3.quat(initial_pose)
        t0 = initial_pose[:3]
        cells = []
        for a in angles_kept:
            half = 0.5 * a
            qa = np.array([np.cos(half), 0.0, 0.0, np.sin(half)])
            q = rigid3.quat_multiply(qa, q0)
            world = rigid3.quat_rotate(q[None, :], point_cloud[:, :3].astype(np.float64)) + t0
            cells.append(
                np.floor(
                    (world - self._origin) / self._resolution + 0.5
                ).astype(np.int32)
            )
        cells = np.stack(cells)  # [A, N, 3] (x, y, z)
        n = cells.shape[1]
        n_pad = 64
        while n_pad < n:
            n_pad *= 2
        cells_p = np.zeros((len(angles_kept), n_pad, 3), np.int32)
        cells_p[:, :n] = cells
        point_mask = np.zeros(n_pad, bool)
        point_mask[:n] = True
        cells_d = jnp.asarray(cells_p)
        pmask_d = jnp.asarray(point_mask)

        nl_xy = int(math.ceil(linear_xy / self._resolution))
        nl_z = int(math.ceil(linear_z / self._resolution))
        nl_xy = min(nl_xy, max(self._shape) + 1)
        nl_z = min(nl_z, max(self._shape) + 1)
        top = 1 << (self._depth - 1)

        def lattice(limit):
            lo = -((limit // top) + 1) * top
            return np.arange(lo, limit + 1, top, dtype=np.int32)

        offs_xy = lattice(nl_xy)
        offs_z = lattice(nl_z)
        a_grid, x_grid, y_grid, z_grid = np.meshgrid(
            np.arange(len(angles_kept), dtype=np.int32),
            offs_xy,
            offs_xy,
            offs_z,
            indexing="ij",
        )
        cand = dict(
            a=a_grid.ravel(), x=x_grid.ravel(), y=y_grid.ravel(), z=z_grid.ravel()
        )

        def score_at(level, c):
            out = np.empty(len(c["a"]), np.float32)
            for s in range(0, len(c["a"]), _MAX_CANDIDATES):
                e = min(s + _MAX_CANDIDATES, len(c["a"]))
                a_p, cmask = _pad_pow2(c["a"][s:e])
                x_p, _ = _pad_pow2(c["x"][s:e])
                y_p, _ = _pad_pow2(c["y"][s:e])
                z_p, _ = _pad_pow2(c["z"][s:e])
                out[s:e] = np.asarray(
                    _score_level_3d(
                        self._pyramid[level],
                        cells_d,
                        pmask_d,
                        jnp.asarray(a_p),
                        jnp.asarray(x_p),
                        jnp.asarray(y_p),
                        jnp.asarray(z_p),
                        jnp.asarray(cmask),
                        level,
                    )
                )[: e - s]
            return out

        def low_res_scores(c):
            """Leaf veto scores on the low-resolution grid."""
            poses = self._candidate_poses(c, angles_kept, initial_pose)
            out = np.empty(len(poses), np.float32)
            prob = self._low_grid.probability()
            lorigin = np.asarray(self._low_grid.origin)
            lres = self._low_grid.resolution
            lp = np.asarray(prob)
            d, h, w = lp.shape
            for i, pose in enumerate(poses):
                world = (
                    rigid3.quat_rotate(
                        rigid3.quat(pose)[None, :],
                        low_resolution_point_cloud[:, :3].astype(np.float64),
                    )
                    + pose[:3]
                )
                ci = np.floor((world - lorigin) / lres + 0.5).astype(int)
                inb = (
                    (ci[:, 0] >= 0) & (ci[:, 0] < w)
                    & (ci[:, 1] >= 0) & (ci[:, 1] < h)
                    & (ci[:, 2] >= 0) & (ci[:, 2] < d)
                )
                vals = np.where(
                    inb,
                    lp[
                        np.clip(ci[:, 2], 0, d - 1),
                        np.clip(ci[:, 1], 0, h - 1),
                        np.clip(ci[:, 0], 0, w - 1),
                    ],
                    pv.MIN_PROBABILITY,
                )
                out[i] = vals.mean()
            return out

        best_score = float(min_score)
        best = None

        for depth in range(self._depth - 1, -1, -1):
            if len(cand["a"]) == 0:
                break
            scores = score_at(depth, cand)
            if depth == 0:
                order = np.argsort(-scores)
                for i in order[:_LEAF_PROBE]:
                    if scores[i] <= best_score and best is not None:
                        break
                    sub = {k: v[i : i + 1] for k, v in cand.items()}
                    low = low_res_scores(sub)[0]
                    if (
                        scores[i] > best_score
                        and low >= opts.min_low_resolution_score
                    ):
                        best_score = float(scores[i])
                        best = (
                            best_score,
                            float(low),
                            int(cand["a"][i]),
                            int(cand["x"][i]),
                            int(cand["y"][i]),
                            int(cand["z"][i]),
                        )
                        break
                break

            probe = np.argsort(-scores)[:_LEAF_PROBE]
            probe_sub = {k: v[probe] for k, v in cand.items()}
            leaf_scores = score_at(0, probe_sub)
            lows = low_res_scores(probe_sub)
            ok = (leaf_scores > best_score) & (lows >= opts.min_low_resolution_score)
            if ok.any():
                j = int(np.argmax(np.where(ok, leaf_scores, -np.inf)))
                best_score = float(leaf_scores[j])
                best = (
                    best_score,
                    float(lows[j]),
                    int(probe_sub["a"][j]),
                    int(probe_sub["x"][j]),
                    int(probe_sub["y"][j]),
                    int(probe_sub["z"][j]),
                )

            keep = scores > best_score
            cand = {k: v[keep] for k, v in cand.items()}
            scores = scores[keep]
            if len(cand["a"]) > _MAX_CANDIDATES:
                order = np.argsort(-scores)[:_MAX_CANDIDATES]
                cand = {k: v[order] for k, v in cand.items()}

            half = 1 << (depth - 1)
            reps = len(cand["a"])
            child = {
                "a": np.repeat(cand["a"], 8),
                "x": np.repeat(cand["x"], 8) + np.tile([0, half] * 4, reps),
                "y": np.repeat(cand["y"], 8)
                + np.tile([0, 0, half, half, 0, 0, half, half], reps),
                "z": np.repeat(cand["z"], 8)
                + np.tile([0] * 4 + [half] * 4, reps),
            }
            inb = (
                (child["x"] <= nl_xy)
                & (child["y"] <= nl_xy)
                & (child["z"] <= nl_z)
            )
            cand = {k: v[inb] for k, v in child.items()}

        if best is None:
            return None
        score, low, ba, bx, by, bz = best
        pose = self._candidate_poses(
            {"a": np.array([ba]), "x": np.array([bx]), "y": np.array([by]), "z": np.array([bz])},
            angles_kept,
            initial_pose,
        )[0]
        return MatchResult3D(
            score=score,
            low_resolution_score=low,
            rotational_score=float(rot_scores_kept[ba]),
            pose=pose,
        )

    def _candidate_poses(self, c, angles_kept, initial_pose):
        poses = []
        for a, x, y, z in zip(c["a"], c["x"], c["y"], c["z"]):
            ang = angles_kept[int(a)]
            half = 0.5 * ang
            qa = np.array([np.cos(half), 0.0, 0.0, np.sin(half)])
            q = rigid3.quat_normalize(
                rigid3.quat_multiply(qa, rigid3.quat(initial_pose))
            )
            t = initial_pose[:3] + np.array([x, y, z], np.float64) * self._resolution
            poses.append(rigid3.make(t, q))
        return poses
