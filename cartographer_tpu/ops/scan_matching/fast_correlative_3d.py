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

from cartographer_tpu import metrics
from cartographer_tpu.common.config import FastCorrelativeScanMatcherOptions3D
from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.mapping.hybrid_grid import Grid3D
from cartographer_tpu.ops.scan_matching import rotational_histogram
from cartographer_tpu.ops.scan_matching.correlative_2d import compute_angular_step
from cartographer_tpu.transform import rigid3

_MAX_CANDIDATES = 1 << 14
_LEAF_PROBE = 128
# Widening ceiling for beam-overflow retries (see fast_correlative_2d).
_MAX_WIDENED_BEAM = 1 << 14


# Pyramid and veto cells are uint8 like the reference's
# PrecomputationGrid3D (precomputation_grid_3d.cc:54-85): value =
# (p - 0.1)/0.8 * 255, scores convert back to mean probability — the same
# 1/255 quantization as the reference, and 4x less HBM than float32
# volumes (a 256^3 pyramid stack drops ~75 MB -> ~19 MB per submap).
_U8_SCALE = 255.0 / (pv.MAX_PROBABILITY - pv.MIN_PROBABILITY)


def _quantize_u8(prob: jax.Array) -> jax.Array:
    return jnp.clip(
        jnp.round((prob - pv.MIN_PROBABILITY) * _U8_SCALE), 0, 255
    ).astype(jnp.uint8)


def _u8_to_prob(vals: jax.Array) -> jax.Array:
    return vals.astype(jnp.float32) * (1.0 / _U8_SCALE) + pv.MIN_PROBABILITY


def _pool_octave(vals: jax.Array) -> jax.Array:
    """Halve each axis, max over 2x2x2 (pad odd dims with 0 = MIN_PROB)."""
    d, h, w = vals.shape
    pd, ph, pw = (d + 1) // 2 * 2, (h + 1) // 2 * 2, (w + 1) // 2 * 2
    x = jnp.pad(
        vals,
        ((0, pd - d), (0, ph - h), (0, pw - w)),
        constant_values=0,
    )
    x = x.reshape(pd // 2, 2, ph // 2, 2, pw // 2, 2)
    return x.max(axis=(1, 3, 5))


@functools.partial(jax.jit, static_argnames=("depth",))
def compute_octave_pyramid(prob: jax.Array, depth: int):
    """Returns a tuple of uint8 arrays, level l of shape ~size/2^l/axis."""
    levels = [_quantize_u8(prob)]
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
        vals = _u8_to_prob(pool[
            jnp.clip(zi, 0, d - 1), jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)
        ])
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


def _score_cands_3d(pool, cells, pmask, a, x, y, z, valid, level):
    d, h, w = pool.shape
    base = cells[a]  # [C, N, 3]
    cx = (base[..., 0] + x[:, None]) >> level
    cy = (base[..., 1] + y[:, None]) >> level
    cz = (base[..., 2] + z[:, None]) >> level

    def at(zi, yi, xi):
        oob = (xi < 0) | (xi >= w) | (yi < 0) | (yi >= h) | (zi < 0) | (zi >= d)
        vals = _u8_to_prob(pool[
            jnp.clip(zi, 0, d - 1), jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)
        ])
        return jnp.where(oob, pv.MIN_PROBABILITY, vals)

    vals = at(cz, cy, cx)
    if level > 0:
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    if dz == dy == dx == 0:
                        continue
                    vals = jnp.maximum(vals, at(cz + dz, cy + dy, cx + dx))
    count = jnp.maximum(jnp.sum(pmask), 1)
    scores = jnp.sum(vals * pmask[None, :], axis=-1) / count
    return jnp.where(valid, scores, -jnp.inf)


def _low_res_scores_device(
    low_prob, low_base, low_mask, a, x, y, z, valid, ratio
):
    """Low-resolution veto scores (low_resolution_matcher.cc) for a batch of
    candidates: gather the low grid at the candidate-shifted cloud."""
    d, h, w = low_prob.shape
    base = low_base[a]  # [C, Nl, 3] fractional low-res cells at offset 0
    off = jnp.stack([x, y, z], axis=-1).astype(jnp.float32) * ratio  # [C, 3]
    ci = jnp.floor(base + off[:, None, :] + 0.5).astype(jnp.int32)
    cx, cy, cz = ci[..., 0], ci[..., 1], ci[..., 2]
    oob = (cx < 0) | (cx >= w) | (cy < 0) | (cy >= h) | (cz < 0) | (cz >= d)
    vals = _u8_to_prob(low_prob[
        jnp.clip(cz, 0, d - 1), jnp.clip(cy, 0, h - 1), jnp.clip(cx, 0, w - 1)
    ])
    vals = jnp.where(oob, pv.MIN_PROBABILITY, vals)
    count = jnp.maximum(jnp.sum(low_mask), 1)
    scores = jnp.sum(vals * low_mask[None, :], axis=-1) / count
    return jnp.where(valid, scores, -jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("depth", "beam", "leaf_probe")
)
def bnb_search_3d(
    pyramid,  # tuple of [Dl, Hl, Wl] octave levels
    points: jax.Array,  # f32 [N, 3] raw high-res cloud (node frame)
    pmask: jax.Array,  # [N]
    q0: jax.Array,  # f32 [4] initial rotation (node->submap)
    t0: jax.Array,  # f32 [3] initial translation
    angles: jax.Array,  # f32 [A] surviving candidate yaws (padded)
    origin: jax.Array,  # f32 [3] high-res grid origin
    resolution: jax.Array,  # f32
    low_prob: jax.Array,  # low-res probability volume
    low_points: jax.Array,  # f32 [Nl, 3] raw low-res cloud
    low_mask: jax.Array,  # [Nl]
    low_origin: jax.Array,  # f32 [3]
    low_resolution: jax.Array,  # f32
    a0, x0, y0, z0, m0,  # [K0] initial candidates
    nl_xy: jax.Array,  # i32 window bounds for children
    nl_z: jax.Array,
    min_score: jax.Array,
    min_low_score: jax.Array,
    ratio: jax.Array,  # f32 high-res cell size in low-res cells
    depth: int,
    beam: int = 4096,
    leaf_probe: int = 128,
):
    """Device-resident 3D branch-and-bound with yaw-pruned candidates and
    low-resolution leaf veto; one host round trip per search. Rotation +
    discretization of the per-yaw clouds happen HERE (the host uploads only
    the raw clouds, which callers can cache on device, and the yaw axis is
    padded so the program compiles once per shape family instead of once
    per surviving-yaw count). Returns (score, low_score, [a, x, y, z],
    overflowed) — `overflowed` reports a binding beam cap (the result is
    then not guaranteed exact; callers re-run with a wider beam)."""
    half_a = 0.5 * angles
    zeros_a = jnp.zeros_like(angles)
    qa = jnp.stack(
        [jnp.cos(half_a), zeros_a, zeros_a, jnp.sin(half_a)], axis=-1
    )  # [A, 4]
    q = rigid3.quat_multiply(qa, q0[None, :], xp=jnp)  # [A, 4]
    world = (
        rigid3.quat_rotate(q[:, None, :], points[None, :, :], xp=jnp)
        + t0[None, None, :]
    )  # [A, N, 3]
    cells = jnp.floor(
        (world - origin[None, None, :]) / resolution + 0.5
    ).astype(jnp.int32)
    low_world = (
        rigid3.quat_rotate(q[:, None, :], low_points[None, :, :], xp=jnp)
        + t0[None, None, :]
    )
    low_base = (low_world - low_origin[None, None, :]) / low_resolution

    best_score = jnp.float32(min_score)
    best_low = jnp.float32(0.0)
    best = jnp.array([-1, 0, 0, 0], jnp.int32)
    overflowed = jnp.asarray(False)
    a, x, y, z, valid = a0, x0, y0, z0, m0
    for level in range(depth - 1, -1, -1):
        scores = _score_cands_3d(
            pyramid[level], cells, pmask, a, x, y, z, valid, level
        )
        if level == 0:
            lows = _low_res_scores_device(
                low_prob, low_base, low_mask, a, x, y, z, valid, ratio
            )
            ok = lows >= min_low_score
            masked = jnp.where(ok, scores, -jnp.inf)
            i = jnp.argmax(masked)
            better = masked[i] > best_score
            best_score = jnp.where(better, masked[i], best_score)
            best_low = jnp.where(better, lows[i], best_low)
            best = jnp.where(
                better, jnp.stack([a[i], x[i], y[i], z[i]]), best
            )
            break
        k_probe = min(leaf_probe, scores.shape[0])
        pscores, pidx = jax.lax.top_k(scores, k_probe)
        pa, px_, py_, pz_ = a[pidx], x[pidx], y[pidx], z[pidx]
        pvalid = pscores > -jnp.inf
        leaf = _score_cands_3d(
            pyramid[0], cells, pmask, pa, px_, py_, pz_, pvalid, 0
        )
        lows = _low_res_scores_device(
            low_prob, low_base, low_mask, pa, px_, py_, pz_, pvalid, ratio
        )
        masked = jnp.where(lows >= min_low_score, leaf, -jnp.inf)
        j = jnp.argmax(masked)
        better = masked[j] > best_score
        best_score = jnp.where(better, masked[j], best_score)
        best_low = jnp.where(better, lows[j], best_low)
        best = jnp.where(
            better, jnp.stack([pa[j], px_[j], py_[j], pz_[j]]), best
        )
        pruned = jnp.where(scores > best_score, scores, -jnp.inf)
        k_beam = min(beam, pruned.shape[0])
        if k_beam < pruned.shape[0]:
            n_surv = jnp.sum(pruned > -jnp.inf)
            overflowed = overflowed | (n_surv > k_beam)
        top_scores, top_idx = jax.lax.top_k(pruned, k_beam)
        half = 1 << (level - 1)
        ca = jnp.repeat(a[top_idx], 8)
        cx = jnp.repeat(x[top_idx], 8) + jnp.tile(
            jnp.asarray([0, half] * 4, jnp.int32), k_beam
        )
        cy = jnp.repeat(y[top_idx], 8) + jnp.tile(
            jnp.asarray([0, 0, half, half] * 2, jnp.int32), k_beam
        )
        cz = jnp.repeat(z[top_idx], 8) + jnp.tile(
            jnp.asarray([0] * 4 + [half] * 4, jnp.int32), k_beam
        )
        cvalid = (
            jnp.repeat(top_scores > -jnp.inf, 8)
            & (cx <= nl_xy)
            & (cy <= nl_xy)
            & (cz <= nl_z)
        )
        a, x, y, z, valid = ca, cx, cy, cz, cvalid
    return best_score, best_low, best, overflowed


# Vmapped batch variant: one program for a whole drain of independent
# searches (see fast_correlative_2d.bnb_search_batch).
bnb_search_3d_batch = jax.jit(
    jax.vmap(
        bnb_search_3d.__wrapped__,
        in_axes=(0,) * 23 + (None, None, None),
    ),
    static_argnums=(23, 24, 25),
)

# 3D pyramids are f32 volumes (~75 MB per submap at 256^3 + octaves), so
# keep stacked batches small.
_MAX_SEARCH_BATCH_3D = 8


def batch_match_device_3d(preps, mesh=None):
    """Run the prepared searches (FastCorrelativeScanMatcher3D._prepare
    results) as vmapped programs in chunks, GROUPED by grid-shape family:
    finished 3D submaps densify cropped to content, so different submaps'
    pyramids legitimately differ in shape and only same-shape searches can
    stack into one program. Returns (packed [K, 7] numpy, ctxs list)
    aligned with `preps`. With `mesh` the search axis of each chunk is
    sharded over it (whole BnB searches per device — the reference's
    ThreadPool fan-out, constraint_builder_3d.cc). Searches whose beam cap
    bound (column 6) are re-run with a doubled beam up to
    _MAX_WIDENED_BEAM (see fast_correlative_2d)."""
    from cartographer_tpu.parallel.partition import fetch

    chunk_cap = _MAX_SEARCH_BATCH_3D
    if mesh is not None:
        chunk_cap = max(chunk_cap, mesh.devices.size)

    def shape_key(pr):
        m = pr["matcher"]
        return (
            tuple(lvl.shape for lvl in m._pyramid),
            tuple(m._low_prob.shape),
        )

    def run_indices(indices, beam_override=None):
        """Dispatch same-shape groups in chunks; write results into
        `packed` at the given global indices."""
        groups = {}
        for i in indices:
            groups.setdefault(shape_key(preps[i]), []).append(i)
        for idx_list in groups.values():
            for j in range(0, len(idx_list), chunk_cap):
                idx = np.asarray(idx_list[j: j + chunk_cap])
                p, c = _batch_3d(
                    [preps[r] for r in idx],
                    beam_override=beam_override,
                    mesh=mesh,
                )
                packed[idx] = fetch(p)[: len(idx)]
                for r, cc in zip(idx, c):
                    ctxs[r] = cc

    packed = np.zeros((len(preps), 7), np.float32)
    ctxs = [None] * len(preps)
    run_indices(range(len(preps)))
    if len(preps):
        beam = preps[0]["matcher"]._options.beam_width
        rows = np.flatnonzero(packed[:, 6] > 0.5)
        while len(rows) and beam < _MAX_WIDENED_BEAM:
            beam = min(2 * beam, _MAX_WIDENED_BEAM)
            metrics.beam_overflow_retries.increment(len(rows))
            run_indices(rows, beam_override=beam)
            rows = rows[packed[rows, 6] > 0.5]
    return packed, ctxs


def _batch_3d(preps, beam_override: Optional[int] = None, mesh=None):
    k = 2 if mesh is None else max(2, mesh.devices.size)
    while k < len(preps):
        k *= 2
    a_pad = 16
    n_pad = 64
    nl_pad = 64
    k0_pad = 1024
    for pr in preps:
        while a_pad < len(pr["angles_p"]):
            a_pad *= 2
        while n_pad < pr["device_points"][0].shape[0]:
            n_pad *= 2
        while nl_pad < pr["device_points"][2].shape[0]:
            nl_pad *= 2
        while k0_pad < len(pr["cand"][0]):
            k0_pad *= 2

    def stack_pyramids():
        rows = [pr["matcher"]._pyramid for pr in preps]
        rows += [preps[0]["matcher"]._pyramid] * (k - len(preps))
        return tuple(
            jnp.stack([r[lvl] for r in rows])
            for lvl in range(len(rows[0]))
        )

    pyr = stack_pyramids()
    low_prob = jnp.stack(
        [pr["matcher"]._low_prob for pr in preps]
        + [preps[0]["matcher"]._low_prob] * (k - len(preps))
    )

    def pad_row(dst, i, arr):
        dst[i, : len(arr)] = arr

    angles = np.zeros((k, a_pad), np.float32)
    q0 = np.zeros((k, 4), np.float32)
    q0[:, 0] = 1.0
    t0 = np.zeros((k, 3), np.float32)
    origins = np.zeros((k, 3), np.float32)
    res = np.ones((k,), np.float32)
    lorigins = np.zeros((k, 3), np.float32)
    lres = np.ones((k,), np.float32)
    a0 = np.zeros((k, k0_pad), np.int32)
    x0 = np.zeros((k, k0_pad), np.int32)
    y0 = np.zeros((k, k0_pad), np.int32)
    z0 = np.zeros((k, k0_pad), np.int32)
    m0 = np.zeros((k, k0_pad), bool)
    nl_xy = np.zeros((k,), np.int32)
    nl_z = np.zeros((k,), np.int32)
    ms = np.full((k,), 1e9, np.float32)
    mls = np.zeros((k,), np.float32)
    ratio = np.ones((k,), np.float32)
    ctxs = []
    for i, pr in enumerate(preps):
        m = pr["matcher"]
        pad_row(angles, i, pr["angles_p"])
        q0[i] = pr["q0"]
        t0[i] = pr["t0"]
        origins[i] = np.asarray(m._origin, np.float32)
        res[i] = m._resolution
        lorigins[i] = pr["lorigin"]
        lres[i] = pr["lres"]
        ca, cx, cy, cz, cm = pr["cand"]
        pad_row(a0, i, ca)
        pad_row(x0, i, cx)
        pad_row(y0, i, cy)
        pad_row(z0, i, cz)
        m0[i, : len(cm)] = cm
        nl_xy[i] = pr["nl_xy"]
        nl_z[i] = pr["nl_z"]
        ms[i] = pr["min_score"]
        mls[i] = m._options.min_low_resolution_score
        ratio[i] = m._resolution / pr["lres"]
        ctxs.append(pr["ctx"])

    # Assemble the point batches HOST-side and ship each as ONE upload.
    # Staged node clouds are pre-padded host arrays (stage_points): a
    # per-row device splice (`.at[i].set`) compiles + dispatches a
    # distinct program per row — ~100 ms each on a remote-attached TPU
    # (measured), dwarfing the few KB/row of re-upload it would save.
    points = np.zeros((k, n_pad, 3), np.float32)
    pmask = np.zeros((k, n_pad), bool)
    lpoints = np.zeros((k, nl_pad, 3), np.float32)
    lmask = np.zeros((k, nl_pad), bool)
    for i, pr in enumerate(preps):
        p_, pm_, lp_, lm_ = (np.asarray(a) for a in pr["device_points"])
        points[i, : p_.shape[0]] = p_
        pmask[i, : pm_.shape[0]] = pm_
        lpoints[i, : lp_.shape[0]] = lp_
        lmask[i, : lm_.shape[0]] = lm_
    points_d = jnp.asarray(points)
    pmask_d = jnp.asarray(pmask)
    lpoints_d = jnp.asarray(lpoints)
    lmask_d = jnp.asarray(lmask)

    m0_first = preps[0]["matcher"]
    beam = (
        beam_override
        if beam_override is not None
        else m0_first._options.beam_width
    )
    if mesh is None:
        place = jnp.asarray
    else:
        from cartographer_tpu.parallel.partition import batch_sharding, put

        metrics.sharded_constraint_batches.increment()
        sharding = batch_sharding(mesh)

        def place(arr):
            return put(arr, sharding)

        pyr = tuple(place(lvl) for lvl in pyr)
        low_prob = place(low_prob)
        points_d = place(points_d)
        pmask_d = place(pmask_d)
        lpoints_d = place(lpoints_d)
        lmask_d = place(lmask_d)
    score, low, best, overflowed = bnb_search_3d_batch(
        pyr, points_d, pmask_d, place(q0), place(t0),
        place(angles), place(origins), place(res),
        low_prob, lpoints_d, lmask_d, place(lorigins),
        place(lres),
        place(a0), place(x0), place(y0), place(z0),
        place(m0), place(nl_xy), place(nl_z),
        place(ms), place(mls), place(ratio),
        m0_first._depth, beam, _LEAF_PROBE,
    )
    packed = jnp.concatenate(
        [
            score[:, None].astype(jnp.float32),
            low[:, None].astype(jnp.float32),
            best.astype(jnp.float32),
            overflowed[:, None].astype(jnp.float32),
        ],
        axis=1,
    )
    return packed, ctxs


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
        # Materialize the low-res probability volume once (it is read by
        # every search against this submap).
        self._low_prob = _quantize_u8(low_resolution_grid.probability())
        self._submap_histogram = submap_histogram

    @staticmethod
    def stage_points(point_cloud: np.ndarray, low_resolution_point_cloud):
        """Pre-pad a node's high/low clouds once for reuse across many
        searches. Returns (points, pmask, low_points, low_mask) HOST
        arrays: batch assembly splices rows into one buffer per array and
        ships each as a single upload — per-row device splices each
        compile + dispatch a distinct program (~100 ms/row measured on a
        remote-attached TPU), dwarfing the few KB/row re-upload."""
        def pad(cloud):
            pts = np.asarray(cloud[:, :3], np.float32)
            n_pad = 64
            while n_pad < pts.shape[0]:
                n_pad *= 2
            out = np.zeros((n_pad, 3), np.float32)
            out[: pts.shape[0]] = pts
            mask = np.zeros(n_pad, bool)
            mask[: pts.shape[0]] = True
            return out, mask

        p, m = pad(point_cloud)
        lp, lm = pad(low_resolution_point_cloud)
        return p, m, lp, lm

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
        dispatched = self.match_device(
            global_node_pose_in_submap,
            node_histogram,
            node_gravity_yaw,
            point_cloud,
            low_resolution_point_cloud,
            min_score,
            full_submap,
        )
        if dispatched is None:
            return None
        packed_d, ctx = dispatched
        packed = np.asarray(packed_d)
        # Beam-overflow widening (see batch_match_device_3d).
        beam = self._options.beam_width
        while packed[6] > 0.5 and beam < _MAX_WIDENED_BEAM:
            beam = min(2 * beam, _MAX_WIDENED_BEAM)
            metrics.beam_overflow_retries.increment()
            packed_d, ctx = self.match_device(
                global_node_pose_in_submap,
                node_histogram,
                node_gravity_yaw,
                point_cloud,
                low_resolution_point_cloud,
                min_score,
                full_submap,
                beam=beam,
            )
            packed = np.asarray(packed_d)
        return self.decode(packed, ctx)

    def _prepare(
        self,
        global_node_pose_in_submap: np.ndarray,
        node_histogram: np.ndarray,
        node_gravity_yaw: float,
        point_cloud: np.ndarray,
        low_resolution_point_cloud: np.ndarray,
        min_score: float,
        full_submap: bool = False,
        device_points=None,
    ):
        """Host-side search preparation (window, yaw pruning, candidate
        lattice); returns a dict of per-search arrays or None when the
        rotational histogram prunes every candidate yaw."""
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
        # Pad the surviving-yaw axis to a power of two for compile-cache
        # stability (padded rows are never indexed by candidates).
        angles_p, _ = _pad_pow2(angles_kept.astype(np.float32), 16)

        q0 = rigid3.quat(initial_pose)
        t0 = initial_pose[:3]
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
        a0, m0 = _pad_pow2(a_grid.ravel(), 1024)
        x0, _ = _pad_pow2(x_grid.ravel(), 1024)
        y0, _ = _pad_pow2(y_grid.ravel(), 1024)
        z0, _ = _pad_pow2(z_grid.ravel(), 1024)

        lorigin = np.asarray(self._low_grid.origin)
        lres = self._low_grid.resolution
        if device_points is None:
            device_points = self.stage_points(
                point_cloud, low_resolution_point_cloud
            )
        return dict(
            matcher=self,
            angles_kept=angles_kept,
            angles_p=angles_p,
            q0=np.asarray(q0, np.float32),
            t0=np.asarray(t0, np.float32),
            lorigin=np.asarray(lorigin, np.float32),
            lres=lres,
            cand=(a0, x0, y0, z0, m0),
            nl_xy=nl_xy,
            nl_z=nl_z,
            min_score=min_score,
            device_points=device_points,
            ctx=(angles_kept, rot_scores_kept, initial_pose),
        )

    def match_device(
        self,
        global_node_pose_in_submap: np.ndarray,
        node_histogram: np.ndarray,
        node_gravity_yaw: float,
        point_cloud: np.ndarray,
        low_resolution_point_cloud: np.ndarray,
        min_score: float,
        full_submap: bool = False,
        device_points=None,
        beam: Optional[int] = None,
    ):
        """Dispatch the search (no host round trip); returns
        (packed device array [7], decode ctx) or None when the rotational
        histogram prunes every candidate yaw. Callers batching searches
        stack the packed vectors and fetch once. Pass `device_points`
        (from stage_points — pre-padded HOST arrays, uploaded on each
        dispatch or spliced into the batch upload) to skip re-padding a
        node's clouds."""
        prep = self._prepare(
            global_node_pose_in_submap, node_histogram, node_gravity_yaw,
            point_cloud, low_resolution_point_cloud, min_score, full_submap,
            device_points,
        )
        if prep is None:
            return None
        opts = self._options
        points_d, pmask_d, low_points_d, low_mask_d = prep["device_points"]
        a0, x0, y0, z0, m0 = prep["cand"]

        # The entire search (incl. per-yaw rotation + discretization of the
        # clouds) runs on device — one dispatch, one fetch.
        score_d, low_d, best_d, overflowed_d = bnb_search_3d(
            self._pyramid,
            points_d,
            pmask_d,
            jnp.asarray(prep["q0"]),
            jnp.asarray(prep["t0"]),
            jnp.asarray(prep["angles_p"]),
            jnp.asarray(self._origin, dtype=jnp.float32),
            jnp.float32(self._resolution),
            self._low_prob,
            low_points_d,
            low_mask_d,
            jnp.asarray(prep["lorigin"]),
            jnp.float32(prep["lres"]),
            jnp.asarray(a0),
            jnp.asarray(x0),
            jnp.asarray(y0),
            jnp.asarray(z0),
            jnp.asarray(m0),
            jnp.int32(prep["nl_xy"]),
            jnp.int32(prep["nl_z"]),
            jnp.float32(min_score),
            jnp.float32(opts.min_low_resolution_score),
            jnp.float32(self._resolution / prep["lres"]),
            self._depth,
            beam=beam if beam is not None else opts.beam_width,
        )
        packed_d = jnp.concatenate(
            [
                score_d[None].astype(jnp.float32),
                low_d[None].astype(jnp.float32),
                best_d.astype(jnp.float32),
                overflowed_d[None].astype(jnp.float32),
            ]
        )
        return packed_d, prep["ctx"]

    def decode(self, packed: np.ndarray, ctx) -> Optional[MatchResult3D]:
        angles_kept, rot_scores_kept, initial_pose = ctx
        ba = int(packed[2])
        if ba < 0:
            return None
        score, low = float(packed[0]), float(packed[1])
        bx, by, bz = int(packed[3]), int(packed[4]), int(packed[5])
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
