"""3D scan-match refinement: 6-DoF Levenberg-Marquardt on device.

Reference: internal/3d/scan_matching/ceres_scan_matcher_3d.cc with residuals
from occupied_space_cost_function_3d.h:34-77 (per-point 1 - p interpolated
from the grid with the smoothstep tensor-product of interpolated_grid.h:36-151
— piecewise cubic with vanishing derivative at voxel centers), over BOTH
grids (high/low resolution, weights occupied_space_weight_0/1 / sqrt(N)),
plus translation and rotation deltas from the initial pose.

Parameterization: fixed quaternion q0 composed with an exponential-map
rotation delta — pose = (t, q0 * exp(r)) over x = [t(3), r(3)] — instead of
Ceres' quaternion block + local parameterization. `only_optimize_yaw`
restricts r to the z component (ConstantYawQuaternionPlus analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.mapping.hybrid_grid import LOG_ODDS_SCALE
from cartographer_tpu.mapping.paged_grid_3d import gather_probability
from cartographer_tpu.ops.scan_matching.gauss_newton_2d import (
    nonmonotonic_accepted,
    nonmonotonic_init,
    nonmonotonic_quality,
    solve_spd_small,
)


def _quat_multiply(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def _quat_exp(r):
    """Exponential map: rotation vector -> quaternion (Taylor-safe)."""
    theta2 = jnp.sum(r * r)
    theta = jnp.sqrt(theta2 + 1e-32)
    half = 0.5 * theta
    small = theta2 < 1e-12
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w[None], r * k])


def _quat_rotate(q, v):
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def _corners_pack(prob, origin, res, points, t, q):
    """Gather the 8 interpolation corners (as probabilities, OOB-filled)
    plus the integer voxel indices at pose (t, q). The corners are
    piecewise constant in the pose — carrying them across LM iterations
    makes the grid read cost ONE gather set per iteration (extraction at
    the candidate pose) instead of one per residual/Jacobian/cost
    evaluation; the Jacobian through the frozen corners equals jacfwd of
    the full residual at the extraction pose.

    `prob` may be a dense f32 probability volume, a dense int8 log-odds
    volume, or a mapping.paged_grid_3d.PagedGrid3D (the active-submap
    representation) — gather_probability handles all three."""
    world = _quat_rotate(q[None, :], points) + t[None, :]
    u = (world[:, 0] - origin[0]) / res
    v = (world[:, 1] - origin[1]) / res
    w = (world[:, 2] - origin[2]) / res
    iu = jnp.floor(u).astype(jnp.int32)
    iv = jnp.floor(v).astype(jnp.int32)
    iw = jnp.floor(w).astype(jnp.int32)

    def corner(dz, dy, dx):
        return gather_probability(prob, iw + dz, iv + dy, iu + dx)

    corners = jnp.stack(
        [
            corner(0, 0, 0), corner(0, 0, 1), corner(0, 1, 0), corner(0, 1, 1),
            corner(1, 0, 0), corner(1, 0, 1), corner(1, 1, 0), corner(1, 1, 1),
        ]
    )  # [8, N]
    return (iu, iv, iw, jax.lax.stop_gradient(corners))


def _pack_corner_volume(vol_i8):
    """[D, H, W] int8 log-odds -> [D, H+1, W+1] int32 byte-packing the
    2x2 (y, x) corner neighborhood of every base cell: byte k of
    packed[z, y+1, x+1] is the cell at (z, y + (k>>1), x + (k&1)), with
    out-of-volume neighbors encoded as byte 0 == unknown ==
    MIN_PROBABILITY (exactly gather_probability's OOB fill). Trilinear
    corner extraction then costs TWO int32 gathers per point (z and
    z+1) instead of eight byte gathers — the LM refinement is
    gather-bound on TPU (~150 M lookups/s), so this is a direct ~4x cut
    of the dominant cost. Elementwise to build (one pass over the
    volume, done once per solve)."""
    d, h, w = vol_i8.shape
    b = vol_i8.astype(jnp.int32) & 0xFF
    e = jnp.zeros((d, h + 2, w + 2), jnp.int32).at[:, 1: h + 1, 1: w + 1].set(b)
    return (
        e[:, :-1, :-1]
        | (e[:, :-1, 1:] << 8)
        | (e[:, 1:, :-1] << 16)
        | (e[:, 1:, 1:] << 24)
    )


def _corners_pack_packed(qvol, shape, origin, res, points, t, q):
    """_corners_pack twin reading a _pack_corner_volume table: identical
    corner probabilities (same int8 values, same OOB/unknown fill,
    bit-equal sigmoid inputs), two gathers per point."""
    d, h, w = shape
    world = _quat_rotate(q[None, :], points) + t[None, :]
    u = (world[:, 0] - origin[0]) / res
    v = (world[:, 1] - origin[1]) / res
    w_ = (world[:, 2] - origin[2]) / res
    iu = jnp.floor(u).astype(jnp.int32)
    iv = jnp.floor(v).astype(jnp.int32)
    iw = jnp.floor(w_).astype(jnp.int32)

    def zgather(dz):
        zz = iw + dz
        yy = iv + 1
        xx = iu + 1
        oob = (
            (zz < 0) | (zz >= d) | (yy < 0) | (yy > h) | (xx < 0) | (xx > w)
        )
        g = qvol[
            jnp.clip(zz, 0, d - 1), jnp.clip(yy, 0, h), jnp.clip(xx, 0, w)
        ]
        return jnp.where(oob, 0, g)

    g0 = zgather(0)
    g1 = zgather(1)

    def byte(g, k):
        bval = (g >> (8 * k)) & 0xFF
        val = bval - jnp.where(bval > 127, 256, 0)
        l = val.astype(jnp.float32) * LOG_ODDS_SCALE
        return jnp.where(
            val != 0, 1.0 / (1.0 + jnp.exp(-l)), pv.MIN_PROBABILITY
        )

    corners = jnp.stack(
        [
            byte(g0, 0), byte(g0, 1), byte(g0, 2), byte(g0, 3),
            byte(g1, 0), byte(g1, 1), byte(g1, 2), byte(g1, 3),
        ]
    )  # [8, N] — same (dz, dy, dx) order as _corners_pack
    return (iu, iv, iw, jax.lax.stop_gradient(corners))


def _corners_eval(pack, origin, res, points, t, q):
    """Smoothstep trilinear interpolation from carried corners;
    differentiable in (t, q) through the fractional coordinates only."""
    iu, iv, iw, c = pack
    world = _quat_rotate(q[None, :], points) + t[None, :]
    u = (world[:, 0] - origin[0]) / res
    v = (world[:, 1] - origin[1]) / res
    w = (world[:, 2] - origin[2]) / res

    def smooth(t_):
        return t_ * t_ * (3.0 - 2.0 * t_)

    tx = smooth(u - iu.astype(jnp.float32))
    ty = smooth(v - iv.astype(jnp.float32))
    tz = smooth(w - iw.astype(jnp.float32))
    c00 = c[0] + (c[1] - c[0]) * tx
    c01 = c[2] + (c[3] - c[2]) * tx
    c10 = c[4] + (c[5] - c[4]) * tx
    c11 = c[6] + (c[7] - c[6]) * tx
    c0 = c00 + (c01 - c00) * ty
    c1 = c10 + (c11 - c10) * ty
    return c0 + (c1 - c0) * tz


def interp_smoothstep_3d(prob: jax.Array, u, v, w):
    """Smoothstep tensor-product interpolation of prob [D, H, W] at
    fractional cell coords (u: x/col, v: y/row, w: z/depth); voxel centers at
    integers; out-of-bounds reads MIN_PROBABILITY. Matches
    interpolated_grid.h's piecewise cubic (zero derivative at centers).

    `prob` may also be an int8 log-odds volume (hybrid_grid.Grid3D.values)
    or a PagedGrid3D: the probability conversion then happens per gathered
    corner, which avoids materializing a float32 copy of the whole volume
    (4x the HBM traffic at 512^3) inside jitted pipelines."""
    iu = jnp.floor(u).astype(jnp.int32)
    iv = jnp.floor(v).astype(jnp.int32)
    iw = jnp.floor(w).astype(jnp.int32)

    def corner(dz, dy, dx):
        return gather_probability(prob, iw + dz, iv + dy, iu + dx)

    def smooth(t):
        return t * t * (3.0 - 2.0 * t)

    tx, ty, tz = smooth(u - iu), smooth(v - iv), smooth(w - iw)
    c000 = corner(0, 0, 0)
    c001 = corner(0, 0, 1)
    c010 = corner(0, 1, 0)
    c011 = corner(0, 1, 1)
    c100 = corner(1, 0, 0)
    c101 = corner(1, 0, 1)
    c110 = corner(1, 1, 0)
    c111 = corner(1, 1, 1)
    c00 = c000 + (c001 - c000) * tx
    c01 = c010 + (c011 - c010) * tx
    c10 = c100 + (c101 - c100) * tx
    c11 = c110 + (c111 - c110) * tx
    c0 = c00 + (c01 - c00) * ty
    c1 = c10 + (c11 - c10) * ty
    return c0 + (c1 - c0) * tz


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations",
        "only_optimize_yaw",
        "use_nonmonotonic_steps",
    ),
)
def match_3d_intensity(
    high_prob: jax.Array,
    high_origin: jax.Array,
    low_prob: jax.Array,
    low_origin: jax.Array,
    intensity_avg: jax.Array,  # f32 [D, H, W] average intensity (0 unknown)
    initial_translation: jax.Array,
    initial_quat: jax.Array,
    target_translation: jax.Array,
    high_points: jax.Array,
    high_mask: jax.Array,
    high_intensities: jax.Array,  # f32 [N0]
    low_points: jax.Array,
    low_mask: jax.Array,
    high_resolution: float,
    low_resolution: float,
    occupied_space_weight_0: float,
    occupied_space_weight_1: float,
    intensity_weight: float,
    intensity_huber_scale: float,
    intensity_threshold: float,
    translation_weight: float,
    rotation_weight: float,
    max_iterations: int = 12,
    only_optimize_yaw: bool = False,
    use_nonmonotonic_steps: bool = False,
):
    """match_3d plus the intensity residual block
    (intensity_cost_function_3d.cc: Huber-robustified difference between the
    interpolated average-intensity grid and the measured intensity, for
    points below the intensity threshold)."""

    def intensity_extract(t, q):
        return _corners_pack(
            intensity_avg, high_origin, high_resolution, high_points, t, q
        )

    def intensity_residual(t, q, pack):
        interp = _corners_eval(
            pack, high_origin, high_resolution, high_points, t, q
        )
        n_used = jnp.maximum(
            jnp.sum(high_mask & (high_intensities <= intensity_threshold)), 1
        ).astype(jnp.float32)
        scale = intensity_weight / jnp.sqrt(n_used)
        r = scale * (interp - high_intensities)
        # Huber IRLS factor (safe-where).
        s = r * r
        delta2 = intensity_huber_scale * intensity_huber_scale
        over = s > delta2
        s_safe = jnp.where(over, s, delta2)
        factor = jnp.where(
            over,
            jnp.sqrt(
                (2.0 * intensity_huber_scale * jnp.sqrt(s_safe) - delta2) / s_safe
            ),
            1.0,
        )
        use = high_mask & (high_intensities <= intensity_threshold)
        return jnp.where(use, r * factor, 0.0)

    return _match_3d_impl(
        high_prob, high_origin, low_prob, low_origin,
        initial_translation, initial_quat, target_translation,
        high_points, high_mask, low_points, low_mask,
        high_resolution, low_resolution,
        occupied_space_weight_0, occupied_space_weight_1,
        translation_weight, rotation_weight,
        max_iterations, only_optimize_yaw,
        extra_block=(intensity_extract, intensity_residual),
        use_nonmonotonic_steps=use_nonmonotonic_steps,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations",
        "only_optimize_yaw",
        "use_nonmonotonic_steps",
    ),
)
def match_3d(
    high_prob: jax.Array,
    high_origin: jax.Array,
    low_prob: jax.Array,
    low_origin: jax.Array,
    initial_translation: jax.Array,
    initial_quat: jax.Array,
    target_translation: jax.Array,
    high_points: jax.Array,
    high_mask: jax.Array,
    low_points: jax.Array,
    low_mask: jax.Array,
    high_resolution: float,
    low_resolution: float,
    occupied_space_weight_0: float,
    occupied_space_weight_1: float,
    translation_weight: float,
    rotation_weight: float,
    max_iterations: int = 12,
    only_optimize_yaw: bool = False,
    use_nonmonotonic_steps: bool = False,
):
    """Returns (translation [3], quaternion [4], cost)."""
    return _match_3d_impl(
        high_prob, high_origin, low_prob, low_origin,
        initial_translation, initial_quat, target_translation,
        high_points, high_mask, low_points, low_mask,
        high_resolution, low_resolution,
        occupied_space_weight_0, occupied_space_weight_1,
        translation_weight, rotation_weight,
        max_iterations, only_optimize_yaw,
        extra_block=None,
        use_nonmonotonic_steps=use_nonmonotonic_steps,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations",
        "only_optimize_yaw",
        "use_nonmonotonic_steps",
    ),
)
def match_3d_batch(
    high_prob,  # [K, D, H, W] per-lane high-res volumes
    high_origin,  # [K, 3]
    low_prob,  # [K, Dl, Hl, Wl]
    low_origin,  # [K, 3]
    initial_translation,  # [K, 3]
    initial_quat,  # [K, 4]
    target_translation,  # [K, 3]
    high_points,  # [K, N, 3]
    high_mask,  # [K, N]
    low_points,  # [K, Nl, 3]
    low_mask,  # [K, Nl]
    high_resolution,  # [K]
    low_resolution,  # [K]
    occupied_space_weight_0: float,
    occupied_space_weight_1: float,
    translation_weight: float,
    rotation_weight: float,
    max_iterations: int = 12,
    only_optimize_yaw: bool = False,
    use_nonmonotonic_steps: bool = False,
):
    """Vmapped dual-grid LM refinement over a drain's accepted matches:
    one device program refines every (node, submap) match of a chunk —
    the reference refines each on its own ThreadPool task
    (constraint_builder_3d.cc). Returns [K, 8] packed rows
    [t(3), q(4), cost]."""

    def one(hv, ho, lv, lo, t, q, tt, p, pm, lp_, lm_, hr, lr):
        return _match_3d_impl(
            hv, ho, lv, lo, t, q, tt, p, pm, lp_, lm_, hr, lr,
            occupied_space_weight_0, occupied_space_weight_1,
            translation_weight, rotation_weight,
            max_iterations, only_optimize_yaw,
            extra_block=None,
            use_nonmonotonic_steps=use_nonmonotonic_steps,
        )

    return jax.vmap(one)(
        high_prob, high_origin, low_prob, low_origin,
        initial_translation, initial_quat, target_translation,
        high_points, high_mask, low_points, low_mask,
        high_resolution, low_resolution,
    )


def _match_3d_impl(
    high_prob,
    high_origin,
    low_prob,
    low_origin,
    initial_translation,
    initial_quat,
    target_translation,
    high_points,
    high_mask,
    low_points,
    low_mask,
    high_resolution,
    low_resolution,
    occupied_space_weight_0,
    occupied_space_weight_1,
    translation_weight,
    rotation_weight,
    max_iterations,
    only_optimize_yaw,
    extra_block=None,
    use_nonmonotonic_steps=False,
):
    """LM loop with carried interpolation corners (see _corners_pack) and
    Ceres-style early exit (function_tolerance 1e-6 / collapsed trust
    region), so the grid read costs ONE gather set per iteration.
    extra_block = (extract(t, q) -> pack, residual(t, q, pack) -> [R])."""
    n0 = jnp.maximum(jnp.sum(high_mask), 1).astype(jnp.float32)
    n1 = jnp.maximum(jnp.sum(low_mask), 1).astype(jnp.float32)
    w0 = occupied_space_weight_0 / jnp.sqrt(n0)
    w1 = occupied_space_weight_1 / jnp.sqrt(n1)

    def decode(x):
        t = x[:3]
        r = x[3:6]
        if only_optimize_yaw:
            r = r * jnp.asarray([0.0, 0.0, 1.0])
        q = _quat_multiply(initial_quat, _quat_exp(r))
        return t, q / jnp.linalg.norm(q), r

    # Dense int8 log-odds volumes get the byte-packed corner tables
    # (two gathers per point instead of eight — see _pack_corner_volume);
    # paged and f32 volumes keep the per-corner gather path.
    def _packable(vol):
        return hasattr(vol, "dtype") and vol.dtype == jnp.int8

    high_packed = _pack_corner_volume(high_prob) if _packable(high_prob) else None
    low_packed = _pack_corner_volume(low_prob) if _packable(low_prob) else None

    def _pack_grid(vol, packed, origin, res, points, t, q):
        if packed is not None:
            return _corners_pack_packed(
                packed, vol.shape, origin, res, points, t, q
            )
        return _corners_pack(vol, origin, res, points, t, q)

    def extract_all(x):
        t, q, _ = decode(x)
        packs = [
            _pack_grid(
                high_prob, high_packed, high_origin, high_resolution,
                high_points, t, q,
            ),
            _pack_grid(
                low_prob, low_packed, low_origin, low_resolution,
                low_points, t, q,
            ),
        ]
        if extra_block is not None:
            packs.append(extra_block[0](t, q))
        return tuple(packs)

    def residuals_given(x, packs):
        t, q, r = decode(x)
        # Voxel centers at origin + idx * res (reference GetCellIndex uses
        # RoundToInt), so the fractional cell coordinate is (x - origin)/res.
        p0 = _corners_eval(
            packs[0], high_origin, high_resolution, high_points, t, q
        )
        p1 = _corners_eval(
            packs[1], low_origin, low_resolution, low_points, t, q
        )
        occ0 = jnp.where(high_mask, w0 * (1.0 - p0), 0.0)
        occ1 = jnp.where(low_mask, w1 * (1.0 - p1), 0.0)
        extra = jnp.concatenate(
            [
                translation_weight * (t - target_translation),
                rotation_weight * r,
            ]
        )
        parts = [occ0, occ1, extra]
        if extra_block is not None:
            parts.append(extra_block[1](t, q, packs[2]))
        return jnp.concatenate(parts)

    def cost_of(x, packs):
        rr = residuals_given(x, packs)
        return 0.5 * jnp.sum(rr * rr)

    def cond(carry):
        x, packs, lam, cost, it, done, ev = carry
        return (it < max_iterations) & ~done

    def step(carry):
        x, packs, lam, cost, it, done, ev = carry
        r = residuals_given(x, packs)
        jac = jax.jacfwd(residuals_given)(x, packs)
        jtj = jac.T @ jac
        jtr = jac.T @ r
        damped = jtj + lam * jnp.diag(jnp.diag(jtj) + 1e-9)
        delta = -solve_spd_small(damped, jtr)
        new_x = x + delta
        # One gather set per iteration (at the candidate pose). A
        # drift-gated lax.cond reuse was measured SLOWER on TPU — the
        # branch does not stay conditional after lowering.
        new_packs = extract_all(new_x)
        new_cost = cost_of(new_x, new_packs)
        if use_nonmonotonic_steps:
            # Ceres nonmonotonic trust region (pose_graph.lua:35 enables
            # it for loop-closure refinement by default).
            model_cost_change = -(jtr @ delta + 0.5 * delta @ (jtj @ delta))
            mcc = jnp.maximum(model_cost_change, 1e-30)
            quality = nonmonotonic_quality(ev, cost, new_cost, mcc)
            accept = (model_cost_change > 0.0) & (quality > 1e-3)
            ev = nonmonotonic_accepted(ev, new_cost, mcc, accept)
        else:
            accept = new_cost < cost
        converged = (
            accept & (jnp.abs(cost - new_cost) <= 1e-6 * cost)
        ) | (~accept & (lam > 1e3))
        x = jnp.where(accept, new_x, x)
        packs = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), new_packs, packs
        )
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-12), lam * 4.0)
        return (x, packs, lam, cost, it + 1, converged, ev)

    x0 = jnp.concatenate([initial_translation, jnp.zeros(3, jnp.float32)])
    packs0 = extract_all(x0)
    cost0 = cost_of(x0, packs0)
    init = (
        x0, packs0, jnp.float32(1e-4), cost0,
        jnp.int32(0), jnp.asarray(False), nonmonotonic_init(cost0),
    )
    x, _, _, cost, _, _, _ = jax.lax.while_loop(cond, step, init)
    t, q, _ = decode(x)
    # One packed result vector: the host pays a single device->host round
    # trip per scan (the link to a remote-attached TPU is latency-bound).
    return jnp.concatenate([t, q, cost[None]])
