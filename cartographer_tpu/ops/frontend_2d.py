"""Fully device-resident 2D local-SLAM frontend (chunked).

The per-scan host orchestration of LocalTrajectoryBuilder2D (reference:
mapping/internal/2d/local_trajectory_builder_2d.cc:38-368) costs two
blocking host<->device round trips per scan — the dominant cost on a
remote-attached TPU. This module runs the ENTIRE per-scan pipeline on
device inside one `lax.scan` over a chunk of scans:

    constant-velocity pose extrapolation (pose_extrapolator.cc:35-262,
    planar no-IMU specialization) -> per-point motion unwarp -> min/max
    range split (local_trajectory_builder_2d.cc:139-170) -> gravity
    alignment + z-crop + voxel filter (:51-63) -> adaptive voxel filter
    (sensor/internal/voxel_filter.cc:38-75) -> Gauss-Newton scan match
    (ceres_scan_matcher_2d.cc) -> extrapolator pose update -> motion
    filter (internal/motion_filter.cc:40-60) -> ray-cast insertion into
    the two active submaps with submap rotation
    (mapping/2d/submap_2d.cc:137-219).

One dispatch + one device_get per chunk; grids never leave the device.

Scope (asserted by the host wrapper in mapping/chunked_frontend_2d.py):
no IMU, no odometry (constant-velocity planar extrapolation),
num_accumulated_range_data == 1, probability grids, no online
correlative matching. The general path remains
mapping/local_trajectory_builder_2d.py.

Planar specialization: without IMU the reference's ImuTracker sees only
fake gravity [0,0,1] and pose-derived angular velocity (0,0,wz)
(pose_extrapolator.cc:201-210), so every orientation in the chain is a
pure yaw rotation; quaternions reduce to yaw scalars exactly.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from flax import struct

from cartographer_tpu.ops import raycast_2d
from cartographer_tpu.ops.scan_matching import gauss_newton_2d

MIN_PROBABILITY = 0.1


# -- device voxel filters -----------------------------------------------------


def _voxel_keys_i32(points, valid, length):
    """Per-point packed voxel keys (two int32 lanes). Axis index fits in
    int16 (|coord| <= ~160 m at the smallest adaptive length); invalid
    points get the maximal key so they sort last."""
    idx = jnp.round(points / length).astype(jnp.int32)  # [N, 3]
    key_a = ((idx[:, 0] & 0xFFFF) << 16) | (idx[:, 1] & 0xFFFF)
    key_b = idx[:, 2]
    big = jnp.int32(0x7FFFFFFF)
    return (
        jnp.where(valid, key_a, big),
        jnp.where(valid, key_b, big),
    )


def voxel_first_mask(points, valid, length):
    """First-occurrence-per-voxel mask (scan order) — the semantics of
    sensor/voxel_filter.voxel_filter_indices, on device with static
    shapes. Returns bool [N]."""
    key_a, key_b = _voxel_keys_i32(points, valid, length)
    perm = jnp.lexsort((key_b, key_a))  # stable; primary key_a
    sa = key_a[perm]
    sb = key_b[perm]
    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1]),
        ]
    )
    mask = jnp.zeros(points.shape[0], bool).at[perm].set(first)
    return mask & valid


def voxel_unique_count(points, valid, length):
    """Number of occupied voxels among valid points."""
    return jnp.sum(voxel_first_mask(points, valid, length))


def adaptive_voxel_mask(points, valid, max_length, min_num_points):
    """Device mirror of sensor/voxel_filter.adaptive_voxel_filter (minus
    its max_range pre-filter, which the caller folds into `valid`):
    halve the voxel edge until at least min_num_points survive, then
    binary-search the edge to within 10% (voxel_filter.cc:50-74)."""
    n0 = jnp.sum(valid)

    def count_at(length):
        return voxel_unique_count(points, valid, length)

    cnt_max = count_at(max_length)
    skip = cnt_max >= min_num_points

    # Halving phase: find the largest `low = high/2` with enough points.
    def halve_cond(carry):
        high, low, found = carry
        return (~found) & (high > 1e-2 * max_length)

    def halve_body(carry):
        high, _, _ = carry
        low = high * 0.5
        found = count_at(low) >= min_num_points
        return (jnp.where(found, high, low), low, found)

    high0 = jnp.float32(max_length)
    high_f, low_f, low_found = jax.lax.while_loop(
        halve_cond, halve_body, (high0, high0, skip)
    )

    # Bisection phase (only meaningful when the halving phase found a low).
    run_bisect = low_found & ~skip

    def bis_cond(carry):
        low, high = carry
        return run_bisect & ((high - low) / low > 1e-1)

    def bis_body(carry):
        low, high = carry
        mid = 0.5 * (low + high)
        ok = count_at(mid) >= min_num_points
        return (jnp.where(ok, mid, low), jnp.where(ok, high, mid))

    low_b, _ = jax.lax.while_loop(bis_cond, bis_body, (low_f, high_f))

    final_length = jnp.where(
        skip, max_length, jnp.where(low_found, low_b, low_f)
    )
    mask = voxel_first_mask(points, valid, final_length)
    # Sparse clouds are returned unfiltered (voxel_filter.cc:42-44).
    return jnp.where(n0 <= min_num_points, valid, mask)


# -- frontend state -----------------------------------------------------------


@struct.dataclass
class FrontendState2D:
    """Device state carried across scans/chunks. All times are float32
    offsets from a host-managed epoch (rebased every chunk for precision).
    """

    # Pose queue (PoseExtrapolator timed_pose_queue, planar, length 2).
    older_t: jax.Array
    older_xy: jax.Array  # [2]
    older_yaw: jax.Array
    newest_t: jax.Array
    newest_xy: jax.Array  # [2]
    newest_yaw: jax.Array
    queue_len: jax.Array  # i32 (1 or 2)
    # Velocities from poses (pose_extrapolator.cc:261-280).
    vel: jax.Array  # [2] linear (planar)
    omega: jax.Array  # yaw rate
    # ImuTracker yaw (fake-gravity planar integration); advanced to
    # newest_t at every add_pose, so tracker_time == newest_t.
    tracker_yaw: jax.Array
    # Extrapolation frontier (get_last_extrapolated_time()).
    last_extrap_t: jax.Array
    # Motion filter memory.
    mf_valid: jax.Array  # bool
    mf_t: jax.Array
    mf_xy: jax.Array  # [2]
    mf_yaw: jax.Array
    # Active submaps: slot 0 = older, slot 1 = newer.
    grids_lo: jax.Array  # f32 [2, H, W]
    grids_known: jax.Array  # bool [2, H, W]
    grid_origin: jax.Array  # f32 [2, 2]
    anchor: jax.Array  # f32 [2, 2] submap local_pose translation
    counts: jax.Array  # i32 [2]
    slot_valid: jax.Array  # bool [2]


def init_state(grid_size: int, t0: float = 0.0) -> FrontendState2D:
    """State after PoseExtrapolator init with identity pose at t0
    (pose_extrapolator_interface.create_without_imu)."""
    f = jnp.float32
    return FrontendState2D(
        older_t=f(t0),
        older_xy=jnp.zeros(2, jnp.float32),
        older_yaw=f(0.0),
        newest_t=f(t0),
        newest_xy=jnp.zeros(2, jnp.float32),
        newest_yaw=f(0.0),
        queue_len=jnp.int32(1),
        vel=jnp.zeros(2, jnp.float32),
        omega=f(0.0),
        tracker_yaw=f(0.0),
        last_extrap_t=f(t0),
        mf_valid=jnp.asarray(False),
        mf_t=f(0.0),
        mf_xy=jnp.zeros(2, jnp.float32),
        mf_yaw=f(0.0),
        grids_lo=jnp.zeros((2, grid_size, grid_size), jnp.float32),
        grids_known=jnp.zeros((2, grid_size, grid_size), bool),
        grid_origin=jnp.zeros((2, 2), jnp.float32),
        anchor=jnp.zeros((2, 2), jnp.float32),
        counts=jnp.zeros(2, jnp.int32),
        slot_valid=jnp.zeros(2, bool),
    )


@dataclasses.dataclass(frozen=True)
class FrontendConfig2D:
    """Static (compile-time) configuration, from TrajectoryBuilder2DOptions."""

    grid_size: int
    resolution: float
    num_range_data: int
    hit_log_odds: float
    miss_log_odds: float
    insert_free_space: bool
    min_range: float
    max_range: float
    missing_data_ray_length: float
    min_z: float
    max_z: float
    voxel_filter_size: float
    avf_max_length: float
    avf_min_num_points: int
    avf_max_range: float
    occupied_space_weight: float
    translation_weight: float
    rotation_weight: float
    gn_iterations: int
    mf_max_time: float
    mf_max_distance: float
    mf_max_angle: float
    pose_queue_duration: float
    num_steps: int  # supercover crossings bound (ceil(max ray / res) + 2)
    # Whether any scan in the chunk has points beyond max_range (the host
    # knows exactly: ranges are invariant under the rigid unwarp). When
    # False, all missing-echo processing and outputs are compiled out.
    has_misses: bool = True
    # Debug: comma-separated stages to stub out when isolating perf
    # ("voxel", "adaptive", "match", "insert"). Not for production use.
    disable: str = ""


def _wrap_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def _rot2(yaw, xy):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [c * xy[..., 0] - s * xy[..., 1], s * xy[..., 0] + c * xy[..., 1]],
        axis=-1,
    )


def _scan_body(cfg: FrontendConfig2D, carry, x):
    state, fin = carry
    points, pmask, ptimes, t_scan, sensor_origin = x
    f32 = jnp.float32
    half = 0.5 * cfg.grid_size * cfg.resolution

    # -- skip gate: extrapolator still initializing
    # (local_trajectory_builder_2d.cc:131-137).
    active = ptimes[0] >= state.newest_t

    # -- per-point unwarp (ExtrapolatePose vectorized) -----------------------
    pt = jnp.maximum(ptimes, state.last_extrap_t)
    pt = jax.lax.associative_scan(jnp.maximum, pt)
    dtp = pt - state.newest_t
    yaw_i = state.newest_yaw + state.omega * dtp  # [N]
    tr_i = state.newest_xy[None, :] + state.vel[None, :] * dtp[:, None]
    origins_w_xy = _rot2(yaw_i, sensor_origin[None, :2]) + tr_i
    origins_w = jnp.concatenate(
        [origins_w_xy, jnp.full((pt.shape[0], 1), sensor_origin[2], f32)], axis=1
    )
    hits_w_xy = _rot2(yaw_i, points[:, :2]) + tr_i
    hits_w = jnp.concatenate([hits_w_xy, points[:, 2:3]], axis=1)
    delta = hits_w - origins_w
    ranges = jnp.linalg.norm(delta, axis=1)
    keep = pmask & (ranges >= cfg.min_range)
    as_return = keep & (ranges <= cfg.max_range)
    if cfg.has_misses:
        as_miss = keep & (ranges > cfg.max_range)
        miss_w = origins_w + (
            cfg.missing_data_ray_length / jnp.maximum(ranges, 1e-12)
        )[:, None] * delta

    # -- gravity alignment at the last point's pose ---------------------------
    t_last = pt[-1]
    dt_last = t_last - state.newest_t
    last_yaw = state.newest_yaw + state.omega * dt_last
    last_xy = state.newest_xy + state.vel * dt_last
    last_origin_w = origins_w[-1]
    # estimate_gravity_orientation(t_scan): main tracker yaw advanced by the
    # current pose-derived angular velocity.
    g_yaw = state.tracker_yaw + state.omega * (t_scan - state.newest_t)
    a = g_yaw - last_yaw  # to_gravity = rot(g_yaw) * inverse(last_pose)

    def to_ga(p):
        xy = _rot2(a, p[:, :2] - last_xy[None, :])
        return jnp.concatenate([xy, p[:, 2:3]], axis=1)

    ga_hits = to_ga(hits_w)
    ga_origin_xy = _rot2(a, last_origin_w[None, :2] - last_xy[None, :])[0]

    # -- z-crop + voxel filter (range_data.crop + voxel_filter) ---------------
    crop_h = (ga_hits[:, 2] >= cfg.min_z) & (ga_hits[:, 2] <= cfg.max_z)
    if "voxel" in cfg.disable:
        ret_mask = as_return & crop_h
    else:
        ret_mask = voxel_first_mask(
            ga_hits, as_return & crop_h, cfg.voxel_filter_size
        )
    if cfg.has_misses:
        ga_miss = to_ga(miss_w)
        crop_m = (ga_miss[:, 2] >= cfg.min_z) & (ga_miss[:, 2] <= cfg.max_z)
        if "voxel" in cfg.disable:
            miss_mask = as_miss & crop_m
        else:
            miss_mask = voxel_first_mask(
                ga_miss, as_miss & crop_m, cfg.voxel_filter_size
            )

    # -- pose prediction (project2d(extrapolate ∘ rot(gravity)^-1)) -----------
    dt_s = t_scan - state.newest_t
    pred = jnp.stack(
        [
            state.newest_xy[0] + state.vel[0] * dt_s,
            state.newest_xy[1] + state.vel[1] * dt_s,
            _wrap_angle(state.newest_yaw + state.omega * dt_s - g_yaw),
        ]
    )

    # -- adaptive voxel filter for the matching cloud --------------------------
    rr = jnp.linalg.norm(ga_hits, axis=1)
    avf_valid = ret_mask & (rr <= cfg.avf_max_range)
    if "adaptive" in cfg.disable:
        adaptive_mask = avf_valid
    else:
        adaptive_mask = adaptive_voxel_mask(
            ga_hits, avf_valid, cfg.avf_max_length, cfg.avf_min_num_points
        )
    matched = active & jnp.any(ret_mask) & jnp.any(adaptive_mask)

    # -- Gauss-Newton match against the older active submap -------------------
    slot0_prob = jnp.where(
        state.grids_known[0],
        1.0 / (1.0 + jnp.exp(-state.grids_lo[0])),
        MIN_PROBABILITY,
    )
    if "match" in cfg.disable:
        gn_pose = pred
    else:
        gn_pose, _gn_cost = gauss_newton_2d.match.__wrapped__(
            1.0 - slot0_prob,
            state.grid_origin[0],
            pred,
            pred[:2],
            ga_hits[:, :2],
            adaptive_mask,
            cfg.resolution,
            cfg.occupied_space_weight,
            cfg.translation_weight,
            cfg.rotation_weight,
            cfg.gn_iterations,
        )
    pose2d = jnp.where(state.slot_valid[0] & matched, gn_pose, pred)
    pose2d = pose2d.at[2].set(_wrap_angle(pose2d[2]))
    yaw_tot = _wrap_angle(pose2d[2] + g_yaw)  # pose_estimate yaw (SE(3))

    # -- extrapolator add_pose -------------------------------------------------
    tracker_yaw_new = g_yaw  # advance main tracker to t_scan (same formula)
    queue_delta = t_scan - state.newest_t
    do_update = (state.queue_len >= 1) & (queue_delta >= cfg.pose_queue_duration)
    vel_new = jnp.where(
        do_update, (pose2d[:2] - state.newest_xy) / jnp.maximum(queue_delta, 1e-12),
        state.vel,
    )
    omega_new = jnp.where(
        do_update,
        _wrap_angle(yaw_tot - state.newest_yaw) / jnp.maximum(queue_delta, 1e-12),
        state.omega,
    )

    def upd(old, new):
        return jnp.where(matched, new, old)

    state = state.replace(
        older_t=upd(state.older_t, state.newest_t),
        older_xy=upd(state.older_xy, state.newest_xy),
        older_yaw=upd(state.older_yaw, state.newest_yaw),
        newest_t=upd(state.newest_t, t_scan),
        newest_xy=upd(state.newest_xy, pose2d[:2]),
        newest_yaw=upd(state.newest_yaw, yaw_tot),
        queue_len=upd(state.queue_len, jnp.minimum(state.queue_len + 1, 2)),
        vel=upd(state.vel, vel_new),
        omega=upd(state.omega, omega_new),
        tracker_yaw=upd(state.tracker_yaw, tracker_yaw_new),
        last_extrap_t=jnp.where(active, t_last, state.last_extrap_t),
    )

    # -- motion filter (on the SE(3) pose estimate) ----------------------------
    similar = (
        state.mf_valid
        & ((t_scan - state.mf_t) <= cfg.mf_max_time)
        & (jnp.linalg.norm(pose2d[:2] - state.mf_xy) <= cfg.mf_max_distance)
        & (jnp.abs(_wrap_angle(yaw_tot - state.mf_yaw)) <= cfg.mf_max_angle)
    )
    insert = matched & ~similar
    state = state.replace(
        mf_valid=state.mf_valid | insert,
        mf_t=jnp.where(insert, t_scan, state.mf_t),
        mf_xy=jnp.where(insert, pose2d[:2], state.mf_xy),
        mf_yaw=jnp.where(insert, yaw_tot, state.mf_yaw),
    )

    # -- submap rotation (ActiveSubmaps2D::InsertRangeData) --------------------
    local_hits = _rot2(pose2d[2], ga_hits[:, :2]) + pose2d[None, :2]
    local_origin = _rot2(pose2d[2], ga_origin_xy[None, :])[0] + pose2d[:2]

    newest_count = jnp.where(state.slot_valid[1], state.counts[1], state.counts[0])
    need_first = insert & ~state.slot_valid[0]
    need_new = insert & state.slot_valid[0] & (newest_count == cfg.num_range_data)
    pop = need_new & state.slot_valid[1]
    created = need_first | need_new

    # Record the popped (finished) submap's grid in the chunk-level ring
    # buffer (pops happen every num_range_data inserts; the buffer is sized
    # for the chunk's worst case).
    cnt = fin["count"]
    fin = {
        "count": cnt + pop.astype(jnp.int32),
        "lo": fin["lo"].at[cnt].set(
            jnp.where(pop, state.grids_lo[0], fin["lo"][cnt])
        ),
        "known": fin["known"].at[cnt].set(
            jnp.where(pop, state.grids_known[0], fin["known"][cnt])
        ),
        "origin": fin["origin"].at[cnt].set(
            jnp.where(pop, state.grid_origin[0], fin["origin"][cnt])
        ),
        "anchor": fin["anchor"].at[cnt].set(
            jnp.where(pop, state.anchor[0], fin["anchor"][cnt])
        ),
    }

    new_origin = local_origin - half
    zero_lo = jnp.zeros_like(state.grids_lo[0])
    zero_known = jnp.zeros_like(state.grids_known[0])

    # pop: shift slot1 -> slot0, fresh slot1.
    grids_lo = jnp.where(
        pop,
        jnp.stack([state.grids_lo[1], zero_lo]),
        state.grids_lo,
    )
    grids_known = jnp.where(
        pop,
        jnp.stack([state.grids_known[1], zero_known]),
        state.grids_known,
    )
    grid_origin = jnp.where(
        pop, jnp.stack([state.grid_origin[1], new_origin]), state.grid_origin
    )
    anchor = jnp.where(
        pop, jnp.stack([state.anchor[1], local_origin]), state.anchor
    )
    counts = jnp.where(
        pop, jnp.stack([state.counts[1], jnp.int32(0)]), state.counts
    )
    # first submap in slot0 / second submap in slot1 (no pop).
    grids_lo = jnp.where(need_first, grids_lo.at[0].set(zero_lo), grids_lo)
    grids_known = jnp.where(
        need_first, grids_known.at[0].set(zero_known), grids_known
    )
    grid_origin = jnp.where(
        need_first, grid_origin.at[0].set(new_origin), grid_origin
    )
    anchor = jnp.where(need_first, anchor.at[0].set(local_origin), anchor)
    counts = jnp.where(need_first, counts.at[0].set(0), counts)

    add_second = need_new & ~state.slot_valid[1]
    grid_origin = jnp.where(
        add_second, grid_origin.at[1].set(new_origin), grid_origin
    )
    anchor = jnp.where(add_second, anchor.at[1].set(local_origin), anchor)
    counts = jnp.where(add_second, counts.at[1].set(0), counts)
    slot_valid = jnp.stack(
        [
            state.slot_valid[0] | need_first,
            state.slot_valid[1] | need_new,
        ]
    )

    # -- ray-cast insertion into all valid slots -------------------------------
    n = local_hits.shape[0]
    if cfg.has_misses:
        local_miss = _rot2(pose2d[2], ga_miss[:, :2]) + pose2d[None, :2]
        ends = jnp.concatenate([local_hits, local_miss], axis=0)  # [2N, 2]
        is_hit = jnp.concatenate([ret_mask, jnp.zeros(n, bool)])
        ray_valid = jnp.concatenate([ret_mask, miss_mask]) & insert
    else:
        ends = local_hits
        is_hit = ret_mask
        ray_valid = ret_mask & insert

    origin_cell = (local_origin[None, :] - grid_origin) / cfg.resolution  # [2,2]
    ends_cell = (ends[None, :, :] - grid_origin[:, None, :]) / cfg.resolution
    if "insert" in cfg.disable:
        new_lo, new_known = grids_lo, grids_known
    else:
        new_lo, new_known = jax.vmap(
            raycast_2d.insert_scan_dense.__wrapped__,
            in_axes=(0, 0, 0, 0, None, None, None, None, None),
        )(
            grids_lo,
            grids_known,
            origin_cell,
            ends_cell,
            is_hit,
            ray_valid,
            cfg.hit_log_odds,
            cfg.miss_log_odds,
            cfg.insert_free_space,
        )
    slot_insert = slot_valid & insert
    grids_lo = jnp.where(slot_insert[:, None, None], new_lo, grids_lo)
    grids_known = jnp.where(slot_insert[:, None, None], new_known, grids_known)
    counts = counts + slot_insert.astype(jnp.int32)
    finished = slot_valid[0] & insert & (counts[0] == 2 * cfg.num_range_data)

    state = state.replace(
        grids_lo=grids_lo,
        grids_known=grids_known,
        grid_origin=grid_origin,
        anchor=anchor,
        counts=counts,
        slot_valid=slot_valid,
    )

    out = {
        "matched": matched,
        "pose2d": pose2d,
        "g_yaw": g_yaw,
        "inserted": insert,
        "created": created,
        "popped": pop,
        "finished": finished,
        "new_anchor": local_origin,
        "counts": counts,
        "ga_hits": ga_hits,
        "ret_mask": ret_mask,
        "adaptive_mask": adaptive_mask,
        "ga_origin": ga_origin_xy,
    }
    if cfg.has_misses:
        out["ga_miss"] = ga_miss
        out["miss_mask"] = miss_mask
    return (state, fin), out


# Per-scan scalar output layout in the packed [C, 16] array.
SCALARS = (
    "matched", "pose_x", "pose_y", "pose_yaw", "g_yaw", "inserted",
    "created", "popped", "finished", "anchor_x", "anchor_y",
    "count0", "count1", "ga_origin_x", "ga_origin_y",
)
SIDX = {k: i for i, k in enumerate(SCALARS)}


@functools.partial(jax.jit, static_argnames=("cfg",))
def run_chunk(
    cfg: FrontendConfig2D,
    state: FrontendState2D,
    epoch_shift: jax.Array,  # f32; subtracted from all state times
    scan_input: jax.Array,  # f32 [C, N, 5]: x, y, z, point_time, valid
    scan_meta: jax.Array,  # f32 [C, 4]: t_scan, sensor origin xyz
):
    """Process a chunk of C scans.

    Inputs/outputs are packed into single contiguous arrays: the host link
    may be high-latency (remote-attached TPU), so the host pays exactly one
    upload and one download per chunk.

    Returns (state, fin, out_points, out_scalars [C, 15]):
      out_points: [C, N, 7] (ga_hit xyz, ga_miss xyz, mask code) when
        cfg.has_misses, else [C, N, 4] (ga_hit xyz, mask code); mask code
        is 0 none / 1 return / 2 return+adaptive / 3 miss;
      out_scalars: see SCALARS.
    """
    state = state.replace(
        older_t=state.older_t - epoch_shift,
        newest_t=state.newest_t - epoch_shift,
        last_extrap_t=state.last_extrap_t - epoch_shift,
        mf_t=state.mf_t - epoch_shift,
    )
    g = cfg.grid_size
    c = scan_input.shape[0]
    # Ring of finished-submap snapshots: one pop per num_range_data inserts.
    r = c // cfg.num_range_data + 1
    fin0 = {
        "count": jnp.int32(0),
        "lo": jnp.zeros((r, g, g), jnp.float32),
        "known": jnp.zeros((r, g, g), bool),
        "origin": jnp.zeros((r, 2), jnp.float32),
        "anchor": jnp.zeros((r, 2), jnp.float32),
    }
    points = scan_input[:, :, :3]
    ptimes = scan_input[:, :, 3]
    pmask = scan_input[:, :, 4] > 0.5
    t_scan = scan_meta[:, 0]
    sensor_origin = scan_meta[:, 1:4]

    def body(c, x):
        return _scan_body(cfg, c, x)

    (state, fin), outs = jax.lax.scan(
        body, (state, fin0), (points, pmask, ptimes, t_scan, sensor_origin)
    )

    mask_code = (
        outs["ret_mask"].astype(jnp.float32)
        + outs["adaptive_mask"].astype(jnp.float32)
    )
    if cfg.has_misses:
        mask_code = mask_code + 3.0 * outs["miss_mask"].astype(jnp.float32)
        out_points = jnp.concatenate(
            [outs["ga_hits"], outs["ga_miss"], mask_code[..., None]], axis=-1
        )
    else:
        out_points = jnp.concatenate(
            [outs["ga_hits"], mask_code[..., None]], axis=-1
        )
    f = lambda k: outs[k].astype(jnp.float32)
    out_scalars = jnp.stack(
        [
            f("matched"),
            outs["pose2d"][:, 0], outs["pose2d"][:, 1], outs["pose2d"][:, 2],
            f("g_yaw"),
            f("inserted"), f("created"), f("popped"), f("finished"),
            outs["new_anchor"][:, 0], outs["new_anchor"][:, 1],
            outs["counts"][:, 0].astype(jnp.float32),
            outs["counts"][:, 1].astype(jnp.float32),
            outs["ga_origin"][:, 0], outs["ga_origin"][:, 1],
        ],
        axis=1,
    )
    return state, fin, out_points, out_scalars
