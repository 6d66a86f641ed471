"""Fully device-resident 3D local-SLAM frontend (chunked).

The per-scan host orchestration of LocalTrajectoryBuilder3D (reference:
mapping/internal/3d/local_trajectory_builder_3d.cc:48-479) costs several
blocking host<->device round trips per scan (dual-grid match dispatch,
two insert dispatches per active submap, host voxel/adaptive filters).
This module runs the ENTIRE per-scan pipeline on device inside one
`lax.scan` over a chunk of scans:

    IMU-fused pose extrapolation (pose_extrapolator.cc:35-262,
    imu_tracker.cc:30-74) -> per-point SE(3) unwarp over per-hit times
    (ExtrapolatePosesWithGravity, local_trajectory_builder_3d.cc:210-257)
    -> min/max range split with misses cropped at max_range -> voxel
    filter in the local frame -> high/low-res adaptive voxel filters on
    the tracking-frame returns -> dual-grid LM scan match
    (ceres_scan_matcher_3d.cc) -> extrapolator pose update -> motion
    filter -> bounded-free-space insertion into the two active submaps'
    high/low-resolution voxel grids (range_data_inserter_3d.cc:27-116,
    submap_3d.cc:199-354).

One dispatch + one packed fetch per chunk; the int8 voxel volumes never
leave the device. Rotational histograms (irregular per-slice sorting)
are computed host-side at collection time from the fetched clouds, as
are the submap-histogram accumulations — control-plane work with no
device round trips.

Scope (asserted by the host wrapper in mapping/chunked_frontend_3d.py):
IMU-driven constant-velocity extrapolation (3D requires IMU), no
odometry, num_accumulated_range_data == 1, no online correlative
matching, no intensities. The general path remains
mapping/local_trajectory_builder_3d.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from cartographer_tpu.mapping.paged_grid_3d import (
    PagedGrid3D,
    insert_cells_paged,
)
from cartographer_tpu.ops import frontend_common as fc
from cartographer_tpu.ops import raycast_3d
from cartographer_tpu.ops.scan_matching import gauss_newton_3d
from cartographer_tpu.transform import rigid3 as rigid3_quat


@struct.dataclass
class FrontendState3D:
    """Device state carried across scans/chunks. All times are float32
    offsets from a host-managed epoch (rebased every chunk).

    The extrapolator block (pose queue / velocities / ImuTracker / motion
    filter) uses the same field names as FrontendState2D so the shared
    tracker fold (ops/frontend_common.py) applies unchanged."""

    # Pose queue (timed_pose_queue, length 2).
    older_t: jax.Array
    older_xyz: jax.Array  # [3]
    older_q: jax.Array  # [4] wxyz
    newest_t: jax.Array
    newest_xyz: jax.Array  # [3]
    newest_q: jax.Array  # [4]
    queue_len: jax.Array  # i32 (1 or 2)
    vel: jax.Array  # [3]
    ang_vel: jax.Array  # [3]
    # ImuTracker (advanced to newest_t at every add_pose).
    tracker_ori: jax.Array  # [4]
    tracker_grav: jax.Array  # [3]
    tracker_omega: jax.Array  # [3]
    tracker_last_acc_t: jax.Array  # f32; -1e30 = never observed
    last_extrap_t: jax.Array
    # Motion filter memory.
    mf_valid: jax.Array
    mf_t: jax.Array
    mf_xyz: jax.Array  # [3]
    mf_q: jax.Array  # [4]
    # Active submaps: slot 0 = older, slot 1 = newer. Grid origins are the
    # fixed -half extent in the submap frame (make_grid_3d at center 0).
    # Dense mode (cfg.paged False): int8 volumes. Paged mode: block-sparse
    # table/pool per slot (mapping/paged_grid_3d.py — fixed block pool +
    # dense block table, the HybridGrid replacement) and the volumes are
    # None. Paged is the default on the flagship path: the virtual extent
    # (table_size * 2^block_bits cells) matches the reference HybridGrid's
    # growable range instead of being capped by the dense allocation, and
    # dropped writes (outside extent / pool exhausted) are COUNTED.
    anchor_t: jax.Array  # f32 [2, 3] submap local_pose translation
    anchor_q: jax.Array  # f32 [2, 4] submap local_pose rotation
    counts: jax.Array  # i32 [2]
    slot_valid: jax.Array  # bool [2]
    high_values: Optional[jax.Array] = None  # i8 [2, Gh, Gh, Gh] (dense)
    low_values: Optional[jax.Array] = None  # i8 [2, Gl, Gl, Gl] (dense)
    # Paged mode: ONE stacked 4-lane layout [high_s0, low_s0, high_s1,
    # low_s1] so insertion and rotation run as single batched
    # gather/scatter ops across slots AND resolutions (per-op dispatch
    # overhead dominates these small sparse ops on TPU). Requires equal
    # table/pool shapes for both resolutions (asserted by the wrapper).
    pg_table: Optional[jax.Array] = None  # i32 [4, T^3]
    pg_pool: Optional[jax.Array] = None  # i8 [4, P, B^3]
    pg_nblocks: Optional[jax.Array] = None  # i32 [4]
    pg_dropped: Optional[jax.Array] = None  # i32 [4]


def init_state(
    cfg: "FrontendConfig3D",
    t0: float = 0.0,
    initial_q=None,
    tracker_grav=None,
    tracker_omega=None,
    tracker_last_acc_t: float = -1e30,
) -> FrontendState3D:
    """State after PoseExtrapolator::InitializeWithImu: the host wrapper
    computes the initial ImuTracker state from the first IMU sample and
    seeds it here (pose at t0 = pure rotation to the tracker orientation)."""
    f = jnp.float32
    q0 = (
        jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
        if initial_q is None
        else jnp.asarray(initial_q, jnp.float32)
    )
    grav0 = (
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        if tracker_grav is None
        else jnp.asarray(tracker_grav, jnp.float32)
    )
    omega0 = (
        jnp.zeros(3, jnp.float32)
        if tracker_omega is None
        else jnp.asarray(tracker_omega, jnp.float32)
    )
    if cfg.paged:
        assert cfg.low_table_size == cfg.high_table_size, (
            "paged device frontend requires equal high/low table sizes "
            "(stacked 4-lane layout)"
        )
        assert cfg.low_pool_blocks == cfg.high_pool_blocks, (
            "paged device frontend requires equal high/low pool sizes "
            "(stacked 4-lane layout)"
        )
        b3 = 1 << (3 * cfg.block_bits)
        grids = dict(
            pg_table=jnp.full((4, cfg.high_table_size**3), -1, jnp.int32),
            pg_pool=jnp.zeros((4, cfg.high_pool_blocks, b3), jnp.int8),
            pg_nblocks=jnp.zeros(4, jnp.int32),
            pg_dropped=jnp.zeros(4, jnp.int32),
        )
    else:
        gh, gl = cfg.high_grid_size, cfg.low_grid_size
        grids = dict(
            high_values=jnp.zeros((2, gh, gh, gh), jnp.int8),
            low_values=jnp.zeros((2, gl, gl, gl), jnp.int8),
        )
    return FrontendState3D(
        **grids,
        older_t=f(t0),
        older_xyz=jnp.zeros(3, jnp.float32),
        older_q=q0,
        newest_t=f(t0),
        newest_xyz=jnp.zeros(3, jnp.float32),
        newest_q=q0,
        queue_len=jnp.int32(1),
        vel=jnp.zeros(3, jnp.float32),
        ang_vel=jnp.zeros(3, jnp.float32),
        tracker_ori=q0,
        tracker_grav=grav0,
        tracker_omega=omega0,
        tracker_last_acc_t=f(tracker_last_acc_t),
        last_extrap_t=f(t0),
        mf_valid=jnp.asarray(False),
        mf_t=f(0.0),
        mf_xyz=jnp.zeros(3, jnp.float32),
        mf_q=jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
        anchor_t=jnp.zeros((2, 3), jnp.float32),
        anchor_q=jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32), (2, 4)
        ),
        counts=jnp.zeros(2, jnp.int32),
        slot_valid=jnp.zeros(2, bool),
    )


@dataclasses.dataclass(frozen=True)
class FrontendConfig3D:
    """Static (compile-time) configuration, from TrajectoryBuilder3DOptions."""

    high_grid_size: int
    low_grid_size: int
    high_resolution: float
    low_resolution: float
    high_resolution_max_range: float
    num_range_data: int
    hit_delta: int  # quantized int8 log-odds deltas (hybrid_grid)
    miss_delta: int
    num_free_space_voxels: int
    min_range: float
    max_range: float
    voxel_filter_size: float
    hi_avf_max_length: float
    hi_avf_min_num_points: int
    hi_avf_max_range: float
    lo_avf_max_length: float
    lo_avf_min_num_points: int
    lo_avf_max_range: float
    occupied_space_weight_0: float
    occupied_space_weight_1: float
    translation_weight: float
    rotation_weight: float
    gn_iterations: int
    only_optimize_yaw: bool
    mf_max_time: float
    mf_max_distance: float
    mf_max_angle: float
    pose_queue_duration: float
    imu_gravity_time_constant: float = 10.0
    max_imu_per_scan: int = 16
    use_imu: bool = True  # 3D always fuses IMU (tracker fold contract)
    # Block-sparse (paged) active-submap grids in the scan-loop state
    # (mapping/paged_grid_3d.py): virtual extent per axis =
    # table_size * 2^block_bits cells, memory bounded by the block pool,
    # dropped writes counted (oob_high/oob_low output scalars). Default on
    # the production wrapper (SubmapsOptions3D.sparse_grids); dense mode
    # remains for parity testing.
    paged: bool = False
    block_bits: int = 4
    high_table_size: int = 64
    high_pool_blocks: int = 4096
    low_table_size: int = 32
    low_pool_blocks: int = 2048
    # Whether any scan in the chunk has points beyond max_range (ranges are
    # invariant under the rigid unwarp, so the host knows before dispatch).
    has_misses: bool = True
    # Static bound on each matching cloud (high/low) handed to the LM
    # matcher; the adaptive filters target ~100-200 points, so the caps are
    # ample — overflow drops the excess from MATCHING only.
    match_max_points: int = 512
    # Packed-transfer geometry (see input_layout/output_layout).
    chunk_size: int = 0
    num_points: int = 0
    # Exact-detection upload compression: every scan's uint8 time
    # fractions equal the uniform round(i*255/(k-1)) ramp, so the time
    # array is regenerated on device instead of uploaded (host-verified,
    # sticky downgrade — see ops/frontend_2d.FrontendConfig2D).
    linear_times: bool = False
    # Debug: comma-separated stages to stub out when isolating perf
    # ("voxel", "adaptive", "match", "insert"). Not for production use.
    disable: str = ""


def _paged_slot(cfg: FrontendConfig3D, state: FrontendState3D, name, slot):
    """View one active-submap slot of the scan-loop state as a PagedGrid3D
    (shares the underlying buffers; geometry from cfg). Lane layout:
    [high_s0, low_s0, high_s1, low_s1]."""
    res = cfg.high_resolution if name == "high" else cfg.low_resolution
    tsize = cfg.high_table_size if name == "high" else cfg.low_table_size
    half = 0.5 * (tsize << cfg.block_bits) * res
    lane = 2 * slot + (0 if name == "high" else 1)
    return PagedGrid3D(
        table=state.pg_table[lane],
        pool=state.pg_pool[lane],
        num_blocks=state.pg_nblocks[lane],
        dropped=state.pg_dropped[lane],
        origin=jnp.full((3,), -half, jnp.float32),
        resolution=res,
        block_bits=cfg.block_bits,
        table_size=tsize,
    )


def _scan_body(cfg: FrontendConfig3D, carry, x):
    state, fin = carry
    points, pmask, ptimes, t_scan, sensor_origin, imu = x
    if cfg.paged:
        half_high = (
            0.5 * (cfg.high_table_size << cfg.block_bits) * cfg.high_resolution
        )
        half_low = (
            0.5 * (cfg.low_table_size << cfg.block_bits) * cfg.low_resolution
        )
    else:
        half_high = 0.5 * cfg.high_grid_size * cfg.high_resolution
        half_low = 0.5 * cfg.low_grid_size * cfg.low_resolution

    # -- skip gate: scan starts before the newest pose
    # (local_trajectory_builder_3d.cc:141-147).
    active = ptimes[0] >= state.newest_t

    # -- ImuTracker fold to t_scan + per-point unwarp -------------------------
    (trk_t, trk_ori, trk_grav, trk_om, trk_la), (bp_t, bp_ori, bp_om) = (
        fc.tracker_fold(cfg, state, t_scan, imu)
    )
    g_quat = trk_ori  # estimate_gravity_orientation(t_scan)
    rot_i, tr_i, pt = fc.unwarp_points(state, bp_t, bp_ori, bp_om, ptimes)

    origins_w = fc.qrot(rot_i, sensor_origin[None, :]) + tr_i  # [N, 3]
    hits_w = fc.qrot(rot_i, points[:, :3]) + tr_i
    delta = hits_w - origins_w
    ranges = jnp.linalg.norm(delta, axis=1)
    keep = pmask & (ranges >= cfg.min_range)
    as_return = keep & (ranges <= cfg.max_range)
    if cfg.has_misses:
        as_miss = keep & (ranges > cfg.max_range)
        # Misses are the rays cropped AT max_range
        # (local_trajectory_builder_3d.cc:239-247).
        miss_w = origins_w + (
            cfg.max_range / jnp.maximum(ranges, 1e-12)
        )[:, None] * delta

    # -- voxel filter in the LOCAL frame --------------------------------------
    if "voxel" in cfg.disable:
        ret_mask = as_return
        if cfg.has_misses:
            miss_mask = as_miss
    else:
        ret_mask = fc.voxel_first_mask(hits_w, as_return, cfg.voxel_filter_size)
        if cfg.has_misses:
            miss_mask = fc.voxel_first_mask(
                miss_w, as_miss, cfg.voxel_filter_size
            )

    # -- pose prediction (extrapolate_pose(t_scan)) ----------------------------
    dt_s = t_scan - state.newest_t
    pred_q = fc.qnorm(
        fc.qmul(state.newest_q, fc.qmul(fc.qconj(state.tracker_ori), trk_ori))
    )
    pred_t = state.newest_xyz + state.vel * dt_s

    # -- tracking frame + adaptive filters -------------------------------------
    hits_track = fc.qrot(fc.qconj(pred_q)[None, :], hits_w - pred_t[None, :])
    rr = jnp.linalg.norm(hits_track, axis=1)
    if "adaptive" in cfg.disable:
        high_mask = ret_mask & (rr <= cfg.hi_avf_max_range)
        low_mask = ret_mask & (rr <= cfg.lo_avf_max_range)
    else:
        high_mask = fc.adaptive_voxel_mask(
            hits_track,
            ret_mask & (rr <= cfg.hi_avf_max_range),
            cfg.hi_avf_max_length,
            cfg.hi_avf_min_num_points,
        )
        low_mask = fc.adaptive_voxel_mask(
            hits_track,
            ret_mask & (rr <= cfg.lo_avf_max_range),
            cfg.lo_avf_max_length,
            cfg.lo_avf_min_num_points,
        )
    matched = (
        active & jnp.any(ret_mask) & jnp.any(high_mask) & jnp.any(low_mask)
    )

    # -- dual-grid LM match against the older active submap --------------------
    # initial_pose_in_submap = submap.local_pose^-1 * prediction.
    aq0, at0 = state.anchor_q[0], state.anchor_t[0]
    init_q = fc.qnorm(fc.qmul(fc.qconj(aq0), pred_q))
    init_t = fc.qrot(fc.qconj(aq0), pred_t - at0)
    high_origin = jnp.full((3,), -half_high, jnp.float32)
    low_origin = jnp.full((3,), -half_low, jnp.float32)
    # Compact each matching cloud to its adaptive-filtered points (stable
    # order): the LM matcher's per-iteration voxel gathers scale with the
    # point count, and the adaptive clouds are ~10% of the padded scan.
    # Cumsum + small scatter instead of argsorts — two full per-scan sorts
    # inside the lax.scan body cost ~ms across the chunk.
    m_cap = min(cfg.match_max_points, hits_track.shape[0])
    iota_cap = jax.lax.broadcasted_iota(jnp.int32, (m_cap,), 0)

    def compact(mask):
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        dst = jnp.where(mask & (pos < m_cap), pos, m_cap)
        pts = (
            jnp.zeros((m_cap + 1, 3), hits_track.dtype)
            .at[dst].set(hits_track, mode="drop")[:m_cap]
        )
        cnt = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), m_cap)
        return pts, iota_cap < cnt

    hi_pts, hi_m = compact(high_mask)
    lo_pts, lo_m = compact(low_mask)
    if cfg.paged:
        # gather_probability reads PagedGrid3D directly — the matcher's
        # corner gathers become table+pool two-gather chains.
        high_vol0 = _paged_slot(cfg, state, "high", 0)
        low_vol0 = _paged_slot(cfg, state, "low", 0)
    else:
        high_vol0 = state.high_values[0]
        low_vol0 = state.low_values[0]
    if "match" in cfg.disable:
        gn_t, gn_q = init_t, init_q
    else:
        packed = gauss_newton_3d._match_3d_impl(
            high_vol0,
            high_origin,
            low_vol0,
            low_origin,
            init_t,
            init_q,
            init_t,
            hi_pts,
            hi_m,
            lo_pts,
            lo_m,
            cfg.high_resolution,
            cfg.low_resolution,
            cfg.occupied_space_weight_0,
            cfg.occupied_space_weight_1,
            cfg.translation_weight,
            cfg.rotation_weight,
            cfg.gn_iterations,
            cfg.only_optimize_yaw,
        )
        gn_t, gn_q = packed[:3], packed[3:7]
    use_gn = state.slot_valid[0] & matched
    sub_t = jnp.where(use_gn, gn_t, init_t)
    sub_q = jnp.where(use_gn, gn_q, init_q)
    # pose_estimate = submap.local_pose * pose_in_submap.
    est_q = fc.qnorm(fc.qmul(aq0, sub_q))
    est_xyz = at0 + fc.qrot(aq0, sub_t)
    # With no submap yet the estimate is the prediction itself.
    est_q = jnp.where(state.slot_valid[0], est_q, pred_q)
    est_xyz = jnp.where(state.slot_valid[0], est_xyz, pred_t)

    # -- extrapolator add_pose --------------------------------------------------
    queue_delta = t_scan - state.newest_t
    do_update = (state.queue_len >= 1) & (queue_delta >= cfg.pose_queue_duration)
    vel_new = jnp.where(
        do_update,
        (est_xyz - state.newest_xyz) / jnp.maximum(queue_delta, 1e-12),
        state.vel,
    )
    ang_new = jnp.where(
        do_update,
        fc.qlog(fc.qmul(fc.qconj(state.newest_q), est_q))
        / jnp.maximum(queue_delta, 1e-12),
        state.ang_vel,
    )

    def upd(old, new):
        return jnp.where(matched, new, old)

    state = state.replace(
        older_t=upd(state.older_t, state.newest_t),
        older_xyz=upd(state.older_xyz, state.newest_xyz),
        older_q=upd(state.older_q, state.newest_q),
        newest_t=upd(state.newest_t, t_scan),
        newest_xyz=upd(state.newest_xyz, est_xyz),
        newest_q=upd(state.newest_q, est_q),
        queue_len=upd(state.queue_len, jnp.minimum(state.queue_len + 1, 2)),
        vel=upd(state.vel, vel_new),
        ang_vel=upd(state.ang_vel, ang_new),
        tracker_ori=upd(state.tracker_ori, trk_ori),
        tracker_grav=upd(state.tracker_grav, trk_grav),
        tracker_omega=upd(state.tracker_omega, trk_om),
        tracker_last_acc_t=upd(state.tracker_last_acc_t, trk_la),
        last_extrap_t=jnp.where(
            active, jnp.maximum(pt[-1], t_scan), state.last_extrap_t
        ),
    )

    # -- motion filter -----------------------------------------------------------
    similar = (
        state.mf_valid
        & ((t_scan - state.mf_t) <= cfg.mf_max_time)
        & (jnp.linalg.norm(est_xyz - state.mf_xyz) <= cfg.mf_max_distance)
        & (
            rigid3_quat.quat_angle(fc.qmul(fc.qconj(state.mf_q), est_q), xp=jnp)
            <= cfg.mf_max_angle
        )
    )
    insert = matched & ~similar
    state = state.replace(
        mf_valid=state.mf_valid | insert,
        mf_t=jnp.where(insert, t_scan, state.mf_t),
        mf_xyz=jnp.where(insert, est_xyz, state.mf_xyz),
        mf_q=jnp.where(insert, est_q, state.mf_q),
    )

    # -- submap rotation (ActiveSubmaps3D::InsertData) -----------------------------
    lfga = fc.qnorm(fc.qmul(est_q, fc.qconj(g_quat)))  # local_from_gravity_aligned
    newest_count = jnp.where(
        state.slot_valid[1], state.counts[1], state.counts[0]
    )
    need_first = insert & ~state.slot_valid[0]
    need_new = insert & state.slot_valid[0] & (newest_count == cfg.num_range_data)
    pop = need_new & state.slot_valid[1]
    created = need_first | need_new

    # The ring write is UNconditional: every scan writes the current slot-0
    # volume at position cnt, and cnt only advances on pop — so the last
    # write at each position is exactly the popped (finished) grid, and
    # positions >= final count are never read. This avoids reading and
    # select-merging the 16 MB ring slot every scan.
    cnt = fin["count"]
    if cfg.paged:
        # Finished-submap snapshot = slot-0 lanes [0:2] ([high, low]).
        fin = {
            "count": cnt + pop.astype(jnp.int32),
            "pg_table": fin["pg_table"].at[cnt].set(state.pg_table[:2]),
            "pg_pool": fin["pg_pool"].at[cnt].set(state.pg_pool[:2]),
            "pg_nblocks": fin["pg_nblocks"].at[cnt].set(state.pg_nblocks[:2]),
            "pg_dropped": fin["pg_dropped"].at[cnt].set(state.pg_dropped[:2]),
        }

        def rotate_paged(cur, empty):
            # Slot rotation in lane space: [s1 lanes, fresh lanes].
            return jnp.where(
                pop, jnp.concatenate([cur[2:4], empty], axis=0), cur
            )

        # Fresh slot-1 lanes on pop match init (empty table = -1).
        pg_table = rotate_paged(
            state.pg_table, jnp.full_like(state.pg_table[:2], -1)
        )
        pg_pool = rotate_paged(
            state.pg_pool, jnp.zeros_like(state.pg_pool[:2])
        )
        pg_nblocks = rotate_paged(
            state.pg_nblocks, jnp.zeros_like(state.pg_nblocks[:2])
        )
        pg_dropped = rotate_paged(
            state.pg_dropped, jnp.zeros_like(state.pg_dropped[:2])
        )
    else:
        fin = {
            "count": cnt + pop.astype(jnp.int32),
            "high": fin["high"].at[cnt].set(state.high_values[0]),
            "low": fin["low"].at[cnt].set(state.low_values[0]),
        }

        zero_high = jnp.zeros_like(state.high_values[0])
        zero_low = jnp.zeros_like(state.low_values[0])
        # need_first implies slot 0 was never written (still the zero volume
        # from init), so no explicit zeroing of the volumes is needed — one
        # fused select per volume covers the rotation.
        high_values = jnp.where(
            pop, jnp.stack([state.high_values[1], zero_high]), state.high_values
        )
        low_values = jnp.where(
            pop, jnp.stack([state.low_values[1], zero_low]), state.low_values
        )
    anchor_t = jnp.where(
        pop, jnp.stack([state.anchor_t[1], est_xyz]), state.anchor_t
    )
    anchor_q = jnp.where(
        pop, jnp.stack([state.anchor_q[1], lfga]), state.anchor_q
    )
    counts = jnp.where(
        pop, jnp.stack([state.counts[1], jnp.int32(0)]), state.counts
    )
    anchor_t = jnp.where(need_first, anchor_t.at[0].set(est_xyz), anchor_t)
    anchor_q = jnp.where(need_first, anchor_q.at[0].set(lfga), anchor_q)
    counts = jnp.where(need_first, counts.at[0].set(0), counts)

    add_second = need_new & ~state.slot_valid[1]
    anchor_t = jnp.where(add_second, anchor_t.at[1].set(est_xyz), anchor_t)
    anchor_q = jnp.where(add_second, anchor_q.at[1].set(lfga), anchor_q)
    counts = jnp.where(add_second, counts.at[1].set(0), counts)
    slot_valid = jnp.stack(
        [state.slot_valid[0] | need_first, state.slot_valid[1] | need_new]
    )

    # -- bounded-free-space insertion into all valid slots ------------------------
    # Hits in the local frame come from the tracking cloud at the MATCHED
    # pose; the sensor origin is trans(pose_estimate)
    # (local_trajectory_builder_3d.cc:300-312: range data re-transformed by
    # pose_estimate before insertion).
    hits_local = fc.qrot(est_q[None, :], hits_track) + est_xyz[None, :]
    ins_range = jnp.linalg.norm(hits_local - est_xyz[None, :], axis=1)
    near = ins_range <= cfg.high_resolution_max_range

    def slot_cells(a_t, a_q, resolution, half):
        # Transform into the submap frame; cell = round((p - origin)/res)
        # with origin = -half (same lattice the matcher gathers from).
        hits_sub = fc.qrot(fc.qconj(a_q)[None, :], hits_local - a_t[None, :])
        origin_sub = fc.qrot(fc.qconj(a_q), est_xyz - a_t)
        cells = jnp.floor((hits_sub + half) / resolution + 0.5).astype(jnp.int32)
        origin_cell = jnp.floor((origin_sub + half) / resolution + 0.5).astype(
            jnp.int32
        )
        return cells, origin_cell

    def insert_slot(values, a_t, a_q, gate, resolution, half, valid):
        cells, origin_cell = slot_cells(a_t, a_q, resolution, half)
        return raycast_3d.insert_scan_3d.__wrapped__(
            values,
            origin_cell,
            cells,
            valid & gate,
            cfg.hit_delta,
            cfg.miss_delta,
            cfg.num_free_space_voxels,
        )

    def insert_lane_paged(
        table, pool, nblocks, dropped, a_t, a_q, resolution, half, valid
    ):
        # One lane = (slot, resolution); vmapping all 4 lanes turns the
        # sparse insert into single batched gather/scatter ops.
        cells, origin_cell = slot_cells(a_t, a_q, resolution, half)
        return insert_cells_paged(
            table,
            pool,
            nblocks,
            dropped,
            origin_cell,
            cells,
            valid,
            cfg.hit_delta,
            cfg.miss_delta,
            cfg.num_free_space_voxels,
            block_bits=cfg.block_bits,
            table_size=cfg.high_table_size,
        )

    def dense_oob(a_t, a_q, gate, resolution, half, size, valid):
        # Hit endpoints outside the dense extent are dropped silently by
        # insert_scan_3d; count them here so a too-small grid_size is
        # visible (the 2D chunk program's oob_hits analog).
        cells, _ = slot_cells(a_t, a_q, resolution, half)
        oob = valid & gate & jnp.any((cells < 0) | (cells >= size), axis=-1)
        return jnp.sum(oob.astype(jnp.int32))

    slot_insert = slot_valid & insert
    oob_high = jnp.int32(0)
    oob_low = jnp.int32(0)
    if "insert" not in cfg.disable:
        if cfg.paged:
            pre = pg_dropped
            lane_res = jnp.asarray(
                [cfg.high_resolution, cfg.low_resolution] * 2, jnp.float32
            )
            lane_half = jnp.asarray([half_high, half_low] * 2, jnp.float32)
            lane_anchor_t = jnp.repeat(anchor_t, 2, axis=0)  # [4, 3]
            lane_anchor_q = jnp.repeat(anchor_q, 2, axis=0)
            lane_valid = jnp.stack(
                [ret_mask & near, ret_mask, ret_mask & near, ret_mask]
            ) & jnp.repeat(slot_insert, 2)[:, None]
            pg_table, pg_pool, pg_nblocks, pg_dropped = jax.vmap(
                insert_lane_paged
            )(
                pg_table, pg_pool, pg_nblocks, pg_dropped,
                lane_anchor_t, lane_anchor_q, lane_res, lane_half,
                lane_valid,
            )
            # Per-scan dropped-write deltas (outside virtual extent or pool
            # exhausted), summed over both slots, per resolution.
            d = pg_dropped - pre
            oob_high = d[0] + d[2]
            oob_low = d[1] + d[3]
        else:
            high_values = jax.vmap(
                functools.partial(
                    insert_slot,
                    resolution=cfg.high_resolution,
                    half=half_high,
                    valid=ret_mask & near,
                )
            )(high_values, anchor_t, anchor_q, slot_insert)
            low_values = jax.vmap(
                functools.partial(
                    insert_slot,
                    resolution=cfg.low_resolution,
                    half=half_low,
                    valid=ret_mask,
                )
            )(low_values, anchor_t, anchor_q, slot_insert)
            oob_high = jnp.sum(
                jax.vmap(
                    functools.partial(
                        dense_oob,
                        resolution=cfg.high_resolution,
                        half=half_high,
                        size=cfg.high_grid_size,
                        valid=ret_mask & near,
                    )
                )(anchor_t, anchor_q, slot_insert)
            )
            oob_low = jnp.sum(
                jax.vmap(
                    functools.partial(
                        dense_oob,
                        resolution=cfg.low_resolution,
                        half=half_low,
                        size=cfg.low_grid_size,
                        valid=ret_mask,
                    )
                )(anchor_t, anchor_q, slot_insert)
            )
    counts = counts + slot_insert.astype(jnp.int32)
    finished = slot_valid[0] & insert & (counts[0] == 2 * cfg.num_range_data)

    if cfg.paged:
        state = state.replace(
            pg_table=pg_table,
            pg_pool=pg_pool,
            pg_nblocks=pg_nblocks,
            pg_dropped=pg_dropped,
            anchor_t=anchor_t,
            anchor_q=anchor_q,
            counts=counts,
            slot_valid=slot_valid,
        )
    else:
        state = state.replace(
            high_values=high_values,
            low_values=low_values,
            anchor_t=anchor_t,
            anchor_q=anchor_q,
            counts=counts,
            slot_valid=slot_valid,
        )

    out = {
        "matched": matched,
        "est_t": est_xyz,
        "est_q": est_q,
        "g_quat": g_quat,
        "inserted": insert,
        "created": created,
        "popped": pop,
        "finished": finished,
        "counts": counts,
        "oob_high": oob_high,
        "oob_low": oob_low,
        "hits_track": hits_track,
        "ret_mask": ret_mask,
        "high_mask": high_mask,
        "low_mask": low_mask,
    }
    if cfg.has_misses:
        out["miss_track"] = fc.qrot(
            fc.qconj(pred_q)[None, :], miss_w - pred_t[None, :]
        )
        out["miss_mask"] = miss_mask
    return (state, fin), out


# Per-scan scalar output layout in the packed [C, 20] array. oob_high /
# oob_low count dropped grid writes that scan (dense: hit endpoints
# outside the fixed extent; paged: outside the virtual extent or block
# pool exhausted) — surfaced as mapping_grid_out_of_extent_points.
SCALARS = (
    "matched", "est_x", "est_y", "est_z",
    "est_qw", "est_qx", "est_qy", "est_qz",
    "g_qw", "g_qx", "g_qy", "g_qz",
    "inserted", "created", "popped", "finished", "count0", "count1",
    "oob_high", "oob_low",
)
SIDX = {k: i for i, k in enumerate(SCALARS)}


def input_layout(cfg: FrontendConfig3D):
    """Byte offsets of the sections inside the packed input buffer:
    (points i16 [C,N,3], times u8 [C,N] — absent under linear_times,
    meta f32 [C,7], imu f32 [C,M,8], total_bytes). Per-point times are
    uint8 fractions of the scan's [t0, t0+span] (see
    ops/frontend_2d.input_layout for the error budget)."""
    c, n, m = cfg.chunk_size, cfg.num_points, cfg.max_imu_per_scan
    o_points = 0
    o_times = o_points + c * n * 6
    o_meta = o_times + (0 if cfg.linear_times else c * n)
    o_imu = o_meta + c * 28
    total = o_imu + c * m * 32
    return o_points, o_times, o_meta, o_imu, total


def output_layout(cfg: FrontendConfig3D):
    """Byte offsets in the packed output buffer: scalars f32
    [C, len(SCALARS)], hits i16 [C,N,3] (tracking frame, quantized),
    code u8 [C,N] (bitmask: 1 voxel-filtered return, +2 high-res adaptive,
    +4 low-res adaptive, +8 miss), then — only when cfg.has_misses —
    misses i16 [C,N,3]; finally total_bytes."""
    c, n = cfg.chunk_size, cfg.num_points
    o_scalars = 0
    o_hits = o_scalars + c * len(SCALARS) * 4
    o_code = o_hits + c * n * 6
    o_miss = o_code + c * n
    total = o_miss + (c * n * 6 if cfg.has_misses else 0)
    return o_scalars, o_hits, o_code, o_miss, total


def point_quantization_scale(cfg: FrontendConfig3D) -> float:
    """Meters per int16 step for the packed host<->device transfers (3D
    misses are cropped AT max_range, so 1.5x max_range bounds both the
    upload deltas — host clamps to 1.25x — and the tracking-frame
    outputs). ~0.2 mm error at 10 m range, ~1.4 mm at 60 m: below the 1 mm
    node-cloud compression granularity the reference uses at short range
    and far below sensor noise at long range."""
    return 1.5 * cfg.max_range / 32767.0


@functools.partial(jax.jit, static_argnames=("cfg",))
def run_chunk(
    cfg: FrontendConfig3D,
    state: FrontendState3D,
    epoch_shift: jax.Array,  # f32; subtracted from all state times
    packed_input: jax.Array,  # uint8 [input_layout(cfg).total]
):
    """Process a chunk of C scans; one flat uint8 upload + one flat uint8
    download (input_layout/output_layout). Same packed-transfer rationale
    as ops/frontend_2d.run_chunk: a remote-attached TPU pays per-array
    round trips and tiled-layout conversions on typed transfers.

    Returns (state, fin, packed_out).
    """
    state = state.replace(
        older_t=state.older_t - epoch_shift,
        newest_t=state.newest_t - epoch_shift,
        last_extrap_t=state.last_extrap_t - epoch_shift,
        mf_t=state.mf_t - epoch_shift,
    )
    c, n, mi = cfg.chunk_size, cfg.num_points, cfg.max_imu_per_scan
    o_points, o_times, o_meta, o_imu, _ = input_layout(cfg)
    bc = jax.lax.bitcast_convert_type
    scan_points = bc(
        packed_input[o_points:o_times].reshape(c, n, 3, 2), jnp.int16
    )
    scan_meta = bc(packed_input[o_meta:o_imu].reshape(c, 7, 4), jnp.float32)
    imu_input = bc(packed_input[o_imu:].reshape(c, mi, 8, 4), jnp.float32)
    q_scale = jnp.float32(point_quantization_scale(cfg))

    r = c // cfg.num_range_data + 1
    if cfg.paged:
        b3 = 1 << (3 * cfg.block_bits)
        fin0 = {
            "count": jnp.int32(0),
            "pg_table": jnp.full(
                (r, 2, cfg.high_table_size**3), -1, jnp.int32
            ),
            "pg_pool": jnp.zeros((r, 2, cfg.high_pool_blocks, b3), jnp.int8),
            "pg_nblocks": jnp.zeros((r, 2), jnp.int32),
            "pg_dropped": jnp.zeros((r, 2), jnp.int32),
        }
    else:
        gh, gl = cfg.high_grid_size, cfg.low_grid_size
        fin0 = {
            "count": jnp.int32(0),
            "high": jnp.zeros((r, gh, gh, gh), jnp.int8),
            "low": jnp.zeros((r, gl, gl, gl), jnp.int8),
        }
    t_scan = scan_meta[:, 0]
    sensor_origin = scan_meta[:, 1:4]
    counts_in = scan_meta[:, 4].astype(jnp.int32)
    t0s = scan_meta[:, 5]
    spans = scan_meta[:, 6]
    points = (
        sensor_origin[:, None, :] + scan_points.astype(jnp.float32) * q_scale
    )
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (c, n), 1)
    if cfg.linear_times:
        # Regenerate the exact uint8 ramp the host verified against (see
        # ops/frontend_2d.run_chunk).
        denom = jnp.maximum(counts_in - 1, 1).astype(jnp.float32)
        u8_frac = jnp.round(
            jnp.minimum(iota_n, counts_in[:, None] - 1).astype(jnp.float32)
            * 255.0
            / denom[:, None]
        )
    else:
        u8_frac = packed_input[o_times:o_meta].reshape(c, n).astype(
            jnp.float32
        )
    ptimes = t0s[:, None] + u8_frac * (spans[:, None] / 255.0)
    pmask = iota_n < counts_in[:, None]
    imu = (
        imu_input[:, :, 0],
        imu_input[:, :, 1:4],
        imu_input[:, :, 4:7],
        imu_input[:, :, 7] > 0.5,
    )

    def body(carry, x):
        return _scan_body(cfg, carry, x)

    (state, fin), outs = jax.lax.scan(
        body, (state, fin0), (points, pmask, ptimes, t_scan, sensor_origin, imu)
    )

    code = (
        outs["ret_mask"].astype(jnp.uint8)
        + 2 * outs["high_mask"].astype(jnp.uint8)
        + 4 * outs["low_mask"].astype(jnp.uint8)
    )
    if cfg.has_misses:
        code = code + 8 * outs["miss_mask"].astype(jnp.uint8)

    def q16(a):
        return jnp.clip(jnp.round(a / q_scale), -32767, 32767).astype(jnp.int16)

    f = lambda k: outs[k].astype(jnp.float32)
    out_scalars = jnp.stack(
        [
            f("matched"),
            outs["est_t"][:, 0], outs["est_t"][:, 1], outs["est_t"][:, 2],
            outs["est_q"][:, 0], outs["est_q"][:, 1],
            outs["est_q"][:, 2], outs["est_q"][:, 3],
            outs["g_quat"][:, 0], outs["g_quat"][:, 1],
            outs["g_quat"][:, 2], outs["g_quat"][:, 3],
            f("inserted"), f("created"), f("popped"), f("finished"),
            outs["counts"][:, 0].astype(jnp.float32),
            outs["counts"][:, 1].astype(jnp.float32),
            f("oob_high"), f("oob_low"),
        ],
        axis=1,
    )
    bc_u8 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
    parts = [bc_u8(out_scalars), bc_u8(q16(outs["hits_track"])), code.reshape(-1)]
    if cfg.has_misses:
        parts.append(bc_u8(q16(outs["miss_track"])))
    packed_out = jnp.concatenate(parts)
    return state, fin, packed_out
