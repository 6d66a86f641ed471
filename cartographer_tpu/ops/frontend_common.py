"""Shared device helpers for the chunked local-SLAM frontends (2D + 3D).

Device-resident voxel filters (sensor/internal/voxel_filter.cc:38-197
semantics with static shapes), quaternion helpers, and the device
ImuTracker / PoseExtrapolator fold (mapping/imu_tracker.cc:30-74,
mapping/pose_extrapolator.cc:35-262). The tracker functions operate on
any frontend-state dataclass exposing the extrapolator field names
(newest_t/newest_q/..., tracker_ori/tracker_grav/tracker_omega/
tracker_last_acc_t, ang_vel) and any config exposing use_imu /
imu_gravity_time_constant / max_imu_per_scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cartographer_tpu.transform import rigid3 as rigid3_quat

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
    return voxel_unique_counts_batch(
        points, valid, jnp.asarray(length, jnp.float32)[None]
    )[0]


def voxel_unique_counts_batch(points, valid, lengths):
    """Occupied-voxel counts for K candidate voxel sizes with ONE batched
    sort (keys only — no permutation payload, no scatter): the adaptive
    filter's repeated `count_at` probes are the dominant device cost of the
    chunked frontends when issued as sequential sorts."""
    idx = jnp.round(points[None, :, :] / lengths[:, None, None]).astype(jnp.int32)
    key_a = ((idx[..., 0] & 0xFFFF) << 16) | (idx[..., 1] & 0xFFFF)
    key_b = idx[..., 2]
    big = jnp.int32(0x7FFFFFFF)
    # key_b == big is unreachable for a real coordinate, so the invalid run
    # can never merge with a valid voxel's run.
    key_a = jnp.where(valid[None, :], key_a, big)
    key_b = jnp.where(valid[None, :], key_b, big)
    sa, sb = jax.lax.sort([key_a, key_b], dimension=1, num_keys=2)
    first = (sa[:, 1:] != sa[:, :-1]) | (sb[:, 1:] != sb[:, :-1])
    runs = 1 + jnp.sum(first, axis=1)
    any_valid = jnp.any(valid)
    any_invalid = ~jnp.all(valid)
    # All-invalid rows have exactly one (invalid) run -> zero voxels.
    return jnp.where(
        any_valid, runs - any_invalid.astype(jnp.int32), 0
    )


def adaptive_voxel_mask(points, valid, max_length, min_num_points):
    """Device mirror of sensor/voxel_filter.adaptive_voxel_filter (minus
    its max_range pre-filter, which the caller folds into `valid`):
    halve the voxel edge until at least min_num_points survive, then
    binary-search the edge to within 10% (voxel_filter.cc:50-74).

    Formulated for the device: the reference's sequential probe loop is
    replaced by (a) one batched count over all 8 halving lengths and (b)
    one batched count over the 15 dyadic midpoints the bisection can ever
    visit (mid = 0.5*(low+high) nested 4 deep always lands on
    low + j/16*(high-low); after 4 levels (high-low)/low <= 1/16 < 0.1 so
    the reference loop never runs a 5th iteration). The tree lengths are
    computed with the same 0.5*(low+high) float arithmetic, so the chosen
    edge length is bit-identical to the sequential loop's."""
    n0 = jnp.sum(valid)
    max_length = jnp.float32(max_length)

    # Halving phase, batched: lengths L/2^k for k = 0..7 (the loop guard
    # `high > 1e-2 * max_length` admits exactly k = 1..7; k = 0 is the
    # initial `skip` check at max_length).
    halving_lengths = max_length * (2.0 ** -jnp.arange(8, dtype=jnp.float32))
    counts_h = voxel_unique_counts_batch(points, valid, halving_lengths)
    enough_h = counts_h >= min_num_points
    skip = enough_h[0]
    low_found = jnp.any(enough_h[1:])
    k_star = 1 + jnp.argmax(enough_h[1:])
    low_f = jnp.where(low_found, halving_lengths[k_star], halving_lengths[7])
    high_f = jnp.where(low_found, halving_lengths[k_star - 1], halving_lengths[7])
    count_low = jnp.where(low_found, counts_h[k_star], counts_h[7])
    count_high = jnp.where(low_found, counts_h[k_star - 1], counts_h[7])
    run_bisect = low_found & ~skip

    # Dyadic midpoint tree (exact fp match with sequential 0.5*(low+high)).
    l = [None] * 17
    l[0], l[16] = low_f, high_f
    for step in (8, 4, 2, 1):
        for j in range(step, 16, 2 * step):
            l[j] = 0.5 * (l[j - step] + l[j + step])
    counts_b = voxel_unique_counts_batch(
        points, valid, jnp.stack(l[1:16])
    )
    counts17 = jnp.concatenate(
        [count_low[None], counts_b, count_high[None]]
    )
    lengths17 = jnp.stack(l)

    lo_j = jnp.int32(0)
    hi_j = jnp.int32(16)
    for _ in range(4):
        active = run_bisect & (
            (lengths17[hi_j] - lengths17[lo_j]) / lengths17[lo_j] > 1e-1
        )
        mid_j = (lo_j + hi_j) // 2
        ok = counts17[mid_j] >= min_num_points
        lo_j = jnp.where(active & ok, mid_j, lo_j)
        hi_j = jnp.where(active & ~ok, mid_j, hi_j)

    low_b = jnp.where(run_bisect, lengths17[lo_j], low_f)
    final_length = jnp.where(
        skip, max_length, jnp.where(low_found, low_b, low_f)
    )
    mask = voxel_first_mask(points, valid, final_length)
    # Sparse clouds are returned unfiltered (voxel_filter.cc:42-44).
    return jnp.where(n0 <= min_num_points, valid, mask)


# -- small geometry helpers ---------------------------------------------------


def wrap_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def rot2(yaw, xy):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [c * xy[..., 0] - s * xy[..., 1], s * xy[..., 0] + c * xy[..., 1]],
        axis=-1,
    )


# Quaternion helpers on device (transform/rigid3.py with xp=jnp).
def qmul(a, b):
    return rigid3_quat.quat_multiply(a, b, xp=jnp)


def qconj(q):
    return rigid3_quat.quat_conjugate(q, xp=jnp)


def qnorm(q):
    return rigid3_quat.quat_normalize(q, xp=jnp)


def qrot(q, v):
    return rigid3_quat.quat_rotate(q, v, xp=jnp)


def qexp(aa):
    return rigid3_quat.quat_from_angle_axis(aa, xp=jnp)


def qlog(q):
    return rigid3_quat.quat_to_angle_axis(q, xp=jnp)


def yaw_of(q):
    return jnp.arctan2(
        2.0 * (q[..., 0] * q[..., 3] + q[..., 1] * q[..., 2]),
        1.0 - 2.0 * (q[..., 2] ** 2 + q[..., 3] ** 2),
    )


def yaw_quat(yaw):
    half = 0.5 * yaw
    z = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), z, z, jnp.sin(half)], axis=-1)


# -- device ImuTracker --------------------------------------------------------


def tracker_advance(time, ori, grav, omega, to_t):
    """ImuTracker::Advance (imu_tracker.cc:44-54)."""
    dt = to_t - time
    dq = qexp(omega * dt)
    ori2 = qnorm(qmul(ori, dq))
    grav2 = qrot(qconj(dq), grav)
    return to_t, ori2, grav2


def tracker_acc_obs(cfg, time, ori, grav, last_acc_t, acc):
    """AddImuLinearAccelerationObservation (imu_tracker.cc:56-77)."""
    dt = jnp.where(last_acc_t > -1e29, time - last_acc_t, jnp.float32(1e30))
    alpha = 1.0 - jnp.exp(-dt / cfg.imu_gravity_time_constant)
    grav2 = (1.0 - alpha) * grav + alpha * acc
    ez = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    rot = rigid3_quat.quat_from_two_vectors(grav2, qrot(qconj(ori), ez), xp=jnp)
    ori2 = qnorm(qmul(ori, rot))
    return ori2, grav2, time


def tracker_fold(cfg, state, t_target, imu):
    """Advance the ImuTracker from its add_pose state (time == newest_t) to
    t_target, consuming the scan's IMU samples in order (the host's
    _advance_imu_tracker / extrapolate_poses_batch breakpoint walk).

    Returns (final tracker tuple, breakpoint arrays (times [M+1],
    orientations [M+1, 4], angular velocities [M+1, 3])) — every query in
    (bp_t[i], bp_t[i+1]] extrapolates from breakpoint i."""
    t0 = state.newest_t
    ori0, grav0 = state.tracker_ori, state.tracker_grav
    om0, la0 = state.tracker_omega, state.tracker_last_acc_t

    if not cfg.use_imu:
        # Fake gravity + pose-derived angular velocity: one advance + one
        # observation pair at t_target (pose_extrapolator.cc:201-210).
        m = cfg.max_imu_per_scan
        bp_t = jnp.full((m + 1,), t0, jnp.float32)
        bp_ori = jnp.broadcast_to(ori0, (m + 1, 4))
        bp_om = jnp.broadcast_to(state.ang_vel, (m + 1, 3))
        t1, ori1, grav1 = tracker_advance(t0, ori0, grav0, om0, t_target)
        ez = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        ori2, grav2, la1 = tracker_acc_obs(cfg, t1, ori1, grav1, la0, ez)
        return (t1, ori2, grav2, state.ang_vel, la1), (bp_t, bp_ori, bp_om)
        # NOTE: the caller overwrites the stored omega with the updated
        # pose-derived angular velocity after the velocity update.

    imu_t, imu_acc, imu_gyro, imu_valid = imu

    def step(c, x):
        time, ori, grav, om, la = c
        it, acc, gyro, valid = x
        use = valid & (it >= time) & (it < t_target)
        t_adv = jnp.maximum(it, time)
        t1, ori1, grav1 = tracker_advance(time, ori, grav, om, t_adv)
        ori2, grav2, la1 = tracker_acc_obs(cfg, t1, ori1, grav1, la, acc)
        nxt = (
            jnp.where(use, t1, time),
            jnp.where(use, ori2, ori),
            jnp.where(use, grav2, grav),
            jnp.where(use, gyro, om),
            jnp.where(use, la1, la),
        )
        return nxt, (nxt[0], nxt[1], nxt[3])

    # Fully unrolled: the body is ~60 tiny scalar quaternion ops and the
    # slot count is small (<= 32), so loop bookkeeping would dominate.
    (tf, orif, gravf, omf, laf), (bt, bo, bw) = jax.lax.scan(
        step, (t0, ori0, grav0, om0, la0),
        (imu_t, imu_acc, imu_gyro, imu_valid),
        unroll=True,
    )
    bp_t = jnp.concatenate([t0[None], bt])
    bp_ori = jnp.concatenate([ori0[None], bo])
    bp_om = jnp.concatenate([om0[None], bw])
    t1, ori1, grav1 = tracker_advance(tf, orif, gravf, omf, t_target)
    return (t1, ori1, grav1, omf, laf), (bp_t, bp_ori, bp_om)


def unwarp_points(state, bp_t, bp_ori, bp_om, ptimes):
    """Per-point pose extrapolation (ExtrapolatePosesBatch): monotonic-clamp
    the point times against the extrapolation frontier, locate each in the
    tracker breakpoint list, and compose rotation/translation from the
    newest pose + velocities. Returns (rot_i [N,4], tr_i [N,3], pt [N])."""
    pt = jnp.maximum(ptimes, state.last_extrap_t)
    pt = jax.lax.associative_scan(jnp.maximum, pt)
    idx = jnp.clip(
        jnp.sum(bp_t[None, :] <= pt[:, None], axis=1) - 1, 0, bp_t.shape[0] - 1
    )
    q_bp = bp_ori[idx]  # [N, 4]
    w_bp = bp_om[idx]  # [N, 3]
    dt_bp = (pt - bp_t[idx])[:, None]
    q_t = qnorm(qmul(q_bp, qexp(w_bp * dt_bp)))
    # rotation_i = newest.q * (conj(main_tracker.ori) * tracker(t_i).ori)
    q_rel = qmul(qconj(state.tracker_ori)[None, :], q_t)
    rot_i = qnorm(qmul(state.newest_q[None, :], q_rel))  # [N, 4]
    dtp = pt - state.newest_t
    tr_i = state.newest_xyz[None, :] + state.vel[None, :] * dtp[:, None]
    return rot_i, tr_i, pt
