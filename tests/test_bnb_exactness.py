"""BnB exactness: 3D search agrees with exhaustive enumeration, and a
binding beam cap is (a) observable in the packed result and (b) healed by
automatic beam widening.

Model: fast_correlative_scan_matcher_3d_test.cc (BnB equals exhaustive
search over the full candidate lattice) plus the widening behavior that
restores the reference DFS's unconditional exactness
(fast_correlative_scan_matcher_2d.cc:335-378 prunes only by admissible
bounds and never truncates)."""

import math

import numpy as np
import pytest

from cartographer_tpu.common.config import (
    FastCorrelativeScanMatcherOptions2D,
    FastCorrelativeScanMatcherOptions3D,
)
from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.mapping.grid_2d import Grid2D
from cartographer_tpu.ops.scan_matching import fast_correlative_2d as fc2
from cartographer_tpu.ops.scan_matching import fast_correlative_3d as fc3
from cartographer_tpu.ops.scan_matching.fast_correlative_2d import (
    FastCorrelativeScanMatcher2D,
)
from cartographer_tpu.ops.scan_matching.fast_correlative_3d import (
    FastCorrelativeScanMatcher3D,
)
from cartographer_tpu.transform import rigid2, rigid3

from test_fast_correlative_3d import make_world


def _exhaustive_3d(matcher, prep, min_score):
    """Enumerate every reachable (yaw, x, y, z) candidate at full
    resolution with the low-resolution veto — the reference's semantics
    with no search-tree pruning at all."""
    high = np.asarray(matcher._pyramid[0])
    low = np.asarray(matcher._low_prob)
    d, h, w = high.shape
    ld, lh, lw = low.shape
    res = np.float32(matcher._resolution)
    origin = np.asarray(matcher._origin, np.float32)
    lorigin = np.asarray(prep["lorigin"], np.float32)
    lres = np.float32(prep["lres"])
    ratio = np.float32(matcher._resolution / prep["lres"])
    min_low = matcher._options.min_low_resolution_score

    q0 = prep["q0"].astype(np.float32)
    t0 = prep["t0"].astype(np.float32)
    angles = prep["angles_kept"].astype(np.float32)
    top = 1 << (matcher._depth - 1)
    nl_xy, nl_z = prep["nl_xy"], prep["nl_z"]
    lo_xy = -((nl_xy // top) + 1) * top
    lo_z = -((nl_z // top) + 1) * top

    points = np.asarray(prep["device_points"][0], np.float32)
    pmask = np.asarray(prep["device_points"][1])
    lpoints = np.asarray(prep["device_points"][2], np.float32)
    lmask = np.asarray(prep["device_points"][3])

    def u8_to_prob(vals):
        return vals.astype(np.float32) * (1.0 / fc3._U8_SCALE) + pv.MIN_PROBABILITY

    best_score, best = min_score, None
    for ai, ang in enumerate(angles):
        half = np.float32(0.5) * ang
        qa = np.array([np.cos(half), 0.0, 0.0, np.sin(half)], np.float32)
        q = rigid3.quat_multiply(qa, q0).astype(np.float32)
        world = rigid3.quat_rotate(q[None, :], points).astype(np.float32) + t0
        cells = np.floor((world - origin) / res + 0.5).astype(np.int32)
        lworld = rigid3.quat_rotate(q[None, :], lpoints).astype(np.float32) + t0
        lbase = ((lworld - lorigin) / lres).astype(np.float32)
        for x in range(lo_xy, nl_xy + 1):
            for y in range(lo_xy, nl_xy + 1):
                for z in range(lo_z, nl_z + 1):
                    cx = cells[:, 0] + x
                    cy = cells[:, 1] + y
                    cz = cells[:, 2] + z
                    oob = (
                        (cx < 0) | (cx >= w) | (cy < 0) | (cy >= h)
                        | (cz < 0) | (cz >= d)
                    )
                    vals = u8_to_prob(high[
                        np.clip(cz, 0, d - 1),
                        np.clip(cy, 0, h - 1),
                        np.clip(cx, 0, w - 1),
                    ])
                    vals = np.where(oob, pv.MIN_PROBABILITY, vals)
                    score = float(
                        np.sum(vals * pmask) / max(np.sum(pmask), 1)
                    )
                    if score <= best_score:
                        continue
                    off = (
                        np.array([x, y, z], np.float32) * ratio
                    ).astype(np.float32)
                    ci = np.floor(lbase + off + 0.5).astype(np.int32)
                    loob = (
                        (ci[:, 0] < 0) | (ci[:, 0] >= lw)
                        | (ci[:, 1] < 0) | (ci[:, 1] >= lh)
                        | (ci[:, 2] < 0) | (ci[:, 2] >= ld)
                    )
                    lvals = u8_to_prob(low[
                        np.clip(ci[:, 2], 0, ld - 1),
                        np.clip(ci[:, 1], 0, lh - 1),
                        np.clip(ci[:, 0], 0, lw - 1),
                    ])
                    lvals = np.where(loob, pv.MIN_PROBABILITY, lvals)
                    lscore = float(
                        np.sum(lvals * lmask) / max(np.sum(lmask), 1)
                    )
                    if lscore < min_low:
                        continue
                    best_score, best = score, (ai, x, y, z)
    return best_score, best


class TestExhaustiveAgreement3D:
    def test_agrees_with_exhaustive(self):
        high, low, hist, cloud = make_world()
        options = FastCorrelativeScanMatcherOptions3D(
            branch_and_bound_depth=3,
            full_resolution_depth=3,
            linear_xy_search_window=0.8,
            linear_z_search_window=0.4,
            angular_search_window=np.radians(10.0),
            min_rotational_score=0.1,
            min_low_resolution_score=0.1,
        )
        matcher = FastCorrelativeScanMatcher3D(high, low, hist, options)
        rng = np.random.default_rng(7)
        low_cloud = cloud[::4]
        pose = rigid3.make(
            rng.normal(0, 0.07, 3),
            rigid3.quat_from_angle_axis(np.array([0.0, 0.0, 0.02])),
        )
        prep = matcher._prepare(pose, hist, 0.0, cloud, low_cloud, 0.15)
        assert prep is not None
        result = matcher.match(pose, hist, 0.0, cloud, low_cloud, 0.15)
        exp_score, exp_best = _exhaustive_3d(matcher, prep, 0.15)
        if exp_best is None:
            assert result is None
        else:
            assert result is not None
            assert result.score == pytest.approx(exp_score, abs=1e-4)


class TestBeamOverflowWidening:
    def test_2d_overflow_flag_and_widening(self):
        # A big uniform-ish grid with a huge window makes far more
        # candidates survive the bound prune than a tiny beam can hold.
        rng = np.random.default_rng(5)
        size, res = 128, 0.05
        angles = np.linspace(0, 2 * np.pi, 200, endpoint=False)
        r = 2.0 + 0.3 * np.sin(5 * angles)
        points = np.stack(
            [r * np.cos(angles), r * np.sin(angles)], axis=-1
        ).astype(np.float32)
        import jax.numpy as jnp

        lo = jnp.zeros((size, size), jnp.float32)
        known = jnp.zeros((size, size), bool)
        grid = Grid2D(
            log_odds=lo, known=known,
            origin=np.array([-3.2, -3.2]), resolution=res,
        )
        from cartographer_tpu.ops import raycast_2d

        cells = (points - np.array([-3.2, -3.2], np.float32)) / res
        lo, known = raycast_2d.insert_scan(
            grid.log_odds, grid.known,
            jnp.asarray((np.zeros(2) - np.array([-3.2, -3.2])) / res,
                        jnp.float32),
            jnp.asarray(cells, jnp.float32),
            jnp.ones(len(cells), bool), jnp.ones(len(cells), bool),
            0.9, -0.4, num_steps=128,
        )
        grid = Grid2D(
            log_odds=lo, known=known,
            origin=np.array([-3.2, -3.2]), resolution=res,
        )

        small = FastCorrelativeScanMatcher2D(
            grid,
            FastCorrelativeScanMatcherOptions2D(
                branch_and_bound_depth=5, beam_width=16
            ),
        )
        # Raw dispatch exposes the overflow flag (packed column 4).
        packed_d, _ = small._dispatch_window(
            rigid2.make([0.0, 0.0], 0.0), points, 0.0,
            linear_search_window=2.0,
            angular_search_window=np.radians(30.0),
        )
        assert np.asarray(packed_d)[4] > 0.5, "expected the beam to bind"

        wide = FastCorrelativeScanMatcher2D(
            grid,
            FastCorrelativeScanMatcherOptions2D(
                branch_and_bound_depth=5, beam_width=fc2._MAX_WIDENED_BEAM
            ),
        )
        # match() widens automatically until the cap stops binding, so the
        # small-beam matcher must agree with the wide-beam one.
        r_small = small.match(
            rigid2.make([0.3, -0.2], np.radians(4.0)), points, 0.1
        )
        r_wide = wide.match(
            rigid2.make([0.3, -0.2], np.radians(4.0)), points, 0.1
        )
        assert (r_small is None) == (r_wide is None)
        if r_wide is not None:
            assert r_small.score == pytest.approx(r_wide.score, abs=1e-6)

    def test_3d_overflow_flag_and_widening(self):
        high, low, hist, cloud = make_world()
        # An imperfect query (jittered cloud) keeps the incumbent leaf
        # score below the pooled bounds, so many candidates survive the
        # prune and a tiny beam must bind.
        rng = np.random.default_rng(13)
        cloud = (cloud + rng.normal(0, 0.1, cloud.shape)).astype(np.float32)
        low_cloud = cloud[::4]
        base = dict(
            branch_and_bound_depth=3,
            full_resolution_depth=3,
            linear_xy_search_window=1.6,
            linear_z_search_window=0.8,
            angular_search_window=np.radians(20.0),
            min_rotational_score=0.0,
            min_low_resolution_score=0.0,
        )
        small = FastCorrelativeScanMatcher3D(
            high, low, hist,
            FastCorrelativeScanMatcherOptions3D(**base, beam_width=2),
        )
        pose = rigid3.make(np.zeros(3), np.array([1.0, 0.0, 0.0, 0.0]))
        dispatched = small.match_device(
            pose, hist, 0.0, cloud, low_cloud, 0.0
        )
        assert dispatched is not None
        assert np.asarray(dispatched[0])[6] > 0.5, "expected the beam to bind"

        wide = FastCorrelativeScanMatcher3D(
            high, low, hist,
            FastCorrelativeScanMatcherOptions3D(
                **base, beam_width=fc3._MAX_WIDENED_BEAM
            ),
        )
        r_small = small.match(pose, hist, 0.0, cloud, low_cloud, 0.1)
        r_wide = wide.match(pose, hist, 0.0, cloud, low_cloud, 0.1)
        assert (r_small is None) == (r_wide is None)
        if r_wide is not None:
            assert r_small.score == pytest.approx(r_wide.score, abs=1e-6)
