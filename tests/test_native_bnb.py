"""Native (threaded C++) loop-closure backend: build + agreement.

The hybrid-placement backend (ConstraintBuilderOptions.loop_closure_backend
= "native", native/bnb_native.cc) must find the same constraints as the
device search on identical inputs — the same agreement strategy as
tests/test_cpu_anchor.py, but through the PRODUCT path
(ConstraintBuilder2D.run_pending) end to end, including the shared
device-batched GN refinement.
"""

import math

import numpy as np

from cartographer_tpu.common.config import (
    ConstraintBuilderOptions,
    FastCorrelativeScanMatcherOptions2D,
)
from cartographer_tpu.mapping.constraint_builder_2d import ConstraintBuilder2D
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.trajectory_node import TrajectoryNodeData
from cartographer_tpu.native import bnb as native_bnb
from cartographer_tpu.transform import rigid2, rigid3
from tests.test_cpu_anchor import _make_workload


def _builder(backend: str) -> ConstraintBuilder2D:
    opts = ConstraintBuilderOptions()
    opts.sampling_ratio = 1.0
    opts.max_constraint_distance = 1e6
    opts.min_score = 0.2
    opts.loop_closure_backend = backend
    opts.fast_correlative_scan_matcher = FastCorrelativeScanMatcherOptions2D(
        branch_and_bound_depth=5,
        linear_search_window=1.0,
        angular_search_window=math.radians(15.0),
    )
    return ConstraintBuilder2D(opts)


def test_native_library_builds():
    assert native_bnb.available()


def test_native_backend_agrees_with_device_backend():
    grid, scan, center = _make_workload()
    cloud3 = np.concatenate(
        [scan[:, :2], np.zeros((len(scan), 1))], axis=1
    ).astype(np.float32)
    node = TrajectoryNodeData(
        time=0.0,
        gravity_alignment=np.array([1.0, 0, 0, 0]),
        filtered_gravity_aligned_point_cloud=cloud3,
        local_pose=rigid3.identity(),
    )
    found = {}
    for backend in ("device", "native"):
        cb = _builder(backend)
        sid = SubmapId(0, 0)
        cb.set_submap_local_pose(sid, np.zeros(3))
        cb.maybe_add_constraint(
            sid,
            grid,
            NodeId(0, 0),
            node,
            rigid2.make(np.asarray(center) + [0.35, -0.25], 0.05),
        )
        out = cb.run_pending()
        assert len(out) == 1, f"{backend} backend found no constraint"
        found[backend] = np.asarray(out[0].pose.zbar_ij)
    # Same search lattice + same refinement: agreement within one cell /
    # a hundredth of a radian absorbs float32-vs-double discretization.
    np.testing.assert_allclose(
        found["native"][:2], found["device"][:2], atol=grid.resolution
    )
    assert abs(
        rigid2.normalize_angle(found["native"][2] - found["device"][2])
    ) < 0.01


def test_native_backend_respects_min_score():
    grid, scan, center = _make_workload()
    # An empty-ish query cloud far from the wall scores ~MIN_PROBABILITY:
    # below min_score the native backend must report no constraint.
    cloud3 = np.zeros((32, 3), np.float32)
    cloud3[:, 0] = np.linspace(0.5, 1.0, 32)
    node = TrajectoryNodeData(
        time=0.0,
        gravity_alignment=np.array([1.0, 0, 0, 0]),
        filtered_gravity_aligned_point_cloud=cloud3,
        local_pose=rigid3.identity(),
    )
    cb = _builder("native")
    cb._options.min_score = 0.95
    sid = SubmapId(0, 0)
    cb.set_submap_local_pose(sid, np.zeros(3))
    cb.maybe_add_constraint(
        sid, grid, NodeId(0, 0), node, rigid2.make(np.asarray(center), 0.0)
    )
    assert cb.run_pending() == []


def test_native_fast_path_agrees_with_anchor_at_grid_edge():
    """The AVX-512 masked-gather fast path (bnb_native.cc ScoreRun) must
    score identically to the branchy scalar anchor when the search
    window and many cloud points fall OFF the grid — off-grid lanes are
    masked out of the gather (contributing 0 == MIN_PROBABILITY) and the
    per-angle bbox shortcut must correctly decline for windows that
    cross the boundary."""
    from tools.cpu_anchor.run_anchor import run_anchor

    grid, scan, _ = _make_workload()
    prob = np.asarray(
        np.where(
            np.asarray(grid.known),
            1.0 / (1.0 + np.exp(-np.asarray(grid.log_odds))),
            0.1,
        ),
        np.float32,
    )
    # Initial pose near the grid corner: a 4 m-radius scan from here puts
    # whole arcs off-grid for every candidate offset, and the 1 m window
    # itself crosses the boundary.
    initial = np.array([0.6, 0.45, 0.1], np.float32)
    linear, angular, min_score, depth = 1.0, math.radians(15.0), 0.05, 5

    anchor = run_anchor(
        prob,
        grid.resolution,
        np.zeros(2, np.float32),
        scan[:, :2],
        initial,
        linear_window=linear,
        angular_window=angular,
        min_score=min_score,
        depth=depth,
        repeats=1,
    )

    pyr = native_bnb.NativePyramid(prob, depth)
    params = np.array(
        [[0.0, 0.0, grid.resolution, initial[0], initial[1], initial[2],
          linear, angular, min_score]],
        np.float32,
    )
    out, found = native_bnb.match_batch([pyr], [scan[:, :2]], params)
    assert bool(found[0]) == bool(anchor["found"])
    # Same u8 quantization, same integer sums: scores agree to float eps,
    # best cell to within one lattice cell (tie order may differ).
    assert abs(out[0, 0] - anchor["score"]) < 1e-4, (out[0, 0], anchor)
    np.testing.assert_allclose(
        out[0, 1:3],
        np.asarray(anchor["pose"][:2], np.float32),
        atol=grid.resolution + 1e-6,
    )


def test_native_global_localization_agrees_with_device():
    """MatchFullSubmap parity: the native backend's full-submap search
    (window covering the whole grid, +-pi yaw) must localize the scan at
    the same pose as the device search, through maybe_add_global_constraint
    (reference: fast_correlative_scan_matcher_2d.cc MatchFullSubmap via
    constraint_builder_2d.cc MaybeAddGlobalConstraint)."""
    grid, scan, center = _make_workload()
    cloud3 = np.concatenate(
        [scan[:, :2], np.zeros((len(scan), 1))], axis=1
    ).astype(np.float32)
    node = TrajectoryNodeData(
        time=0.0,
        gravity_alignment=np.array([1.0, 0, 0, 0]),
        filtered_gravity_aligned_point_cloud=cloud3,
        local_pose=rigid3.identity(),
    )
    found = {}
    for backend in ("device", "native"):
        cb = _builder(backend)
        cb._options.global_localization_min_score = 0.3
        sid = SubmapId(0, 0)
        cb.set_submap_local_pose(sid, np.zeros(3))
        cb.maybe_add_global_constraint(sid, grid, NodeId(0, 0), node)
        out = cb.run_pending()
        assert len(out) == 1, f"{backend} global localization found nothing"
        found[backend] = np.asarray(out[0].pose.zbar_ij)
    np.testing.assert_allclose(
        found["native"][:2], found["device"][:2], atol=2 * grid.resolution
    )
    assert abs(
        rigid2.normalize_angle(found["native"][2] - found["device"][2])
    ) < 0.02
    # And it actually localized at the true placement.
    np.testing.assert_allclose(found["native"][:2], center, atol=0.15)


def test_mixed_tsdf_and_probability_drain_under_auto():
    """Under the default backend "auto" the native C++ scorer handles
    log-odds submaps only; TSDF submaps in the SAME drain must route to
    the device search (the native scorer has no TSD table) and both
    searches must land. Regression test for the round-5 finding that
    'auto' crashed the drain thread on TSDF grids."""
    import jax.numpy as jnp

    from cartographer_tpu.mapping.tsdf_2d import TSDF2D

    grid, scan, center = _make_workload()
    # A TSDF twin of the same wall: tsd=0 on wall cells (probability()
    # -> 0.9), truncation elsewhere; sprinkle known free space.
    size, res = grid.log_odds.shape[0], grid.resolution
    trunc = 0.3
    tsd = np.full((size, size), trunc, np.float32)
    weight = np.zeros((size, size), np.float32)
    wall_world = scan + center
    ix = np.clip(np.floor(wall_world[:, 0] / res).astype(int), 0, size - 1)
    iy = np.clip(np.floor(wall_world[:, 1] / res).astype(int), 0, size - 1)
    tsd[iy, ix] = 0.0
    weight[iy, ix] = 1.0
    rng = np.random.default_rng(7)
    free = rng.integers(0, size, size=(4000, 2))
    fy, fx = free[:, 0], free[:, 1]
    miss = weight[fy, fx] == 0.0
    weight[fy[miss], fx[miss]] = 1.0  # known free: tsd stays at trunc
    tsdf = TSDF2D(
        tsd=jnp.asarray(tsd),
        weight=jnp.asarray(weight),
        origin=jnp.asarray(np.asarray(grid.origin)),
        resolution=res,
        truncation_distance=trunc,
        max_weight=10.0,
    )

    cloud3 = np.concatenate(
        [scan[:, :2], np.zeros((len(scan), 1))], axis=1
    ).astype(np.float32)
    node = TrajectoryNodeData(
        time=0.0,
        gravity_alignment=np.array([1.0, 0, 0, 0]),
        filtered_gravity_aligned_point_cloud=cloud3,
        local_pose=rigid3.identity(),
    )
    cb = _builder("auto")
    assert cb._use_native_backend(), "native library should be available"
    initial = rigid2.make(
        np.asarray([center[0] + 0.3, center[1] - 0.2]), 0.04
    )
    for s, g in ((SubmapId(0, 0), grid), (SubmapId(0, 1), tsdf)):
        cb.set_submap_local_pose(s, np.zeros(3))
        cb.maybe_add_constraint(s, g, NodeId(0, 0), node, initial)
    results = cb.run_pending()
    assert len(results) == 2, (
        f"expected constraints against BOTH submaps, got {len(results)}"
    )
    for c in results:
        # Both placements must recover ~the true pose (node at center,
        # submaps at origin 0 local pose).
        err = np.linalg.norm(np.asarray(c.pose.zbar_ij[:2]) - center)
        assert err < 0.15, f"{c.submap_id}: pose error {err:.3f} m"
