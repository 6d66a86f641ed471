"""Native (threaded C++) 3D loop-closure backend vs the device matcher.

Model: the 2D agreement suite (test_native_bnb.py). The native backend
(native/bnb3d_native.cc) must reproduce the device BnB's results — same
octave pyramid quantization, 2x2x2 neighborhood bounds, low-resolution
leaf veto, yaw pruning — for windowed searches and through the
ConstraintBuilder3D drain.
"""

import numpy as np
import pytest

from cartographer_tpu.common.config import (
    ConstraintBuilderOptions,
    FastCorrelativeScanMatcherOptions3D,
)
from cartographer_tpu.native import bnb3 as native_bnb3
from cartographer_tpu.ops.scan_matching import rotational_histogram
from cartographer_tpu.ops.scan_matching.fast_correlative_3d import (
    FastCorrelativeScanMatcher3D,
)
from cartographer_tpu.transform import rigid3

from test_fast_correlative_3d import make_world

pytestmark = pytest.mark.skipif(
    not native_bnb3.available(), reason="no C++ toolchain"
)


def _options():
    return FastCorrelativeScanMatcherOptions3D(
        branch_and_bound_depth=3,
        full_resolution_depth=3,
        linear_xy_search_window=0.8,
        linear_z_search_window=0.4,
        angular_search_window=np.radians(10.0),
        min_rotational_score=0.1,
        min_low_resolution_score=0.1,
    )


def _native_match(high, low, hist, cloud, low_cloud, pose, options,
                  min_score=0.15):
    """Drive the native backend exactly the way ConstraintBuilder3D does."""
    import math

    from cartographer_tpu.ops.scan_matching.correlative_2d import (
        compute_angular_step,
    )

    res = float(high.resolution)
    ns = native_bnb3.NativeSubmap3D(
        np.asarray(high.probability()),
        np.asarray(low.probability()),
        options.branch_and_bound_depth,
    )
    max_range = float(np.max(np.linalg.norm(cloud, axis=1)))
    step = compute_angular_step(res, max_range)
    na = int(math.ceil(options.angular_search_window / step))
    angles = (np.arange(2 * na + 1) - na) * step
    rot = rotational_histogram.match_angles(hist, hist, 0.0, angles)
    keep = rot >= options.min_rotational_score
    if not keep.any():
        return None
    angles_kept = angles[keep].astype(np.float32)
    shape = np.asarray(high.values).shape
    nl_xy = min(
        int(math.ceil(options.linear_xy_search_window / res)),
        max(shape) + 1,
    )
    nl_z = min(
        int(math.ceil(options.linear_z_search_window / res)),
        max(shape) + 1,
    )
    params = np.concatenate(
        [
            np.asarray(rigid3.quat(pose), np.float32),
            np.asarray(pose[:3], np.float32),
            np.asarray(high.origin, np.float32),
            [np.float32(res)],
            np.asarray(low.origin, np.float32),
            [np.float32(low.resolution)],
            [np.float32(nl_xy), np.float32(nl_z)],
            [np.float32(min_score)],
            [np.float32(options.min_low_resolution_score)],
        ]
    )[None, :]
    out, found = native_bnb3.match_batch(
        [ns], [cloud.astype(np.float32)],
        [low_cloud.astype(np.float32)], [angles_kept], params,
    )
    if not found[0]:
        return None
    score, lowscore = float(out[0, 0]), float(out[0, 1])
    ba = int(out[0, 2])
    ang = float(angles_kept[ba])
    half = 0.5 * ang
    qa = np.array([np.cos(half), 0.0, 0.0, np.sin(half)])
    q = rigid3.quat_normalize(
        rigid3.quat_multiply(qa, rigid3.quat(np.asarray(pose, np.float64)))
    )
    t = np.asarray(pose[:3], np.float64) + out[0, 3:6].astype(
        np.float64
    ) * res
    return score, lowscore, rigid3.make(t, q)


def test_native_3d_agrees_with_device_matcher():
    high, low, hist, cloud = make_world()
    options = _options()
    matcher = FastCorrelativeScanMatcher3D(high, low, hist, options)
    low_cloud = cloud[::4]
    rng = np.random.default_rng(11)
    n_checked = 0
    for _ in range(4):
        pose = rigid3.make(
            rng.normal(0, 0.1, 3),
            rigid3.quat_from_angle_axis(
                np.array([0.0, 0.0, rng.normal(0, 0.03)])
            ),
        )
        device = matcher.match(pose, hist, 0.0, cloud, low_cloud, 0.15)
        native = _native_match(
            high, low, hist, cloud, low_cloud, pose, options
        )
        assert (device is None) == (native is None)
        if device is None:
            continue
        n_checked += 1
        score, lowscore, npose = native
        assert score == pytest.approx(device.score, abs=1e-5)
        assert lowscore == pytest.approx(
            device.low_resolution_score, abs=1e-5
        )
        np.testing.assert_allclose(npose, device.pose, atol=1e-5)
    assert n_checked >= 3


def test_native_3d_respects_min_score():
    high, low, hist, cloud = make_world()
    options = _options()
    low_cloud = cloud[::4]
    pose = rigid3.identity()
    native = _native_match(
        high, low, hist, cloud, low_cloud, pose, options, min_score=0.99
    )
    assert native is None


def test_constraint_builder_3d_native_backend_agrees():
    """End-to-end: ConstraintBuilder3D drains identical searches through
    the device and native backends and must emit matching constraints."""
    from cartographer_tpu.mapping.constraint_builder_3d import (
        ConstraintBuilder3D,
    )
    from cartographer_tpu.mapping.id import NodeId, SubmapId
    from cartographer_tpu.mapping.submap_3d import Submap3D
    from cartographer_tpu.mapping.trajectory_node import TrajectoryNodeData

    high, low, hist, cloud = make_world()
    low_cloud = cloud[::4]

    submap = Submap3D.__new__(Submap3D)
    submap.high_resolution_grid = high
    submap.low_resolution_grid = low
    submap.rotational_scan_matcher_histogram = hist
    submap.local_pose = rigid3.identity()

    def run(backend):
        cb_opts = ConstraintBuilderOptions()
        cb_opts.sampling_ratio = 1.0
        cb_opts.max_constraint_distance = 1e6
        cb_opts.min_score = 0.15
        cb_opts.loop_closure_backend = backend
        cb_opts.fast_correlative_scan_matcher_3d = _options()
        cb = ConstraintBuilder3D(cb_opts)
        node = TrajectoryNodeData(
            time=0.0,
            gravity_alignment=np.array([1.0, 0, 0, 0]),
            filtered_gravity_aligned_point_cloud=None,
            local_pose=rigid3.identity(),
            high_resolution_point_cloud=cloud.astype(np.float32),
            low_resolution_point_cloud=low_cloud.astype(np.float32),
            rotational_scan_matcher_histogram=hist,
        )
        rng = np.random.default_rng(5)
        for k in range(3):
            pose = rigid3.make(
                rng.normal(0, 0.1, 3),
                rigid3.quat_from_angle_axis(
                    np.array([0.0, 0.0, rng.normal(0, 0.03)])
                ),
            )
            cb.maybe_add_constraint(
                SubmapId(0, 0), submap, NodeId(0, k), node, pose, 0.0
            )
        return cb.run_pending()

    dev = run("device")
    nat = run("native")
    assert len(dev) == len(nat) and len(nat) >= 2
    for a, b in zip(dev, nat):
        assert a.node_id == b.node_id and a.submap_id == b.submap_id
        np.testing.assert_allclose(
            a.pose.zbar_ij, b.pose.zbar_ij, atol=1e-4
        )
