"""3D fast correlative matcher: batched drain vs single-search parity
(model: fast_correlative_scan_matcher_3d_test.cc scope; end-to-end BnB
behavior is covered by test_map_builder_3d)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cartographer_tpu.common.config import FastCorrelativeScanMatcherOptions3D
from cartographer_tpu.mapping.hybrid_grid import LOG_ODDS_SCALE, Grid3D
from cartographer_tpu.ops.scan_matching import rotational_histogram
from cartographer_tpu.ops.scan_matching.fast_correlative_3d import (
    FastCorrelativeScanMatcher3D,
    batch_match_device_3d,
)
from cartographer_tpu.transform import rigid3


def make_world():
    rng = np.random.default_rng(3)
    angles = np.linspace(0, 2 * np.pi, 160, endpoint=False)
    r = 3.0 + 0.4 * np.sin(3 * angles)
    z = 0.4 * np.sin(5 * angles)
    cloud = np.stack(
        [r * np.cos(angles), r * np.sin(angles), z], axis=-1
    ).astype(np.float32)

    def grid_from(cloud, size, res):
        vals = np.zeros((size, size, size), np.int8)
        half = 0.5 * size * res
        cells = np.floor((cloud + half) / res + 0.5).astype(int)
        ok = np.all((cells >= 0) & (cells < size), axis=1)
        c = cells[ok]
        vals[c[:, 2], c[:, 1], c[:, 0]] = int(2.0 / LOG_ODDS_SCALE / 4)
        origin = jnp.full((3,), -half, jnp.float32)
        return Grid3D(values=jnp.asarray(vals), origin=origin, resolution=res)

    high = grid_from(cloud, 64, 0.2)
    low = grid_from(cloud, 32, 0.8)
    hist = rotational_histogram.compute_histogram(cloud, 120)
    return high, low, hist, cloud


class TestBatchedSearch3D:
    def test_batch_matches_single(self):
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
        rng = np.random.default_rng(11)
        low_cloud = cloud[::4]
        preps, singles = [], []
        for i in range(3):
            pose = rigid3.make(
                rng.normal(0, 0.1, 3),
                rigid3.quat_from_angle_axis(
                    np.array([0.0, 0.0, rng.normal(0, 0.03)])
                ),
            )
            staged = (
                FastCorrelativeScanMatcher3D.stage_points(cloud, low_cloud)
                if i % 2 == 0
                else None
            )
            prep = matcher._prepare(
                pose, hist, 0.0, cloud, low_cloud, 0.15,
                device_points=staged,
            )
            assert prep is not None
            preps.append(prep)
            packed, ctx = matcher.match_device(
                pose, hist, 0.0, cloud, low_cloud, 0.15,
                device_points=staged,
            )
            singles.append(matcher.decode(np.asarray(packed), ctx))

        packed_all, ctxs = batch_match_device_3d(preps)
        assert packed_all.shape[0] == len(preps)
        for row, ctx, single in zip(packed_all, ctxs, singles):
            batched = matcher.decode(row, ctx)
            assert (batched is None) == (single is None)
            if single is not None:
                assert batched.score == pytest.approx(single.score, abs=1e-6)
                np.testing.assert_allclose(
                    batched.pose, single.pose, atol=1e-6
                )
