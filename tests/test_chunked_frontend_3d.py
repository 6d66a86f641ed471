"""Chunked 3D device frontend vs the per-scan host frontend (parity).

Both implement local_trajectory_builder_3d.cc semantics; the chunked one
runs the whole pipeline on device (ops/frontend_3d.py). On the same
synthetic scans + IMU stream they must produce the same node schedule
and closely matching poses."""

import numpy as np
import pytest

from cartographer_tpu.common.config import (
    AdaptiveVoxelFilterOptions,
    MotionFilterOptions,
    SubmapsOptions3D,
    TrajectoryBuilder3DOptions,
)
from cartographer_tpu.mapping.chunked_frontend_3d import (
    ChunkedLocalTrajectoryBuilder3D,
)
from cartographer_tpu.mapping.local_trajectory_builder_3d import (
    LocalTrajectoryBuilder3D,
)
from cartographer_tpu.sensor.data import ImuData
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3

TRAVEL_DISTANCE = 1.0
DURATION = 4.0
TIME_STEP = 0.1


def make_options():
    return TrajectoryBuilder3DOptions(
        min_range=0.1,
        max_range=10.0,
        # Thresholds chosen away from the per-scan deltas (0.025 m, ~0 rad)
        # so the insert schedule is time-driven and identical between the
        # float64 host path and the float32 device path.
        motion_filter=MotionFilterOptions(
            max_time_seconds=0.5, max_distance_meters=0.2, max_angle_radians=0.2
        ),
        high_resolution_adaptive_voxel_filter=AdaptiveVoxelFilterOptions(
            max_length=2.0, min_num_points=100, max_range=15.0
        ),
        low_resolution_adaptive_voxel_filter=AdaptiveVoxelFilterOptions(
            max_length=4.0, min_num_points=150, max_range=15.0
        ),
        submaps=SubmapsOptions3D(
            num_range_data=10,
            high_resolution=0.10,
            low_resolution=0.45,
            high_resolution_grid_size=192,
            low_resolution_grid_size=96,
        ),
    )


def imu_stream(t0, t1, rate=50.0):
    times = np.arange(t0, t1, 1.0 / rate)
    return [
        ImuData(
            time=t,
            linear_acceleration=np.array([0.0, 0.0, 9.8]),
            angular_velocity=np.zeros(3),
        )
        for t in times
    ]


@pytest.fixture(scope="module")
def runs():
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    translation = direction * TRAVEL_DISTANCE
    measurements = generate_fake_range_measurements(
        translation=translation, duration=DURATION, time_step=TIME_STEP
    )
    imu = imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + DURATION + 0.1)

    host = LocalTrajectoryBuilder3D(make_options(), {"range"})
    host_results = []
    imu_i = 0
    for m in measurements:
        while imu_i < len(imu) and imu[imu_i].time <= m.time:
            host.add_imu_data(imu[imu_i])
            imu_i += 1
        r = host.add_range_data("range", m)
        if r is not None:
            host_results.append(r)

    chunked = ChunkedLocalTrajectoryBuilder3D(
        make_options(), {"range"}, chunk_size=8
    )
    chunked_results = []
    imu_i = 0
    for m in measurements:
        while imu_i < len(imu) and imu[imu_i].time <= m.time:
            chunked.add_imu_data(imu[imu_i])
            imu_i += 1
        chunked_results.extend(chunked.add_range_data("range", m))
    chunked_results.extend(chunked.flush())
    return host_results, chunked_results, translation, chunked


class TestChunkedParity3D:
    def test_same_node_schedule(self, runs):
        host_results, chunked_results, _, _ = runs
        assert len(chunked_results) == len(host_results)
        host_inserted = [r.insertion_result is not None for r in host_results]
        chunked_inserted = [
            r.insertion_result is not None for r in chunked_results
        ]
        assert chunked_inserted == host_inserted

    def test_pose_parity(self, runs):
        host_results, chunked_results, _, _ = runs
        for h, c in zip(host_results, chunked_results):
            assert h.time == c.time
            err = np.linalg.norm(
                rigid3.trans(h.local_pose) - rigid3.trans(c.local_pose)
            )
            assert err < 0.03, (h.time, err)

    def test_drift_bounded(self, runs):
        _, chunked_results, translation, _ = runs
        velocity = translation / DURATION
        last = chunked_results[-1]
        expected = rigid3.translation((last.time - FAKE_START_TIME) * velocity)
        err = np.linalg.norm(
            rigid3.trans(last.local_pose) - rigid3.trans(expected)
        )
        assert err < 0.1 * TRAVEL_DISTANCE

    def test_submap_lifecycle(self, runs):
        host_results, chunked_results, _, chunked = runs
        host_counts = [
            tuple(s.num_range_data for s in r.insertion_result.insertion_submaps)
            for r in host_results
            if r.insertion_result is not None
        ]
        chunked_counts = [
            tuple(s.num_range_data for s in r.insertion_result.insertion_submaps)
            for r in chunked_results
            if r.insertion_result is not None
        ]
        assert chunked_counts == host_counts
        for r in chunked_results:
            if r.insertion_result is None:
                continue
            for s in r.insertion_result.insertion_submaps:
                assert s.high_resolution_grid is not None
                assert s.low_resolution_grid is not None

    def test_grid_content_parity(self, runs):
        host_results, chunked_results, _, _ = runs
        h_sub = next(
            r.insertion_result.insertion_submaps[0]
            for r in host_results
            if r.insertion_result is not None
        )
        c_sub = next(
            r.insertion_result.insertion_submaps[0]
            for r in chunked_results
            if r.insertion_result is not None
        )
        from cartographer_tpu.mapping.paged_grid_3d import as_dense

        h_grid = as_dense(h_sub.high_resolution_grid)
        c_grid = c_sub.high_resolution_grid
        cv = np.asarray(c_grid.values)
        # The host side builds paged and densifies cropped; embed the crop
        # into the chunked grid's (full-extent) cell lattice to compare.
        hv = np.zeros_like(cv)
        crop = np.asarray(h_grid.values)
        off = np.round(
            (np.asarray(h_grid.origin) - np.asarray(c_grid.origin))
            / h_grid.resolution
        ).astype(int)
        hv[
            off[2]: off[2] + crop.shape[0],
            off[1]: off[1] + crop.shape[1],
            off[0]: off[0] + crop.shape[2],
        ] = crop
        # Occupancy agreement: same voxels known, >=98% sign agreement.
        known_h = hv != 0
        known_c = cv != 0
        inter = known_h & known_c
        union = known_h | known_c
        assert inter.sum() / max(union.sum(), 1) > 0.9
        agree = (np.sign(hv[inter]) == np.sign(cv[inter])).mean()
        assert agree > 0.98

    def test_histogram_parity(self, runs):
        host_results, chunked_results, _, _ = runs
        h = next(
            r.insertion_result
            for r in host_results
            if r.insertion_result is not None
        )
        c = next(
            r.insertion_result
            for r in chunked_results
            if r.insertion_result is not None
        )
        hh = h.constant_data.rotational_scan_matcher_histogram
        ch = c.constant_data.rotational_scan_matcher_histogram

        # The synthetic wall's ~1 cm point spacing makes the histogram's
        # 0.2 m chain threshold (rotational_scan_matcher.cc MIN_DISTANCE)
        # knife-edge: the chunked path's sub-mm point quantization flips
        # WHICH point crosses it, shifting delta angles by ~2 of the
        # pi/120 buckets. Compare smoothed histograms — real clouds have
        # sensor noise well above the quantization and are equally
        # chain-sensitive in both implementations.
        def smooth(x):
            return sum(np.roll(x, k) for k in range(-2, 3))

        hh, ch = smooth(hh), smooth(ch)
        denom = max(np.linalg.norm(hh) * np.linalg.norm(ch), 1e-6)
        assert float(np.dot(hh, ch)) / denom > 0.92
