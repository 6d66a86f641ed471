"""Chunked device frontend vs the per-scan host frontend (parity).

Both implement local_trajectory_builder_2d.cc semantics; the chunked one
runs the whole pipeline on device (ops/frontend_2d.py). On the same
synthetic scans they must produce the same node schedule and closely
matching poses."""

import numpy as np
import pytest

from cartographer_tpu.common.config import (
    GridOptions2D,
    SubmapsOptions2D,
    TrajectoryBuilder2DOptions,
)
from cartographer_tpu.mapping.chunked_frontend_2d import (
    ChunkedLocalTrajectoryBuilder2D,
)
from cartographer_tpu.mapping.local_trajectory_builder_2d import (
    LocalTrajectoryBuilder2D,
)
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3

TRAVEL_DISTANCE = 1.2
DURATION = 4.0
TIME_STEP = 0.1


def make_options():
    return TrajectoryBuilder2DOptions(
        use_imu_data=False,
        max_range=10.0,
        submaps=SubmapsOptions2D(
            num_range_data=20,
            grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512),
        ),
    )


def make_measurements():
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    translation = direction * TRAVEL_DISTANCE
    return (
        generate_fake_range_measurements(
            translation=translation, duration=DURATION, time_step=TIME_STEP
        ),
        translation,
    )


@pytest.fixture(scope="module")
def runs():
    measurements, translation = make_measurements()

    host = LocalTrajectoryBuilder2D(make_options(), {"range"})
    host_results = []
    for m in measurements:
        r = host.add_range_data("range", m)
        if r is not None:
            host_results.append(r)

    chunked = ChunkedLocalTrajectoryBuilder2D(
        make_options(), {"range"}, chunk_size=16
    )
    chunked_results = []
    for m in measurements:
        chunked_results.extend(chunked.add_range_data("range", m))
    chunked_results.extend(chunked.flush())
    return host_results, chunked_results, translation, chunked


class TestChunkedParity:
    def test_same_node_schedule(self, runs):
        host_results, chunked_results, _, _ = runs
        assert len(chunked_results) == len(host_results)
        host_inserted = [r.insertion_result is not None for r in host_results]
        chunked_inserted = [
            r.insertion_result is not None for r in chunked_results
        ]
        assert chunked_inserted == host_inserted

    def test_pose_parity(self, runs):
        # The chunked path int16-quantizes the host->device point transfer
        # (~0.2 mm error, far below real LIDAR noise); the scan-match ->
        # insert feedback loop amplifies that perturbation over the run, so
        # host/device trajectories agree to sub-cell (< 1 x resolution)
        # rather than sub-mm. Accuracy itself is gated by
        # test_drift_bounded (vs ground truth).
        host_results, chunked_results, _, _ = runs
        for h, c in zip(host_results, chunked_results):
            assert h.time == c.time
            err = np.linalg.norm(
                rigid3.trans(h.local_pose) - rigid3.trans(c.local_pose)
            )
            assert err < 0.05, (h.time, err)

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
        # Every submap handed out has a real grid attached by chunk end.
        for r in chunked_results:
            if r.insertion_result:
                for s in r.insertion_result.insertion_submaps:
                    assert s.grid is not None

    def test_grid_parity(self, runs):
        """Finished-submap grids match the host path cell-for-cell (same
        inserts, same ray casting)."""
        host_results, chunked_results, _, _ = runs
        host_sub = chunked_sub = None
        for r in host_results:
            if r.insertion_result:
                for s in r.insertion_result.insertion_submaps:
                    if s.insertion_finished:
                        host_sub = s
        for r in chunked_results:
            if r.insertion_result:
                for s in r.insertion_result.insertion_submaps:
                    if s.insertion_finished:
                        chunked_sub = s
        assert (host_sub is None) == (chunked_sub is None)
        if host_sub is None:
            return
        hk = np.asarray(host_sub.grid.known)
        ck = np.asarray(chunked_sub.grid.known)
        # Known-cell agreement within a small tolerance (pose differences
        # of <2 cm shift a few boundary cells).
        agree = (hk == ck).mean()
        assert agree > 0.97, agree


class TestChunkedWithImu:
    def test_imu_parity(self):
        """With IMU (use_imu_data=True) the device ImuTracker chain matches
        the host LocalTrajectoryBuilder2D on synthetic planar data."""
        import tests.test_map_builder_3d as t3d

        def opts():
            return TrajectoryBuilder2DOptions(
                use_imu_data=True,
                max_range=10.0,
                submaps=SubmapsOptions2D(
                    num_range_data=20,
                    grid_options_2d=GridOptions2D(
                        resolution=0.05, grid_size=512
                    ),
                ),
            )

        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * TRAVEL_DISTANCE
        measurements = generate_fake_range_measurements(
            translation=translation, duration=DURATION, time_step=TIME_STEP
        )
        imu = t3d.imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + DURATION + 0.1)
        events = [("imu", d.time, d) for d in imu] + [
            ("range", m.time, m) for m in measurements
        ]
        events.sort(key=lambda e: e[1])

        host = LocalTrajectoryBuilder2D(opts(), {"range"})
        host_results = []
        for kind, _, payload in events:
            if kind == "imu":
                host.add_imu_data(payload)
            else:
                r = host.add_range_data("range", payload)
                if r is not None:
                    host_results.append(r)

        chunked = ChunkedLocalTrajectoryBuilder2D(opts(), {"range"}, chunk_size=16)
        chunked_results = []
        for kind, _, payload in events:
            if kind == "imu":
                chunked.add_imu_data(payload)
            else:
                chunked_results.extend(chunked.add_range_data("range", payload))
        chunked_results.extend(chunked.flush())

        assert len(chunked_results) == len(host_results)
        for h, c in zip(host_results, chunked_results):
            assert h.time == c.time
            err = np.linalg.norm(
                rigid3.trans(h.local_pose) - rigid3.trans(c.local_pose)
            )
            assert err < 0.03, (h.time, err)
        # Drift bound vs ground truth.
        velocity = translation / DURATION
        last = chunked_results[-1]
        expected = rigid3.translation((last.time - FAKE_START_TIME) * velocity)
        err = np.linalg.norm(rigid3.trans(last.local_pose) - rigid3.trans(expected))
        assert err < 0.1 * TRAVEL_DISTANCE
        host_ins = [r.insertion_result is not None for r in host_results]
        chunk_ins = [r.insertion_result is not None for r in chunked_results]
        assert chunk_ins == host_ins


class TestChunkedOdometryParity:
    """Odometry-fed runs: the chunked device frontend's odometry queue,
    endpoint velocities, and tracker extrapolation must track the host
    PoseExtrapolator (pose_extrapolator.cc:100-135)."""

    def _run_both(self):
        from cartographer_tpu.sensor.data import OdometryData
        from cartographer_tpu.transform import rigid2 as _r2

        measurements, translation = make_measurements()
        velocity = translation / DURATION

        def odom_stream():
            # 20 Hz odometry along the true trajectory with slight noise.
            rng = np.random.default_rng(7)
            ts = np.arange(
                FAKE_START_TIME + 0.01, FAKE_START_TIME + DURATION, 0.05
            )
            out = []
            for t in ts:
                pos = (t - FAKE_START_TIME) * velocity
                pos = pos + rng.normal(0, 1e-4, 3)
                out.append(
                    OdometryData(
                        time=float(t),
                        pose=rigid3.make(pos, np.array([1.0, 0, 0, 0])),
                    )
                )
            return out

        def feed(builder, chunked):
            odom = odom_stream()
            oi = 0
            results = []
            for m in measurements:
                while oi < len(odom) and odom[oi].time <= m.time:
                    try:
                        builder.add_odometry_data(odom[oi])
                    except Exception:
                        raise
                    oi += 1
                r = builder.add_range_data("range", m)
                if chunked:
                    results.extend(r)
                elif r is not None:
                    results.append(r)
            if chunked:
                results.extend(builder.flush())
            return results

        host = LocalTrajectoryBuilder2D(make_options(), {"range"})
        host_results = feed(host, chunked=False)
        dev = ChunkedLocalTrajectoryBuilder2D(
            make_options(), {"range"}, chunk_size=16
        )
        dev_results = feed(dev, chunked=True)
        return host_results, dev_results

    def test_odometry_parity(self):
        host_results, dev_results = self._run_both()
        assert len(dev_results) == len(host_results)
        host_inserted = [r.insertion_result is not None for r in host_results]
        dev_inserted = [r.insertion_result is not None for r in dev_results]
        assert dev_inserted == host_inserted
        for h, c in zip(host_results, dev_results):
            assert h.time == c.time
            err = np.linalg.norm(
                rigid3.trans(h.local_pose) - rigid3.trans(c.local_pose)
            )
            assert err < 0.05, (h.time, err)

    def test_odometry_drift_bounded(self):
        _, dev_results = self._run_both()
        velocity = None
        measurements, translation = make_measurements()
        velocity = translation / DURATION
        errs = []
        for r in dev_results:
            expected = (r.time - FAKE_START_TIME) * velocity
            errs.append(
                np.linalg.norm(rigid3.trans(r.local_pose) - expected)
            )
        assert max(errs) < 0.1 * TRAVEL_DISTANCE


class TestChunkedOnlineCorrelative:
    """use_online_correlative_scan_matching=True runs the RTCSM pre-match
    on device before the LM refinement
    (local_trajectory_builder_2d.cc:255-265)."""

    def _options(self):
        from cartographer_tpu.common.config import (
            MotionFilterOptions,
            RealTimeCorrelativeScanMatcherOptions,
        )

        o = make_options()
        o.use_online_correlative_scan_matching = True
        # A narrow window keeps the quantized RTCSM argmax away from
        # near-ties on the sparsely-populated early submap (with a wide
        # window BOTH paths yaw-wander there and tie-break differently);
        # the motion filter likewise stays far from decision boundaries.
        o.real_time_correlative_scan_matcher = (
            RealTimeCorrelativeScanMatcherOptions(
                linear_search_window=0.1,
                angular_search_window=np.radians(3.0),
            )
        )
        o.motion_filter = MotionFilterOptions(
            max_distance_meters=0.04,
            # Yaw differences of one RTCSM angular step (~0.017 rad)
            # between equally-valid anchors must not flip the filter.
            max_angle_radians=np.radians(10.0),
        )
        return o

    @staticmethod
    def _measurements():
        # ~0.75 cells per scan: away from the half-cell fraction where
        # adjacent RTCSM candidates tie within the clouds' int16
        # quantization noise (host/device then pick different anchors,
        # both valid), and slow enough for the no-IMU cold start.
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * 1.5
        return (
            generate_fake_range_measurements(
                translation=translation, duration=4.0, time_step=0.1
            ),
            translation,
        )

    def test_parity_with_host(self):
        measurements, translation = self._measurements()
        host = LocalTrajectoryBuilder2D(self._options(), {"range"})
        host_results = []
        for m in measurements:
            r = host.add_range_data("range", m)
            if r is not None:
                host_results.append(r)
        dev = ChunkedLocalTrajectoryBuilder2D(
            self._options(), {"range"}, chunk_size=16
        )
        dev_results = []
        for m in measurements:
            dev_results.extend(dev.add_range_data("range", m))
        dev_results.extend(dev.flush())

        assert len(dev_results) == len(host_results)
        # The RTCSM argmax is grid/angle-quantized: when two candidates
        # score within float noise, host and device (whose filtered clouds
        # already differ by int16 quantization) can pick adjacent cells,
        # anchoring the LM rotation penalty one angular step apart. Exact
        # schedule equality is therefore not attainable; require close
        # poses and a near-identical insert schedule instead (pure parity
        # without RTCSM is covered by TestChunkedParity).
        # A single early tie-break flip shifts the whole insert cadence
        # by one scan, so positional comparison is meaningless — the
        # CADENCE (total insert count) is the invariant.
        host_n = sum(r.insertion_result is not None for r in host_results)
        dev_n = sum(r.insertion_result is not None for r in dev_results)
        assert abs(host_n - dev_n) <= 2, (host_n, dev_n)
        # Early-run agreement (before independent tie-breaks compound into
        # two equally-valid trajectories); absolute accuracy of the full
        # run is gated against ground truth below for BOTH paths.
        for h, c in list(zip(host_results, dev_results))[:15]:
            err = np.linalg.norm(
                rigid3.trans(h.local_pose) - rigid3.trans(c.local_pose)
            )
            assert err < 0.08, (h.time, err)
        _, translation = self._measurements()
        velocity = translation / 4.0
        for results in (host_results, dev_results):
            errs = [
                np.linalg.norm(
                    rigid3.trans(r.local_pose)
                    - (r.time - FAKE_START_TIME) * velocity
                )
                for r in results
            ]
            assert max(errs) < 0.1 * np.linalg.norm(translation), max(errs)

    def test_drift_bounded_with_online_correlative(self):
        measurements, translation = self._measurements()
        velocity = translation / 4.0
        dev = ChunkedLocalTrajectoryBuilder2D(
            self._options(), {"range"}, chunk_size=16
        )
        results = []
        for m in measurements:
            results.extend(dev.add_range_data("range", m))
        results.extend(dev.flush())
        errs = [
            np.linalg.norm(
                rigid3.trans(r.local_pose)
                - (r.time - FAKE_START_TIME) * velocity
            )
            for r in results
        ]
        assert max(errs) < 0.1 * np.linalg.norm(translation)


class TestChunkedImuOdometryParity:
    """IMU + odometry together (the common real-robot 2D config): the
    device odometry tracker copy syncs to the gyro-fed main tracker at
    each add_pose and advances with the latest gyro rate — matching
    PoseExtrapolator::AddOdometryData with odometry_imu_tracker_
    (pose_extrapolator.cc:100-135). Previously this configuration raised
    NotImplementedError and silently cost ~6x on the host path."""

    def _run_both(self):
        import tests.test_map_builder_3d as t3d
        from cartographer_tpu.sensor.data import OdometryData

        def opts():
            return TrajectoryBuilder2DOptions(
                use_imu_data=True,
                max_range=10.0,
                submaps=SubmapsOptions2D(
                    num_range_data=20,
                    grid_options_2d=GridOptions2D(
                        resolution=0.05, grid_size=512
                    ),
                ),
            )

        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        translation = direction * TRAVEL_DISTANCE
        velocity = translation / DURATION
        measurements = generate_fake_range_measurements(
            translation=translation, duration=DURATION, time_step=TIME_STEP
        )
        imu = t3d.imu_stream(
            FAKE_START_TIME - 0.5, FAKE_START_TIME + DURATION + 0.1
        )
        rng = np.random.default_rng(11)
        odom = [
            OdometryData(
                time=float(t),
                pose=rigid3.make(
                    (t - FAKE_START_TIME) * velocity + rng.normal(0, 1e-4, 3),
                    np.array([1.0, 0, 0, 0]),
                ),
            )
            for t in np.arange(
                FAKE_START_TIME + 0.01, FAKE_START_TIME + DURATION, 0.05
            )
        ]
        events = (
            [("imu", d.time, d) for d in imu]
            + [("odom", d.time, d) for d in odom]
            + [("range", m.time, m) for m in measurements]
        )
        events.sort(key=lambda e: e[1])

        def feed(builder, chunked):
            results = []
            for kind, _, payload in events:
                if kind == "imu":
                    builder.add_imu_data(payload)
                elif kind == "odom":
                    builder.add_odometry_data(payload)
                else:
                    r = builder.add_range_data("range", payload)
                    if chunked:
                        results.extend(r)
                    elif r is not None:
                        results.append(r)
            if chunked:
                results.extend(builder.flush())
            return results

        host_results = feed(
            LocalTrajectoryBuilder2D(opts(), {"range"}), chunked=False
        )
        dev_results = feed(
            ChunkedLocalTrajectoryBuilder2D(opts(), {"range"}, chunk_size=16),
            chunked=True,
        )
        return host_results, dev_results, translation

    def test_imu_odometry_parity(self):
        host_results, dev_results, translation = self._run_both()
        assert len(dev_results) == len(host_results) > 10
        host_inserted = [r.insertion_result is not None for r in host_results]
        dev_inserted = [r.insertion_result is not None for r in dev_results]
        assert dev_inserted == host_inserted
        for h, c in zip(host_results, dev_results):
            assert h.time == c.time
            err = np.linalg.norm(
                rigid3.trans(h.local_pose) - rigid3.trans(c.local_pose)
            )
            assert err < 0.05, (h.time, err)
        # Drift bound vs ground truth.
        velocity = translation / DURATION
        errs = [
            np.linalg.norm(
                rigid3.trans(r.local_pose)
                - (r.time - FAKE_START_TIME) * velocity
            )
            for r in dev_results
        ]
        assert max(errs) < 0.1 * TRAVEL_DISTANCE


class TestImuDropDeviationBounded:
    def test_orientation_error_under_sustained_skipping(self):
        """Known deviation (ops/frontend_2d.py module docstring): IMU
        samples in the window of a scan that produces no match are
        dropped, and the gap is bridged by constant-rate extrapolation.
        The induced orientation error is proportional to the angular
        ACCELERATION over the dropped windows; this test drives a
        time-varying yaw rate with every third scan filtered out
        (all points below min_range) and bounds the device-vs-host yaw
        deviation."""
        from cartographer_tpu.sensor.data import ImuData, TimedPointCloudData

        def opts():
            return TrajectoryBuilder2DOptions(
                use_imu_data=True,
                min_range=0.3,
                max_range=10.0,
                submaps=SubmapsOptions2D(
                    num_range_data=20,
                    grid_options_2d=GridOptions2D(
                        resolution=0.05, grid_size=512
                    ),
                ),
            )

        measurements = generate_fake_range_measurements(
            translation=np.zeros(3), duration=DURATION, time_step=TIME_STEP
        )
        # Every 3rd scan: points collapsed below min_range -> no match on
        # either path, but its window's IMU is dropped only on the device.
        doctored = []
        for i, m in enumerate(measurements):
            if i % 3 == 2 and i > 4:
                pts = m.ranges.points.copy()
                norms = np.linalg.norm(pts, axis=1, keepdims=True)
                pts = pts / np.maximum(norms, 1e-9) * 0.05
                doctored.append(
                    TimedPointCloudData(
                        time=m.time,
                        origin=m.origin,
                        ranges=type(m.ranges)(pts, m.ranges.times),
                    )
                )
            else:
                doctored.append(m)
        # Yaw rate varies during the run: omega(t) = 0.3 sin(t).
        t_imu = np.arange(
            FAKE_START_TIME - 0.5, FAKE_START_TIME + DURATION + 0.1, 0.01
        )
        imu = [
            ImuData(
                time=float(t),
                linear_acceleration=np.array([0.0, 0.0, 9.8]),
                angular_velocity=np.array(
                    [0.0, 0.0, 0.3 * np.sin(t - FAKE_START_TIME)]
                ),
            )
            for t in t_imu
        ]
        events = [("imu", d.time, d) for d in imu] + [
            ("range", m.time, m) for m in doctored
        ]
        events.sort(key=lambda e: e[1])

        def feed(builder, chunked):
            results = []
            for kind, _, payload in events:
                if kind == "imu":
                    builder.add_imu_data(payload)
                else:
                    r = builder.add_range_data("range", payload)
                    if chunked:
                        results.extend(r)
                    elif r is not None:
                        results.append(r)
            if chunked:
                results.extend(builder.flush())
            return results

        host_results = feed(
            LocalTrajectoryBuilder2D(opts(), {"range"}), chunked=False
        )
        dev_results = feed(
            ChunkedLocalTrajectoryBuilder2D(opts(), {"range"}, chunk_size=16),
            chunked=True,
        )
        assert len(host_results) > 10
        assert len(dev_results) == len(host_results)
        yaw_errs = []
        for h, c in zip(host_results, dev_results):
            dyaw = abs(
                rigid3.get_yaw(
                    rigid3.quat_multiply(
                        rigid3.quat_conjugate(rigid3.quat(h.local_pose)),
                        rigid3.quat(c.local_pose),
                    )
                )
            )
            yaw_errs.append(dyaw)
        # Sustained skipping with omega_dot <= 0.3 rad/s^2 over 0.1 s
        # windows: per-window deviation <= ~0.0015 rad; the scan matcher
        # re-anchors orientation, so the accumulated error stays small.
        assert max(yaw_errs) < 0.03, max(yaw_errs)
