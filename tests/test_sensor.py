"""Sensor layer tests (model: sensor/internal/{voxel_filter,ordered_multi_queue,
collator}_test.cc, compressed_point_cloud_test.cc)."""

import dataclasses

import numpy as np
import pytest

from cartographer_tpu.common.config import AdaptiveVoxelFilterOptions
from cartographer_tpu.sensor import (
    PointCloud,
    RangeData,
    adaptive_voxel_filter,
    voxel_filter,
)
from cartographer_tpu.sensor.collator import Collator, TrajectoryCollator
from cartographer_tpu.sensor.compression import CompressedPointCloud
from cartographer_tpu.sensor.map_by_time import MapByTime
from cartographer_tpu.sensor.ordered_multi_queue import OrderedMultiQueue
from cartographer_tpu.transform import rigid3


@dataclasses.dataclass
class FakeData:
    time: float
    tag: str = ""


class TestVoxelFilter:
    def test_keeps_one_per_voxel(self):
        cloud = PointCloud(
            np.array(
                [[0.0, 0.0, 0.0], [0.01, 0.01, 0.0], [0.5, 0.5, 0.0], [0.51, 0.5, 0.0]],
                dtype=np.float32,
            )
        )
        out = voxel_filter(cloud, 0.3)
        assert out.size == 2

    def test_keeps_sparse_cloud(self):
        pts = np.random.default_rng(0).uniform(-10, 10, size=(50, 3)).astype(np.float32)
        cloud = PointCloud(pts)
        out = voxel_filter(cloud, 0.01)
        assert out.size == 50

    def test_adaptive_returns_enough_points(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-5, 5, size=(1000, 3)).astype(np.float32)
        options = AdaptiveVoxelFilterOptions(max_length=5.0, min_num_points=100, max_range=50.0)
        out = adaptive_voxel_filter(PointCloud(pts), options)
        assert out.size >= 100

    def test_adaptive_passthrough_when_sparse(self):
        pts = np.random.default_rng(2).uniform(-5, 5, size=(10, 3)).astype(np.float32)
        options = AdaptiveVoxelFilterOptions(max_length=0.5, min_num_points=100, max_range=50.0)
        out = adaptive_voxel_filter(PointCloud(pts), options)
        assert out.size == 10

    def test_max_range_crop(self):
        pts = np.array([[1.0, 0, 0], [100.0, 0, 0]], dtype=np.float32)
        options = AdaptiveVoxelFilterOptions(max_length=0.5, min_num_points=100, max_range=50.0)
        out = adaptive_voxel_filter(PointCloud(pts), options)
        assert out.size == 1


class TestRangeData:
    def test_transform_and_crop(self):
        rd = RangeData(
            origin=np.zeros(3, np.float32),
            returns=PointCloud(np.array([[1.0, 0.0, 0.5], [0.0, 1.0, 3.0]], np.float32)),
            misses=PointCloud(np.zeros((0, 3), np.float32)),
        )
        cropped = rd.crop(-1.0, 1.0)
        assert cropped.returns.size == 1
        pose = rigid3.translation(np.array([1.0, 2.0, 3.0]))
        moved = rd.transform(pose)
        np.testing.assert_allclose(moved.origin, [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(moved.returns.points[0], [2, 2, 3.5], atol=1e-6)


class TestCompression:
    def test_roundtrip_precision(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(-50, 50, size=(500, 3)).astype(np.float32)
        comp = CompressedPointCloud.compress(pts)
        out = comp.decompress()
        assert out.shape == pts.shape
        # 1 mm grid quantization -> max error 0.5 mm per axis.
        np.testing.assert_allclose(out, pts, atol=6e-4)

    def test_empty(self):
        comp = CompressedPointCloud.compress(np.zeros((0, 3)))
        assert comp.decompress().shape == (0, 3)


class TestOrderedMultiQueue:
    def _make(self, dispatched):
        q = OrderedMultiQueue()
        for key in [(0, "a"), (0, "b")]:
            q.add_queue(key, lambda d: dispatched.append(d))
        return q

    def test_time_ordering(self):
        out = []
        q = self._make(out)
        q.add((0, "a"), FakeData(1.0, "a1"))
        q.add((0, "a"), FakeData(3.0, "a3"))
        q.add((0, "b"), FakeData(2.0, "b2"))
        q.add((0, "b"), FakeData(4.0, "b4"))
        q.flush()
        assert [d.time for d in out] == [1.0, 2.0, 3.0, 4.0]

    def test_blocks_on_empty_queue(self):
        out = []
        q = self._make(out)
        q.add((0, "a"), FakeData(1.0))
        q.add((0, "a"), FakeData(2.0))
        # Queue b empty: nothing can be dispatched past common start logic.
        assert len(out) == 0
        assert q.get_blocker() == (0, "b")

    def test_common_start_time_drops_early_data(self):
        out = []
        q = self._make(out)
        for t in [1.0, 2.0, 3.0, 4.0]:
            q.add((0, "a"), FakeData(t, f"a{t}"))
        q.add((0, "b"), FakeData(3.5, "b3.5"))
        q.flush()
        # Common start = 3.5 (first b). Early 'a' data dropped except the
        # last one before the common start time.
        times = [d.time for d in out]
        assert times == sorted(times)
        assert 1.0 not in times and 2.0 not in times
        assert 3.0 in times and 3.5 in times and 4.0 in times


class TestCollator:
    def test_collation(self):
        out = []
        c = Collator()
        c.add_trajectory(0, {"lidar", "imu"}, lambda sid, d: out.append((sid, d.time)))
        c.add_sensor_data(0, "lidar", FakeData(1.0))
        c.add_sensor_data(0, "imu", FakeData(0.5))
        c.add_sensor_data(0, "imu", FakeData(1.5))
        c.add_sensor_data(0, "lidar", FakeData(2.0))
        c.flush()
        times = [t for _, t in out]
        assert times == sorted(times)

    def test_trajectory_collator_independent(self):
        out = {0: [], 1: []}
        c = TrajectoryCollator()
        c.add_trajectory(0, {"lidar"}, lambda sid, d: out[0].append(d.time))
        c.add_trajectory(1, {"lidar"}, lambda sid, d: out[1].append(d.time))
        c.add_sensor_data(0, "lidar", FakeData(5.0))
        c.add_sensor_data(1, "lidar", FakeData(1.0))
        c.flush()
        assert out[0] == [5.0] and out[1] == [1.0]


class TestMapByTime:
    def test_append_and_lookup(self):
        m = MapByTime()
        for t in [1.0, 2.0, 3.0]:
            m.append(0, FakeData(t))
        assert m.has_trajectory(0)
        assert m.lower_bound(0, 2.0) == 1
        assert m.lower_bound(0, 2.5) == 2

    def test_trim(self):
        m = MapByTime()
        for t in [1.0, 2.0, 3.0, 4.0]:
            m.append(0, FakeData(t))
        m.trim(0, keep_from_time=3.0)
        times = [d.time for d in m.trajectory(0)]
        assert times == [2.0, 3.0, 4.0]  # keeps one before for interpolation
