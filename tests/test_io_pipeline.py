"""IO post-processing tests (model: io/*_points_processor tests,
fake_file_writer, xray_points_processor; mapping/detect_floors)."""

import io

import numpy as np
import pytest

from cartographer_tpu.io.points_processor import (
    CountingPointsProcessor,
    FlushResult,
    NullPointsProcessor,
    PointsBatch,
    build_pipeline,
    run_pipeline,
)
from cartographer_tpu.mapping.detect_floors import detect_floors
from cartographer_tpu.transform import rigid3


def make_batch(points, origin=(0, 0, 0), frame_id="lidar", intensities=None):
    return PointsBatch(
        time=0.0,
        origin=np.asarray(origin, np.float32),
        frame_id=frame_id,
        points=np.asarray(points, np.float32).reshape(-1, 3),
        intensities=None if intensities is None else np.asarray(intensities, np.float32),
    )


class TestPipeline:
    def test_counting_and_filters(self):
        files = {}

        def factory(name):
            files[name] = io.BytesIO()
            return files[name]

        pipeline = build_pipeline(
            [
                {"action": "min_max_range_filter", "min_range": 0.5, "max_range": 10.0},
                {"action": "vertical_range_filter", "min_z": -1.0, "max_z": 1.0},
                {"action": "dump_num_points"},
                {"action": "write_xyz", "filename": "points.xyz"},
                {"action": "write_ply", "filename": "points.ply"},
                {"action": "write_pcd", "filename": "points.pcd"},
            ],
            factory,
        )
        batch = make_batch(
            [
                [1.0, 0.0, 0.0],  # kept
                [0.1, 0.0, 0.0],  # dropped: too close
                [20.0, 0.0, 0.0],  # dropped: too far
                [2.0, 0.0, 5.0],  # dropped: z
            ]
        )
        run_pipeline(pipeline, lambda: [batch])
        counter = next(
            p for p in pipeline if isinstance(p, CountingPointsProcessor)
        )
        assert counter.num_points == 1
        assert b"1.0 0.0 0.0" in files["points.xyz"].getvalue()
        assert files["points.ply"].getvalue().startswith(b"ply")
        assert b"POINTS 1" in files["points.pcd"].getvalue()

    def test_outlier_removal_multipass(self):
        # A static wall plus a "moving object" point that many rays cross.
        wall = [[2.0, y, 0.0] for y in np.linspace(-1, 1, 21)]
        ghost = [[1.0, 0.0, 0.0]]  # between sensor and wall: rays pass through

        batches = [
            make_batch(wall + (ghost if i == 0 else []))
            for i in range(6)
        ]
        pipeline = build_pipeline(
            [
                {
                    "action": "voxel_filter_and_remove_moving_objects",
                    "voxel_size": 0.2,
                    "miss_per_hit_limit": 3.0,
                },
                {"action": "dump_num_points"},
            ],
            None,
        )
        run_pipeline(pipeline, lambda: batches)
        counter = next(p for p in pipeline if isinstance(p, CountingPointsProcessor))
        # The ghost voxel has 1 hit and ~wall-many rays through it -> removed.
        total_wall = 6 * len(wall)
        assert counter.num_points == total_wall

    def test_xray_and_probability_images(self):
        files = {}

        def factory(name):
            files[name] = io.BytesIO()
            return files[name]

        pipeline = build_pipeline(
            [
                {"action": "write_xray_image", "voxel_size": 0.1, "filename": "xray.png"},
                {"action": "write_probability_grid", "resolution": 0.1, "filename": "grid.png"},
                {"action": "write_hybrid_grid", "resolution": 0.1, "filename": "grid.npz"},
            ],
            factory,
        )
        rng = np.random.default_rng(0)
        run_pipeline(
            pipeline, lambda: [make_batch(rng.uniform(-2, 2, (500, 3)))]
        )
        assert files["xray.png"].getvalue()[:8] == b"\x89PNG\r\n\x1a\n"
        assert files["grid.png"].getvalue()[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(files["grid.npz"].getvalue()) > 100


class TestDetectFloors:
    def test_two_floors(self):
        # Spans must exceed the 25 m short-span threshold to count as real
        # floors (detect_floors.cc kMaxShortSpanLengthMeters).
        times, poses = [], []
        t = 0.0
        for z in [0.0] * 50 + [2.8] * 50:
            times.append(t)
            poses.append(rigid3.translation(np.array([t * 0.6, 0.0, z])))
            t += 1.0
        floors = detect_floors(times, poses)
        assert len(floors) == 2
        assert floors[0].z == pytest.approx(0.0, abs=0.3)
        assert floors[1].z == pytest.approx(2.8, abs=0.3)

    def test_single_floor(self):
        times = list(range(20))
        poses = [
            rigid3.translation(np.array([i * 2.0, 0.0, 0.02 * (i % 3)]))
            for i in range(20)
        ]
        assert len(detect_floors(times, poses)) == 1
