"""Reference-format pbstream compatibility tests: byte-format container,
proto record roundtrip, full state roundtrip 2D and 3D, and localization on
a map loaded from the reference format."""

import numpy as np
import pytest

from cartographer_tpu.io import pbstream_compat as pc
from cartographer_tpu.io.proto import state_pb2 as pb
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.map_builder import MapBuilder
from tests.test_map_builder import map_builder_options, trajectory_options
from tests.test_serialization import build_map


class TestConversions:
    def test_compressed_cloud_roundtrip(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-40, 40, (300, 3)).astype(np.float32)
        msg = pb.CompressedPointCloud()
        pc.compress_cloud_to_proto(pts, msg)
        out = pc.decompress_cloud_from_proto(msg)
        assert out.shape == pts.shape
        # Every decompressed point within the 1mm quantization of some input
        # point (order is block-sorted): sort both sides by quantized keys so
        # quantization ties pair up deterministically.
        qa = np.round(pts.astype(np.float64) / 1e-3)
        qb = np.round(out.astype(np.float64) / 1e-3)
        a = pts[np.lexsort(qa.T)]
        b = out[np.lexsort(qb.T)]
        np.testing.assert_allclose(a, b, atol=2e-3)
        msg2 = pb.CompressedPointCloud()
        pc.compress_cloud_to_proto(out, msg2)
        out2 = pc.decompress_cloud_from_proto(msg2)
        np.testing.assert_allclose(
            out[np.lexsort(out.T)], out2[np.lexsort(out2.T)], atol=1e-6
        )

    def test_cost_value_roundtrip(self):
        values = np.array([0, 1, 100, 16000, 32767], np.int32)
        log_odds, known = pc.cost_value_to_log_odds(values)
        back = pc.log_odds_to_cost_value(log_odds, known)
        np.testing.assert_array_equal(back, values)

    def test_prob_value_int8_roundtrip_monotone(self):
        values = np.array([0, 1, 8000, 16000, 24000, 32767], np.int64)
        q = pc.prob_value_to_log_odds_int8(values)
        back = pc.log_odds_int8_to_prob_value(q)
        # int8 quantization: monotone, ~0.7% of range error.
        assert (np.diff(back[1:]) > 0).all()
        assert np.abs(back[1:] - values[1:]).max() < 300

    def test_grid2d_roundtrip(self):
        from tests.test_grid_2d import make_range_data, small_options
        from cartographer_tpu.mapping.submap_2d import ActiveSubmaps2D

        active = ActiveSubmaps2D(small_options(grid_size=128, resolution=0.05))
        pts = np.stack([np.linspace(-1, 1, 60), np.full(60, 2.0)], axis=1)
        for _ in range(3):
            active.insert_range_data(make_range_data((0.3, -0.2), pts))
        grid = active.submaps()[0].grid
        msg = pb.Grid2D()
        pc.grid2d_to_proto(grid, msg)
        grid2 = pc.grid2d_from_proto(msg, 128)
        # Compare probabilities at known world points.
        from cartographer_tpu.mapping.grid_2d import world_to_cell

        for x, y in [(0.0, 2.0), (0.5, 2.0), (-0.9, 2.0), (0.3, 1.0)]:
            def prob_at(g):
                cx, cy = np.asarray(world_to_cell(g, np.array([x, y], np.float32)))
                p = np.asarray(g.probability())
                return p[int(np.floor(cy)), int(np.floor(cx))]

            assert prob_at(grid2) == pytest.approx(prob_at(grid), abs=1e-3)


class TestStateRoundtrip3D:
    def test_write_read_3d(self):
        import tests.test_map_builder_3d as t3d
        from cartographer_tpu.testing.synthetic import (
            FAKE_START_TIME,
            generate_fake_range_measurements,
        )

        mb = MapBuilder(t3d.map_builder_options())
        tid = mb.add_trajectory_builder(
            {"range", "imu"}, t3d.trajectory_options(), None
        )
        builder = mb.get_trajectory_builder(tid)
        imu = t3d.imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + 2.1)
        measurements = generate_fake_range_measurements(
            translation=np.array([0.5, 0.25, 0.0]), duration=2.0, time_step=0.1
        )
        events = [("imu", d.time, d) for d in imu] + [
            ("range", m.time, m) for m in measurements
        ]
        events.sort(key=lambda e: e[1])
        for kind, _, payload in events:
            builder.add_sensor_data(kind, payload)
        mb.finish_trajectory(tid)

        data = pc.write_pbstream(mb)
        mb2 = MapBuilder(t3d.map_builder_options())
        remap = pc.read_pbstream(mb2, data, load_frozen_state=True)
        assert remap == {0: 0}
        nodes1 = mb.pose_graph.get_trajectory_nodes()
        nodes2 = mb2.pose_graph.get_trajectory_nodes()
        assert nodes2.size() == nodes1.size()
        for node_id, node in nodes1.items(NodeId):
            np.testing.assert_allclose(
                nodes2.at(node_id).global_pose, node.global_pose, atol=1e-6
            )
            np.testing.assert_allclose(
                nodes2.at(node_id).constant_data.rotational_scan_matcher_histogram,
                node.constant_data.rotational_scan_matcher_histogram,
                atol=1e-5,
            )
        # 3D grids survive with int8<->uint16 quantization (identical cells
        # known, probabilities within the int8 step).
        for submap_id, d1 in mb.pose_graph.get_all_submap_data().items(SubmapId):
            d2 = mb2.pose_graph.get_all_submap_data().at(submap_id)
            k1 = int(np.asarray(d1.submap.high_resolution_grid.known()).sum())
            k2 = int(np.asarray(d2.submap.high_resolution_grid.known()).sum())
            assert k1 == k2


class TestStateRoundtrip2D:
    def test_write_read_preserves_graph(self):
        mb, _ = build_map()
        data = pc.write_pbstream(mb)
        assert data[:8] == bytes.fromhex("db01f55b7b1f1d7b")  # magic LE

        mb2 = MapBuilder(map_builder_options())
        remap = pc.read_pbstream(mb2, data, load_frozen_state=True)
        assert remap == {0: 0}
        nodes1 = mb.pose_graph.get_trajectory_nodes()
        nodes2 = mb2.pose_graph.get_trajectory_nodes()
        assert nodes2.size() == nodes1.size()
        for node_id, node in nodes1.items(NodeId):
            np.testing.assert_allclose(
                nodes2.at(node_id).global_pose, node.global_pose, atol=1e-6
            )
        assert len(mb2.pose_graph.constraints) == len(mb.pose_graph.constraints)
        # Grid content survives (checked via known-cell counts).
        for submap_id, d1 in mb.pose_graph.get_all_submap_data().items(SubmapId):
            d2 = mb2.pose_graph.get_all_submap_data().at(submap_id)
            n1 = int(np.asarray(d1.submap.grid.known).sum())
            n2 = int(np.asarray(d2.submap.grid.known).sum())
            assert n2 == n1


class TestMigration:
    def test_v1_to_v2_restores_3d_histograms(self, tmp_path):
        """serialization_format_migration.cc: a v1 stream (3D submaps
        without histograms) migrates to v2 with histograms accumulated from
        INTRA-constraint node histograms rotated into the submap frame."""
        import io as _io

        import numpy as np
        import tests.test_map_builder_3d as t3d

        from cartographer_tpu.io import pbstream_compat as pc
        from cartographer_tpu.io.proto import state_pb2 as pb
        from cartographer_tpu.io.proto_stream import (
            ProtoStreamReader,
            ProtoStreamWriter,
        )
        from cartographer_tpu.mapping.map_builder import MapBuilder
        from cartographer_tpu.testing.synthetic import FAKE_START_TIME

        from cartographer_tpu.testing.synthetic import (
            generate_fake_range_measurements,
        )

        mb = MapBuilder(t3d.map_builder_options())
        tid = mb.add_trajectory_builder(
            {"range", "imu"}, t3d.trajectory_options(), None
        )
        builder = mb.get_trajectory_builder(tid)
        imu = t3d.imu_stream(FAKE_START_TIME - 0.5, FAKE_START_TIME + 2.1)
        measurements = generate_fake_range_measurements(
            translation=np.array([0.5, 0.25, 0.0]), duration=2.0, time_step=0.1
        )
        events = [("imu", d.time, d) for d in imu] + [
            ("range", m.time, m) for m in measurements
        ]
        events.sort(key=lambda e: e[1])
        for kind, _, payload in events:
            builder.add_sensor_data(kind, payload)
        mb.finish_trajectory(tid)
        mb.pose_graph.run_final_optimization()
        v2 = pc.write_pbstream(mb)

        # Downgrade: strip submap histograms, set header version 1.
        reader = ProtoStreamReader(_io.BytesIO(v2))
        header = pb.SerializationHeader()
        header.ParseFromString(reader.read())
        header.format_version = 1
        records = [pb.SerializedData.FromString(raw) for raw in reader]
        buf = _io.BytesIO()
        writer = ProtoStreamWriter(buf)
        writer.write(header.SerializeToString())
        had_histograms = 0
        for rec in records:
            if rec.WhichOneof("data") == "submap" and rec.submap.HasField(
                "submap_3d"
            ):
                if len(rec.submap.submap_3d.rotational_scan_matcher_histogram):
                    had_histograms += 1
                del rec.submap.submap_3d.rotational_scan_matcher_histogram[:]
            writer.write(rec.SerializeToString())
        writer.close()
        assert had_histograms > 0
        v1 = buf.getvalue()

        migrated = pc.migrate_pbstream(v1)
        reader = ProtoStreamReader(_io.BytesIO(migrated))
        header = pb.SerializationHeader()
        header.ParseFromString(reader.read())
        assert header.format_version == 2
        restored = 0
        for raw in reader:
            rec = pb.SerializedData.FromString(raw)
            if rec.WhichOneof("data") == "submap" and rec.submap.HasField(
                "submap_3d"
            ):
                h = np.asarray(
                    rec.submap.submap_3d.rotational_scan_matcher_histogram
                )
                if h.size:
                    assert np.all(np.isfinite(h)) and h.max() > 0
                    restored += 1
        assert restored > 0

        # The migrated stream loads back.
        mb3 = MapBuilder(t3d.map_builder_options())
        remap = mb3.load_state_pbstream(migrated, load_frozen_state=True)
        assert remap
