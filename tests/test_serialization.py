"""Save/load + pure localization tests (model: map_builder_test.cc
SaveLoadState and LocalizationOnFrozenTrajectory2D)."""

import numpy as np
import pytest

from cartographer_tpu.common.config import (
    PureLocalizationTrimmerOptions,
)
from cartographer_tpu.io.proto_stream import (
    ProtoStreamReader,
    ProtoStreamWriter,
)
from cartographer_tpu.io.serialization import pbstream_info
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid2, rigid3
from tests.test_map_builder import (
    LocalSlamObserver,
    map_builder_options,
    trajectory_options,
)

import io


class TestProtoStream:
    def test_roundtrip(self):
        buf = io.BytesIO()
        w = ProtoStreamWriter(buf)
        w.write(b"hello world")
        w.write(b"x" * 100000)
        buf.seek(0)
        r = ProtoStreamReader(buf)
        records = list(r)
        assert records[0] == b"hello world"
        assert records[1] == b"x" * 100000

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError):
            ProtoStreamReader(io.BytesIO(b"not a pbstream..."))


def build_map(travel=1.2, duration=6.0):
    mb = MapBuilder(map_builder_options())
    tid = mb.add_trajectory_builder({"range"}, trajectory_options(), None)
    builder = mb.get_trajectory_builder(tid)
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    for m in generate_fake_range_measurements(
        translation=direction * travel, duration=duration, time_step=0.05
    ):
        builder.add_sensor_data("range", m)
    mb.finish_trajectory(tid)
    mb.pose_graph.run_final_optimization()
    return mb, direction * travel / duration


class TestSaveLoad:
    def test_roundtrip_preserves_graph(self):
        mb, _ = build_map()
        state = mb.serialize_state()
        info = pbstream_info(state)
        assert info["format_version"] == 2
        assert info["record_counts"]["submap_2d"] >= 1
        assert info["record_counts"]["node"] > 10

        mb2 = MapBuilder(map_builder_options())
        remap = mb2.load_state(state, load_frozen_state=True)
        assert remap == {0: 0}
        nodes1 = mb.pose_graph.get_trajectory_nodes()
        nodes2 = mb2.pose_graph.get_trajectory_nodes()
        assert nodes2.size() == nodes1.size()
        for node_id, node in nodes1.items(NodeId):
            np.testing.assert_allclose(
                nodes2.at(node_id).global_pose, node.global_pose, atol=1e-6
            )
        assert mb2.pose_graph.is_trajectory_frozen(0)
        # Submap grids preserved.
        for submap_id, data in mb.pose_graph.get_all_submap_data().items(SubmapId):
            loaded = mb2.pose_graph.get_all_submap_data().at(submap_id)
            np.testing.assert_array_equal(
                np.asarray(loaded.submap.grid.known),
                np.asarray(data.submap.grid.known),
            )

    def test_pure_localization_on_frozen_map(self):
        mb, velocity = build_map()
        state = mb.serialize_state()

        mb2 = MapBuilder(map_builder_options())
        mb2.load_state(state, load_frozen_state=True)
        opts = trajectory_options()
        opts.pure_localization_trimmer = PureLocalizationTrimmerOptions(
            max_submaps_to_keep=3
        )
        observer = LocalSlamObserver()
        tid = mb2.add_trajectory_builder({"range"}, opts, observer)
        # Tell the graph roughly where the new trajectory starts (the
        # reference test does the same via initial poses).
        mb2.pose_graph.set_initial_trajectory_pose(
            tid, 0, rigid3.identity(), FAKE_START_TIME + 100.0
        )
        builder = mb2.get_trajectory_builder(tid)
        direction = np.array([2.0, 1.0, 0.0])
        direction /= np.linalg.norm(direction)
        measurements = generate_fake_range_measurements(
            translation=direction * 1.2, duration=6.0, time_step=0.05
        )
        # Shift times so they are fresh.
        for m in measurements:
            m.time += 100.0
            builder.add_sensor_data("range", m)
        mb2.finish_trajectory(tid)
        mb2.pose_graph.run_final_optimization()

        # Localized: global poses of the new trajectory match ground truth
        # in the frozen map's frame.
        nodes = mb2.pose_graph.get_trajectory_nodes()
        errs = []
        for node_id, node in nodes.items(NodeId):
            if node_id.trajectory_id != tid:
                continue
            t = node.constant_data.time - 100.0
            expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
            errs.append(
                np.linalg.norm(rigid3.trans(node.global_pose) - rigid3.trans(expected))
            )
        assert len(errs) > 10
        assert max(errs) < 0.15
        # Cross-trajectory INTER constraints to the frozen map exist.
        assert any(
            c.tag == "INTER_SUBMAP"
            and c.submap_id.trajectory_id == 0
            and c.node_id.trajectory_id == tid
            for c in mb2.pose_graph.constraints
        )
        # The pure-localization trimmer kept the trajectory short.
        num_submaps = mb2.pose_graph.get_all_submap_data().size_of_trajectory_or_zero(tid)
        assert num_submaps <= 3
