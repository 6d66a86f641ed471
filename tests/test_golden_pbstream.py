"""Wire-interop proof: load a GOLDEN pbstream whose bytes were assembled
independently per the reference's writer (see
tests/data/make_golden_pbstream.py — container framing per
io/proto_stream.cc, hand-encoded protobuf payloads with the reference's
field numbers, grid cells per map_limits.h/probability_values.h, point
clouds per compressed_point_cloud.cc) and verify poses, grid
probabilities at world coordinates, node clouds, and re-serialize
stability.

This is the missing half of the compat tests, which otherwise only
round-trip this engine's own output."""

import os

import numpy as np
import pytest

from cartographer_tpu.common.config import MapBuilderOptions
from cartographer_tpu.mapping.grid_2d import world_to_cell
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.map_builder import MapBuilder

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
from make_golden_pbstream import (  # noqa: E402
    CLOUD,
    KNOWN_CELLS,
    MAX_X,
    MAX_Y,
    NODE0_POSE,
    NODE0_TICKS,
    NODE1_POSE,
    RES,
    SUBMAP_POSE,
    build_records,
    main as regenerate,
)

GOLDEN = os.path.join(
    os.path.dirname(__file__), "data", "reference_golden_mini.pbstream"
)


def load_golden():
    mb = MapBuilder(MapBuilderOptions(use_trajectory_builder_2d=True))
    with open(GOLDEN, "rb") as f:
        remap = mb.load_state_pbstream(f.read(), load_frozen_state=True)
    return mb, remap


class TestGoldenPbstream:
    def test_golden_is_current(self):
        """The checked-in golden matches its generator (provenance)."""
        import gzip
        import struct

        with open(GOLDEN, "rb") as f:
            blob = f.read()
        assert struct.unpack("<Q", blob[:8])[0] == 0x7B1D1F7B5BF501DB
        offset = 8
        payloads = []
        while offset < len(blob):
            (size,) = struct.unpack("<Q", blob[offset: offset + 8])
            offset += 8
            payloads.append(gzip.decompress(blob[offset: offset + size]))
            offset += size
        assert payloads == build_records()

    def test_poses_and_constraints(self):
        mb, remap = load_golden()
        assert remap == {0: 0}
        pg = mb.pose_graph
        submaps = pg.get_all_submap_data()
        assert submaps.size() == 1
        sid, sdata = next(iter(submaps.items(SubmapId)))
        assert sid == SubmapId(0, 0)
        assert sdata.submap.insertion_finished
        np.testing.assert_allclose(
            sdata.submap.local_pose, SUBMAP_POSE[:2] + (0.0,), atol=1e-9
        )
        global_pose = pg._optimization_problem.submap_data.at(sid).global_pose
        np.testing.assert_allclose(global_pose, SUBMAP_POSE[:2] + (0.0,), atol=1e-9)
        nodes = pg.get_trajectory_nodes()
        poses = {nid: n.global_pose for nid, n in nodes.items(NodeId)}
        np.testing.assert_allclose(
            poses[NodeId(0, 0)][:3], NODE0_POSE, atol=1e-9
        )
        np.testing.assert_allclose(
            poses[NodeId(0, 1)][:3], NODE1_POSE, atol=1e-9
        )
        # Node time round-trips through the UTS tick scale.
        t0 = nodes.at(NodeId(0, 0)).constant_data.time
        assert t0 == pytest.approx(NODE0_TICKS / 1e7, rel=1e-12)
        cons = pg.constraints
        assert any(
            c.tag == "INTRA_SUBMAP"
            and c.submap_id == SubmapId(0, 0)
            and c.node_id == NodeId(0, 0)
            for c in cons
        )

    def test_grid_probabilities_at_world_coordinates(self):
        """Cell values land at the WORLD positions the reference's
        map_limits.h conventions dictate — catches axis transposition in
        the reader independently of our own writer."""
        mb, _ = load_golden()
        sdata = next(iter(mb.pose_graph.get_all_submap_data().items(SubmapId)))[1]
        grid = sdata.submap.grid
        prob = np.asarray(grid.probability())
        known = np.asarray(grid.known)
        for cx, cy, p in KNOWN_CELLS:
            world = np.array(
                [MAX_X - RES * (cy + 0.5), MAX_Y - RES * (cx + 0.5)],
                np.float32,
            )
            cxy = np.floor(
                np.asarray(world_to_cell(grid, world))
            ).astype(int)
            assert known[cxy[1], cxy[0]], (cx, cy)
            assert prob[cxy[1], cxy[0]] == pytest.approx(p, abs=1.0 / 32766)
        # Exactly the golden's known cells are known.
        assert int(known.sum()) == len(KNOWN_CELLS)

    def test_node_cloud_decodes(self):
        mb, _ = load_golden()
        nodes = mb.pose_graph.get_trajectory_nodes()
        cloud = nodes.at(
            NodeId(0, 0)
        ).constant_data.filtered_gravity_aligned_point_cloud
        got = sorted(map(tuple, np.round(np.asarray(cloud), 4)))
        want = sorted(tuple(np.round(p, 4)) for p in CLOUD)
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_reserialize_stability(self):
        mb, _ = load_golden()
        blob = mb.serialize_state_pbstream(include_unfinished_submaps=True)
        mb2 = MapBuilder(MapBuilderOptions(use_trajectory_builder_2d=True))
        mb2.load_state_pbstream(blob, load_frozen_state=True)
        a = next(iter(mb.pose_graph.get_all_submap_data().items(SubmapId)))[1]
        b = next(iter(mb2.pose_graph.get_all_submap_data().items(SubmapId)))[1]
        np.testing.assert_allclose(
            a.submap.local_pose, b.submap.local_pose, atol=1e-9
        )
        pa = np.asarray(a.submap.grid.probability())
        pb_ = np.asarray(b.submap.grid.probability())
        ka = np.asarray(a.submap.grid.known)
        kb = np.asarray(b.submap.grid.known)
        assert ka.sum() == kb.sum()
        np.testing.assert_allclose(pa[ka].sum(), pb_[kb].sum(), rtol=1e-5)
