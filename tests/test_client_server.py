"""Cloud-mode tests (model: cloud/internal/client_server_test.cc:79-720):
a real in-process server on localhost gRPC driven by the real client stub;
uplink federation with server-restart fault injection."""

import time

import numpy as np
import pytest

from cartographer_tpu.cloud.map_builder_server import MapBuilderServer
from cartographer_tpu.cloud.map_builder_stub import MapBuilderStub
from cartographer_tpu.mapping.id import NodeId
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3
from tests.test_map_builder import map_builder_options, trajectory_options

DURATION = 4.0
TRAVEL = 1.0


def drive_trajectory(stub, tid, duration=DURATION, travel=TRAVEL, t_offset=0.0):
    builder = stub.get_trajectory_builder(tid)
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    measurements = generate_fake_range_measurements(
        translation=direction * travel, duration=duration, time_step=0.05
    )
    for m in measurements:
        m.time += t_offset
        builder.add_sensor_data("range", m)
    return direction * travel / duration


class TestClientServer:
    def test_local_slam_through_rpc(self):
        server = MapBuilderServer(map_builder_options())
        server.start()
        try:
            stub = MapBuilderStub(f"localhost:{server.port}")
            tid = stub.add_trajectory_builder({"range"}, trajectory_options())
            velocity = drive_trajectory(stub, tid)
            server.wait_until_idle()
            stub.finish_trajectory(tid)
            stub.pose_graph.run_final_optimization()

            node_poses = stub.pose_graph.get_trajectory_node_poses()
            assert len(node_poses) > 10
            # Global consistency through the wire.
            nodes = server.map_builder.pose_graph.get_trajectory_nodes()
            errs = []
            for node_id, pose in node_poses.items():
                t = nodes.at(node_id).constant_data.time
                expected = rigid3.translation((t - FAKE_START_TIME) * velocity)
                errs.append(
                    np.linalg.norm(pose[:3] - rigid3.trans(expected))
                )
            assert max(errs) < 0.1 * TRAVEL
            assert stub.pose_graph.is_trajectory_finished(tid)
            constraints = stub.pose_graph.constraints()
            assert any(c["tag"] == "INTRA_SUBMAP" for c in constraints)

            state = stub.serialize_state()
            assert len(state) > 1000

            # SubmapQuery through the wire.
            from cartographer_tpu.mapping.id import SubmapId

            texture = stub.get_submap_data(SubmapId(tid, 0))
            assert texture is not None
            assert texture["submap_version"] > 0
            assert texture["intensity"].shape == texture["alpha"].shape
            assert texture["alpha"].any()
            assert stub.get_submap_data(SubmapId(99, 0)) is None
            stub.close()
        finally:
            server.shutdown()

    def test_uplink_federation_with_restart(self):
        # Upstream (cloud) server.
        uplink = MapBuilderServer(map_builder_options())
        uplink.start()
        uplink_port = uplink.port
        # Robot-side server with uplink.
        robot = MapBuilderServer(
            map_builder_options(),
            uplink_address=f"localhost:{uplink_port}",
            uplink_batch_size=5,
        )
        robot.start()
        try:
            stub = MapBuilderStub(f"localhost:{robot.port}")
            tid = stub.add_trajectory_builder({"range"}, trajectory_options())
            drive_trajectory(stub, tid, duration=1.5)
            robot.wait_until_idle()
            robot._uploader.wait_until_drained()

            # Kill the uplink mid-stream and keep driving: the uploader must
            # reconnect and keep the upstream graph consistent.
            uplink.shutdown()
            drive_trajectory(stub, tid, duration=1.0, t_offset=10.0)
            time.sleep(0.5)

            uplink2 = MapBuilderServer(
                map_builder_options(), address=f"localhost:{uplink_port}"
            )
            uplink2.start()
            try:
                drive_trajectory(stub, tid, duration=1.5, t_offset=20.0)
                robot.wait_until_idle()
                robot._uploader.wait_until_drained()
                uplink2.wait_until_idle()
                # The upstream graph received data (before kill and after
                # recovery).
                upstream_nodes = (
                    uplink2.map_builder.pose_graph.get_trajectory_nodes().size()
                )
                robot_nodes = (
                    robot.map_builder.pose_graph.get_trajectory_nodes().size()
                )
                assert robot_nodes > 10
                assert upstream_nodes >= 1
            finally:
                uplink2.shutdown()
            stub.close()
        finally:
            robot.shutdown()


class TestStreamingAndSubscriptions:
    def test_subscriptions_landmarks_delete(self, tmp_path):
        """Streaming per-sensor RPCs, ReceiveLocalSlamResults /
        ReceiveGlobalSlamOptimizations subscriptions, landmark set/get,
        DeleteTrajectory, WriteStateToFile/LoadStateFromFile
        (client_server_test.cc LocalSlam2DWithCallbacks, DeleteTrajectory)."""
        from cartographer_tpu.sensor.data import LandmarkData, LandmarkObservation
        from cartographer_tpu.transform import rigid3 as r3

        server = MapBuilderServer(map_builder_options())
        server.start()
        try:
            stub = MapBuilderStub(f"localhost:{server.port}")
            local_results = []
            optimizations = []
            sub1 = stub.receive_local_slam_results(
                lambda tid, t, pose: local_results.append((tid, t, pose))
            )
            sub2 = stub.receive_global_slam_optimizations(
                lambda submaps, nodes: optimizations.append((submaps, nodes))
            )
            topts = trajectory_options()
            topts.collate_landmarks = False
            tid = stub.add_trajectory_builder({"range"}, topts)
            builder = stub.get_trajectory_builder(tid)
            # One landmark observation through the streaming landmark RPC.
            builder.add_sensor_data(
                "landmarks",
                LandmarkData(
                    time=FAKE_START_TIME + 0.501,
                    landmark_observations=[
                        LandmarkObservation(
                            id="lm_0",
                            landmark_to_tracking_transform=r3.translation(
                                np.array([1.0, 0.0, 0.0])
                            ),
                            translation_weight=10.0,
                            rotation_weight=10.0,
                        )
                    ],
                ),
            )
            drive_trajectory(stub, tid)
            stub.finish_trajectory(tid)
            stub.pose_graph.run_final_optimization()

            deadline = time.monotonic() + 10.0
            while time.monotonic() < deadline and not (
                local_results and optimizations
            ):
                time.sleep(0.05)
            assert len(local_results) > 10
            assert optimizations, "no global optimization events received"

            landmarks = stub.pose_graph.get_landmark_poses()
            assert "lm_0" in landmarks
            stub.pose_graph.set_landmark_pose(
                "lm_0", r3.translation(np.array([2.0, 3.0, 0.0])), frozen=True
            )
            landmarks = stub.pose_graph.get_landmark_poses()
            assert np.allclose(landmarks["lm_0"][:2], [2.0, 3.0], atol=1e-6)

            # State to file and back, then delete the trajectory.
            path = str(tmp_path / "state.bin")
            nbytes = stub.write_state_to_file(path)
            assert nbytes > 1000
            stub.pose_graph.delete_trajectory(tid)
            assert len(stub.pose_graph.get_trajectory_node_poses()) == 0
            remap = stub.load_state_from_file(path)
            assert remap
            assert len(stub.pose_graph.get_trajectory_node_poses()) > 0

            sub1.cancel()
            sub2.cancel()
            stub.close()
        finally:
            server.shutdown()
