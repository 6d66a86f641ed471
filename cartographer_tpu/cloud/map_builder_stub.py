"""Client stub: the MapBuilder interface over the wire.

Reference: cloud/client/map_builder_stub.{h:30,cc} and
cloud/internal/client/trajectory_builder_stub.h:38, pose_graph_stub.h:26 —
the full MapBuilderInterface implemented via RPCs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set

import grpc
import numpy as np

from cartographer_tpu.cloud import wire
from cartographer_tpu.cloud.map_builder_server import _method_path
from cartographer_tpu.common.config import TrajectoryBuilderOptions
from cartographer_tpu.mapping.id import NodeId, SubmapId


class TrajectoryBuilderStub:
    def __init__(self, parent: "MapBuilderStub", trajectory_id: int):
        self._parent = parent
        self._trajectory_id = trajectory_id

    def add_sensor_data(self, sensor_id: str, data) -> None:
        payload = wire.encode_sensor_data(sensor_id, data)
        request = wire.encode(
            "sensor_data",
            {"trajectory_id": self._trajectory_id},
            {"payload": np.frombuffer(payload, np.uint8)},
        )
        self._parent._call("AddSensorData", request)


class PoseGraphStub:
    def __init__(self, parent: "MapBuilderStub"):
        self._parent = parent

    def run_final_optimization(self) -> None:
        self._parent._call(
            "RunFinalOptimization", wire.encode("empty", {}, {}), timeout=600.0
        )

    def get_local_to_global_transform(self, trajectory_id: int) -> np.ndarray:
        response = self._parent._call(
            "GetLocalToGlobalTransform",
            wire.encode("query", {"trajectory_id": trajectory_id}, {}),
        )
        _, _, arrays = wire.decode(response)
        return arrays["pose"]

    def get_trajectory_node_poses(self) -> Dict[NodeId, np.ndarray]:
        response = self._parent._call(
            "GetTrajectoryNodePoses", wire.encode("empty", {}, {})
        )
        _, _, arrays = wire.decode(response)
        return {
            NodeId(int(t), int(i)): pose
            for (t, i), pose in zip(arrays["ids"], arrays["poses"])
        }

    def get_submap_poses(self) -> Dict[SubmapId, np.ndarray]:
        response = self._parent._call("GetSubmapPoses", wire.encode("empty", {}, {}))
        _, _, arrays = wire.decode(response)
        return {
            SubmapId(int(t), int(i)): pose
            for (t, i), pose in zip(arrays["ids"], arrays["poses"])
        }

    def constraints(self):
        response = self._parent._call("GetConstraints", wire.encode("empty", {}, {}))
        _, meta, arrays = wire.decode(response)
        return [
            {
                "submap_id": SubmapId(int(s[0]), int(s[1])),
                "node_id": NodeId(int(n[0]), int(n[1])),
                "tag": tag,
            }
            for s, n, tag in zip(
                arrays["submap_ids"], arrays["node_ids"], meta["tags"]
            )
        ]

    def is_trajectory_finished(self, trajectory_id: int) -> bool:
        response = self._parent._call(
            "IsTrajectoryFinished",
            wire.encode("query", {"trajectory_id": trajectory_id}, {}),
        )
        _, meta, _ = wire.decode(response)
        return meta["value"]

    def is_trajectory_frozen(self, trajectory_id: int) -> bool:
        response = self._parent._call(
            "IsTrajectoryFrozen",
            wire.encode("query", {"trajectory_id": trajectory_id}, {}),
        )
        _, meta, _ = wire.decode(response)
        return meta["value"]


class MapBuilderStub:
    def __init__(self, server_address: str, client_id: str = "client"):
        self._channel = grpc.insecure_channel(server_address)
        self._client_id = client_id
        self._pose_graph = PoseGraphStub(self)
        self._trajectory_builders: Dict[int, TrajectoryBuilderStub] = {}

    def _call(self, method: str, request: bytes, timeout: float = 60.0) -> bytes:
        callable_ = self._channel.unary_unary(
            _method_path(method),
            request_serializer=None,
            response_deserializer=None,
        )
        return callable_(request, timeout=timeout)

    @property
    def pose_graph(self) -> PoseGraphStub:
        return self._pose_graph

    def add_trajectory_builder(
        self,
        expected_sensor_ids: Set[str],
        trajectory_options: TrajectoryBuilderOptions,
        local_slam_result_callback=None,
    ) -> int:
        response = self._call(
            "AddTrajectory",
            wire.encode(
                "add_trajectory",
                {
                    "client_id": self._client_id,
                    "expected_sensor_ids": sorted(expected_sensor_ids),
                    "trajectory_options": trajectory_options.to_dict(),
                },
                {},
            ),
        )
        _, meta, _ = wire.decode(response)
        trajectory_id = meta["trajectory_id"]
        self._trajectory_builders[trajectory_id] = TrajectoryBuilderStub(
            self, trajectory_id
        )
        return trajectory_id

    def get_trajectory_builder(self, trajectory_id: int) -> TrajectoryBuilderStub:
        return self._trajectory_builders[trajectory_id]

    def get_submap_data(self, submap_id: SubmapId):
        """Returns a dict with the submap texture (SubmapQuery analog), or
        None if the submap does not exist."""
        response = self._call(
            "GetSubmapData",
            wire.encode(
                "query",
                {
                    "trajectory_id": submap_id.trajectory_id,
                    "submap_index": submap_id.submap_index,
                },
                {},
            ),
        )
        _, meta, arrays = wire.decode(response)
        if not meta["found"]:
            return None
        return {**meta, **arrays}

    def finish_trajectory(self, trajectory_id: int) -> None:
        self._call(
            "FinishTrajectory",
            wire.encode("finish", {"trajectory_id": trajectory_id}, {}),
            timeout=600.0,
        )

    def serialize_state(self) -> bytes:
        return self._call("WriteState", wire.encode("empty", {}, {}), timeout=600.0)

    def load_state(self, state: bytes) -> Dict[int, int]:
        response = self._call("LoadState", state, timeout=300.0)
        _, meta, _ = wire.decode(response)
        return {int(k): v for k, v in meta["remap"].items()}

    def close(self) -> None:
        self._channel.close()
