"""MapBuilder: the library's public API facade.

Reference: mapping/map_builder.cc:77-402 and map_builder_interface.h:44-115.
Wires the sensor collator, per-trajectory CollatedTrajectoryBuilder ->
GlobalTrajectoryBuilder (internal/global_trajectory_builder.cc:36-143) ->
pose graph, plus trajectory lifecycle and serialization entry points.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Set

import numpy as np

from cartographer_tpu.common.config import (
    MapBuilderOptions,
    TrajectoryBuilderOptions,
)
from cartographer_tpu.common.time import Time
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.local_trajectory_builder_2d import (
    LocalTrajectoryBuilder2D,
    MatchingResult,
)
from cartographer_tpu.mapping.pose_graph_2d import PoseGraph2D
from cartographer_tpu.mapping.trimmers import PureLocalizationTrimmer
from cartographer_tpu.sensor.collator import Collator, TrajectoryCollator
from cartographer_tpu.sensor.data import (
    FixedFramePoseData,
    ImuData,
    LandmarkData,
    OdometryData,
    TimedPointCloudData,
)

# callback(trajectory_id, time, local_pose, range_data_in_local, insertion_result)
LocalSlamResultCallback = Callable


@dataclasses.dataclass
class _QueuedData:
    time: Time
    payload: object


class GlobalTrajectoryBuilder:
    """Glue: local SLAM result -> pose_graph.add_node -> user callback
    (internal/global_trajectory_builder.cc:36-143)."""

    def __init__(
        self,
        local_trajectory_builder: Optional[LocalTrajectoryBuilder2D],
        trajectory_id: int,
        pose_graph: PoseGraph2D,
        local_slam_result_callback: Optional[LocalSlamResultCallback],
    ):
        self._local_trajectory_builder = local_trajectory_builder
        self._trajectory_id = trajectory_id
        self._pose_graph = pose_graph
        self._local_slam_result_callback = local_slam_result_callback

    def add_sensor_data(self, sensor_id: str, data) -> None:
        if isinstance(data, TimedPointCloudData):
            if self._local_trajectory_builder is None:
                return
            matching_result = self._local_trajectory_builder.add_range_data(
                sensor_id, data
            )
            # The chunked device frontend emits results in batches.
            if isinstance(matching_result, list):
                for r in matching_result:
                    self._handle_matching_result(r)
                return
            if matching_result is None:
                return
            self._handle_matching_result(matching_result)
        elif isinstance(data, ImuData):
            if self._local_trajectory_builder is not None:
                self._local_trajectory_builder.add_imu_data(data)
            self._pose_graph.add_imu_data(self._trajectory_id, data)
        elif isinstance(data, OdometryData):
            if self._local_trajectory_builder is not None:
                self._local_trajectory_builder.add_odometry_data(data)
            self._pose_graph.add_odometry_data(self._trajectory_id, data)
        elif isinstance(data, FixedFramePoseData):
            self._pose_graph.add_fixed_frame_pose_data(self._trajectory_id, data)
        elif isinstance(data, LandmarkData):
            self._pose_graph.add_landmark_data(self._trajectory_id, data)
        else:
            raise TypeError(f"unsupported sensor data {type(data)}")

    def _handle_matching_result(self, matching_result: MatchingResult) -> None:
        if matching_result.insertion_result is not None:
            self._pose_graph.add_node(
                matching_result.insertion_result.constant_data,
                self._trajectory_id,
                matching_result.insertion_result.insertion_submaps,
            )
        if self._local_slam_result_callback:
            self._local_slam_result_callback(
                self._trajectory_id,
                matching_result.time,
                matching_result.local_pose,
                matching_result.range_data_in_local,
                matching_result.insertion_result,
            )

    def flush(self) -> None:
        """Drain any scans buffered by a chunked device frontend."""
        builder = self._local_trajectory_builder
        if builder is not None and hasattr(builder, "flush"):
            for r in builder.flush():
                self._handle_matching_result(r)


class CollatedTrajectoryBuilder:
    """Routes sensor data through the collator
    (internal/collated_trajectory_builder.cc:31-87)."""

    def __init__(
        self,
        collator,
        trajectory_id: int,
        expected_sensor_ids: Set[str],
        wrapped: GlobalTrajectoryBuilder,
    ):
        self._collator = collator
        self._trajectory_id = trajectory_id
        self._wrapped = wrapped
        self._expected_sensor_ids = set(expected_sensor_ids)
        self._collator.add_trajectory(
            trajectory_id, expected_sensor_ids, self._handle_collated
        )

    def add_sensor_data(self, sensor_id: str, data) -> None:
        if sensor_id not in self._expected_sensor_ids:
            # Un-collated sensors (e.g. landmarks/fixed-frame with
            # collate_* = false) bypass the ordered queues
            # (collated_trajectory_builder.cc:50-60).
            self._wrapped.add_sensor_data(sensor_id, data)
            return
        self._collator.add_sensor_data(
            self._trajectory_id, sensor_id, _QueuedData(data.time, data)
        )

    def _handle_collated(self, sensor_id: str, queued: _QueuedData) -> None:
        self._wrapped.add_sensor_data(sensor_id, queued.payload)


def _slow_path_fallback(builder, reason: str):
    """Requested chunked device frontend is unavailable for this config:
    warn once and count every scan that pays the host-path cost
    (mapping_frontend_slow_path_scans) so the ~6x throughput cliff is
    visible in metrics rather than silent."""
    import logging

    logging.warning(
        "use_chunked_device_frontend requested but unsupported: %s; "
        "falling back to the per-scan host path (~6x slower). Scans on "
        "the slow path are counted by mapping_frontend_slow_path_scans.",
        reason,
    )
    orig = builder.add_range_data

    def counted_add_range_data(*args, **kwargs):
        from cartographer_tpu import metrics

        metrics.frontend_slow_path_scans.increment()
        return orig(*args, **kwargs)

    builder.add_range_data = counted_add_range_data
    return builder


class MapBuilder:
    def __init__(self, options: MapBuilderOptions, mesh=None):
        """mesh: optional jax.sharding.Mesh — the pose-graph backend's
        loop-closure search batches and SPA solves run sharded over it
        (the multi-chip scale-up story, SURVEY.md section 2.10.4); None =
        single-chip behavior."""
        assert options.use_trajectory_builder_2d != options.use_trajectory_builder_3d, (
            "Exactly one of use_trajectory_builder_2d / 3d must be set."
        )
        self._options = options
        thread_pool = None
        if options.async_pose_graph:
            from cartographer_tpu.common.task import ThreadPool

            thread_pool = ThreadPool(max(1, options.num_background_threads))
        if options.use_trajectory_builder_2d:
            self._pose_graph = PoseGraph2D(
                options.pose_graph, thread_pool, mesh=mesh
            )
        else:
            from cartographer_tpu.mapping.pose_graph_3d import PoseGraph3D

            self._pose_graph = PoseGraph3D(
                options.pose_graph, thread_pool, mesh=mesh
            )
        self._collator = (
            TrajectoryCollator() if options.collate_by_trajectory else Collator()
        )
        # Slots may be None for trajectories loaded from serialized state
        # (map_builder.cc LoadState registers them without local builders).
        self._trajectory_builders: Dict[int, Optional[CollatedTrajectoryBuilder]] = {}
        self._num_trajectories = 0
        self._all_trajectory_builder_options: Dict[int, TrajectoryBuilderOptions] = {}

    @property
    def pose_graph(self):
        return self._pose_graph

    def num_trajectory_builders(self) -> int:
        return self._num_trajectories

    def get_trajectory_builder(self, trajectory_id: int):
        return self._trajectory_builders[trajectory_id]

    def add_trajectory_builder(
        self,
        expected_sensor_ids: Set[str],
        trajectory_options: TrajectoryBuilderOptions,
        local_slam_result_callback: Optional[LocalSlamResultCallback] = None,
    ) -> int:
        trajectory_id = self._num_trajectories
        self._num_trajectories += 1
        if self._options.use_trajectory_builder_2d:
            range_ids = {
                s for s in expected_sensor_ids if s.startswith("range")
            } or expected_sensor_ids
            opts2d = trajectory_options.trajectory_builder_2d
            if trajectory_options.use_chunked_device_frontend:
                from cartographer_tpu.mapping import chunked_frontend_2d

                if chunked_frontend_2d.supports(opts2d):
                    local_builder = (
                        chunked_frontend_2d.ChunkedLocalTrajectoryBuilder2D(
                            opts2d,
                            range_ids,
                            chunk_size=trajectory_options.device_frontend_chunk_size,
                        )
                    )
                else:
                    # Configuration outside the chunked frontend's scope
                    # (TSDF, num_accumulated_range_data > 1, imu-based
                    # extrapolator): fall back to the per-scan host path
                    # (~6x slower) OBSERVABLY — warning + per-scan counter
                    # instead of a silent perf cliff.
                    local_builder = _slow_path_fallback(
                        LocalTrajectoryBuilder2D(opts2d, range_ids),
                        "2D configuration outside the chunked device "
                        "frontend's scope (needs probability grid, "
                        "num_accumulated_range_data == 1, constant-velocity "
                        "extrapolator)",
                    )
            else:
                local_builder = LocalTrajectoryBuilder2D(opts2d, range_ids)
        else:
            from cartographer_tpu.mapping.local_trajectory_builder_3d import (
                LocalTrajectoryBuilder3D,
            )

            range_ids = {
                s for s in expected_sensor_ids if s.startswith("range")
            } or expected_sensor_ids
            opts3d = trajectory_options.trajectory_builder_3d
            if trajectory_options.use_chunked_device_frontend:
                from cartographer_tpu.mapping import chunked_frontend_3d

                if chunked_frontend_3d.supports(opts3d):
                    local_builder = (
                        chunked_frontend_3d.ChunkedLocalTrajectoryBuilder3D(
                            opts3d,
                            range_ids,
                            chunk_size=trajectory_options.device_frontend_chunk_size,
                        )
                    )
                else:
                    local_builder = _slow_path_fallback(
                        LocalTrajectoryBuilder3D(opts3d, range_ids),
                        "3D configuration outside the chunked device "
                        "frontend's scope (needs IMU, constant-velocity "
                        "extrapolator, no intensity grids)",
                    )
            else:
                local_builder = LocalTrajectoryBuilder3D(opts3d, range_ids)
        if trajectory_options.pure_localization_trimmer is not None:
            self._pose_graph.add_trimmer(
                PureLocalizationTrimmer(
                    trajectory_id,
                    trajectory_options.pure_localization_trimmer.max_submaps_to_keep,
                )
            )
        global_builder = GlobalTrajectoryBuilder(
            local_builder,
            trajectory_id,
            self._pose_graph,
            local_slam_result_callback,
        )
        self._trajectory_builders[trajectory_id] = CollatedTrajectoryBuilder(
            self._collator, trajectory_id, expected_sensor_ids, global_builder
        )
        self._all_trajectory_builder_options[trajectory_id] = trajectory_options
        self._pose_graph.add_trajectory_if_needed(trajectory_id)
        return trajectory_id

    def finish_trajectory(self, trajectory_id: int) -> None:
        self._collator.finish_trajectory(trajectory_id)
        builder = self._trajectory_builders.get(trajectory_id)
        if builder is not None:
            builder._wrapped.flush()
        self._pose_graph.finish_trajectory(trajectory_id)

    def serialize_state(self, include_unfinished_submaps: bool = True):
        from cartographer_tpu.io.serialization import serialize_state

        return serialize_state(self, include_unfinished_submaps)

    def serialize_state_pbstream(self, include_unfinished_submaps: bool = True) -> bytes:
        """Reference-wire-format pbstream (io/pbstream_compat.py)."""
        from cartographer_tpu.io.pbstream_compat import write_pbstream

        return write_pbstream(self, include_unfinished_submaps)

    def load_state_pbstream(self, state: bytes, load_frozen_state: bool = True):
        from cartographer_tpu.io.pbstream_compat import read_pbstream

        return read_pbstream(self, state, load_frozen_state)

    def load_state(self, state, load_frozen_state: bool = True):
        from cartographer_tpu.io.serialization import load_state

        remap = load_state(self, state, load_frozen_state)
        # Reserve the loaded trajectory ids so new builders don't collide
        # (map_builder.cc LoadState registers placeholder entries).
        for new_id in remap.values():
            self._trajectory_builders[new_id] = None
            self._num_trajectories = max(self._num_trajectories, new_id + 1)
        return remap
