"""Pose-graph trimmers (reference: mapping/pose_graph_trimmer.h:56-81).

PureLocalizationTrimmer keeps only the last N submaps of a trajectory —
localization mode against a frozen map (pose_graph_trimmer.cc).
"""

from __future__ import annotations


class PoseGraphTrimmer:
    def trim(self, trimmable) -> None:
        raise NotImplementedError

    def is_finished(self) -> bool:
        raise NotImplementedError


class PureLocalizationTrimmer(PoseGraphTrimmer):
    def __init__(self, trajectory_id: int, max_submaps_to_keep: int):
        assert max_submaps_to_keep >= 2
        self._trajectory_id = trajectory_id
        self._max_submaps_to_keep = max_submaps_to_keep
        self._finished = False

    def trim(self, trimmable) -> None:
        if self._finished:
            return
        submap_ids = trimmable.get_submap_ids(self._trajectory_id)
        for submap_id in submap_ids[: max(0, len(submap_ids) - self._max_submaps_to_keep)]:
            trimmable.trim_submap(submap_id)

    def is_finished(self) -> bool:
        return self._finished
