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


class OverlappingSubmapsTrimmer2D(PoseGraphTrimmer):
    """Coverage-based sparsification (reference:
    internal/2d/overlapping_submaps_trimmer_2d.cc): a finished submap is
    trimmed once its cells are covered by at least `fresh_submaps_count`
    newer submaps except for less than `min_covered_area` m^2, after at
    least `min_added_submaps_count` new submaps were added."""

    def __init__(
        self,
        fresh_submaps_count: int,
        min_covered_area: float,
        min_added_submaps_count: int,
    ):
        self._fresh_submaps_count = fresh_submaps_count
        self._min_covered_area = min_covered_area
        self._min_added_submaps_count = min_added_submaps_count
        self._current_submap_count = 0

    def trim(self, trimmable) -> None:
        import numpy as np

        from cartographer_tpu.mapping.grid_2d import compute_cropped
        from cartographer_tpu.transform import rigid2

        pg = trimmable._pose_graph
        from cartographer_tpu.mapping.id import SubmapId
        from cartographer_tpu.mapping.pose_graph_2d import SubmapState

        all_ids = []
        for sid, data in pg._submap_data.items(SubmapId):
            if data.state == SubmapState.FINISHED:
                all_ids.append(sid)
        if (
            len(all_ids) - self._current_submap_count
            < self._min_added_submaps_count
        ):
            return
        self._current_submap_count = len(all_ids)

        # Per-cell (rounded global coords) list of submap ids covering it.
        coverage = {}
        resolution = None
        for sid in all_ids:
            data = pg._submap_data.at(sid)
            cropped = compute_cropped(data.submap.grid)
            if cropped.probability.size == 0:
                continue
            resolution = cropped.resolution
            spec = pg._optimization_problem.submap_data.get(sid)
            if spec is None:
                continue
            to_global = rigid2.compose(
                np.asarray(spec.global_pose),
                rigid2.inverse(np.asarray(data.submap.local_pose)),
            )
            ys, xs = np.nonzero(cropped.known)
            pts = (
                np.stack([xs + 0.5, ys + 0.5], axis=1) * cropped.resolution
                + cropped.origin
            )
            pts = rigid2.apply(to_global, pts)
            cells = np.floor(pts / cropped.resolution).astype(np.int64)
            for c in map(tuple, cells):
                coverage.setdefault(c, []).append(sid)
        if resolution is None:
            return

        # Count cells where each submap is among the freshest K.
        fresh_cells = {sid: 0 for sid in all_ids}
        for c, sids in coverage.items():
            for sid in sorted(sids)[-self._fresh_submaps_count:]:
                fresh_cells[sid] += 1
        cell_area = resolution * resolution
        for sid in all_ids:
            if fresh_cells[sid] * cell_area < self._min_covered_area:
                trimmable.trim_submap(sid)

    def is_finished(self) -> bool:
        return False


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
