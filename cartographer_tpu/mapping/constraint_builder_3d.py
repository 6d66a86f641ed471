"""3D loop-closure constraint search.

Reference: internal/constraints/constraint_builder_3d.cc — per (node,
finished submap) pair: branch-and-bound match (yaw-pruned by rotational
histograms, dual min-score gates: min_score plus min_low_resolution_score)
followed by dual-grid Gauss-Newton refinement; emits INTER constraints whose
zbar is the refined node pose in the submap frame.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from cartographer_tpu import metrics
from cartographer_tpu.common.config import ConstraintBuilderOptions
from cartographer_tpu.common.fixed_ratio_sampler import FixedRatioSampler
from cartographer_tpu.common.histogram import Histogram
from cartographer_tpu.mapping.constraint_builder_2d import (
    INTER_SUBMAP,
    Constraint,
    ConstraintPose,
)
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.scan_matching_3d import CeresScanMatcher3D
from cartographer_tpu.mapping.submap_3d import Submap3D
from cartographer_tpu.mapping.trajectory_node import TrajectoryNodeData
from cartographer_tpu.ops.scan_matching.fast_correlative_3d import (
    FastCorrelativeScanMatcher3D,
)
from cartographer_tpu.transform import rigid3


@dataclasses.dataclass
class _PendingSearch3D:
    submap_id: SubmapId
    node_id: NodeId
    constant_data: TrajectoryNodeData
    global_node_pose: Optional[np.ndarray]  # in submap frame; None => global
    gravity_yaw: float


class ConstraintBuilder3D:
    def __init__(self, options: ConstraintBuilderOptions, mesh=None):
        """mesh: optional jax.sharding.Mesh — drained search batches are
        sharded over it (constraint_builder_2d.ConstraintBuilder2D)."""
        self._options = options
        self._mesh = mesh
        self._samplers: Dict[SubmapId, FixedRatioSampler] = {}
        self._matchers: Dict[SubmapId, FastCorrelativeScanMatcher3D] = {}
        self._submaps: Dict[SubmapId, Submap3D] = {}
        self._ceres_matcher = CeresScanMatcher3D(options.ceres_scan_matcher_3d)
        self._pending: List[_PendingSearch3D] = []
        self._score_histogram = Histogram()
        self._rotational_score_histogram = Histogram()
        self._low_resolution_score_histogram = Histogram()
        # Device-resident node clouds (uploaded once per node, reused
        # across every submap it is searched against).
        self._node_clouds: Dict[NodeId, tuple] = {}

    def _sampler(self, submap_id: SubmapId) -> FixedRatioSampler:
        if submap_id not in self._samplers:
            self._samplers[submap_id] = FixedRatioSampler(self._options.sampling_ratio)
        return self._samplers[submap_id]

    def _matcher(self, submap_id: SubmapId) -> FastCorrelativeScanMatcher3D:
        if submap_id not in self._matchers:
            submap = self._submaps[submap_id]
            self._matchers[submap_id] = FastCorrelativeScanMatcher3D(
                submap.high_resolution_grid,
                submap.low_resolution_grid,
                submap.rotational_scan_matcher_histogram,
                self._options.fast_correlative_scan_matcher_3d,
            )
        return self._matchers[submap_id]

    def maybe_add_constraint(
        self,
        submap_id: SubmapId,
        submap: Submap3D,
        node_id: NodeId,
        constant_data: TrajectoryNodeData,
        global_node_pose_in_submap: np.ndarray,
        gravity_yaw: float,
    ) -> None:
        if (
            np.linalg.norm(global_node_pose_in_submap[:3])
            > self._options.max_constraint_distance
        ):
            return
        if not self._sampler(submap_id).pulse():
            return
        self._submaps.setdefault(submap_id, submap)
        self._pending.append(
            _PendingSearch3D(
                submap_id,
                node_id,
                constant_data,
                global_node_pose_in_submap,
                gravity_yaw,
            )
        )

    def maybe_add_global_constraint(
        self,
        submap_id: SubmapId,
        submap: Submap3D,
        node_id: NodeId,
        constant_data: TrajectoryNodeData,
        gravity_yaw: float,
    ) -> None:
        self._submaps.setdefault(submap_id, submap)
        self._pending.append(
            _PendingSearch3D(submap_id, node_id, constant_data, None, gravity_yaw)
        )

    def notify_end_of_node(self) -> None:
        pass

    def num_pending(self) -> int:
        return len(self._pending)

    def run_pending(self) -> List[Constraint]:
        """Batched like constraint_builder_2d.run_pending: all BnB searches
        dispatched then fetched as one stacked array, then all Gauss-Newton
        refinements — two host round trips per batch."""
        results: List[Constraint] = []
        pending, self._pending = self._pending, []
        if not pending:
            return results
        import jax.numpy as jnp

        from cartographer_tpu.ops.scan_matching.fast_correlative_3d import (
            batch_match_device_3d,
        )

        preps = []
        kept_searches = []
        for search in pending:
            metrics.constraints_searched.increment()
            matcher = self._matcher(search.submap_id)
            cd = search.constant_data
            staged = self._node_clouds.get(search.node_id)
            if staged is None:
                staged = FastCorrelativeScanMatcher3D.stage_points(
                    cd.high_resolution_point_cloud,
                    cd.low_resolution_point_cloud,
                )
                self._node_clouds[search.node_id] = staged
            if search.global_node_pose is None:
                initial = rigid3.make(
                    np.zeros(3), rigid3.quat_conjugate(cd.gravity_alignment)
                )
                prep = matcher._prepare(
                    initial,
                    cd.rotational_scan_matcher_histogram,
                    search.gravity_yaw,
                    cd.high_resolution_point_cloud,
                    cd.low_resolution_point_cloud,
                    self._options.global_localization_min_score,
                    full_submap=True,
                    device_points=staged,
                )
            else:
                prep = matcher._prepare(
                    search.global_node_pose,
                    cd.rotational_scan_matcher_histogram,
                    search.gravity_yaw,
                    cd.high_resolution_point_cloud,
                    cd.low_resolution_point_cloud,
                    self._options.min_score,
                    device_points=staged,
                )
            if prep is not None:  # None: yaw pruning rejected every candidate
                preps.append(prep)
                kept_searches.append(search)
        if not preps:
            metrics.constraints_found.increment(0)
            return results
        # ALL surviving searches as vmapped device programs + one fetch.
        all_bnb, ctxs = batch_match_device_3d(preps, mesh=self._mesh)
        dispatched = [
            (s, c) for s, c in zip(kept_searches, ctxs)
        ]

        refine = []
        for (search, ctx), packed in zip(dispatched, all_bnb):
            matcher = self._matcher(search.submap_id)
            result = matcher.decode(packed, ctx)
            if result is None:
                continue
            self._score_histogram.add(result.score)
            self._rotational_score_histogram.add(result.rotational_score)
            self._low_resolution_score_histogram.add(result.low_resolution_score)
            metrics.constraint_scores.observe(result.score)
            cd = search.constant_data
            submap = self._submaps[search.submap_id]
            refine.append(
                (
                    search,
                    self._ceres_matcher.match_device(
                        result.pose[:3],
                        result.pose,
                        cd.high_resolution_point_cloud,
                        submap.high_resolution_grid,
                        cd.low_resolution_point_cloud,
                        submap.low_resolution_grid,
                    ),
                )
            )
        if refine:
            all_gn = np.asarray(jnp.stack([p for _, p in refine]))
            for (search, _), packed in zip(refine, all_gn):
                refined_pose, _cost = self._ceres_matcher.decode(packed)
                results.append(
                    Constraint(
                        submap_id=search.submap_id,
                        node_id=search.node_id,
                        pose=ConstraintPose(
                            zbar_ij=refined_pose,
                            translation_weight=self._options.loop_closure_translation_weight,
                            rotation_weight=self._options.loop_closure_rotation_weight,
                        ),
                        tag=INTER_SUBMAP,
                    )
                )
        metrics.constraints_found.increment(len(results))
        return results

    def _compute_constraint(self, search: _PendingSearch3D) -> Optional[Constraint]:
        metrics.constraints_searched.increment()
        matcher = self._matcher(search.submap_id)
        submap = self._submaps[search.submap_id]
        cd = search.constant_data
        if search.global_node_pose is None:
            # Global localization: search the full submap; center the initial
            # estimate on the submap with gravity-consistent orientation.
            initial = rigid3.make(
                np.zeros(3), rigid3.quat_conjugate(cd.gravity_alignment)
            )
            result = matcher.match(
                initial,
                cd.rotational_scan_matcher_histogram,
                search.gravity_yaw,
                cd.high_resolution_point_cloud,
                cd.low_resolution_point_cloud,
                self._options.global_localization_min_score,
                full_submap=True,
            )
        else:
            result = matcher.match(
                search.global_node_pose,
                cd.rotational_scan_matcher_histogram,
                search.gravity_yaw,
                cd.high_resolution_point_cloud,
                cd.low_resolution_point_cloud,
                self._options.min_score,
            )
        if result is None:
            return None
        self._score_histogram.add(result.score)
        self._rotational_score_histogram.add(result.rotational_score)
        self._low_resolution_score_histogram.add(result.low_resolution_score)
        metrics.constraint_scores.observe(result.score)

        refined_pose, _ = self._ceres_matcher.match(
            result.pose[:3],
            result.pose,
            cd.high_resolution_point_cloud,
            submap.high_resolution_grid,
            cd.low_resolution_point_cloud,
            submap.low_resolution_grid,
        )
        return Constraint(
            submap_id=search.submap_id,
            node_id=search.node_id,
            pose=ConstraintPose(
                zbar_ij=refined_pose,
                translation_weight=self._options.loop_closure_translation_weight,
                rotation_weight=self._options.loop_closure_rotation_weight,
            ),
            tag=INTER_SUBMAP,
        )

    def score_histogram(self) -> Histogram:
        return self._score_histogram
