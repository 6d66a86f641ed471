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
        run as one batch — `loop_closure_backend="native"` fans them
        across host cores via the threaded C++ backend
        (native/bnb3d_native.cc, hybrid placement), otherwise they
        dispatch as vmapped device programs — then all Gauss-Newton
        refinements run as one device batch."""
        import time as _time

        results: List[Constraint] = []
        pending, self._pending = self._pending, []
        # Drop searches whose submap was trimmed while queued (see the
        # 2D twin — the async drain races the trimmers).
        stale = [s for s in pending if s.submap_id not in self._submaps]
        if stale:
            import logging

            logging.getLogger(__name__).info(
                "Dropping %d queued constraint searches against trimmed "
                "submaps.", len(stale),
            )
            pending = [s for s in pending if s.submap_id in self._submaps]
        if not pending:
            return results
        import jax.numpy as jnp

        _t0 = _time.perf_counter()
        use_native = self._use_native_backend()
        # Native path: chunk the drain so each chunk's device refinement
        # (grouped vmapped dual-grid LM programs) executes WHILE the host
        # cores search the next chunk — mirrors ConstraintBuilder2D's
        # pipeline.
        chunk_size = 256 if use_native else len(pending)
        _t_search = 0.0
        _t_refine_wait = 0.0
        staged = []  # (jobs, dispatched refine groups)
        for c0 in range(0, len(pending), chunk_size):
            chunk = pending[c0: c0 + chunk_size]
            _ts = _time.perf_counter()
            if use_native:
                matched = self._run_searches_native(chunk)
            else:
                matched = self._run_searches_device(chunk)
            _t_search += _time.perf_counter() - _ts
            jobs = []
            for search, result in matched:
                if result is None:
                    continue
                self._score_histogram.add(result.score)
                self._rotational_score_histogram.add(
                    result.rotational_score
                )
                self._low_resolution_score_histogram.add(
                    result.low_resolution_score
                )
                metrics.constraint_scores.observe(result.score)
                jobs.append((search, result))
            groups = (
                self._batch_refine_dispatch(jobs) if jobs else ([], [])
            )
            if getattr(self, "serialize_refine", False):
                _tw = _time.perf_counter()
                for _, handle in groups[1]:
                    np.asarray(handle)
                _t_refine_wait += _time.perf_counter() - _tw
            staged.append((jobs, groups))
        for jobs, groups in staged:
            _tw = _time.perf_counter()
            rows_all = self._batch_refine_collect(groups)
            _t_refine_wait += _time.perf_counter() - _tw
            for (search, _), row in zip(jobs, rows_all):
                refined_pose, _cost = self._ceres_matcher.decode(row)
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
        self.last_drain_timings = {
            "searches": len(pending),
            "search_s": _t_search,
            "refine_wait_s": _t_refine_wait,
            "total_s": _time.perf_counter() - _t0,
        }
        return results

    def _batch_refine_dispatch(self, jobs):
        """Dispatch every accepted match's refinement as grouped vmapped
        device programs (gauss_newton_3d.match_3d_batch) — one program
        per grid-shape family instead of one dispatch per match
        (finished 3D submaps densify cropped to content, so shapes
        legitimately differ). Returns (rows_all, staged): rows_all holds
        eagerly-computed fallback rows (paged grids), staged the
        dispatched (idxs, handle) groups for _batch_refine_collect."""
        import jax.numpy as jnp

        from cartographer_tpu.mapping.paged_grid_3d import PagedGrid3D
        from cartographer_tpu.mapping.scan_matching_3d import pad_points_3d
        from cartographer_tpu.ops.scan_matching import gauss_newton_3d

        opts = self._options.ceres_scan_matcher_3d
        rows_all = [None] * len(jobs)
        groups: Dict[tuple, list] = {}
        for j, (search, result) in enumerate(jobs):
            submap = self._submaps[search.submap_id]
            hg = submap.high_resolution_grid
            lg = submap.low_resolution_grid
            if isinstance(hg, PagedGrid3D) or isinstance(lg, PagedGrid3D):
                # Unfinished (paged) grids: per-job dispatch fallback.
                cd = search.constant_data
                rows_all[j] = np.asarray(
                    self._ceres_matcher.match_device(
                        result.pose[:3], result.pose,
                        cd.high_resolution_point_cloud, hg,
                        cd.low_resolution_point_cloud, lg,
                    )
                )
                continue
            key = (tuple(hg.values.shape), tuple(lg.values.shape))
            groups.setdefault(key, []).append(j)
        staged = []
        for idxs in groups.values():
            k = len(idxs)
            uniq: Dict[int, int] = {}
            h_vols, l_vols, h_orgs, l_orgs, h_res, l_res = (
                [], [], [], [], [], [],
            )
            sidx = np.zeros(k, np.int32)
            n_pad = nl_pad = 64
            for r, j in enumerate(idxs):
                search, _ = jobs[j]
                submap = self._submaps[search.submap_id]
                hg = submap.high_resolution_grid
                gi = uniq.get(id(hg))
                if gi is None:
                    gi = len(h_vols)
                    uniq[id(hg)] = gi
                    lg = submap.low_resolution_grid
                    h_vols.append(hg.values)
                    l_vols.append(lg.values)
                    h_orgs.append(np.asarray(hg.origin, np.float32))
                    l_orgs.append(np.asarray(lg.origin, np.float32))
                    h_res.append(hg.resolution)
                    l_res.append(lg.resolution)
                sidx[r] = gi
                cd = search.constant_data
                while n_pad < len(cd.high_resolution_point_cloud):
                    n_pad *= 2
                while nl_pad < len(cd.low_resolution_point_cloud):
                    nl_pad *= 2
            hp = np.zeros((k, n_pad, 3), np.float32)
            hm = np.zeros((k, n_pad), bool)
            lp = np.zeros((k, nl_pad, 3), np.float32)
            lm = np.zeros((k, nl_pad), bool)
            t0 = np.zeros((k, 3), np.float32)
            q0 = np.zeros((k, 4), np.float32)
            tgt = np.zeros((k, 3), np.float32)
            for r, j in enumerate(idxs):
                search, result = jobs[j]
                cd = search.constant_data
                p_, m_ = pad_points_3d(
                    np.asarray(cd.high_resolution_point_cloud), n_pad
                )
                hp[r], hm[r] = p_, m_
                p_, m_ = pad_points_3d(
                    np.asarray(cd.low_resolution_point_cloud), nl_pad
                )
                lp[r], lm[r] = p_, m_
                t0[r] = result.pose[:3]
                q0[r] = result.pose[3:7]
                tgt[r] = result.pose[:3]
            sidx_d = jnp.asarray(sidx)
            handle = gauss_newton_3d.match_3d_batch(
                jnp.take(jnp.stack(h_vols), sidx_d, axis=0),
                jnp.take(jnp.asarray(np.stack(h_orgs)), sidx_d, axis=0),
                jnp.take(jnp.stack(l_vols), sidx_d, axis=0),
                jnp.take(jnp.asarray(np.stack(l_orgs)), sidx_d, axis=0),
                jnp.asarray(t0), jnp.asarray(q0), jnp.asarray(tgt),
                jnp.asarray(hp), jnp.asarray(hm),
                jnp.asarray(lp), jnp.asarray(lm),
                jnp.take(
                    jnp.asarray(np.asarray(h_res, np.float32)), sidx_d
                ),
                jnp.take(
                    jnp.asarray(np.asarray(l_res, np.float32)), sidx_d
                ),
                opts.occupied_space_weight_0,
                opts.occupied_space_weight_1,
                opts.translation_weight,
                opts.rotation_weight,
                opts.ceres_solver_options.max_num_iterations,
                opts.only_optimize_yaw,
                bool(opts.ceres_solver_options.use_nonmonotonic_steps),
            )
            try:
                handle.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
            staged.append((idxs, handle))
        return rows_all, staged

    @staticmethod
    def _batch_refine_collect(groups):
        rows_all, staged = groups
        for idxs, handle in staged:
            rows = np.asarray(handle)
            for r, j in enumerate(idxs):
                rows_all[j] = rows[r]
        return rows_all

    def _run_searches_device(self, pending):
        """All searches as vmapped device programs + one fetch; returns
        [(search, MatchResult3D | None)]."""
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
            return [(s, None) for s in pending]
        all_bnb, ctxs = batch_match_device_3d(preps, mesh=self._mesh)
        decoded = {}
        for search, ctx, packed in zip(kept_searches, ctxs, all_bnb):
            decoded[id(search)] = self._matcher(search.submap_id).decode(
                packed, ctx
            )
        return [(s, decoded.get(id(s))) for s in pending]

    def _use_native_backend(self) -> bool:
        if self._options.loop_closure_backend not in ("native", "auto"):
            return False
        from cartographer_tpu.native import bnb3 as native_bnb3

        if not native_bnb3.available():
            if self._options.loop_closure_backend == "native" and not getattr(
                self, "_warned_no_native", False
            ):
                self._warned_no_native = True
                import logging

                logging.warning(
                    "loop_closure_backend='native' requested but no C++ "
                    "toolchain produced the 3D library; falling back to "
                    "the device search."
                )
            return False
        return True

    def _run_searches_native(self, pending):
        """Threaded C++ searches across host cores (hybrid placement;
        native/bnb3d_native.cc). Yaw candidates are pre-pruned here with
        the rotational histogram, exactly like the device path's
        _prepare. Returns [(search, MatchResult3D | None)]."""
        import math

        from cartographer_tpu.native import bnb3 as native_bnb3
        from cartographer_tpu.ops.scan_matching import rotational_histogram
        from cartographer_tpu.ops.scan_matching.correlative_2d import (
            compute_angular_step,
        )
        from cartographer_tpu.ops.scan_matching.fast_correlative_3d import (
            MatchResult3D,
        )

        opts = self._options.fast_correlative_scan_matcher_3d
        depth = opts.branch_and_bound_depth
        if not hasattr(self, "_native_submaps"):
            self._native_submaps = {}
            self._native_meta = {}
        submaps = []
        highs = []
        lows = []
        angle_lists = []
        ctxs = []  # (angles_kept, rot_scores_kept, initial_pose) or None
        rows = []  # index into the native batch, or None (yaw-pruned out)
        params = np.zeros((len(pending), 19), np.float32)
        for search in pending:
            metrics.constraints_searched.increment()
            sid = search.submap_id
            ns = self._native_submaps.get(sid)
            if ns is None:
                submap = self._submaps[sid]
                hg = submap.high_resolution_grid
                lg = submap.low_resolution_grid
                # One host fetch per FINISHED submap (it no longer
                # changes); the C++ side quantizes and builds octaves.
                ns = native_bnb3.NativeSubmap3D(
                    np.asarray(hg.probability()),
                    np.asarray(lg.probability()),
                    depth,
                    opts.full_resolution_depth,
                )
                self._native_submaps[sid] = ns
                self._native_meta[sid] = (
                    np.asarray(hg.origin, np.float64),
                    float(hg.resolution),
                    np.asarray(lg.origin, np.float64),
                    float(lg.resolution),
                    np.asarray(
                        submap.rotational_scan_matcher_histogram
                    ),
                )
            origin, res, lorigin, lres, sub_hist = self._native_meta[sid]
            cd = search.constant_data
            if not hasattr(self, "_native_node_clouds"):
                self._native_node_clouds = {}
            cached = self._native_node_clouds.get(search.node_id)
            if cached is None:
                # Stable per-node arrays (the native layer deduplicates
                # the flat upload by array identity) + the node's cached
                # max range so the prep loop does no per-search norms.
                hc = np.ascontiguousarray(
                    cd.high_resolution_point_cloud[:, :3], np.float32
                )
                cached = (
                    hc,
                    np.ascontiguousarray(
                        cd.low_resolution_point_cloud[:, :3], np.float32
                    ),
                    float(
                        np.max(np.linalg.norm(hc, axis=1), initial=0.0)
                    ),
                )
                self._native_node_clouds[search.node_id] = cached
            cloud, low_cloud, cloud_max_range = cached
            shape = self._native_submaps[sid].shape
            if search.global_node_pose is None:
                initial = rigid3.make(
                    np.zeros(3), rigid3.quat_conjugate(cd.gravity_alignment)
                )
                linear_xy = 0.5 * shape[2] * res
                linear_z = 0.5 * shape[0] * res
                angular = math.pi
                min_score = self._options.global_localization_min_score
            else:
                initial = np.asarray(search.global_node_pose, np.float64)
                linear_xy = opts.linear_xy_search_window
                linear_z = opts.linear_z_search_window
                angular = opts.angular_search_window
                min_score = self._options.min_score
            max_range = max(cloud_max_range, 3.0 * res)
            step = compute_angular_step(res, max_range)
            num_angular = int(math.ceil(angular / step))
            angles = (np.arange(2 * num_angular + 1) - num_angular) * step
            rot_scores = rotational_histogram.match_angles(
                sub_hist,
                np.asarray(cd.rotational_scan_matcher_histogram),
                search.gravity_yaw,
                angles,
            )
            keep = rot_scores >= opts.min_rotational_score
            if not keep.any():
                rows.append(None)
                ctxs.append(None)
                continue
            angles_kept = angles[keep].astype(np.float32)
            nl_xy = min(
                int(math.ceil(linear_xy / res)), max(shape) + 1
            )
            nl_z = min(int(math.ceil(linear_z / res)), max(shape) + 1)
            r = len(submaps)
            rows.append(r)
            ctxs.append((angles_kept, rot_scores[keep], initial, res))
            submaps.append(ns)
            highs.append(cloud)
            lows.append(low_cloud)
            angle_lists.append(angles_kept)
            p = params[r]
            p[0:4] = rigid3.quat(initial)
            p[4:7] = initial[:3]
            p[7:10] = origin
            p[10] = res
            p[11:14] = lorigin
            p[14] = lres
            p[15] = nl_xy
            p[16] = nl_z
            p[17] = min_score
            p[18] = opts.min_low_resolution_score
        if not submaps:
            return [(s, None) for s in pending]
        out_rows, found = native_bnb3.match_batch(
            submaps, highs, lows, angle_lists, params[: len(submaps)]
        )
        matched = []
        for search, row, ctx in zip(pending, rows, ctxs):
            if row is None or not found[row]:
                matched.append((search, None))
                continue
            angles_kept, rot_kept, initial, res = ctx
            score, low = float(out_rows[row, 0]), float(out_rows[row, 1])
            ba = int(out_rows[row, 2])
            bx, by, bz = (
                out_rows[row, 3],
                out_rows[row, 4],
                out_rows[row, 5],
            )
            ang = float(angles_kept[ba])
            half = 0.5 * ang
            qa = np.array([np.cos(half), 0.0, 0.0, np.sin(half)])
            q = rigid3.quat_normalize(
                rigid3.quat_multiply(qa, rigid3.quat(initial))
            )
            t = initial[:3] + np.array([bx, by, bz], np.float64) * res
            matched.append(
                (
                    search,
                    MatchResult3D(
                        score=score,
                        low_resolution_score=low,
                        rotational_score=float(rot_kept[ba]),
                        pose=rigid3.make(t, q),
                    ),
                )
            )
        return matched

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
