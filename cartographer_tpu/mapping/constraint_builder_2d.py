"""Loop-closure constraint search for 2D.

Reference: internal/constraints/constraint_builder_2d.cc:59-343. For each
(node, finished submap) pair (distance-gated + per-submap sampled), run the
fast correlative matcher (branch-and-bound, min_score gate) and refine with
the Gauss-Newton matcher; emit an INTER_SUBMAP constraint with loop-closure
weights. Global (cross-trajectory) searches use MatchFullSubmap with
global_localization_min_score.

Structure vs the reference: the reference dispatches one ThreadPool task per
pair plus a memoized matcher-construction task per submap. Here searches are
queued and executed in deterministic batches when the pose graph drains its
work queue (`run_pending`); the device parallelizes candidate scoring inside
each match, and pyramid construction is memoized per submap just like
DispatchScanMatcherConstruction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from cartographer_tpu import metrics
from cartographer_tpu.common.config import ConstraintBuilderOptions
from cartographer_tpu.common.fixed_ratio_sampler import FixedRatioSampler
from cartographer_tpu.common.histogram import Histogram
from cartographer_tpu.mapping.grid_2d import Grid2D
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.scan_matching_2d import CeresScanMatcher2D
from cartographer_tpu.mapping.trajectory_node import TrajectoryNodeData
from cartographer_tpu.ops.scan_matching.fast_correlative_2d import (
    FastCorrelativeScanMatcher2D,
)
from cartographer_tpu.transform import rigid2

INTRA_SUBMAP = "INTRA_SUBMAP"
INTER_SUBMAP = "INTER_SUBMAP"


@dataclasses.dataclass
class ConstraintPose:
    zbar_ij: np.ndarray  # SE(2) (3,) observed submap->node
    translation_weight: float
    rotation_weight: float


@dataclasses.dataclass
class Constraint:
    submap_id: SubmapId
    node_id: NodeId
    pose: ConstraintPose
    tag: str  # INTRA_SUBMAP | INTER_SUBMAP


@dataclasses.dataclass
class _PendingSearch:
    submap_id: SubmapId
    node_id: NodeId
    constant_data: TrajectoryNodeData
    initial_relative_pose: Optional[np.ndarray]  # None => global (full submap)


class ConstraintBuilder2D:
    def __init__(self, options: ConstraintBuilderOptions, mesh=None):
        """mesh: optional jax.sharding.Mesh — the drained search batch is
        sharded over it (whole BnB searches per device), the TPU analog of
        the reference's per-pair ThreadPool fan-out
        (constraint_builder_2d.cc:102-136)."""
        self._options = options
        self._mesh = mesh
        self._samplers: Dict[SubmapId, FixedRatioSampler] = {}
        self._matchers: Dict[SubmapId, FastCorrelativeScanMatcher2D] = {}
        self._submap_grids: Dict[SubmapId, Grid2D] = {}
        self._ceres_matcher = CeresScanMatcher2D(options.ceres_scan_matcher)
        self._pending: List[_PendingSearch] = []
        self._score_histogram = Histogram()
        self._num_finished_nodes = 0
        self._submap_local_poses: Dict[SubmapId, np.ndarray] = {}
        # Staged (pre-padded) node clouds: a node is searched against many
        # submaps (and by MatchFullSubmap), so its cloud is padded once
        # and deduplicated inside each batch upload.
        self._node_clouds: Dict[NodeId, tuple] = {}
        # Memoized device stacks of unique submap grids for _batch_refine.
        self._grid_stack_cache: Dict[tuple, tuple] = {}
        # Native-backend state: per-submap C++ pyramids + host origins
        # (loop_closure_backend="native").
        self._native_pyramids: Dict[SubmapId, object] = {}
        self._native_origins: Dict[SubmapId, tuple] = {}

    def _sampler(self, submap_id: SubmapId) -> FixedRatioSampler:
        if submap_id not in self._samplers:
            self._samplers[submap_id] = FixedRatioSampler(self._options.sampling_ratio)
        return self._samplers[submap_id]

    def _matcher(self, submap_id: SubmapId) -> FastCorrelativeScanMatcher2D:
        # Memoized per-submap pyramid (DispatchScanMatcherConstruction).
        if submap_id not in self._matchers:
            self._matchers[submap_id] = FastCorrelativeScanMatcher2D(
                self._submap_grids[submap_id],
                self._options.fast_correlative_scan_matcher,
            )
        return self._matchers[submap_id]

    def maybe_add_constraint(
        self,
        submap_id: SubmapId,
        grid: Grid2D,
        node_id: NodeId,
        constant_data: TrajectoryNodeData,
        initial_relative_pose: np.ndarray,
    ) -> None:
        if (
            np.linalg.norm(initial_relative_pose[:2])
            > self._options.max_constraint_distance
        ):
            return
        if not self._sampler(submap_id).pulse():
            return
        self._submap_grids.setdefault(submap_id, grid)
        self._pending.append(
            _PendingSearch(submap_id, node_id, constant_data, initial_relative_pose)
        )

    def maybe_add_global_constraint(
        self,
        submap_id: SubmapId,
        grid: Grid2D,
        node_id: NodeId,
        constant_data: TrajectoryNodeData,
    ) -> None:
        self._submap_grids.setdefault(submap_id, grid)
        self._pending.append(
            _PendingSearch(submap_id, node_id, constant_data, None)
        )

    def notify_end_of_node(self) -> None:
        self._num_finished_nodes += 1

    # Searches per pipeline stage: the host (threaded C++) searches chunk
    # k+1 WHILE the device refines chunk k's accepted matches — the
    # dispatched refinement program executes asynchronously and is only
    # fetched after the last chunk, so at steady state the chip's LM
    # refinement work rides entirely inside the host search wall.
    _DRAIN_CHUNK = 256

    def run_pending(self) -> List[Constraint]:
        """Execute queued searches; returns found constraints (WhenDone).

        Pipelined hybrid placement: the branch-and-bound searches run
        threaded across host cores (or batched on device), and every
        chunk's accepted matches are immediately dispatched as ONE
        vmapped device refinement program (match_log_odds_batch_packed)
        that overlaps the NEXT chunk's host search — the reference runs
        both phases as concurrent thread-pool tasks per pair
        (constraint_builder_2d.cc:102-136, :246-249)."""
        import time as _time

        results: List[Constraint] = []
        pending, self._pending = self._pending, []
        # Drop searches whose submap was trimmed while they sat queued:
        # with the async backend the trimmers (locked drain phase) race
        # the enqueue side, and a stale search would otherwise crash the
        # drain on the evicted grid. The reference likewise never
        # computes constraints against trimmed submaps.
        stale = [s for s in pending if s.submap_id not in self._submap_grids]
        if stale:
            import logging

            logging.getLogger(__name__).info(
                "Dropping %d queued constraint searches against trimmed "
                "submaps.", len(stale),
            )
            pending = [
                s for s in pending if s.submap_id in self._submap_grids
            ]
        if not pending:
            return results

        _t0 = _time.perf_counter()
        use_native = self._use_native_backend()
        # The native C++ scorer reads log-odds probability pyramids; TSDF
        # submaps have no log-odds table, so their searches take the
        # device path even under "native"/"auto" (mixed drains split).
        if use_native:
            native_pending = [
                s
                for s in pending
                if hasattr(self._submap_grids[s.submap_id], "log_odds")
            ]
            device_pending = [
                s
                for s in pending
                if not hasattr(self._submap_grids[s.submap_id], "log_odds")
            ]
        else:
            native_pending, device_pending = [], pending
        # Native chunks first (they drive the search-worker pipeline),
        # then ONE device chunk — the device path vmaps a whole batch.
        chunks = [
            ("native", native_pending[c0: c0 + self._DRAIN_CHUNK])
            for c0 in range(0, len(native_pending), self._DRAIN_CHUNK)
        ]
        n_native_chunks = len(chunks)
        if device_pending:
            chunks.append(("device", device_pending))
        _t_search = 0.0
        _t_refine_dispatch = 0.0
        _t_refine_wait = 0.0
        # Native path: the C++ search releases the GIL, so chunk k+1's
        # threaded search runs on a worker thread WHILE the main thread
        # decodes chunk k and dispatches its device refinement (which in
        # turn executes under chunk k+2's search) — a three-stage
        # host-search / host-assembly / chip-refinement pipeline. On
        # near-saturated hosts (<4 cores) the assembly thread would
        # steal cycles from the search threads for a net LOSS (measured:
        # 3.9k -> 3.4k matches/s on a 2-core host), so the overlap only
        # engages where there is headroom.
        import os as _os

        use_search_worker = (
            use_native
            and n_native_chunks > 0
            and (_os.cpu_count() or 1) >= 4
        )
        future = None
        if use_search_worker:
            from cartographer_tpu.native import bnb as native_bnb

            if not hasattr(self, "_search_pool"):
                import concurrent.futures as _cf

                self._search_pool = _cf.ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="bnb-search"
                )
            _ts = _time.perf_counter()
            prep = self._prepare_native(chunks[0][1])
            future = self._search_pool.submit(
                native_bnb.match_batch,
                prep["pyramids"], prep["clouds"], prep["params"],
            )
            _t_search += _time.perf_counter() - _ts
        # Per chunk: (refine rows [(search, pose|None)], device jobs,
        # dispatched device rows handle).
        staged = []
        for ci, (kind, chunk) in enumerate(chunks):
            _ts = _time.perf_counter()
            if kind == "device":
                decoded = self._run_searches_device(chunk)
            elif use_search_worker:
                out_rows, found = future.result()
                if ci + 1 < n_native_chunks:
                    prep = self._prepare_native(chunks[ci + 1][1])
                    future = self._search_pool.submit(
                        native_bnb.match_batch,
                        prep["pyramids"], prep["clouds"], prep["params"],
                    )
                decoded = self._decode_native(chunk, out_rows, found)
            else:
                decoded = self._run_searches_native(chunk)
            _t_search += _time.perf_counter() - _ts
            refine = []
            device_jobs = []  # (refine row, search, BnB result)
            for search, result in decoded:
                if result is None:
                    continue
                self._score_histogram.add(result.score)
                metrics.constraint_scores.observe(result.score)
                grid = self._submap_grids[search.submap_id]
                if not hasattr(grid, "log_odds"):  # TSDF grid: serial path
                    cloud = (
                        search.constant_data
                        .filtered_gravity_aligned_point_cloud
                    )
                    refined_pose, _ = self._ceres_matcher.match(
                        result.pose[:2], result.pose, cloud, grid
                    )
                    refine.append((search, refined_pose))
                    continue
                device_jobs.append((len(refine), search, result))
                refine.append((search, None))
            handle = None
            if device_jobs:
                _tr = _time.perf_counter()
                handle = self._batch_refine_dispatch(device_jobs)
                if getattr(self, "serialize_refine", False):
                    # Measurement mode: block on each chunk's refinement
                    # program so its DEVICE execution time lands in
                    # refine_wait_s instead of hiding under later host
                    # searches (bench.py's device-time column).
                    _tw = _time.perf_counter()
                    np.asarray(handle)
                    _t_refine_wait += _time.perf_counter() - _tw
                    _t_refine_dispatch += _time.perf_counter() - _tr
                    staged.append((refine, device_jobs, handle))
                    continue
                try:
                    # Start the device->host copy NOW: on remote-attached
                    # backends dispatch alone can stay lazily enqueued
                    # until the first fetch, which would serialize the
                    # refinement after the host searches instead of
                    # under them.
                    handle.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
                _t_refine_dispatch += _time.perf_counter() - _tr
            staged.append((refine, device_jobs, handle))

        # Fetch the refinement programs (most have already executed under
        # later chunks' host searches) and assemble constraints.
        for refine, device_jobs, handle in staged:
            if handle is not None:
                _tw = _time.perf_counter()
                rows = np.asarray(handle)
                _t_refine_wait += _time.perf_counter() - _tw
                poses = rows[: len(device_jobs), :3].astype(np.float64)
                poses[:, 2] = rigid2.normalize_angle(poses[:, 2])
                for (i, _, __), pose in zip(device_jobs, poses):
                    refine[i] = (refine[i][0], pose)
            if not refine:
                continue
            # Vectorized zbar = inverse(submap_local_pose) o refined_pose.
            sub = np.stack(
                [
                    self._submap_local_pose(search.submap_id)
                    for search, _ in refine
                ]
            ).astype(np.float64)
            ref = np.stack([pose for _, pose in refine]).astype(np.float64)
            ct, st = np.cos(-sub[:, 2]), np.sin(-sub[:, 2])
            dx = ref[:, 0] - sub[:, 0]
            dy = ref[:, 1] - sub[:, 1]
            zx = ct * dx - st * dy
            zy = st * dx + ct * dy
            zt = rigid2.normalize_angle(ref[:, 2] - sub[:, 2])
            tw = self._options.loop_closure_translation_weight
            rw = self._options.loop_closure_rotation_weight
            for (search, _), x, y, t in zip(refine, zx, zy, zt):
                results.append(
                    Constraint(
                        submap_id=search.submap_id,
                        node_id=search.node_id,
                        pose=ConstraintPose(
                            zbar_ij=np.array([x, y, t]),
                            translation_weight=tw,
                            rotation_weight=rw,
                        ),
                        tag=INTER_SUBMAP,
                    )
                )
        metrics.constraints_found.increment(len(results))
        # Drain phase timings (observability; bench.py reports the
        # search-phase rate against the search-only CPU anchor, and the
        # refine wait shows how much chip time did NOT overlap the host
        # searches).
        self.last_drain_timings = {
            "searches": len(pending),
            "search_s": _t_search,
            "refine_dispatch_s": _t_refine_dispatch,
            "refine_wait_s": _t_refine_wait,
            "total_s": _time.perf_counter() - _t0,
        }
        return results

    def _use_native_backend(self) -> bool:
        if self._options.loop_closure_backend not in ("native", "auto"):
            return False
        from cartographer_tpu.native import bnb as native_bnb

        if not native_bnb.available():
            if self._options.loop_closure_backend == "native" and not getattr(
                self, "_warned_no_native", False
            ):
                self._warned_no_native = True
                import logging

                logging.warning(
                    "loop_closure_backend='native' requested but no C++ "
                    "toolchain produced the library; falling back to the "
                    "device search."
                )
            return False
        return True

    def _run_searches_device(self, pending):
        """Phase 1 on device: ALL BnB searches as ONE vmapped program +
        one fetch. Returns [(search, MatchResult | None)]."""
        from cartographer_tpu.ops.scan_matching.fast_correlative_2d import (
            batch_match_device,
        )

        batch = []
        for search in pending:
            metrics.constraints_searched.increment()
            matcher = self._matcher(search.submap_id)
            cloud = search.constant_data.filtered_gravity_aligned_point_cloud
            staged = self._node_clouds.get(search.node_id)
            if staged is None or staged[0].shape[0] < cloud.shape[0]:
                staged = FastCorrelativeScanMatcher2D.stage_points(cloud) + (
                    np.ascontiguousarray(cloud[:, :2], np.float32),
                )
                self._node_clouds[search.node_id] = staged
            staged = staged[:2]
            if search.initial_relative_pose is None:
                initial_pose = None
                min_score = self._options.global_localization_min_score
            else:
                initial_pose = rigid2.compose(
                    self._submap_local_pose(search.submap_id),
                    search.initial_relative_pose,
                )
                min_score = self._options.min_score
            batch.append(
                dict(
                    matcher=matcher, initial_pose=initial_pose,
                    point_cloud=cloud, device_points=staged,
                    min_score=min_score,
                )
            )
        packed_batch, ctxs = batch_match_device(batch, mesh=self._mesh)
        all_bnb = np.asarray(packed_batch)
        out = []
        for search, ctx, packed in zip(pending, ctxs, all_bnb):
            out.append(
                (search, self._matcher(search.submap_id).decode(packed, ctx))
            )
        return out

    def _run_searches_native(self, pending):
        """Phase 1 on host cores: the threaded C++ BnB
        (native/bnb_native.cc) fans the drained searches across threads —
        hybrid placement, see ConstraintBuilderOptions.loop_closure_backend.
        Returns [(search, MatchResult | None)]."""
        from cartographer_tpu.native import bnb as native_bnb

        prep = self._prepare_native(pending)
        out_rows, found = native_bnb.match_batch(
            prep["pyramids"], prep["clouds"], prep["params"]
        )
        return self._decode_native(pending, out_rows, found)

    def _prepare_native(self, pending):
        """Host-side batch assembly for the native search: pyramids
        (memoized per submap), deduplicated clouds, vectorized initial
        poses. Pure main-thread work — the returned dict feeds
        native_bnb.match_batch, which releases the GIL so a drain can
        overlap the NEXT chunk's C++ search with this chunk's decode and
        refinement dispatch."""
        import math

        from cartographer_tpu.native import bnb as native_bnb

        opts = self._options.fast_correlative_scan_matcher
        depth = opts.branch_and_bound_depth
        n = len(pending)
        metrics.constraints_searched.increment(n)
        pyramids = []
        clouds = []
        params = np.zeros((n, 9), np.float32)
        # Vectorized initial-pose assembly: compose(submap_local_pose,
        # initial_relative_pose) batched over the chunk.
        sub = np.zeros((n, 3), np.float64)
        rel = np.zeros((n, 3), np.float64)
        is_global = np.zeros(n, bool)
        for i, search in enumerate(pending):
            sid = search.submap_id
            pyr = self._native_pyramids.get(sid)
            if pyr is None:
                grid = self._submap_grids[sid]
                # One host fetch per FINISHED submap grid (it no longer
                # changes); probability computed host-side.
                log_odds = np.asarray(grid.log_odds)
                known = np.asarray(grid.known)
                prob = np.where(
                    known, 1.0 / (1.0 + np.exp(-log_odds)), 0.1
                ).astype(np.float32)
                pyr = native_bnb.NativePyramid(prob, depth)
                self._native_pyramids[sid] = pyr
                self._native_origins[sid] = (
                    np.asarray(grid.origin, np.float64),
                    float(grid.resolution),
                )
            origin, resolution = self._native_origins[sid]
            cloud = search.constant_data.filtered_gravity_aligned_point_cloud
            staged = self._node_clouds.get(search.node_id)
            if staged is None or staged[0].shape[0] < cloud.shape[0]:
                # The device-batched refinement phase reads staged
                # clouds; the native layer deduplicates the flat upload
                # by the f32 array's identity, so the 2-column cast is
                # cached alongside.
                staged = FastCorrelativeScanMatcher2D.stage_points(cloud) + (
                    np.ascontiguousarray(cloud[:, :2], np.float32),
                )
                self._node_clouds[search.node_id] = staged
            clouds.append(staged[2])
            if search.initial_relative_pose is None:
                is_global[i] = True
                center = origin + 0.5 * resolution * np.array(
                    [pyr.w, pyr.h]
                )
                sub[i] = rigid2.make(center, 0.0)
                params[i, 6:9] = (
                    1e6 * resolution,
                    math.pi,
                    self._options.global_localization_min_score,
                )
            else:
                sub[i] = self._submap_local_pose(sid)
                rel[i] = search.initial_relative_pose
                params[i, 6:9] = (
                    opts.linear_search_window,
                    opts.angular_search_window,
                    self._options.min_score,
                )
            params[i, 0:2] = origin
            params[i, 2] = resolution
            pyramids.append(pyr)
        ct, st = np.cos(sub[:, 2]), np.sin(sub[:, 2])
        params[:, 3] = sub[:, 0] + ct * rel[:, 0] - st * rel[:, 1]
        params[:, 4] = sub[:, 1] + st * rel[:, 0] + ct * rel[:, 1]
        params[:, 5] = sub[:, 2] + rel[:, 2]
        return {"pyramids": pyramids, "clouds": clouds, "params": params}

    def _decode_native(self, pending, out_rows, found):
        from cartographer_tpu.ops.scan_matching.fast_correlative_2d import (
            MatchResult,
        )

        thetas = rigid2.normalize_angle(out_rows[:, 3].astype(np.float64))
        out = []
        for i, search in enumerate(pending):
            if not found[i]:
                out.append((search, None))
                continue
            pose = np.array(
                [out_rows[i, 1], out_rows[i, 2], thetas[i]], np.float64
            )
            out.append(
                (search, MatchResult(score=float(out_rows[i, 0]), pose=pose))
            )
        return out

    def _batch_refine_dispatch(self, jobs):
        """Dispatch ONE device program refining every accepted BnB match;
        returns the [k, 4] device rows (callers fetch).

        `jobs`: list of (row, _PendingSearch, MatchResult). Stacks the
        UNIQUE submap grids involved (device arrays already resident in
        HBM, stack memoized across drains) and the UNIQUE node clouds,
        packs the small per-match arrays into one uint8 upload, runs the
        vmapped LM refinement, and fetches all poses in one round trip.
        The reference refines each match on its own ThreadPool task
        (constraint_builder_2d.cc:246-249); per-match dispatch here would
        pay one host link round trip each.
        """
        import jax.numpy as jnp

        from cartographer_tpu.ops.scan_matching.gauss_newton_2d import (
            match_log_odds_batch_packed,
        )

        opts = self._options.ceres_scan_matcher
        grid_index: Dict[SubmapId, int] = {}
        grids = []
        cloud_index: Dict[NodeId, int] = {}
        clouds = []
        n_pad = 64
        for _, search, _result in jobs:
            sid = search.submap_id
            if sid not in grid_index:
                grid_index[sid] = len(grids)
                grids.append(self._submap_grids[sid])
            nid = search.node_id
            if nid not in cloud_index:
                cloud_index[nid] = len(clouds)
                clouds.append(self._node_clouds[nid])
                while n_pad < clouds[-1][0].shape[0]:
                    n_pad *= 2
        k = 4
        while k < len(jobs):
            k *= 2
        u_pad = 4
        while u_pad < len(clouds):
            u_pad *= 2

        points = np.zeros((u_pad, n_pad, 2), np.float32)
        pmask = np.zeros((u_pad, n_pad), bool)
        for r, staged in enumerate(clouds):
            pts, mask = staged[0], staged[1]
            points[r, : pts.shape[0]] = pts
            pmask[r, : mask.shape[0]] = mask
        origins = np.zeros((k, 2), np.float32)
        initial_poses = np.zeros((k, 3), np.float32)
        target_translations = np.zeros((k, 2), np.float32)
        resolutions = np.ones((k,), np.float32)
        sidx = np.zeros((k,), np.int32)
        rows_idx = np.zeros((k,), np.int32)
        for i, (_, search, result) in enumerate(jobs):
            grid = self._submap_grids[search.submap_id]
            origins[i] = np.asarray(grid.origin)
            initial_poses[i] = result.pose
            target_translations[i] = result.pose[:2]
            resolutions[i] = grid.resolution
            sidx[i] = grid_index[search.submap_id]
            rows_idx[i] = cloud_index[search.node_id]
        buf = np.concatenate(
            [
                origins.ravel().view(np.uint8),
                initial_poses.ravel().view(np.uint8),
                target_translations.ravel().view(np.uint8),
                resolutions.view(np.uint8),
                sidx.view(np.uint8),
                rows_idx.view(np.uint8),
            ]
        )
        return match_log_odds_batch_packed(
            *self._grid_stack(grids),
            jnp.asarray(points),
            jnp.asarray(pmask),
            jnp.asarray(buf),
            k,
            opts.occupied_space_weight,
            opts.translation_weight,
            opts.rotation_weight,
            opts.ceres_solver_options.max_num_iterations,
            bool(opts.ceres_solver_options.use_nonmonotonic_steps),
        )

    def _batch_refine(self, jobs) -> List[np.ndarray]:
        """_batch_refine_dispatch + one fetch + decode."""
        rows = np.asarray(self._batch_refine_dispatch(jobs))
        poses = []
        for row in rows[: len(jobs)]:
            pose = np.asarray(row[:3], np.float64)
            pose[2] = rigid2.normalize_angle(pose[2])
            poses.append(pose)
        return poses

    def _grid_stack(self, grids):
        """Memoized [S_pad, H, W] device stacks (log_odds, known) of the
        drain's unique submap grids — padded to a power of two with
        repeats of the first (padding rows are never indexed)."""
        import jax.numpy as jnp

        key = tuple(id(g) for g in grids)
        hit = self._grid_stack_cache.get(key)
        if hit is not None:
            return hit[0]
        s_pad = 2
        while s_pad < len(grids):
            s_pad *= 2
        padded = grids + [grids[0]] * (s_pad - len(grids))
        stacks = (
            jnp.stack([g.log_odds for g in padded]),
            jnp.stack([g.known for g in padded]),
        )
        while len(self._grid_stack_cache) >= 8:
            self._grid_stack_cache.pop(next(iter(self._grid_stack_cache)))
        self._grid_stack_cache[key] = (stacks, tuple(grids))
        return stacks

    def num_pending(self) -> int:
        return len(self._pending)

    def _compute_constraint(self, search: _PendingSearch) -> Optional[Constraint]:
        metrics.constraints_searched.increment()
        matcher = self._matcher(search.submap_id)
        cloud = search.constant_data.filtered_gravity_aligned_point_cloud
        grid = self._submap_grids[search.submap_id]
        submap_local_pose = self._submap_local_pose(search.submap_id)

        if search.initial_relative_pose is None:
            result = matcher.match_full_submap(
                cloud, self._options.global_localization_min_score
            )
        else:
            initial_pose = rigid2.compose(
                submap_local_pose, search.initial_relative_pose
            )
            result = matcher.match(initial_pose, cloud, self._options.min_score)
        if result is None:
            return None
        self._score_histogram.add(result.score)
        metrics.constraint_scores.observe(result.score)

        # Gauss-Newton refinement with the BnB pose as target
        # (constraint_builder_2d.cc:246-249).
        refined_pose, _ = self._ceres_matcher.match(
            result.pose[:2], result.pose, cloud, grid
        )
        zbar_ij = rigid2.compose(rigid2.inverse(submap_local_pose), refined_pose)
        return Constraint(
            submap_id=search.submap_id,
            node_id=search.node_id,
            pose=ConstraintPose(
                zbar_ij=zbar_ij,
                translation_weight=self._options.loop_closure_translation_weight,
                rotation_weight=self._options.loop_closure_rotation_weight,
            ),
            tag=INTER_SUBMAP,
        )

    def set_submap_local_pose(self, submap_id: SubmapId, pose: np.ndarray) -> None:
        self._submap_local_poses[submap_id] = np.asarray(pose)

    def _submap_local_pose(self, submap_id: SubmapId) -> np.ndarray:
        return self._submap_local_poses[submap_id]

    def score_histogram(self) -> Histogram:
        return self._score_histogram
