"""Phase-profile the 16-search BnB drain on TPU."""
import time
import numpy as np
import jax

from cartographer_tpu.common.config import (
    AdaptiveVoxelFilterOptions, ConstraintBuilderOptions,
    FastCorrelativeScanMatcherOptions2D, GridOptions2D, SubmapsOptions2D,
    TrajectoryBuilder2DOptions)
from cartographer_tpu.mapping.chunked_frontend_2d import ChunkedLocalTrajectoryBuilder2D
from cartographer_tpu.mapping.constraint_builder_2d import ConstraintBuilder2D
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.trajectory_node import TrajectoryNodeData
from cartographer_tpu.ops.scan_matching import fast_correlative_2d as fc2
from cartographer_tpu.sensor.data import PointCloud
from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter
from cartographer_tpu.testing.synthetic import generate_fake_range_measurements
from cartographer_tpu.transform import rigid2, rigid3 as r3

direction = np.array([2.0, 1.0, 0.0]); direction /= np.linalg.norm(direction)
measurements = generate_fake_range_measurements(
    translation=direction * 10.0, duration=30.0, time_step=0.05)
builder = ChunkedLocalTrajectoryBuilder2D(
    TrajectoryBuilder2DOptions(
        use_imu_data=False, max_range=10.0,
        submaps=SubmapsOptions2D(
            num_range_data=40,
            grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512))),
    {"range"}, chunk_size=32, serialize_dispatch=True)
for m in measurements[:256]:
    builder.add_range_data("range", m)
builder.flush()
grid = builder._submaps[0].grid
cloud = adaptive_voxel_filter(
    PointCloud(measurements[-1].ranges.points),
    AdaptiveVoxelFilterOptions(max_length=0.9, min_num_points=100, max_range=50.0),
).points[:, :2]
center = np.asarray(grid.origin) + 0.5 * 0.05 * 512

cb_opts = ConstraintBuilderOptions()
cb_opts.sampling_ratio = 1.0
cb_opts.max_constraint_distance = 1e6
cb_opts.min_score = 0.3
cb_opts.fast_correlative_scan_matcher = FastCorrelativeScanMatcherOptions2D(
    branch_and_bound_depth=7, linear_search_window=7.0,
    angular_search_window=np.radians(30.0))
cb = ConstraintBuilder2D(cb_opts)
sid = SubmapId(0, 0)
cb.set_submap_local_pose(sid, np.zeros(3))
cloud3 = np.concatenate([cloud, np.zeros((len(cloud), 1))], axis=1).astype(np.float32)

def enqueue():
    for k in range(16):
        cb.maybe_add_constraint(
            sid, grid, NodeId(0, k),
            TrajectoryNodeData(
                time=0.0, gravity_alignment=np.array([1.0, 0, 0, 0]),
                filtered_gravity_aligned_point_cloud=cloud3,
                local_pose=r3.identity()),
            rigid2.make(center, 0.1))

enqueue(); cb.run_pending()  # warm

for trial in range(3):
    # Phase A: batch build + dispatch (returns async)
    enqueue()
    pending, cb._pending = cb._pending, []
    batch = []
    t0 = time.perf_counter()
    for search in pending:
        matcher = cb._matcher(search.submap_id)
        cloud_ = search.constant_data.filtered_gravity_aligned_point_cloud
        staged = cb._node_clouds.get(search.node_id)
        if staged is None:
            staged = fc2.FastCorrelativeScanMatcher2D.stage_points(cloud_)
            cb._node_clouds[search.node_id] = staged
        initial_pose = rigid2.compose(
            cb._submap_local_pose(search.submap_id), search.initial_relative_pose)
        batch.append(dict(matcher=matcher, initial_pose=initial_pose,
                          point_cloud=cloud_, device_points=staged,
                          min_score=cb._options.min_score))
    t1 = time.perf_counter()
    packed_batch, ctxs = fc2.batch_match_device(batch, mesh=None)
    t2 = time.perf_counter()
    all_bnb = np.asarray(packed_batch)
    t3 = time.perf_counter()
    # Phase 2 equivalent: decode + GN refine through public API is awkward;
    # time the remaining full run via a fresh enqueue instead.
    enqueue()
    t4 = time.perf_counter()
    found = cb.run_pending()
    t5 = time.perf_counter()
    print(f"trial{trial}: prep={t1-t0:.3f}s dispatch={t2-t1:.3f}s "
          f"fetch={t3-t2:.3f}s full_drain={t5-t4:.3f}s found={len(found)}")
