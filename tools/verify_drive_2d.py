"""End-to-end verify drive: chunked device frontend through MapBuilder
(run from /root/repo: python -c "exec(open('tools/verify_drive_2d.py').read())")."""
import numpy as np

from cartographer_tpu.common.config import (
    FastCorrelativeScanMatcherOptions2D, GridOptions2D, MapBuilderOptions,
    MotionFilterOptions, PoseGraphOptions, SubmapsOptions2D,
    TrajectoryBuilder2DOptions, TrajectoryBuilderOptions,
)
from cartographer_tpu.mapping.id import NodeId
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME, generate_fake_range_measurements,
)
from cartographer_tpu.transform import rigid3

pg = PoseGraphOptions(optimize_every_n_nodes=20)
pg.constraint_builder.fast_correlative_scan_matcher = (
    FastCorrelativeScanMatcherOptions2D(
        linear_search_window=2.0, angular_search_window=np.radians(20.0),
        branch_and_bound_depth=4))
pg.constraint_builder.sampling_ratio = 0.5
# VERIFY_LOOP_BACKEND=native drives the hybrid-placement C++ BnB backend.
import os as _os
pg.constraint_builder.loop_closure_backend = _os.environ.get(
    "VERIFY_LOOP_BACKEND", "device")
mb = MapBuilder(MapBuilderOptions(use_trajectory_builder_2d=True, pose_graph=pg))
topts = TrajectoryBuilderOptions(
    trajectory_builder_2d=TrajectoryBuilder2DOptions(
        use_imu_data=False, max_range=10.0,
        motion_filter=MotionFilterOptions(max_distance_meters=0.04),
        submaps=SubmapsOptions2D(
            num_range_data=8,
            grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512))),
    use_chunked_device_frontend=True, device_frontend_chunk_size=32)
results = []
tid = mb.add_trajectory_builder(
    {"range"}, topts, lambda t, tm, pose, rd, ins: results.append((tm, pose)))
b = mb.get_trajectory_builder(tid)
direction = np.array([2.0, 1.0, 0.0]); direction /= np.linalg.norm(direction)
translation = direction * 1.2
for m in generate_fake_range_measurements(
        translation=translation, duration=6.0, time_step=0.05):
    b.add_sensor_data("range", m)
mb.finish_trajectory(tid)
mb.pose_graph.run_final_optimization()

velocity = translation / 6.0
nodes = mb.pose_graph.get_trajectory_nodes()
errs = []
for node_id, node in nodes.items(NodeId):
    expected = rigid3.translation(
        (node.constant_data.time - FAKE_START_TIME) * velocity)
    errs.append(np.linalg.norm(
        rigid3.trans(node.global_pose) - rigid3.trans(expected)))
c = mb.pose_graph.constraints
print(f"results={len(results)} nodes={len(errs)} max_err={max(errs):.4f} "
      f"intra={sum(x.tag=='INTRA_SUBMAP' for x in c)} "
      f"inter={sum(x.tag=='INTER_SUBMAP' for x in c)}")
assert max(errs) < 0.12, max(errs)
assert any(x.tag == "INTER_SUBMAP" for x in c)
blob = mb.serialize_state_pbstream(include_unfinished_submaps=True)
mb2 = MapBuilder(MapBuilderOptions(use_trajectory_builder_2d=True, pose_graph=pg))
remap = mb2.load_state_pbstream(blob, load_frozen_state=True)
print(f"pbstream bytes={len(blob)} loaded={remap}")
print("VERIFY OK")
