"""Profile the batched BnB search on TPU: where does the time go?"""
import time
import numpy as np
import jax

from cartographer_tpu.common.config import (
    AdaptiveVoxelFilterOptions, ConstraintBuilderOptions,
    FastCorrelativeScanMatcherOptions2D, GridOptions2D, SubmapsOptions2D,
    TrajectoryBuilder2DOptions)
from cartographer_tpu.mapping.chunked_frontend_2d import ChunkedLocalTrajectoryBuilder2D
from cartographer_tpu.ops.scan_matching import fast_correlative_2d as fc2
from cartographer_tpu.sensor.data import PointCloud
from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter
from cartographer_tpu.testing.synthetic import generate_fake_range_measurements
from cartographer_tpu.transform import rigid2

d = np.array([2.0, 1.0, 0.0]); d /= np.linalg.norm(d)
ms = generate_fake_range_measurements(translation=d*10.0, duration=30.0, time_step=0.05)
b = ChunkedLocalTrajectoryBuilder2D(
    TrajectoryBuilder2DOptions(use_imu_data=False, max_range=10.0,
        submaps=SubmapsOptions2D(num_range_data=40,
            grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512))),
    {"range"}, chunk_size=32)
for m in ms[:256]:
    b.add_range_data("range", m)
b.flush()
grid = b._submaps[0].grid
cloud = adaptive_voxel_filter(PointCloud(ms[-1].ranges.points),
    AdaptiveVoxelFilterOptions(max_length=0.9, min_num_points=100, max_range=50.0)).points[:, :2]
center = np.asarray(grid.origin) + 0.5*0.05*512
cloud3 = np.concatenate([cloud, np.zeros((len(cloud),1))], axis=1).astype(np.float32)
print("cloud points:", len(cloud))

for beam in (4096, 1024, 256):
    opts = FastCorrelativeScanMatcherOptions2D(branch_and_bound_depth=7,
        linear_search_window=7.0, angular_search_window=np.radians(30.0),
        beam_width=beam)
    matcher = fc2.FastCorrelativeScanMatcher2D(grid, opts)
    for batch in (16,):
        searches = [dict(matcher=matcher, initial_pose=rigid2.make(center, 0.1),
                         point_cloud=cloud3, device_points=None, min_score=0.3)
                    for _ in range(batch)]
        p, c = fc2.batch_match_device(searches)  # warm (compile)
        import numpy as _np
        n_over = int((_np.asarray(p)[:, 4] > 0.5).sum())
        t0 = time.perf_counter()
        for _ in range(3):
            p, c = fc2.batch_match_device(searches)
        dt = (time.perf_counter() - t0) / 3
        print(f"beam={beam} batch={batch}: {dt*1000:.1f} ms -> {batch/dt:.2f} matches/s (scores {_np.asarray(p)[:2,0]}, overflowed={n_over})")
