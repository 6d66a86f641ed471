"""Profile the native-backend constraint drain (run from /root/repo).

Reproduces bench.py's _bench_bnb native 1024 drain and prints the
cProfile hot spots of run_pending, so host-side overhead (decode,
refinement assembly, constraint construction) is attributable.
"""
import cProfile
import io
import pstats
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as tf:
        workload_path = tf.name
    subprocess.run(
        [sys.executable, "bench.py", "--extra", "_make_bnb_workload",
         workload_path],
        check=True, capture_output=True, timeout=600.0)
    data = np.load(workload_path)

    import jax.numpy as jnp

    from cartographer_tpu.common.config import (
        ConstraintBuilderOptions, FastCorrelativeScanMatcherOptions2D)
    from cartographer_tpu.mapping.constraint_builder_2d import (
        ConstraintBuilder2D)
    from cartographer_tpu.mapping.grid_2d import Grid2D
    from cartographer_tpu.mapping.id import NodeId, SubmapId
    from cartographer_tpu.mapping.trajectory_node import TrajectoryNodeData
    from cartographer_tpu.transform import rigid2
    from cartographer_tpu.transform import rigid3 as r3

    grid = Grid2D(
        log_odds=jnp.asarray(data["log_odds"]),
        known=jnp.asarray(data["known"]),
        origin=np.asarray(data["origin"], np.float32),
        resolution=float(data["resolution"]),
    )
    cloud = data["cloud"]
    center = np.asarray(grid.origin) + 0.5 * 0.05 * 512
    cloud3 = np.concatenate(
        [cloud, np.zeros((len(cloud), 1))], axis=1).astype(np.float32)

    cb_opts = ConstraintBuilderOptions()
    cb_opts.sampling_ratio = 1.0
    cb_opts.max_constraint_distance = 1e6
    cb_opts.min_score = 0.3
    cb_opts.loop_closure_backend = "native"
    cb_opts.fast_correlative_scan_matcher = (
        FastCorrelativeScanMatcherOptions2D(
            branch_and_bound_depth=7,
            linear_search_window=7.0,
            angular_search_window=float(np.radians(30.0))))
    cb = ConstraintBuilder2D(cb_opts)

    def enqueue(n_nodes, n_submaps):
        for s in range(n_submaps):
            cb.set_submap_local_pose(SubmapId(0, s), np.zeros(3))
        for k in range(n_nodes):
            node = TrajectoryNodeData(
                time=0.0,
                gravity_alignment=np.array([1.0, 0, 0, 0]),
                filtered_gravity_aligned_point_cloud=cloud3,
                local_pose=r3.identity(),
            )
            for s in range(n_submaps):
                cb.maybe_add_constraint(
                    SubmapId(0, s), grid, NodeId(0, k), node,
                    rigid2.make(center, 0.1))

    # Warm: compiles + pyramid + padded builds.
    enqueue(128, 8)
    cb.run_pending()

    enqueue(128, 8)
    t0 = time.perf_counter()
    cb.run_pending()
    print(f"unprofiled drain: {time.perf_counter() - t0:.3f}s", flush=True)

    enqueue(128, 8)
    prof = cProfile.Profile()
    prof.enable()
    t0 = time.perf_counter()
    out = cb.run_pending()
    dt = time.perf_counter() - t0
    prof.disable()
    print(f"profiled drain: {dt:.3f}s, constraints={len(out)}")
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
