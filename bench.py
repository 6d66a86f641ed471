"""Benchmark: full 2D local-SLAM pipeline throughput (scans/sec/chip).

Measures the steady-state throughput of the COMPLETE per-scan local SLAM
pipeline — constant-velocity extrapolation, per-point motion unwarp,
range filtering, gravity alignment, voxel + adaptive voxel filtering,
Levenberg-Marquardt scan matching (20 iterations, bicubic grid
interpolation), motion filtering, and supercover ray-cast insertion into
the two active 512x512 submaps — running device-resident in chunks
(cartographer_tpu/mapping/chunked_frontend_2d.py) on synthetic scans of
~1.6k points (trajectory_builder_2d.lua-equivalent settings, 5 cm grid).

This is an end-to-end local-SLAM number (the same work
LocalTrajectoryBuilder2D does per scan in the reference,
mapping/internal/2d/local_trajectory_builder_2d.cc), not a single-kernel
microbenchmark.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is a documented estimate of the reference's CPU local-SLAM
rate (~100 scans/sec/core for comparable 2D settings, i.e. ~10 ms/scan
for the full pipeline on a desktop core — consistent with its real-time
claim at 5-20x margin on Revo LDS data). BASELINE.md's target is >=5x.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_CPU_SCANS_PER_SEC = 100.0


def main() -> None:
    from cartographer_tpu.common.config import (
        GridOptions2D,
        SubmapsOptions2D,
        TrajectoryBuilder2DOptions,
    )
    from cartographer_tpu.mapping.chunked_frontend_2d import (
        ChunkedLocalTrajectoryBuilder2D,
    )
    from cartographer_tpu.testing.synthetic import generate_fake_range_measurements

    def make_options():
        return TrajectoryBuilder2DOptions(
            use_imu_data=False,
            max_range=10.0,
            submaps=SubmapsOptions2D(
                num_range_data=40,
                grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512),
            ),
        )

    chunk = 32
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    measurements = generate_fake_range_measurements(
        translation=direction * 10.0, duration=120.0, time_step=0.05
    )

    builder = ChunkedLocalTrajectoryBuilder2D(
        make_options(), {"range"}, chunk_size=chunk
    )
    # Time-bounded phases: the host link to a remote-attached TPU can
    # degrade by orders of magnitude under load. The bench then reports the
    # (low) achieved rate, flagged as degraded, instead of hanging past the
    # driver's patience. Only complete chunks count toward the rate.
    warmup = 16 * chunk
    warmup_budget_s = 480.0
    budget_s = 120.0
    n = 0
    warm_done = 0
    t_start = time.perf_counter()
    for m in measurements[:warmup]:
        n += len(builder.add_range_data("range", m))
        warm_done += 1
        if (
            warm_done % chunk == 0
            and time.perf_counter() - t_start > warmup_budget_s
        ):
            break
    degraded = warm_done < warmup
    t0 = time.perf_counter()
    count = 0
    for m in measurements[warm_done:]:
        n += len(builder.add_range_data("range", m))
        count += 1
        if count % chunk == 0 and time.perf_counter() - t0 > budget_s:
            break
    dt = time.perf_counter() - t0
    n += len(builder.flush())
    scans_per_sec = count / dt
    assert n > min(count, warmup) // 2, "pipeline produced too few results"

    record = {
        "metric": "local_slam_2d_full_pipeline_scans_per_sec_per_chip",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / REFERENCE_CPU_SCANS_PER_SEC, 3),
    }
    if degraded:
        record["note"] = (
            "host link degraded during run (warmup truncated); value "
            "understates steady-state throughput"
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
