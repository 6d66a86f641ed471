"""Profile the chunked 3D frontend: device compute vs host-link transfers.

Same methodology as tools/profile_frontend_2d.py, on the 3D pipeline with
bench_suite's 3D configuration.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from cartographer_tpu.common.config import (
    AdaptiveVoxelFilterOptions as _AVF,
    MotionFilterOptions,
    SubmapsOptions3D,
    TrajectoryBuilder3DOptions,
)
from cartographer_tpu.mapping.chunked_frontend_3d import (
    ChunkedLocalTrajectoryBuilder3D,
)
from cartographer_tpu.ops import frontend_3d
from cartographer_tpu.sensor.data import ImuData
from cartographer_tpu.testing.synthetic import (
    FAKE_START_TIME,
    generate_fake_range_measurements,
)

CHUNK = 16


def make_options():
    return TrajectoryBuilder3DOptions(
        min_range=0.1,
        max_range=10.0,
        motion_filter=MotionFilterOptions(
            max_time_seconds=0.5,
            max_distance_meters=0.2,
            max_angle_radians=0.2,
        ),
        high_resolution_adaptive_voxel_filter=_AVF(
            max_length=2.0, min_num_points=100, max_range=15.0
        ),
        low_resolution_adaptive_voxel_filter=_AVF(
            max_length=4.0, min_num_points=150, max_range=15.0
        ),
        submaps=SubmapsOptions3D(
            num_range_data=40,
            high_resolution=0.10,
            low_resolution=0.45,
            high_resolution_grid_size=256,
            low_resolution_grid_size=128,
        ),
    )


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}")
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    duration = 30.0
    measurements = generate_fake_range_measurements(
        translation=direction * 5.0, duration=duration, time_step=0.1
    )
    print(
        f"scans: {len(measurements)}, "
        f"points/scan: {measurements[0].ranges.points.shape[0]}"
    )
    imu_times = np.arange(
        FAKE_START_TIME - 0.5, FAKE_START_TIME + duration + 0.2, 0.02
    )
    imu = [
        ImuData(
            time=t,
            linear_acceleration=np.array([0.0, 0.0, 9.8]),
            angular_velocity=np.zeros(3),
        )
        for t in imu_times
    ]

    builder = ChunkedLocalTrajectoryBuilder3D(
        make_options(), {"range"}, chunk_size=CHUNK
    )
    captured = {}
    orig = frontend_3d.run_chunk

    def capture(cfg, state, eps, *arrays):
        # Keep the LAST dispatch: steady state (the first chunk carries the
        # pre-start IMU backlog and compiles a wider tracker fold).
        captured.update(
            cfg=cfg, state=state,
            arrays=[np.asarray(a) for a in arrays],
        )
        return orig(cfg, state, eps, *arrays)

    frontend_3d.run_chunk = capture
    try:
        imu_i = 0
        for m in measurements[: 6 * CHUNK]:
            while imu_i < len(imu) and imu[imu_i].time <= m.time:
                builder.add_imu_data(imu[imu_i])
                imu_i += 1
            builder.add_range_data("range", m)
        builder.flush()
    finally:
        frontend_3d.run_chunk = orig

    cfg = captured["cfg"]
    state = captured["state"]
    import jax.numpy as jnp

    eps = jnp.float32(0.0)
    host_inputs = captured["arrays"]
    nbytes = sum(a.nbytes for a in host_inputs)
    for _ in range(2):
        staged = [jax.device_put(a) for a in host_inputs]
        jax.block_until_ready(staged)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        staged = [jax.device_put(a) for a in host_inputs]
        jax.block_until_ready(staged)
    up = (time.perf_counter() - t0) / reps
    print(f"upload: {nbytes/1e6:.2f} MB in {up*1e3:.1f} ms")

    def device_time(cfg_variant, reps=6):
        out = frontend_3d.run_chunk(cfg_variant, state, eps, *staged)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        s = state
        outs = []
        for _ in range(reps):
            res = frontend_3d.run_chunk(cfg_variant, s, eps, *staged)
            s = res[0]
            outs.append(res[2:])
        jax.block_until_ready((s, outs))
        return (time.perf_counter() - t0) / reps, res[2:]

    full_t, outs = device_time(cfg)
    print(f"device full chunk: {full_t*1e3:.1f} ms ({CHUNK/full_t:.0f} scans/s)")
    import dataclasses

    for stage in ("voxel", "adaptive", "match", "insert",
                  "voxel,adaptive,match,insert"):
        t, _ = device_time(dataclasses.replace(cfg, disable=stage))
        print(
            f"device without {stage:28s}: {t*1e3:6.1f} ms "
            f"(stage ~{(full_t-t)*1e3:5.1f} ms)"
        )

    fetch_bytes = sum(o.nbytes for o in outs)
    t0 = time.perf_counter()
    for _ in range(reps):
        for o in outs:
            np.asarray(o)
    ft = (time.perf_counter() - t0) / reps
    print(f"fetch: {fetch_bytes/1e6:.2f} MB in {ft*1e3:.1f} ms")
    total = max(full_t, up + ft)
    print(
        f"pipeline bound: device {full_t*1e3:.1f} ms vs link {(up+ft)*1e3:.1f} ms"
        f" -> ~{CHUNK/total:.0f} scans/s"
    )


if __name__ == "__main__":
    main()
