"""Profile the chunked 2D frontend: device compute vs host-link transfers.

Splits the per-chunk cost of the device-resident frontend into
  (a) pure device time per chunk (inputs pre-staged, outputs not fetched),
  (b) upload time for the chunk's input arrays,
  (c) fetch time for the chunk's output arrays,
and isolates per-stage device cost via FrontendConfig2D.disable.

Run on the real TPU to decide what to optimize next.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.common.config import (
    GridOptions2D,
    SubmapsOptions2D,
    TrajectoryBuilder2DOptions,
)
from cartographer_tpu.mapping.chunked_frontend_2d import (
    ChunkedLocalTrajectoryBuilder2D,
)
from cartographer_tpu.ops import frontend_2d
from cartographer_tpu.testing.synthetic import generate_fake_range_measurements

CHUNK = 32


def make_options():
    return TrajectoryBuilder2DOptions(
        use_imu_data=False,
        max_range=10.0,
        submaps=SubmapsOptions2D(
            num_range_data=40,
            grid_options_2d=GridOptions2D(resolution=0.05, grid_size=512),
        ),
    )


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}")
    direction = np.array([2.0, 1.0, 0.0])
    direction /= np.linalg.norm(direction)
    measurements = generate_fake_range_measurements(
        translation=direction * 10.0, duration=60.0, time_step=0.05
    )
    print(
        f"scans: {len(measurements)}, "
        f"points/scan: {measurements[0].ranges.points.shape[0]}"
    )

    options = make_options()
    builder = ChunkedLocalTrajectoryBuilder2D(options, {"range"}, chunk_size=CHUNK)
    # Feed one chunk through the builder to capture realistic inputs/state.
    captured = {}
    orig_run_chunk = frontend_2d.run_chunk

    def capture_run_chunk(cfg, state, epoch_shift, packed_input):
        if "cfg" not in captured:
            captured.update(
                cfg=cfg,
                state=state,
                epoch_shift=epoch_shift,
                packed_input=np.asarray(packed_input),
            )
        return orig_run_chunk(cfg, state, epoch_shift, packed_input)

    frontend_2d.run_chunk = capture_run_chunk
    try:
        n = 0
        for m in measurements[: 4 * CHUNK]:
            n += len(builder.add_range_data("range", m))
        n += len(builder.flush())
    finally:
        frontend_2d.run_chunk = orig_run_chunk
    print(f"warm results: {n}")

    cfg = captured["cfg"]
    state = captured["state"]
    eps = jnp.float32(0.0)

    # (b) upload time (one flat uint8 buffer)
    host_input = captured["packed_input"]
    nbytes = host_input.nbytes
    for _ in range(2):
        staged = jax.device_put(host_input)
        staged.block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        staged = jax.device_put(host_input)
        staged.block_until_ready()
    up = (time.perf_counter() - t0) / reps
    print(f"upload: {nbytes/1e6:.2f} MB in {up*1e3:.1f} ms ({nbytes/up/1e6:.1f} MB/s)")

    # (a) device-only per-chunk time, total and per-stage
    def device_time(cfg_variant, reps=10):
        out = frontend_2d.run_chunk(cfg_variant, state, eps, staged)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        s = state
        outs = []
        for _ in range(reps):
            s, fin, op, pkd = frontend_2d.run_chunk(cfg_variant, s, eps, staged)
            outs.append(pkd)
        jax.block_until_ready((s, outs))
        return (time.perf_counter() - t0) / reps, pkd

    full_t, packed_out = device_time(cfg)
    print(f"device full chunk: {full_t*1e3:.1f} ms ({CHUNK/full_t:.0f} scans/s)")
    for stage in ("voxel", "adaptive", "match", "insert",
                  "voxel,adaptive", "voxel,adaptive,match,insert"):
        t, _ = device_time(dataclasses.replace(cfg, disable=stage))
        print(f"device without {stage:28s}: {t*1e3:6.1f} ms (stage ~{(full_t-t)*1e3:5.1f} ms)")
    alt = dataclasses.replace(cfg, use_band_matcher=not cfg.use_band_matcher)
    t, _ = device_time(alt)
    print(
        f"device full chunk with use_band_matcher={alt.use_band_matcher}: "
        f"{t*1e3:.1f} ms ({CHUNK/t:.0f} scans/s)"
    )

    # (c) fetch time (the full out_points stays on device — lazy)
    fetch_bytes = packed_out.nbytes
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(packed_out)
    ft = (time.perf_counter() - t0) / reps
    print(
        f"fetch: {fetch_bytes/1e6:.2f} MB in {ft*1e3:.1f} ms "
        f"({fetch_bytes/ft/1e6:.1f} MB/s)"
    )

    total = max(full_t, up + ft)
    print(
        f"pipeline bound: device {full_t*1e3:.1f} ms vs link {(up+ft)*1e3:.1f} ms "
        f"-> ~{CHUNK/total:.0f} scans/s"
    )


if __name__ == "__main__":
    main()
