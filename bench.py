"""Benchmark: 2D local-SLAM matching throughput (scans/sec/chip).

Measures the steady-state device throughput of the flagship hot path — one
Gauss-Newton scan match (20 LM iterations, bicubic grid interpolation)
against a 1024x1024 probability grid followed by ray-cast insertion into the
two active submaps — on realistic shapes (512-point filtered scans, 5 cm
resolution, trajectory_builder_2d.lua defaults).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is a documented estimate of the reference's CPU local-SLAM rate
(~100 scans/sec/core for comparable 2D settings, i.e. ~10 ms/scan for
match+insert on a desktop core — consistent with its real-time claim at
5-20x margin on Revo LDS data). BASELINE.md's target is >=5x this.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_CPU_SCANS_PER_SEC = 100.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cartographer_tpu.ops import raycast_2d
    from cartographer_tpu.ops.scan_matching import gauss_newton_2d

    H = W = 1024
    N = 512
    RES = 0.05
    NUM_STEPS = 64  # rays sampled per scan segment bucket

    def step(log_odds, known, origin, initial_pose, points, point_mask):
        """One local-SLAM device step: match + insert into 2 submaps."""
        prob = jnp.where(known[0], 1.0 / (1.0 + jnp.exp(-log_odds[0])), 0.1)
        cost = 1.0 - prob
        pose, _ = gauss_newton_2d.match.__wrapped__(
            cost, origin[0], initial_pose, initial_pose[:2], points, point_mask,
            RES, 1.0, 10.0, 40.0, 20,
        )
        c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
        world = jnp.stack(
            [
                c * points[:, 0] - s * points[:, 1] + pose[0],
                s * points[:, 0] + c * points[:, 1] + pose[1],
            ],
            axis=-1,
        )
        origin_cell = (pose[:2][None, :] - origin) / RES
        ends_cell = (world[None, :, :] - origin[:, None, :]) / RES
        new_lo, new_known = jax.vmap(
            raycast_2d.insert_scan.__wrapped__,
            in_axes=(0, 0, 0, 0, None, None, None, None, None, None),
        )(
            log_odds, known, origin_cell, ends_cell,
            jnp.ones(N, bool), point_mask,
            0.2006707, -0.04000533, NUM_STEPS, True,
        )
        return pose, new_lo, new_known

    step_jit = jax.jit(step, donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    angles = np.linspace(0, 2 * np.pi, N, endpoint=False)
    pts = (8.0 + 1.5 * np.sin(3 * angles))[:, None] * np.stack(
        [np.cos(angles), np.sin(angles)], axis=-1
    )
    log_odds = jnp.zeros((2, H, W), jnp.float32)
    known = jnp.zeros((2, H, W), bool)
    origin = jnp.asarray([[-25.6, -25.6], [-20.0, -25.6]], jnp.float32)
    initial_pose = jnp.asarray([0.02, -0.01, 0.005], jnp.float32)
    points = jnp.asarray(pts, jnp.float32)
    point_mask = jnp.ones(N, bool)

    # Warmup / compile.
    pose, log_odds, known = step_jit(
        log_odds, known, origin, initial_pose, points, point_mask
    )
    pose.block_until_ready()

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        pose, log_odds, known = step_jit(
            log_odds, known, origin, initial_pose, points, point_mask
        )
    pose.block_until_ready()
    dt = time.perf_counter() - t0
    scans_per_sec = iters / dt

    print(
        json.dumps(
            {
                "metric": "local_slam_2d_scans_per_sec_per_chip",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / REFERENCE_CPU_SCANS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
