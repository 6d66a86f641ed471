"""2D truncated signed distance field grid.

Reference: mapping/internal/2d/tsdf_2d.h (two uint16 grids: TSD + weight via
TSDValueConverter). TPU representation: float32 tsd + float32 weight arrays
with fixed extent (same layout as grid_2d.Grid2D); weight == 0 marks unknown.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TSDF2D:
    tsd: jax.Array  # f32 [H, W] signed distance, clamped to +-truncation
    weight: jax.Array  # f32 [H, W], 0 = unknown
    origin: jax.Array  # f32 [2]
    resolution: float = struct.field(pytree_node=False)
    truncation_distance: float = struct.field(pytree_node=False)
    max_weight: float = struct.field(pytree_node=False)

    @property
    def size(self) -> int:
        return self.tsd.shape[0]

    def known(self) -> jax.Array:
        return self.weight > 0.0

    def probability(self) -> jax.Array:
        """Score-grid view for correlative matching: the reference scores
        TSDF cells as (max_cost - |tsd|) / max_cost
        (real_time_correlative_scan_matcher_2d.cc ComputeCandidateScore),
        mapped into the probability range [0.1, 0.9] so the correlative and
        BnB kernels work unchanged; unknown cells -> 0.1."""
        score = 1.0 - jnp.abs(self.tsd) / self.truncation_distance
        return jnp.where(self.weight > 0.0, 0.1 + 0.8 * score, 0.1)


def make_tsdf(center_xy, resolution: float, grid_size: int,
              truncation_distance: float, max_weight: float) -> TSDF2D:
    center = jnp.asarray(center_xy, dtype=jnp.float32)
    half = 0.5 * grid_size * resolution
    return TSDF2D(
        tsd=jnp.full((grid_size, grid_size), truncation_distance, jnp.float32),
        weight=jnp.zeros((grid_size, grid_size), jnp.float32),
        origin=center - half,
        resolution=resolution,
        truncation_distance=truncation_distance,
        max_weight=max_weight,
    )
