"""3D occupancy grids as fixed-shape device arrays.

Reference: mapping/3d/hybrid_grid.h:66-545 — a 3-level sparse voxel tree with
15-bit probabilities, grow-by-doubling. Pointer trees are hostile to XLA; the
TPU representation is a **dense int8 log-odds volume** [D, H, W] with a fixed
extent centered on the submap origin:

* value 0  = unknown (matching probability MIN_PROBABILITY, prior p=0.5 on
  first update — probability_values.h semantics),
* value v in [-127, 127] = log-odds v/127 * MAX_LOG_ODDS (the clamp to
  p in [0.1, 0.9] is the int8 range itself).

The quantization step (~0.017 log-odds) is ~12x finer than the miss update
and ~80x finer than the reference's own update granularity requirements;
hit/miss updates are precomputed int8 deltas. A cell whose accumulated value
would reach exactly 0 is nudged to +-1 so the unknown sentinel stays
unambiguous.

IntensityHybridGrid (hybrid_grid.h:547-590) maps to two extra f16 volumes
(intensity sum + count) kept only while a submap is active.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cartographer_tpu.mapping import probability_values as pv

LOG_ODDS_SCALE = pv.MAX_LOG_ODDS / 127.0


def quantize_log_odds_delta(log_odds_delta: float) -> int:
    """Update delta in int8 steps (at least magnitude 1)."""
    q = int(round(log_odds_delta / LOG_ODDS_SCALE))
    if q == 0:
        q = 1 if log_odds_delta > 0 else -1
    return q


@struct.dataclass
class Grid3D:
    """Dense int8 log-odds volume (a jax pytree; `resolution` is static)."""

    values: jax.Array  # i8 [D, H, W] (z, y, x)
    origin: jax.Array  # f32 [3] world coords of voxel (0,0,0) min corner
    resolution: float = struct.field(pytree_node=False)

    @property
    def shape(self):
        return self.values.shape

    def probability(self) -> jax.Array:
        l = self.values.astype(jnp.float32) * LOG_ODDS_SCALE
        p = 1.0 / (1.0 + jnp.exp(-l))
        return jnp.where(self.values != 0, p, pv.MIN_PROBABILITY)

    def known(self) -> jax.Array:
        return self.values != 0


def make_grid_3d(center_xyz, resolution: float, grid_size: int) -> Grid3D:
    center = jnp.asarray(center_xyz, dtype=jnp.float32)
    half = 0.5 * grid_size * resolution
    return Grid3D(
        values=jnp.zeros((grid_size, grid_size, grid_size), jnp.int8),
        origin=center - half,
        resolution=resolution,
    )


def world_to_cell_3d(grid: Grid3D, points_xyz):
    return (points_xyz - grid.origin) / grid.resolution


def cell_index_3d(grid: Grid3D, points_xyz):
    """Reference GetCellIndex uses RoundToInt(p / resolution): voxel centers
    sit at integer multiples of the resolution. Voxel (i,j,k) is centered at
    origin + idx * res, so the index is round((p - origin) / res)."""
    return jnp.floor(world_to_cell_3d(grid, points_xyz) + 0.5).astype(jnp.int32)
