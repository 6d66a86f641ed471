"""2D occupancy grids as fixed-shape device arrays.

Reference: mapping/2d/grid_2d.h:38-128 (dense uint16 correspondence-cost grid
with dynamic GrowLimits) and mapping/2d/probability_grid.h.

TPU-native design: a grid is a **fixed-extent** float32 log-odds array plus a
known-cell mask, centered on the submap origin (config grid_size cells). XLA
needs static shapes; the reference's grow-by-doubling becomes pre-allocation
(the submap extent is effectively bounded anyway by num_range_data and max
range). Cell (iy, ix) covers world [origin + (ix, iy)*res, +res). Points
outside the fixed extent are dropped with a mask (a behavioral deviation from
the reference that only matters if a submap out-runs its configured extent).

Unknown cells have log_odds == 0 AND known == False; their matching
probability is MIN_PROBABILITY (probability_values.h: unknown value 0 maps to
max correspondence cost).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cartographer_tpu.mapping import probability_values as pv


@struct.dataclass
class Grid2D:
    """Probability grid state (a jax pytree; `resolution` is static)."""

    log_odds: jax.Array  # f32 [H, W]
    known: jax.Array  # bool [H, W]
    origin: jax.Array  # f32 [2] world coords of cell (0, 0) min corner
    resolution: float = struct.field(pytree_node=False)

    @property
    def size(self) -> int:
        return self.log_odds.shape[0]

    def probability(self) -> jax.Array:
        """Per-cell matching probability; unknown cells -> MIN_PROBABILITY."""
        p = 1.0 / (1.0 + jnp.exp(-self.log_odds))
        return jnp.where(self.known, p, pv.MIN_PROBABILITY)

    def correspondence_cost(self) -> jax.Array:
        return 1.0 - self.probability()


def make_grid(center_xy, resolution: float, grid_size: int) -> Grid2D:
    """Fresh unknown grid centered on `center_xy` (world meters)."""
    center = jnp.asarray(center_xy, dtype=jnp.float32)
    half = 0.5 * grid_size * resolution
    origin = center - half
    return Grid2D(
        log_odds=jnp.zeros((grid_size, grid_size), jnp.float32),
        known=jnp.zeros((grid_size, grid_size), bool),
        origin=origin,
        resolution=resolution,
    )


def world_to_cell(grid: Grid2D, points_xy):
    """World (..., 2) -> fractional cell coordinates (..., 2) as (cx, cy)."""
    return (points_xy - grid.origin) / grid.resolution


def cell_center_world(grid: Grid2D, ix, iy):
    return grid.origin + (jnp.stack([ix, iy], axis=-1) + 0.5) * grid.resolution


@dataclasses.dataclass
class CroppedGrid:
    """Host-side crop of the known region (for rendering/serialization)."""

    probability: np.ndarray  # [h, w]
    known: np.ndarray  # [h, w]
    origin: np.ndarray  # [2]
    resolution: float
    offset_yx: tuple


def compute_cropped(grid: Grid2D) -> CroppedGrid:
    """Crop to the bounding box of known cells (Grid2D::ComputeCroppedLimits)."""
    known = np.asarray(grid.known)
    prob = np.asarray(grid.probability())
    ys, xs = np.nonzero(known)
    if len(ys) == 0:
        return CroppedGrid(
            probability=np.zeros((0, 0), np.float32),
            known=np.zeros((0, 0), bool),
            origin=np.asarray(grid.origin),
            resolution=grid.resolution,
            offset_yx=(0, 0),
        )
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    origin = np.asarray(grid.origin) + np.array([x0, y0]) * grid.resolution
    return CroppedGrid(
        probability=prob[y0:y1, x0:x1],
        known=known[y0:y1, x0:x1],
        origin=origin,
        resolution=grid.resolution,
        offset_yx=(int(y0), int(x0)),
    )
