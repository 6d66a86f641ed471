"""3D submaps and the two-active-submaps scheme.

Reference: mapping/3d/submap_3d.h:43-140 and submap_3d.cc:199-354. A Submap3D
holds TWO grids (high/low resolution), an optional intensity grid, and an
accumulated rotational histogram rotated into the submap frame. Range data
is inserted in the SUBMAP frame (transform by local_pose^-1); the submap's
local pose is {origin translation, gravity alignment rotation}
(ActiveSubmaps3D::AddSubmap).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.common.config import SubmapsOptions3D
from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.mapping.hybrid_grid import (
    Grid3D,
    cell_index_3d,
    make_grid_3d,
    quantize_log_odds_delta,
)
from cartographer_tpu.mapping.paged_grid_3d import (
    PagedGrid3D,
    insert_scan_3d_paged,
    make_paged_grid_3d,
    to_dense,
)
from cartographer_tpu.ops import raycast_3d
from cartographer_tpu.ops.scan_matching import rotational_histogram
from cartographer_tpu.sensor.data import RangeData
from cartographer_tpu.transform import rigid3


def _pad_cells(cells: np.ndarray, minimum: int = 256):
    n = len(cells)
    size = minimum
    while size < n:
        size *= 2
    out = np.zeros((size, 3), np.int32)
    out[:n] = cells
    mask = np.zeros(size, bool)
    mask[:n] = True
    return out, mask


@dataclasses.dataclass
class Submap3D:
    local_pose: np.ndarray  # SE(3) (7,)
    high_resolution_grid: Grid3D  # or PagedGrid3D while building
    low_resolution_grid: Grid3D
    rotational_scan_matcher_histogram: np.ndarray
    intensity_sum: Optional[jnp.ndarray] = None
    intensity_count: Optional[jnp.ndarray] = None
    num_range_data: int = 0
    insertion_finished: bool = False

    def finish(self) -> None:
        # Paged building grids densify cropped to the occupied block
        # bounding box on finish — the form the BnB pyramid, constraint
        # refinement, and serialization consume (the reference's
        # PrecomputationGrid3D also materializes dense bounded volumes,
        # precomputation_grid_3d.cc:54-85).
        for name in ("high_resolution_grid", "low_resolution_grid"):
            grid = getattr(self, name)
            if not isinstance(grid, PagedGrid3D):
                continue
            dropped = int(grid.dropped)
            if dropped:
                from cartographer_tpu import metrics

                metrics.grid_oob_points.increment(dropped)
                import logging

                logging.getLogger(__name__).warning(
                    "paged 3D grid dropped %d write(s) (%s: pool full or "
                    "outside the virtual extent); raise the sparse_* "
                    "options", dropped, name,
                )
            setattr(self, name, to_dense(grid))
        self.insertion_finished = True


class ActiveSubmaps3D:
    def __init__(self, options: SubmapsOptions3D, use_intensities: bool = False):
        self._options = options
        self._use_intensities = use_intensities
        self._submaps: List[Submap3D] = []
        ins = options.range_data_inserter
        self._hit_delta = quantize_log_odds_delta(
            pv.hit_update_log_odds(ins.hit_probability)
        )
        self._miss_delta = quantize_log_odds_delta(
            pv.miss_update_log_odds(ins.miss_probability)
        )

    def submaps(self) -> List[Submap3D]:
        return list(self._submaps)

    def insert_data(
        self,
        range_data_in_local: RangeData,
        local_from_gravity_aligned: np.ndarray,  # quaternion
        scan_histogram_in_gravity: np.ndarray,
    ) -> List[Submap3D]:
        if (
            not self._submaps
            or self._submaps[-1].num_range_data == self._options.num_range_data
        ):
            self._add_submap(range_data_in_local.origin, local_from_gravity_aligned)
        for submap in self._submaps:
            self._insert_into(
                submap,
                range_data_in_local,
                local_from_gravity_aligned,
                scan_histogram_in_gravity,
            )
        if self._submaps[0].num_range_data == 2 * self._options.num_range_data:
            self._submaps[0].finish()
        return list(self._submaps)

    def _add_submap(self, origin: np.ndarray, local_from_gravity_aligned: np.ndarray) -> None:
        if len(self._submaps) == 2:
            self._submaps.pop(0)
        local_pose = rigid3.make(
            np.asarray(origin, np.float64), np.asarray(local_from_gravity_aligned)
        )
        o = self._options
        # Intensity grids are dense companions of the high grid, so the
        # intensity configuration keeps dense building grids.
        if o.sparse_grids and not self._use_intensities:
            high = make_paged_grid_3d(
                np.zeros(3, np.float32),
                o.high_resolution,
                block_bits=o.sparse_block_bits,
                table_size=o.sparse_high_table_size,
                pool_blocks=o.sparse_high_pool_blocks,
            )
            low = make_paged_grid_3d(
                np.zeros(3, np.float32),
                o.low_resolution,
                block_bits=o.sparse_block_bits,
                table_size=o.sparse_low_table_size,
                pool_blocks=o.sparse_low_pool_blocks,
            )
        else:
            high = make_grid_3d(
                np.zeros(3, np.float32),
                o.high_resolution,
                o.high_resolution_grid_size,
            )
            low = make_grid_3d(
                np.zeros(3, np.float32),
                o.low_resolution,
                o.low_resolution_grid_size,
            )
        submap = Submap3D(
            local_pose=local_pose,
            high_resolution_grid=high,
            low_resolution_grid=low,
            rotational_scan_matcher_histogram=np.zeros(
                len(self._submaps[0].rotational_scan_matcher_histogram)
                if self._submaps
                else 0,
                np.float32,
            ),
        )
        if self._use_intensities:
            shape = high.values.shape
            submap.intensity_sum = jnp.zeros(shape, jnp.float32)
            submap.intensity_count = jnp.zeros(shape, jnp.float32)
        self._submaps.append(submap)

    def _insert_into(
        self,
        submap: Submap3D,
        range_data_in_local: RangeData,
        local_from_gravity_aligned: np.ndarray,
        scan_histogram_in_gravity: np.ndarray,
    ) -> None:
        assert not submap.insertion_finished
        # Transform into the submap frame (submap_3d.cc InsertData).
        data = range_data_in_local.transform(rigid3.inverse(submap.local_pose))
        hits = data.returns.points
        origin = data.origin

        # High resolution: hits within high_resolution_max_range only.
        ranges = np.linalg.norm(hits - origin[None, :], axis=1)
        near = ranges <= self._options.high_resolution_max_range
        for grid_name, grid, pts in (
            ("high", submap.high_resolution_grid, hits[near]),
            ("low", submap.low_resolution_grid, hits),
        ):
            if len(pts) == 0:
                continue
            cells = np.floor(
                (pts - np.asarray(grid.origin)) / grid.resolution + 0.5
            ).astype(np.int32)
            origin_cell = np.floor(
                (origin - np.asarray(grid.origin)) / grid.resolution + 0.5
            ).astype(np.int32)
            cells_p, valid = _pad_cells(cells)
            if isinstance(grid, PagedGrid3D):
                new_grid = insert_scan_3d_paged(
                    grid,
                    jnp.asarray(origin_cell),
                    jnp.asarray(cells_p),
                    jnp.asarray(valid),
                    self._hit_delta,
                    self._miss_delta,
                    self._options.range_data_inserter.num_free_space_voxels,
                )
            else:
                new_values = raycast_3d.insert_scan_3d(
                    grid.values,
                    jnp.asarray(origin_cell),
                    jnp.asarray(cells_p),
                    jnp.asarray(valid),
                    self._hit_delta,
                    self._miss_delta,
                    self._options.range_data_inserter.num_free_space_voxels,
                )
                new_grid = Grid3D(
                    values=new_values,
                    origin=grid.origin,
                    resolution=grid.resolution,
                )
            if grid_name == "high":
                submap.high_resolution_grid = new_grid
            else:
                submap.low_resolution_grid = new_grid

        if (
            self._use_intensities
            and data.returns.intensities is not None
            and len(data.returns.intensities)
        ):
            thresh = self._options.range_data_inserter.intensity_threshold
            keep = (data.returns.intensities <= thresh) & near
            pts = hits[keep]
            grid = submap.high_resolution_grid
            cells = np.floor(
                (pts - np.asarray(grid.origin)) / grid.resolution
            ).astype(np.int32)
            cells_p, valid = _pad_cells(cells)
            intens = np.zeros(len(valid), np.float32)
            intens[: len(pts)] = data.returns.intensities[keep]
            submap.intensity_sum, submap.intensity_count = (
                raycast_3d.insert_intensities_3d(
                    submap.intensity_sum,
                    submap.intensity_count,
                    jnp.asarray(cells_p),
                    jnp.asarray(intens),
                    jnp.asarray(valid),
                )
            )

        submap.num_range_data += 1
        # Histogram accumulated in the submap frame (submap_3d.cc:289-294).
        yaw_in_submap_from_gravity = rigid3.get_yaw(
            rigid3.quat_multiply(
                rigid3.quat_conjugate(rigid3.quat(submap.local_pose)),
                np.asarray(local_from_gravity_aligned),
            )
        )
        if len(submap.rotational_scan_matcher_histogram) == 0:
            submap.rotational_scan_matcher_histogram = np.zeros_like(
                scan_histogram_in_gravity
            )
        submap.rotational_scan_matcher_histogram = (
            submap.rotational_scan_matcher_histogram
            + rotational_histogram.rotate_histogram(
                scan_histogram_in_gravity, float(yaw_in_submap_from_gravity)
            )
        )
