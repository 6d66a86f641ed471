"""Block-sparse (paged) 3D grid: insertion/read/match parity vs the
dense path, extent beyond any dense configuration, overflow
observability, and finish-time densification.

Model: mapping/3d/hybrid_grid_test.cc (set/get/growth semantics) plus the
range_data_inserter_3d.cc update rules the dense kernel already encodes."""

import numpy as np
import pytest
import jax.numpy as jnp

from cartographer_tpu.common.config import (
    SubmapsOptions3D,
)
from cartographer_tpu.mapping import paged_grid_3d as pg
from cartographer_tpu.mapping.hybrid_grid import make_grid_3d
from cartographer_tpu.mapping.submap_3d import ActiveSubmaps3D
from cartographer_tpu.ops import raycast_3d
from cartographer_tpu.sensor.data import PointCloud, RangeData


def random_scan(rng, n=200, spread=5.0):
    pts = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    return pts


class TestPagedInsertParity:
    def test_matches_dense_insert(self):
        rng = np.random.default_rng(0)
        res = 0.2
        dense = make_grid_3d(np.zeros(3), res, 64)  # +-6.4 m
        paged = pg.make_paged_grid_3d(
            np.zeros(3), res, block_bits=3, table_size=8, pool_blocks=512
        )  # same virtual extent: 8*8=64 cells
        origin_cell = np.array([32, 32, 32], np.int32)
        for _ in range(3):
            pts = random_scan(rng, 150, 5.5)
            cells = np.floor(pts / res + 32.5).astype(np.int32)
            valid = np.ones(len(cells), bool)
            dense_vals = raycast_3d.insert_scan_3d(
                dense.values,
                jnp.asarray(origin_cell),
                jnp.asarray(cells),
                jnp.asarray(valid),
                12,
                -5,
                num_free_space_voxels=2,
            )
            dense = dense.replace(values=dense_vals)
            paged = pg.insert_scan_3d_paged(
                paged,
                jnp.asarray(origin_cell),
                jnp.asarray(cells),
                jnp.asarray(valid),
                12,
                -5,
                num_free_space_voxels=2,
            )
        assert int(paged.dropped) == 0
        # Cell-exact parity on the full extent.
        zi, yi, xi = np.meshgrid(
            np.arange(64), np.arange(64), np.arange(64), indexing="ij"
        )
        paged_vals = np.asarray(
            pg.gather_values(
                paged,
                jnp.asarray(zi.ravel()),
                jnp.asarray(yi.ravel()),
                jnp.asarray(xi.ravel()),
            )
        ).reshape(64, 64, 64)
        np.testing.assert_array_equal(paged_vals, np.asarray(dense_vals))
        # Probability reads agree too (shared matcher helper).
        p_paged = np.asarray(
            pg.gather_probability(
                paged, jnp.asarray(zi.ravel()), jnp.asarray(yi.ravel()),
                jnp.asarray(xi.ravel()),
            )
        )
        p_dense = np.asarray(
            pg.gather_probability(
                dense.values, jnp.asarray(zi.ravel()),
                jnp.asarray(yi.ravel()), jnp.asarray(xi.ravel()),
            )
        )
        np.testing.assert_allclose(p_paged, p_dense, rtol=1e-6)

    def test_to_dense_crops_to_content(self):
        res = 0.1
        paged = pg.make_paged_grid_3d(
            np.zeros(3), res, block_bits=4, table_size=64, pool_blocks=64
        )
        # One hit far from the center: virtual extent is 1024 cells
        # (+-51.2 m), far beyond any dense config at this resolution.
        cell = np.array([[700, 300, 512]], np.int32)
        paged = pg.insert_scan_3d_paged(
            paged,
            jnp.asarray([512, 512, 512], np.int32),
            jnp.asarray(cell),
            jnp.asarray([True]),
            12,
            -5,
            num_free_space_voxels=1,
        )
        dense = pg.to_dense(paged)
        assert int(paged.num_blocks) >= 1
        # The dense crop is tiny (a few blocks), not 1024^3.
        assert max(dense.values.shape) <= 64
        # The hit cell reads back through the cropped grid.
        world = np.asarray(paged.origin) + cell[0] * res
        ci = np.floor(
            (world - np.asarray(dense.origin)) / res + 0.5
        ).astype(int)
        assert dense.values[ci[2], ci[1], ci[0]] == 12

    def test_pool_overflow_is_observable(self):
        res = 0.1
        paged = pg.make_paged_grid_3d(
            np.zeros(3), res, block_bits=3, table_size=16, pool_blocks=2
        )
        rng = np.random.default_rng(1)
        cells = rng.integers(0, 128, (200, 3)).astype(np.int32)
        paged = pg.insert_scan_3d_paged(
            paged,
            jnp.asarray([64, 64, 64], np.int32),
            jnp.asarray(cells),
            jnp.ones(200, bool),
            12,
            -5,
            num_free_space_voxels=0,
        )
        assert int(paged.num_blocks) == 2
        assert int(paged.dropped) > 0

    def test_out_of_extent_is_observable(self):
        res = 0.1
        paged = pg.make_paged_grid_3d(
            np.zeros(3), res, block_bits=3, table_size=4, pool_blocks=8
        )
        cells = np.array([[1000, 0, 0]], np.int32)  # outside 32-cell extent
        paged = pg.insert_scan_3d_paged(
            paged,
            jnp.asarray([16, 16, 16], np.int32),
            jnp.asarray(cells),
            jnp.asarray([True]),
            12,
            -5,
            num_free_space_voxels=0,
        )
        assert int(paged.dropped) >= 1


class TestActiveSubmapsPaged:
    def test_sparse_submaps_finish_dense(self):
        opts = SubmapsOptions3D(
            num_range_data=2,
            high_resolution=0.2,
            low_resolution=0.8,
            sparse_grids=True,
            sparse_block_bits=3,
            sparse_high_table_size=16,
            sparse_high_pool_blocks=512,
            sparse_low_table_size=8,
            sparse_low_pool_blocks=256,
        )
        active = ActiveSubmaps3D(opts)
        rng = np.random.default_rng(2)
        finished = []
        for i in range(6):
            pts = random_scan(rng, 120, 6.0) + np.array([0.1 * i, 0, 0])
            rd = RangeData(
                origin=np.array([0.1 * i, 0.0, 0.0], np.float32),
                returns=PointCloud(pts),
                misses=PointCloud(np.zeros((0, 3), np.float32)),
            )
            submaps = active.insert_data(
                rd, np.array([1.0, 0, 0, 0]), np.zeros(8, np.float32)
            )
            finished.extend(s for s in submaps if s.insertion_finished)
        assert finished, "no submap finished"
        s = finished[0]
        # Finished grids are dense and cropped (have .values).
        assert hasattr(s.high_resolution_grid, "values")
        assert hasattr(s.low_resolution_grid, "values")
        assert np.asarray(s.high_resolution_grid.values).any()

    def test_sparse_matches_dense_end_to_end(self):
        rng = np.random.default_rng(3)
        scans = [random_scan(rng, 100, 5.0) for _ in range(4)]

        def run(sparse):
            opts = SubmapsOptions3D(
                num_range_data=2,
                high_resolution=0.2,
                low_resolution=0.8,
                high_resolution_grid_size=64,
                low_resolution_grid_size=32,
                sparse_grids=sparse,
                sparse_block_bits=3,
                sparse_high_table_size=8,   # same 64-cell extent as dense
                sparse_high_pool_blocks=512,
                sparse_low_table_size=4,
                sparse_low_pool_blocks=64,
            )
            active = ActiveSubmaps3D(opts)
            out = None
            for pts in scans:
                rd = RangeData(
                    origin=np.zeros(3, np.float32),
                    returns=PointCloud(pts),
                    misses=PointCloud(np.zeros((0, 3), np.float32)),
                )
                submaps = active.insert_data(
                    rd, np.array([1.0, 0, 0, 0]), np.zeros(8, np.float32)
                )
                for s in submaps:
                    if s.insertion_finished:
                        out = s
            return out

        dense_s = run(False)
        sparse_s = run(True)
        assert dense_s is not None and sparse_s is not None
        dv = np.asarray(dense_s.high_resolution_grid.values)
        sg = sparse_s.high_resolution_grid
        sv = np.asarray(sg.values)
        # The sparse finished grid is a crop of the dense one: compare on
        # the crop's extent.
        off = np.round(
            (np.asarray(sg.origin) - np.asarray(
                dense_s.high_resolution_grid.origin
            )) / 0.2
        ).astype(int)
        dcrop = dv[
            off[2]: off[2] + sv.shape[0],
            off[1]: off[1] + sv.shape[1],
            off[0]: off[0] + sv.shape[2],
        ]
        np.testing.assert_array_equal(sv, dcrop)
        # And nothing outside the crop is non-zero in the dense grid.
        total_dense = int((dv != 0).sum())
        total_sparse = int((sv != 0).sum())
        assert total_dense == total_sparse
