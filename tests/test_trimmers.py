"""OverlappingSubmapsTrimmer2D unit tests through the Trimmable surface.

Reference: internal/2d/overlapping_submaps_trimmer_2d_test.cc with
mapping/internal/testing/fake_trimmable.h — the trimmer must work through
the Trimmable interface only (get_optimized_submap_data / trim_submap),
never pose-graph privates.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.mapping import probability_values as pv
from cartographer_tpu.mapping.grid_2d import Grid2D
from cartographer_tpu.mapping.id import SubmapId
from cartographer_tpu.mapping.trimmers import OverlappingSubmapsTrimmer2D


@dataclasses.dataclass
class _FakeSubmap:
    grid: Grid2D
    local_pose: np.ndarray


class FakeTrimmable:
    def __init__(self, submap_data):
        self._submap_data = submap_data
        self.trimmed = []

    def get_optimized_submap_data(self):
        return list(self._submap_data)

    def trim_submap(self, submap_id):
        self.trimmed.append(submap_id)


def _submap_covering(x0, y0, w, h, resolution=0.1, size=64):
    """A submap whose known cells cover the world rectangle
    [x0, x0+w] x [y0, y0+h] (identity local/global pose)."""
    log_odds = np.zeros((size, size), np.float32)
    known = np.zeros((size, size), bool)
    i0, j0 = int(round(y0 / resolution)), int(round(x0 / resolution))
    known[i0 : i0 + int(h / resolution), j0 : j0 + int(w / resolution)] = True
    log_odds[known] = pv.MAX_LOG_ODDS
    grid = Grid2D(
        log_odds=jnp.asarray(log_odds),
        known=jnp.asarray(known),
        origin=jnp.zeros(2, jnp.float32),
        resolution=resolution,
    )
    return _FakeSubmap(grid=grid, local_pose=np.zeros(3))


def test_trims_fully_overlapped_stale_submaps():
    # Four identical submaps stacked on the same 2x2 m area, plus one
    # covering a disjoint area. With fresh_submaps_count=2, only the two
    # NEWEST of the stack keep coverage; the two oldest fall below
    # min_covered_area and are trimmed. The disjoint one survives.
    stack = [
        (SubmapId(0, i), _submap_covering(0.4, 0.4, 2.0, 2.0), np.zeros(3))
        for i in range(4)
    ]
    elsewhere = (
        SubmapId(0, 4),
        _submap_covering(4.0, 4.0, 2.0, 2.0),
        np.zeros(3),
    )
    trimmable = FakeTrimmable(stack + [elsewhere])
    trimmer = OverlappingSubmapsTrimmer2D(
        fresh_submaps_count=2,
        min_covered_area=1.0,
        min_added_submaps_count=0,
    )
    trimmer.trim(trimmable)
    assert trimmable.trimmed == [SubmapId(0, 0), SubmapId(0, 1)]


def test_keeps_everything_below_added_submap_threshold():
    stack = [
        (SubmapId(0, i), _submap_covering(0.4, 0.4, 2.0, 2.0), np.zeros(3))
        for i in range(4)
    ]
    trimmable = FakeTrimmable(stack)
    trimmer = OverlappingSubmapsTrimmer2D(
        fresh_submaps_count=2,
        min_covered_area=1.0,
        min_added_submaps_count=10,
    )
    trimmer.trim(trimmable)
    assert trimmable.trimmed == []


def test_partial_overlap_keeps_enough_fresh_area():
    # Submap 0 covers a 2x2 m area; submaps 1..3 cover only its right
    # half. Submap 0 keeps >= 1 m^2 of freshest-2 coverage (its left
    # half) and survives; submap 1 is fully shadowed by the two fresher
    # identical submaps (2, 3) and is trimmed.
    data = [
        (SubmapId(0, 0), _submap_covering(0.4, 0.4, 2.0, 2.0), np.zeros(3))
    ] + [
        (SubmapId(0, i), _submap_covering(1.4, 0.4, 1.0, 2.0), np.zeros(3))
        for i in range(1, 4)
    ]
    trimmable = FakeTrimmable(data)
    trimmer = OverlappingSubmapsTrimmer2D(
        fresh_submaps_count=2,
        min_covered_area=1.0,
        min_added_submaps_count=0,
    )
    trimmer.trim(trimmable)
    assert trimmable.trimmed == [SubmapId(0, 1)]
