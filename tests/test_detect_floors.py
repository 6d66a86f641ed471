"""detect_floors at reference fidelity (mapping/detect_floors.cc:40-219):
altitude-jump slicing, short-span (stairs) folding into neighboring
levels, long-span-only floor heights, all-short levels dropped."""

import numpy as np
import pytest

from cartographer_tpu.mapping.detect_floors import (
    Floor,
    detect_floors,
)
from cartographer_tpu.transform import rigid3


def _walk(segments):
    """segments: list of (num_nodes, xy_step, z). Returns (times, poses)
    of a continuous walk; each node advances x by xy_step."""
    times, poses = [], []
    t, x = 0.0, 0.0
    for n, step, z in segments:
        for _ in range(n):
            times.append(t)
            poses.append(rigid3.translation(np.array([x, 0.0, z])))
            t += 1.0
            x += step
    return times, poses


class TestDetectFloorsReference:
    def test_two_floors_with_stairs_span(self):
        """Ground floor (30 m), a short stair climb, upper floor (30 m):
        two floors; the stairs piece is attached to BOTH neighbor levels'
        timespans, and floor heights come from the long spans only
        (detect_floors.cc:155-186)."""
        times, poses = _walk(
            [
                (50, 0.6, 0.0),  # 29.4 m at z=0 — long
                (5, 0.4, 4.0),  # 1.6 m at z=4 — short stairs piece
                (50, 0.6, 8.0),  # long at z=8
            ]
        )
        floors = detect_floors(times, poses)
        assert len(floors) == 2
        assert floors[0].z == pytest.approx(0.0, abs=0.01)
        assert floors[1].z == pytest.approx(8.0, abs=0.01)
        # Stairs timespan folded into both floors: 2 timespans each.
        assert len(floors[0].timespans) == 2
        assert len(floors[1].timespans) == 2
        # Coverage: the ground floor's spans cover nodes 0..54, the upper
        # floor's spans cover 50..104.
        assert floors[0].timespans[0].start == times[0]
        assert floors[0].timespans[-1].end == times[54]
        assert floors[1].timespans[0].start == times[50]
        assert floors[1].timespans[-1].end == times[104]

    def test_short_revisit_joins_existing_level(self):
        """A short span at the same altitude as a long span joins that
        level (its level already has a long piece) rather than being
        treated as stairs."""
        times, poses = _walk(
            [
                (50, 0.6, 0.0),  # long ground floor
                (4, 0.5, 3.0),  # short excursion
                (6, 0.5, 0.1),  # short revisit of the ground floor
            ]
        )
        floors = detect_floors(times, poses)
        assert len(floors) == 1
        assert floors[0].z == pytest.approx(0.0, abs=0.05)
        # Ground span + the excursion (attached once per adjacent span —
        # both neighbors are this level, so it appears twice, exactly as
        # the reference pushes it to LevelFind(i-1) and LevelFind(i+1),
        # detect_floors.cc:155-166) + revisit.
        assert len(floors[0].timespans) == 4
        starts = sorted(t.start for t in floors[0].timespans)
        assert starts == [times[0], times[50], times[50], times[54]]

    def test_all_short_spans_yield_no_floor(self):
        """A trajectory of only short spans has no reliable floor
        estimate: the reference drops all-short levels
        (detect_floors.cc:191-196)."""
        times, poses = _walk([(10, 0.2, 0.0), (10, 0.2, 4.0)])
        assert detect_floors(times, poses) == []

    def test_nearby_levels_merge(self):
        """Spans whose median z differs by < 1 m union into one level
        (kMinLevelSeparationMeters, detect_floors.cc:117-128)."""
        times, poses = _walk(
            [
                (50, 0.6, 0.0),
                (5, 0.4, 4.0),  # jump forces a new span
                (50, 0.6, 0.6),  # back within 1 m of the first level
            ]
        )
        floors = detect_floors(times, poses)
        assert len(floors) == 1
        assert -0.1 < floors[0].z < 0.7

    def test_running_median_slicing(self):
        """A slow drift within the level height does NOT split the span
        (slicing compares against the running median, not the previous
        node)."""
        times, poses = [], []
        t = 0.0
        for i in range(80):
            times.append(t)
            # Drift 0..2.0 m over 48 m of travel: never further than
            # kLevelHeightMeters from the running median.
            poses.append(
                rigid3.translation(np.array([i * 0.6, 0.0, i * 0.025]))
            )
            t += 1.0
        floors = detect_floors(times, poses)
        assert len(floors) == 1
        assert len(floors[0].timespans) == 1
