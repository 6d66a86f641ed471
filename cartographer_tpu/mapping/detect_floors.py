"""Multi-storey floor segmentation (reference: mapping/detect_floors.cc).

Segments a trajectory into floors by clustering node z values: spans of
consecutive nodes whose z stays within a window belong to one floor; floors
are merged by their median z.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from cartographer_tpu.common.time import Time

# Reference constants (detect_floors.cc).
MAX_SHORT_SPAN_LENGTH_METERS = 25.0
LEVEL_HEIGHT_METERS = 2.5
MIN_LEVEL_SEPARATION_METERS = 1.0


@dataclasses.dataclass
class Timespan:
    start: Time
    end: Time


@dataclasses.dataclass
class Floor:
    timespans: List[Timespan]
    z: float


def detect_floors(node_times: List[Time], node_poses: List[np.ndarray]) -> List[Floor]:
    """node_poses: SE(3) (7,) per node, time-ordered."""
    if not node_times:
        return []
    zs = np.array([p[2] for p in node_poses])
    times = np.array(node_times)

    # Split into spans of similar z.
    spans = []  # (start_idx, end_idx inclusive)
    start = 0
    for i in range(1, len(zs)):
        if abs(zs[i] - np.median(zs[start:i])) > LEVEL_HEIGHT_METERS / 2.0:
            spans.append((start, i - 1))
            start = i
    spans.append((start, len(zs) - 1))

    # Merge spans into floors by median z.
    floors: List[Floor] = []
    for s, e in spans:
        z = float(np.median(zs[s : e + 1]))
        placed = False
        for floor in floors:
            if abs(floor.z - z) < MIN_LEVEL_SEPARATION_METERS:
                floor.timespans.append(Timespan(times[s], times[e]))
                floor.z = (floor.z + z) / 2.0
                placed = True
                break
        if not placed:
            floors.append(Floor(timespans=[Timespan(times[s], times[e])], z=z))
    floors.sort(key=lambda f: f.z)
    return floors
