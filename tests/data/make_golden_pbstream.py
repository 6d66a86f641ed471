"""Generate tests/data/reference_golden_mini.pbstream byte-for-byte per
the REFERENCE writer's format — independently of cartographer_tpu's own
serialization stack.

Every byte is assembled here from first principles:
  * container framing per io/proto_stream.cc:26-97 (8-byte little-endian
    magic 0x7b1d1f7b5bf501db, then per record a little-endian uint64
    compressed size followed by gzip data);
  * protobuf payloads hand-encoded with a local varint/wire writer using
    the reference's field numbers (mapping/proto/serialization.proto,
    pose_graph.proto, trajectory.proto, submap.proto, grid_2d.proto,
    trajectory_node_data.proto, sensor/proto/sensor.proto,
    transform/proto/transform.proto) in the reference's write order
    (io/internal/mapping_state_serialization.cc:28-237);
  * grid cells per mapping/2d/map_limits.h:69-82 (flat index
    num_x_cells * cell.y + cell.x, world center
    (max.x - res*(cy+0.5), max.y - res*(cx+0.5))) and
    probability_values.h:32-44 (value = round((clamp(cost)-0.1) *
    32766/0.8) + 1, 0 = unknown);
  * compressed point clouds per sensor/compressed_point_cloud.cc:99-147
    (1 mm raster, 10-bit block-relative packing).

Run from the repo root:  python tests/data/make_golden_pbstream.py
"""

from __future__ import annotations

import gzip
import os
import struct

MAGIC = 0x7B1D1F7B5BF501DB

# -- minimal protobuf wire encoder -------------------------------------------


def _varint(value: int) -> bytes:
    if value < 0:
        value += 1 << 64  # two's complement, 10 bytes
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def f_varint(field: int, value: int) -> bytes:
    return _varint(field << 3 | 0) + _varint(value)


def f_double(field: int, value: float) -> bytes:
    return _varint(field << 3 | 1) + struct.pack("<d", value)


def f_float(field: int, value: float) -> bytes:
    return _varint(field << 3 | 5) + struct.pack("<f", value)


def f_bytes(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def f_packed_varints(field: int, values) -> bytes:
    body = b"".join(_varint(v) for v in values)
    return f_bytes(field, body)


def f_packed_floats(field: int, values) -> bytes:
    body = b"".join(struct.pack("<f", v) for v in values)
    return f_bytes(field, body)


# -- reference message builders ----------------------------------------------


def vector3d(x, y, z) -> bytes:
    out = b""
    if x:
        out += f_double(1, x)
    if y:
        out += f_double(2, y)
    if z:
        out += f_double(3, z)
    return out


def quaterniond(x, y, z, w) -> bytes:
    out = b""
    if x:
        out += f_double(1, x)
    if y:
        out += f_double(2, y)
    if z:
        out += f_double(3, z)
    if w:
        out += f_double(4, w)
    return out


def rigid3d(tx, ty, tz, qw=1.0, qx=0.0, qy=0.0, qz=0.0) -> bytes:
    return f_bytes(1, vector3d(tx, ty, tz)) + f_bytes(
        2, quaterniond(qx, qy, qz, qw)
    )


def cost_to_value(cost: float) -> int:
    """probability_values.h CorrespondenceCostToValue."""
    cost = min(max(cost, 0.1), 0.9)
    return int(round((cost - 0.1) * (32766.0 / 0.8))) + 1


def compressed_cloud(points) -> bytes:
    """sensor/compressed_point_cloud.cc block encoding (single block
    assumed — callers pass nearby points)."""
    ints = []
    rasters = []
    block = None
    for p in points:
        r = [int(round(c / 0.001)) for c in p]
        b = [c >> 10 for c in r]
        if block is None:
            block = b
        assert b == block, "test points must share one block"
        rasters.append([c & 0x3FF for c in r])
    ints.append(len(rasters))
    ints.extend(block)
    for r in rasters:
        ints.append(((r[2] << 10) + r[1] << 10) + r[0])
    return f_varint(1, len(points)) + f_packed_varints(3, ints)


# -- golden content -----------------------------------------------------------

TICKS_OFFSET = 719162 * 24 * 3600 * 10_000_000  # common/time.h epoch shift
NODE0_TICKS = TICKS_OFFSET + 1_234_567_890
NODE1_TICKS = NODE0_TICKS + 3_000_000  # +0.3 s

# Grid geometry: distinct dims to catch transposition bugs.
RES = 0.05
MAX_X, MAX_Y = 2.0, 3.0
NUM_X_CELLS, NUM_Y_CELLS = 4, 3
# (cell_x, cell_y, probability): flat = NUM_X_CELLS * cy + cx; world
# center = (MAX_X - RES*(cy+0.5), MAX_Y - RES*(cx+0.5)).
KNOWN_CELLS = [(0, 0, 0.35), (1, 2, 0.75)]

SUBMAP_POSE = (1.0, 2.0, 0.0)
NODE0_POSE = (0.5, 0.5, 0.0)
NODE1_POSE = (1.5, 0.5, 0.0)
CLOUD = [(0.1, 0.2, 0.0), (0.11, 0.19, 0.0)]


def build_records():
    records = []

    # 1. SerializationHeader {format_version = 2}.
    records.append(f_varint(1, 2))

    # 2. SerializedData{pose_graph}: trajectory poses + one constraint.
    trajectory = (
        f_varint(3, 0)  # trajectory_id
        + f_bytes(  # node 0
            1,
            f_varint(7, 0)
            + f_varint(1, NODE0_TICKS)
            + f_bytes(5, rigid3d(*NODE0_POSE)),
        )
        + f_bytes(  # node 1
            1,
            f_varint(7, 1)
            + f_varint(1, NODE1_TICKS)
            + f_bytes(5, rigid3d(*NODE1_POSE)),
        )
        + f_bytes(  # submap 0
            2, f_varint(2, 0) + f_bytes(1, rigid3d(*SUBMAP_POSE))
        )
    )
    constraint = (
        f_bytes(1, f_varint(1, 0) + f_varint(2, 0))  # submap_id {0, 0}
        + f_bytes(2, f_varint(1, 0) + f_varint(2, 0))  # node_id {0, 0}
        + f_bytes(3, rigid3d(-0.5, -1.5, 0.0))  # relative pose
        + f_double(6, 1.1e2)
        + f_double(7, 1.6e4)
        # tag INTRA_SUBMAP = 0 (proto3 default, omitted on the wire)
    )
    pose_graph = f_bytes(2, constraint) + f_bytes(4, trajectory)
    records.append(f_bytes(1, pose_graph))

    # 3. SerializedData{all_trajectory_builder_options}: carried opaquely
    # by the loader; a minimal valid message body.
    records.append(f_bytes(2, b""))

    # 4. SerializedData{submap}: one finished 2D probability-grid submap.
    cells = [0] * (NUM_X_CELLS * NUM_Y_CELLS)
    for cx, cy, p in KNOWN_CELLS:
        cells[NUM_X_CELLS * cy + cx] = cost_to_value(1.0 - p)
    xs = [c[0] for c in KNOWN_CELLS]
    ys = [c[1] for c in KNOWN_CELLS]
    grid = (
        f_bytes(  # MapLimits
            1,
            f_double(1, RES)
            + f_bytes(2, f_double(1, MAX_X) + f_double(2, MAX_Y))
            + f_bytes(3, f_varint(1, NUM_X_CELLS) + f_varint(2, NUM_Y_CELLS)),
        )
        + f_packed_varints(2, cells)
        + f_bytes(  # known_cells_box
            3,
            f_varint(1, max(xs)) + f_varint(2, max(ys))
            + f_varint(3, min(xs)) + f_varint(4, min(ys)),
        )
        + f_bytes(4, b"")  # probability_grid_2d marker
        + f_float(6, 0.1)
        + f_float(7, 0.9)
    )
    submap_2d = (
        f_bytes(1, rigid3d(*SUBMAP_POSE))
        + f_varint(2, 10)
        + f_varint(3, 1)  # finished
        + f_bytes(4, grid)
    )
    submap = f_bytes(1, f_varint(1, 0) + f_varint(2, 0)) + f_bytes(
        2, submap_2d
    )
    records.append(f_bytes(3, submap))

    # 5. SerializedData{node} x2.
    for index, ticks, pose in (
        (0, NODE0_TICKS, NODE0_POSE),
        (1, NODE1_TICKS, NODE1_POSE),
    ):
        node_data = (
            f_varint(1, ticks)
            + f_bytes(2, quaterniond(0.0, 0.0, 0.0, 1.0))
            + f_bytes(3, compressed_cloud(CLOUD))
            + f_packed_floats(6, [])
            + f_bytes(7, rigid3d(*pose))
        )
        node = f_bytes(
            1, f_varint(1, 0) + f_varint(2, index)
        ) + f_bytes(5, node_data)
        records.append(f_bytes(4, node))

    return records


def main() -> None:
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "reference_golden_mini.pbstream",
    )
    with open(out_path, "wb") as f:
        f.write(struct.pack("<Q", MAGIC))
        for record in build_records():
            # mtime=0 + fixed compresslevel keep the golden reproducible.
            compressed = gzip.compress(record, compresslevel=9, mtime=0)
            f.write(struct.pack("<Q", len(compressed)))
            f.write(compressed)
    print(f"wrote {out_path} ({os.path.getsize(out_path)} bytes)")


if __name__ == "__main__":
    main()
