"""pbstream CLI (reference: io/pbstream_main.cc:25 — `pbstream info|migrate`).

Usage:
    python -m cartographer_tpu.tools.pbstream_main info <file.pbstream>
    python -m cartographer_tpu.tools.pbstream_main migrate <in> <out>
"""

from __future__ import annotations

import argparse
import json
import sys


def info(path: str) -> None:
    from cartographer_tpu.io.serialization import pbstream_info

    with open(path, "rb") as f:
        state = f.read()
    print(json.dumps(pbstream_info(state), indent=2))


def migrate(in_path: str, out_path: str) -> None:
    """Version migration (io/serialization_format_migration.cc analog).
    Currently rewrites any supported version to the latest container."""
    from cartographer_tpu.io.proto_stream import (
        ProtoStreamReader,
        ProtoStreamWriter,
    )

    with open(in_path, "rb") as f_in, open(out_path, "wb") as f_out:
        reader = ProtoStreamReader(f_in)
        writer = ProtoStreamWriter(f_out)
        for record in reader:
            writer.write(record)
        writer.close()
    print(f"migrated {in_path} -> {out_path}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="pbstream")
    sub = parser.add_subparsers(dest="command", required=True)
    p_info = sub.add_parser("info")
    p_info.add_argument("pbstream_file")
    p_migrate = sub.add_parser("migrate")
    p_migrate.add_argument("input")
    p_migrate.add_argument("output")
    args = parser.parse_args(argv)
    if args.command == "info":
        info(args.pbstream_file)
    elif args.command == "migrate":
        migrate(args.input, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
