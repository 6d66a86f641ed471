"""Supported test-suite entry point.

`python tools/run_tests.py` runs the whole suite. By default it runs
pytest in a SINGLE process (`tests/conftest.py` forces the 8-virtual-
device CPU mesh); `--split N` runs the test files in N sequential pytest
processes instead and aggregates the results.

Why --split exists: XLA:CPU has segfaulted (exit 139) compiling large
programs on worker threads deep into long single-process runs on this
fleet. The in-tree mitigation compiles every chunk-program signature on
the feed thread (chunked_frontend_{2d,3d}._dispatch), which removes the
diagnosed crash mode; --split is the defense-in-depth fallback if a new
in-process accumulation mode appears — each group gets a fresh runtime,
and a crash is contained and reported per group instead of killing the
certification run.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--split",
        type=int,
        default=0,
        help="run the suite as N sequential pytest processes (0 = one "
        "process, the default)",
    )
    parser.add_argument(
        "pytest_args",
        nargs="*",
        help="extra args forwarded to pytest (e.g. -x, -k pattern)",
    )
    args = parser.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(root)

    if args.split <= 1:
        return subprocess.call(
            [sys.executable, "-m", "pytest", "tests/", "-q", *args.pytest_args]
        )

    files = sorted(glob.glob("tests/test_*.py"))
    groups: list[list[str]] = [[] for _ in range(args.split)]
    for i, f in enumerate(files):
        groups[i % args.split].append(f)
    failures = []
    t0 = time.perf_counter()
    for i, group in enumerate(groups):
        if not group:
            continue
        print(f"== group {i + 1}/{args.split}: {len(group)} files ==",
              flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", *group, "-q", *args.pytest_args]
        )
        if rc != 0:
            failures.append((i, rc, group))
    dt = time.perf_counter() - t0
    if failures:
        for i, rc, group in failures:
            print(f"group {i + 1} FAILED (exit {rc}): {' '.join(group)}")
        print(f"{len(failures)}/{args.split} groups failed in {dt:.0f}s")
        return 1
    print(f"all {args.split} groups passed in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
