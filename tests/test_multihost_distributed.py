"""REAL multi-process multi-host test: two `jax.distributed` CPU
processes form one 8-device global mesh, run the sharded scoring + SPA
workloads, and agree numerically with a single-process run.

Model: the reference integration-tests its distributed layer with real
in-process servers (cloud/internal/client_server_test.cc:79-720); here
the distributed layer is multi-controller JAX, so the equivalent is real
subprocesses connected through the coordination service."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    # Never inherit a TPU attachment into the CPU workers: a sitecustomize
    # on PYTHONPATH may register an accelerator PJRT plugin at interpreter
    # start, which breaks both the forced CPU device count and
    # jax.distributed initialization in subprocesses.
    env.pop("PJRT_DEVICE", None)
    path = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join(path)
    return env


def _run_workers(
    num_processes: int, port: int, spa_nodes: int = 256, production: bool = False
):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(num_processes):
        args = [
            sys.executable,
            "-m",
            "cartographer_tpu.tools.multihost_worker",
            "--candidates_per_device", "64",
            "--spa_nodes", str(spa_nodes),
            # Cross-process CPU collectives (Gloo) cost ~20 ms each; keep
            # the iteration product small — correctness, not throughput,
            # is under test.
            "--lm_iterations", "4",
            "--cg_iterations", "8",
        ]
        if production:
            args.append("--production")
        if num_processes > 1:
            args += [
                "--coordinator_address", f"127.0.0.1:{port}",
                "--num_processes", str(num_processes),
                "--process_id", str(pid),
            ]
        procs.append(
            subprocess.Popen(
                args,
                cwd=repo,
                env=_worker_env(8 // num_processes),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(
            [json.loads(l) for l in out.splitlines() if l.startswith("{")]
        )
    return outs


class TestTwoProcessDistributed:
    def test_two_processes_match_single_process(self):
        single = _run_workers(1, 0)[0]
        duo = _run_workers(2, _free_port())

        spa_single = next(
            r for r in single if r["metric"] == "sharded_spa_solve"
        )
        assert spa_single["num_processes"] == 1
        assert spa_single["num_devices"] == 8

        for pid, reports in enumerate(duo):
            score = next(
                r for r in reports if r["metric"] == "sharded_candidate_scores"
            )
            spa = next(
                r for r in reports if r["metric"] == "sharded_spa_solve"
            )
            assert score["num_processes"] == 2
            assert score["num_devices"] == 8, (
                "global mesh must span both processes"
            )
            assert spa["process_id"] == pid
            # Numerical parity of the sharded SPA solve with the
            # single-process run over the identical global problem.
            assert spa["final_cost"] == pytest.approx(
                spa_single["final_cost"], rel=1e-3
            )
        # Both processes of the SPMD program agree exactly.
        costs = [
            next(r for r in reports if r["metric"] == "sharded_spa_solve")[
                "final_cost"
            ]
            for reports in duo
        ]
        assert costs[0] == pytest.approx(costs[1], rel=1e-6)

    def test_two_processes_production_drain(self):
        """The PRODUCTION pose-graph drain (MapBuilder -> PoseGraph2D ->
        sharded constraint batch + SPA — the same entry as
        dryrun_multichip) as a real 2-process jax.distributed SPMD
        program: sharded programs dispatched, loop closures found, node
        poses within the ground-truth bound, and both processes agree."""
        duo = _run_workers(2, _free_port(), production=True)
        drains = [
            next(r for r in reports if r["metric"] == "production_drain_2d")
            for reports in duo
        ]
        for pid, d in enumerate(drains):
            assert d["num_processes"] == 2
            assert d["num_devices"] == 8
            assert d["process_id"] == pid
            assert d["sharded_search_batches"] > 0
            assert d["sharded_spa_solves"] > 0
            assert d["inter_constraints"] > 0
            assert d["max_node_error_m"] < 0.15 * d["travel_m"]
        # SPMD equality: both processes computed the identical drain.
        assert drains[0]["pose_digest"] == pytest.approx(
            drains[1]["pose_digest"], abs=1e-6
        )
