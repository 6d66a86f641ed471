"""The server CLI binary (tools/map_builder_server_main, reference
cloud/map_builder_server_main.cc:28-65): flags -> Lua MAP_BUILDER_SERVER
config -> serving loop, driven end to end through a real subprocess and
the gRPC client stub."""

import os
import signal
import subprocess
import sys
import time
import urllib.request

import numpy as np

from cartographer_tpu.tools.map_builder_server_main import load_server_options


def _write_config(tmp_path, extra=""):
    cfg = tmp_path / "server_test.lua"
    cfg.write_text(
        'include "map_builder_server.lua"\n'
        "MAP_BUILDER.use_trajectory_builder_2d = true\n"
        'MAP_BUILDER_SERVER.server_address = "localhost:0"\n' + extra
    )
    return cfg


class TestLoadServerOptions:
    def test_resolves_reference_config(self, tmp_path):
        cfg = _write_config(tmp_path)
        options, address, uplink, batch = load_server_options(
            str(cfg), [str(tmp_path)]
        )
        assert options.use_trajectory_builder_2d
        assert options.collate_by_trajectory  # map_builder_server.lua:28
        assert address == "localhost:0"
        assert uplink is None
        assert batch == 100

    def test_uplink_address_passthrough(self, tmp_path):
        cfg = _write_config(
            tmp_path,
            'MAP_BUILDER_SERVER.uplink_server_address = "localhost:1234"\n',
        )
        _, _, uplink, _ = load_server_options(str(cfg), [str(tmp_path)])
        assert uplink == "localhost:1234"


class TestServerMainProcess:
    def test_serves_and_shuts_down_cleanly(self, tmp_path):
        cfg = _write_config(tmp_path)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.Popen(
            [
                sys.executable,
                "-m",
                "cartographer_tpu.tools.map_builder_server_main",
                "--configuration_directory", str(tmp_path),
                "--configuration_basename", "server_test.lua",
                "--monitoring_port", "0",
            ],
            cwd=repo,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        try:
            line = proc.stdout.readline()
            assert "listening on port" in line, line
            port = int(line.strip().rsplit(" ", 1)[-1])

            from cartographer_tpu.cloud.map_builder_stub import MapBuilderStub
            from cartographer_tpu.testing.synthetic import (
                generate_fake_range_measurements,
            )
            from tests.test_map_builder import trajectory_options

            stub = MapBuilderStub(f"localhost:{port}")
            tid = stub.add_trajectory_builder({"range"}, trajectory_options())
            builder = stub.get_trajectory_builder(tid)
            for m in generate_fake_range_measurements(
                translation=np.array([0.5, 0.25, 0.0]),
                duration=2.0,
                time_step=0.1,
            ):
                builder.add_sensor_data("range", m)
            deadline = time.monotonic() + 120.0
            while time.monotonic() < deadline:
                if len(stub.pose_graph.get_trajectory_node_poses()) > 3:
                    break
                time.sleep(0.5)
            stub.finish_trajectory(tid)
            poses = stub.pose_graph.get_trajectory_node_poses()
            assert len(poses) > 3
            stub.close()

            proc.send_signal(signal.SIGINT)
            assert proc.wait(timeout=30) == 0
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
