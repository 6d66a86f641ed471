"""Golden test: the reference's shipped Lua configs load 1:1 into our typed
options and match our dataclass defaults (model: configuration_files_test.cc)."""

import math
import os

import pytest

from cartographer_tpu.common.config import (
    MapBuilderOptions,
    TrajectoryBuilderOptions,
)
from cartographer_tpu.common.lua_config import (
    load_lua_file,
    load_map_builder_options,
    load_trajectory_builder_options,
)

REFERENCE_CONFIG_DIR = "/root/reference/configuration_files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CONFIG_DIR),
    reason="reference configuration files not mounted",
)


class TestLuaLoading:
    def test_trajectory_builder_2d_values(self):
        table = load_lua_file("trajectory_builder_2d.lua", [REFERENCE_CONFIG_DIR])
        tb = table["TRAJECTORY_BUILDER_2D"]
        assert tb["max_range"] == 30.0
        assert tb["submaps"]["num_range_data"] == 90
        assert tb["real_time_correlative_scan_matcher"][
            "angular_search_window"
        ] == pytest.approx(math.radians(20.0))
        assert tb["ceres_scan_matcher"]["ceres_solver_options"]["max_num_iterations"] == 20
        assert tb["use_imu_data"] is True

    def test_pose_graph_values(self):
        table = load_lua_file("pose_graph.lua", [REFERENCE_CONFIG_DIR])
        pg = table["POSE_GRAPH"]
        assert pg["optimize_every_n_nodes"] == 90
        assert pg["constraint_builder"]["min_score"] == 0.55
        assert pg["constraint_builder"]["loop_closure_translation_weight"] == 1.1e4
        assert pg["matcher_rotation_weight"] == 1.6e3

    def test_includes_resolve(self):
        table = load_lua_file("map_builder.lua", [REFERENCE_CONFIG_DIR])
        assert "MAP_BUILDER" in table
        assert table["MAP_BUILDER"]["pose_graph"]["optimize_every_n_nodes"] == 90


class TestTypedConversion:
    def test_map_builder_matches_defaults(self):
        loaded = load_map_builder_options("map_builder.lua")
        defaults = MapBuilderOptions()
        assert loaded.pose_graph.optimize_every_n_nodes == defaults.pose_graph.optimize_every_n_nodes
        assert (
            loaded.pose_graph.constraint_builder.sampling_ratio
            == defaults.pose_graph.constraint_builder.sampling_ratio
        )
        assert (
            loaded.pose_graph.optimization_problem.huber_scale
            == defaults.pose_graph.optimization_problem.huber_scale
        )
        assert (
            loaded.pose_graph.constraint_builder.fast_correlative_scan_matcher.branch_and_bound_depth
            == defaults.pose_graph.constraint_builder.fast_correlative_scan_matcher.branch_and_bound_depth
        )

    def test_trajectory_builder_matches_defaults(self):
        loaded = load_trajectory_builder_options("trajectory_builder.lua")
        defaults = TrajectoryBuilderOptions()
        l2d, d2d = loaded.trajectory_builder_2d, defaults.trajectory_builder_2d
        assert l2d.max_range == d2d.max_range
        assert l2d.voxel_filter_size == d2d.voxel_filter_size
        assert l2d.submaps.num_range_data == d2d.submaps.num_range_data
        assert (
            l2d.ceres_scan_matcher.rotation_weight
            == d2d.ceres_scan_matcher.rotation_weight
        )
        l3d, d3d = loaded.trajectory_builder_3d, defaults.trajectory_builder_3d
        assert l3d.max_range == d3d.max_range
        assert l3d.submaps.high_resolution == d3d.submaps.high_resolution
        assert (
            l3d.motion_filter.max_angle_radians == d3d.motion_filter.max_angle_radians
        )
