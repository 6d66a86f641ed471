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


class TestRealLuaEvaluator:
    """The tree-walking evaluator (common/lua.py) vs the pitfalls a regex
    translation mis-parses, plus the reference's unread-key typo defense
    (lua_parameter_dictionary.h reference counting)."""

    def test_comment_markers_inside_strings(self):
        from cartographer_tpu.common.lua_config import load_lua_code

        table = load_lua_code(
            'options = { tag = "a--b;c", other = "semi;colon" }\n'
            "options.x = 1 -- real comment = ignored\n"
        )
        assert table["options"]["tag"] == "a--b;c"
        assert table["options"]["other"] == "semi;colon"
        assert table["options"]["x"] == 1.0

    def test_long_comments_and_multiline_exprs(self):
        from cartographer_tpu.common.lua_config import load_lua_code

        table = load_lua_code(
            "--[[ a long\n comment with options = {} inside ]]\n"
            "options = {\n"
            "  value = 1.0 +\n"
            "          2.0 * 3.0,\n"
            "  angle = math.rad(90.),\n"
            "}\n"
        )
        assert table["options"]["value"] == 7.0
        assert abs(table["options"]["angle"] - 1.5707963) < 1e-6

    def test_arithmetic_on_included_subtables(self):
        from cartographer_tpu.common.lua_config import load_lua_code

        table = load_lua_code(
            "BASE = { resolution = 0.05, count = 4 }\n"
            "DERIVED = { cells = 2 / BASE.resolution + BASE.count }\n"
        )
        assert table["DERIVED"]["cells"] == 44.0

    def test_return_chunk(self):
        from cartographer_tpu.common.lua_config import load_lua_code

        table = load_lua_code("return { blah = 100 }")
        assert table == {"blah": 100.0}

    def test_string_concat_and_local(self):
        from cartographer_tpu.common.lua_config import load_lua_code

        table = load_lua_code(
            'local prefix = "map_"\n'
            'options = { name = prefix .. "builder" .. 2 }\n'
        )
        assert table["options"]["name"] == "map_builder2"

    def test_clear_error_on_unsupported_lua(self):
        import pytest

        from cartographer_tpu.common.lua import LuaError
        from cartographer_tpu.common.lua_config import load_lua_code

        with pytest.raises(LuaError):
            load_lua_code("function f() return 1 end")

    def test_unread_key_is_hard_error(self):
        import pytest

        from cartographer_tpu.common.lua_config import (
            LuaConfigError,
            load_map_builder_options,
        )

        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "typo.lua")
            with open(path, "w") as f:
                f.write(
                    'include "map_builder.lua"\n'
                    "MAP_BUILDER.use_trajectory_builder_2d = true\n"
                    "MAP_BUILDER.nmu_background_threads = 4\n"  # typo
                )
            with pytest.raises(LuaConfigError, match="nmu_background"):
                load_map_builder_options("typo.lua", include_dirs=[d])
            # Non-strict loading still works for forward compatibility.
            opts = load_map_builder_options(
                "typo.lua", include_dirs=[d], strict=False
            )
            assert opts.use_trajectory_builder_2d

    def test_nested_includes(self):
        import os
        import tempfile

        from cartographer_tpu.common.lua_config import load_lua_file

        with tempfile.TemporaryDirectory() as d:
            with open(os.path.join(d, "base.lua"), "w") as f:
                f.write("BASE = { value = 1 }\n")
            with open(os.path.join(d, "mid.lua"), "w") as f:
                f.write('include "base.lua"\nBASE.value = BASE.value + 1\n')
            with open(os.path.join(d, "top.lua"), "w") as f:
                f.write('include "mid.lua"\nTOP = { v = BASE.value * 10 }\n')
            table = load_lua_file("top.lua", [d])
            assert table["TOP"]["v"] == 20.0

    def test_integer_fields_coerced_from_lua_floats(self):
        """Lua numbers are all floats; integer config fields coerce like
        the reference's LuaParameterDictionary::GetInt — and a fractional
        value for an int field is a hard error."""
        import os
        import tempfile

        import pytest

        from cartographer_tpu.common.lua_config import load_map_builder_options

        with tempfile.TemporaryDirectory() as d:
            with open(os.path.join(d, "ints.lua"), "w") as f:
                f.write(
                    'include "map_builder.lua"\n'
                    "MAP_BUILDER.use_trajectory_builder_2d = true\n"
                    "MAP_BUILDER.num_background_threads = 4\n"
                    "MAP_BUILDER.pose_graph.optimize_every_n_nodes = 90\n"
                )
            opts = load_map_builder_options("ints.lua", include_dirs=[d])
            assert isinstance(opts.num_background_threads, int)
            assert isinstance(opts.pose_graph.optimize_every_n_nodes, int)
            fc = opts.pose_graph.constraint_builder.fast_correlative_scan_matcher
            assert isinstance(fc.branch_and_bound_depth, int)
            assert fc.branch_and_bound_depth == 7

            with open(os.path.join(d, "frac.lua"), "w") as f:
                f.write(
                    'include "map_builder.lua"\n'
                    "MAP_BUILDER.use_trajectory_builder_2d = true\n"
                    "MAP_BUILDER.num_background_threads = 4.5\n"
                )
            with pytest.raises(ValueError, match="num_background_threads"):
                load_map_builder_options("frac.lua", include_dirs=[d])
