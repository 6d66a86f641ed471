"""Loader for the reference's Lua configuration files.

Reference: common/lua_parameter_dictionary.cc + configuration_file_resolver.cc
— Lua 5.2 evaluates config files into nested dictionaries with
include-resolution. The shipped configuration files use a small, declarative
subset of Lua (table constructors, `include`, `math.rad`/`math.pi`, numeric
expressions, local references to previously-defined globals); this module
translates that subset to Python and evaluates it, so the reference's actual
.lua files (and user configs written in the same style) load directly into
the dataclass options of common/config.py.
"""

from __future__ import annotations

import math
import os
import re
from typing import Any, Dict, List, Optional

from cartographer_tpu.common import config as config_module


class _LuaEnv(dict):
    """Name lookup for evaluated Lua globals with math.* support."""

    def __missing__(self, key):
        raise KeyError(f"undefined Lua global {key!r}")


def _strip_comments(text: str) -> str:
    out_lines = []
    for line in text.splitlines():
        idx = line.find("--")
        if idx >= 0:
            line = line[:idx]
        out_lines.append(line)
    return "\n".join(out_lines)


def _lua_to_python(expr: str) -> str:
    """Translate the declarative Lua subset to a Python expression."""
    expr = expr.replace("math.rad", "math.radians")
    expr = re.sub(r"\btrue\b", "True", expr)
    expr = re.sub(r"\bfalse\b", "False", expr)
    expr = re.sub(r"\bnil\b", "None", expr)
    # Table keys: `name = value` inside { } -> `"name": value`. Handle only
    # identifier keys at the start of an item.
    expr = re.sub(r"(?m)(?<=[{,\n])(\s*)([A-Za-z_][A-Za-z0-9_]*)\s*=", r'\1"\2":', expr)
    # Lua statement-level semicolons inside tables behave like commas.
    expr = expr.replace(";", ",")
    return expr


def load_lua_file(
    filename: str, include_dirs: List[str], env: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Evaluate a Lua config file; returns the resulting global table dict."""
    if env is None:
        env = _LuaEnv()
        env["math"] = math

    path = None
    for d in include_dirs:
        candidate = os.path.join(d, filename)
        if os.path.exists(candidate):
            path = candidate
            break
    if path is None:
        raise FileNotFoundError(f"config file {filename!r} not in {include_dirs}")

    with open(path) as f:
        text = _strip_comments(f.read())

    # Process statements: includes, assignments (possibly spanning lines).
    pos = 0
    statements: List[str] = []
    include_re = re.compile(r'include\s+"([^"]+)"')
    for m in include_re.finditer(text):
        load_lua_file(m.group(1), include_dirs, env)
    text = include_re.sub("", text)

    # Split into `NAME = <expr>` assignments at top level by scanning
    # balanced braces.
    assign_re = re.compile(r"(?m)^\s*([A-Za-z_][A-Za-z0-9_.]*)\s*=\s*")
    idx = 0
    while True:
        m = assign_re.search(text, idx)
        if m is None:
            break
        name = m.group(1)
        start = m.end()
        # Find the end of the expression: balanced braces, ends before the
        # next top-level assignment or EOF.
        depth = 0
        end = start
        while end < len(text):
            ch = text[end]
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
            elif depth == 0 and ch == "\n":
                nxt = assign_re.match(text, end + 1)
                rest = text[end:].strip()
                if nxt is not None or not rest:
                    break
                # Continue multi-line scalar expressions.
            end += 1
        expr = text[start:end].strip().rstrip(",")
        py_expr = _lua_to_python(expr)
        value = eval(py_expr, {"math": math, "__builtins__": {}}, env)  # noqa: S307
        _assign(env, name, value)
        idx = end

    return {k: v for k, v in env.items() if k != "math"}


def _assign(env: Dict[str, Any], dotted_name: str, value: Any) -> None:
    parts = dotted_name.split(".")
    target = env
    for p in parts[:-1]:
        target = target[p]
    target[parts[-1]] = value


# -- conversion into the typed dataclass options ----------------------------

_REFERENCE_DIRS = ["/root/reference/configuration_files"]


def _prune_unknown(cls, data: dict) -> dict:
    """Drop keys the dataclass doesn't know (the reference's Lua files may
    carry extra keys for other consumers); recurse into nested configs."""
    import dataclasses

    field_names = {f.name for f in dataclasses.fields(cls)}
    out = {}
    for key, value in data.items():
        if key not in field_names:
            continue
        default = config_module._default_of(cls, key)
        if dataclasses.is_dataclass(default) and isinstance(value, dict):
            out[key] = _prune_unknown(type(default), value)
        elif (
            default is None
            and isinstance(value, dict)
            and key in config_module._OPTIONAL_NESTED
        ):
            out[key] = _prune_unknown(config_module._OPTIONAL_NESTED[key], value)
        else:
            out[key] = value
    return out


def load_map_builder_options(
    lua_code_or_file: str, include_dirs: Optional[List[str]] = None
) -> config_module.MapBuilderOptions:
    include_dirs = (include_dirs or []) + _REFERENCE_DIRS
    table = load_lua_file(lua_code_or_file, include_dirs)
    options = table.get("MAP_BUILDER", table.get("options"))
    return config_module.MapBuilderOptions.from_dict(
        _prune_unknown(config_module.MapBuilderOptions, options)
    )


def load_trajectory_builder_options(
    lua_code_or_file: str, include_dirs: Optional[List[str]] = None
) -> config_module.TrajectoryBuilderOptions:
    include_dirs = (include_dirs or []) + _REFERENCE_DIRS
    table = load_lua_file(lua_code_or_file, include_dirs)
    options = table.get("TRAJECTORY_BUILDER", table.get("options"))
    return config_module.TrajectoryBuilderOptions.from_dict(
        _prune_unknown(config_module.TrajectoryBuilderOptions, options)
    )
