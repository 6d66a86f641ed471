"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding paths are
exercised on a virtual 8-device CPU mesh (SURVEY.md section 4 implication c).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# CPU test runs skip the persistent compilation cache: XLA:CPU executable
# (de)serialization has segfaulted on this fleet both when loading entries
# from a host with different CPU features and when writing entries on some
# hosts. TPU runs (bench, tools) keep the cache — TPU executables
# serialize independently of host CPU features.
os.environ["CARTOGRAPHER_TPU_DISABLE_COMPILE_CACHE"] = "1"

import jax  # noqa: E402

# The environment may pre-import jax with JAX_PLATFORMS pointing at a real
# accelerator (sitecustomize); the config update below overrides it even
# then — it takes effect as long as no backend has been used yet.
jax.config.update("jax_platforms", "cpu")

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Crash mitigations (tools/run_tests.py docstring): XLA:CPU segfaults
# nondeterministically inside backend_compile_and_load deep into long
# single-process runs. (1) Serialize the multi-threaded ORC-JIT codegen
# (parallel_codegen_split_count defaults to 32) — round-5 measurement:
# reduces but does NOT eliminate the crash (reproduced once with the
# flag set, ~120 tests in, compiling on the main thread). (2) Shed
# accumulated JIT state between test modules (the autouse fixture
# below): every crash observed has been deep into a long-lived process
# with hundreds of live compiled executables; clearing per module keeps
# the executable population small. The split runner remains the
# certification-grade containment.
if "xla_cpu_parallel_codegen_split_count" not in xla_flags:
    xla_flags = (
        xla_flags + " --xla_cpu_parallel_codegen_split_count=1"
    ).strip()
os.environ["XLA_FLAGS"] = xla_flags

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _shed_jax_jit_state_per_module():
    yield
    jax.clear_caches()
