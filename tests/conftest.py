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
# Crash mitigation, pinned after forensics (tools/run_tests.py
# docstring): XLA:CPU segfaults nondeterministically inside
# backend_compile_and_load deep into long runs. The compile path
# JIT-compiles split LLVM modules on a thread pool
# (parallel_codegen_split_count defaults to 32); serializing codegen
# removes the multi-threaded ORC-JIT window the crashes point at, at a
# small compile-time cost on this 2-core host.
if "xla_cpu_parallel_codegen_split_count" not in xla_flags:
    xla_flags = (
        xla_flags + " --xla_cpu_parallel_codegen_split_count=1"
    ).strip()
os.environ["XLA_FLAGS"] = xla_flags
