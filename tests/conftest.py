"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding paths are
exercised on a virtual 8-device CPU mesh (SURVEY.md section 4 implication c).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment may pre-import jax with JAX_PLATFORMS pointing at a real
# accelerator (sitecustomize); the config update below overrides it even
# then — it takes effect as long as no backend has been used yet.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache makes repeated test runs fast. NOTE:
# importing cartographer_tpu re-points the cache at the repo's
# .jax_cache/<machine-tag> dir (cartographer_tpu/__init__.py — keyed by
# CPU features because foreign-machine XLA:CPU AOT entries SIGSEGV on
# load); the settings here only cover jax use before that import.
from cartographer_tpu import _machine_cache_tag

jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/ctpu_jax_cache_{_machine_cache_tag()}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
