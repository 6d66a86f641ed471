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

# Persistent compilation cache makes repeated test runs fast (the env var is
# not read by this jax version; set the config explicitly). The cache dir is
# keyed by this machine's CPU flags: XLA:CPU caches AOT results compiled for
# the build host's exact feature set, and loading them on a host with
# different features can SIGSEGV/SIGILL mid-run.
import hashlib
import platform

def _machine_tag() -> str:
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
        return hashlib.sha1(
            (platform.machine() + flags).encode()
        ).hexdigest()[:12]
    except OSError:
        return platform.machine()

jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/ctpu_jax_cache_{_machine_tag()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
