"""cartographer_tpu: a TPU-native real-time LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of Google
Cartographer (reference: cartographer-project/cartographer): 2D/3D local SLAM
(correlative + Gauss-Newton scan matching against probability-grid / TSDF /
voxel submaps), branch-and-bound loop closure over multi-resolution
precomputed grids, sparse pose-graph optimization (device Gauss-Newton/LM
with CG), pure localization, serialization, and multi-robot ingestion.

Array-first design: submap grids are fixed-shape device arrays, candidate
scoring is batched gathers, and solvers are matrix-free on device. Host code
handles sensor collation, configuration and pose-graph bookkeeping.
"""

__version__ = "0.1.0"


def _machine_cache_tag() -> str:
    """Fingerprint of this host's CPU feature set. XLA:CPU caches AOT
    executables compiled for the build host's exact features; loading them
    on a machine with different features can SIGSEGV/SIGILL mid-run (the
    cache directory persists across machine migrations), so the cache is
    keyed per feature set."""
    import hashlib
    import platform

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
    except OSError:  # pragma: no cover - non-Linux fallback
        return platform.machine()


def _enable_persistent_compile_cache() -> None:
    """Point JAX at a persistent compilation cache unless the user already
    configured one. TPU programs here are large (whole-pipeline chunk
    programs) and the accelerator may sit behind a remote compile service,
    so cold compiles cost 10-300 s per program; the cache makes every
    process after the first start instantly."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if os.environ.get("CARTOGRAPHER_TPU_DISABLE_COMPILE_CACHE"):
        # XLA:CPU executable (de)serialization is fragile across CPU
        # feature sets (segfaults observed in both cache reads of
        # foreign-machine entries and cache writes on some hosts); CPU
        # test runs disable the cache entirely.
        return
    try:
        import jax

        cache_dir = os.path.join(
            os.path.dirname(__file__), "..", ".jax_cache", _machine_cache_tag()
        )
        jax.config.update(
            "jax_compilation_cache_dir", os.path.abspath(cache_dir)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
