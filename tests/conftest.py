"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

The reference repo has no test suite (SURVEY.md §4); we build the pyramid here:
pure-function unit tests, golden-value tests against captured torch reference
outputs, and multi-device sharding tests on a forced 8-device CPU backend.
"""
import os

# jax may already be imported by the interpreter's startup hook with
# JAX_PLATFORMS pinned to the real TPU; override via jax.config (must happen
# before the first backend use, which is why this sits at conftest import).
if not os.environ.get("TMDIFF_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache, fingerprinted by host microarchitecture.
    # A bare shared cache is unsafe on XLA:CPU — its keys ignore CPU features,
    # so AOT code compiled on an avx512 host SIGILLs elsewhere (observed in
    # round 1). Keying the cache DIRECTORY by (cpu flags, jax version) keeps
    # warm re-runs on the same machine fast (~4x on this suite) while a
    # different microarchitecture simply starts a fresh directory.
    if not os.environ.get("TMDIFF_NO_COMPILE_CACHE"):
        import hashlib
        import tempfile

        try:
            with open("/proc/cpuinfo") as f:
                cpu = next((l for l in f if l.startswith("flags")), "")
        except OSError:
            cpu = ""
        fp = hashlib.sha256(f"{cpu}|{jax.__version__}".encode()).hexdigest()[:12]
        cache_dir = os.path.join(tempfile.gettempdir(), f"tmdiff_xla_cache_{fp}")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(3407)
