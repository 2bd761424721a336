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
    # NOTE: do NOT enable jax's persistent compilation cache here — XLA:CPU
    # AOT entries are unreliable to reload even on the SAME machine: XLA
    # bakes pseudo-features like +prefer-no-scatter/+prefer-no-gather into
    # the compile-machine feature list, the loader then reports them as
    # "not supported on the host machine" and execution can go wrong
    # (observed twice: round-1 cross-host SIGILL, and round-2 same-host
    # cpu_aot_loader errors with a cpuinfo-fingerprinted cache directory).

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(3407)
