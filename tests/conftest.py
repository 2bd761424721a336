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
    if "xla_backend_optimization_level" not in flags:
        # Tests are compile-bound, not run-bound: the UNet backward costs
        # ~104 s to compile at the default level on this box vs ~50 s at
        # level 0, with runtime still fine for 16²-shape tests (measured;
        # golden-parity and SPMD-exactness tests pass identically — the
        # flag only relaxes backend codegen effort, not HLO semantics or
        # partitioning). Export XLA_FLAGS with a level to override.
        os.environ["XLA_FLAGS"] += " --xla_backend_optimization_level=0"
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


def pytest_collection_modifyitems(config, items):
    """Opt-in slow tier: tests marked `slow` (multi-minute e2e compiles)
    only run with TMDIFF_RUN_SLOW=1 — the default suite stays the fast
    regression net (VERDICT r2 #8: suite wall-time budget)."""
    if os.environ.get("TMDIFF_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: set TMDIFF_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(3407)


@pytest.fixture(scope="session")
def shared_sharp():
    """ONE tiny Pansharpener shared across test files (same instance ⇒ same
    jitted-sampler cache): test_harness + test_serve previously built
    identical copies and paid every sampler compile twice."""
    import jax
    import jax.numpy as jnp

    from tmdiff_tpu.data.synthetic import make_arrays
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.pipeline import Pansharpener

    model = WavBEST(channels=(4, 8, 8, 16))
    data = make_arrays(n=2, bands=4, size=16)
    x = jnp.asarray(data["gt"] - data["lms"])
    params = model.init(
        jax.random.key(0), x, jnp.array([1, 2]), jnp.asarray(data["pan"]),
        jnp.asarray(data["lms"]), jnp.zeros(768),
    )
    return Pansharpener(model, params, n_timestep=10)
