"""Opt-in multi-host DCN dryrun (see tools/multihost_dryrun.py, PARITY §2.3).

Two real OS processes, jax.distributed over a localhost coordinator, one
SPMD train step with the gradient all-reduce crossing the process boundary.
Excluded from the default suite — the 2-process CPU compile costs ~5 min;
it rides the slow tier (TMDIFF_RUN_SLOW=1, alongside the CLI preemption
e2e) so one documented flag exercises the full matrix; TMDIFF_RUN_MULTIHOST=1
still selects it alone.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not (os.environ.get("TMDIFF_RUN_MULTIHOST")
         or os.environ.get("TMDIFF_RUN_SLOW")),
    reason="slow tier (TMDIFF_RUN_SLOW=1 or TMDIFF_RUN_MULTIHOST=1): "
           "2-process CPU compile ~5 min",
)
def test_multihost_dryrun():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_dryrun.py")],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "TMDIFF_MULTIHOST_PORT": "52717"},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.count("MULTIHOST_OK") == 2, proc.stdout
