"""Driver-budget guard for ``__graft_entry__.dryrun_multichip``.

Round 3 regressed this: expanding the dryrun to all 5 zoo families without
budgeting compile time blew the driver's timeout (MULTICHIP_r03.json rc=124)
and LOST the multi-chip correctness artifact for the round.  This test runs
the real entry point in a fresh subprocess (as the driver does) and asserts
it completes well inside budget — measured r4: ~135 s cold / ~49 s warm on
this 1-CPU host with the structural-minimum configs + backend-opt-0 + the
persistent compile cache.  Bound: 420 s (driver budget observed >= 540 s;
the round-3 failure was ~510 s, safely above this bound)."""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
BUDGET_S = 420


@pytest.mark.slow
def test_dryrun_multichip_completes_inside_driver_budget():
    env = dict(os.environ)
    # fresh-process conditions, exactly like the driver: no inherited
    # platform pin or test-suite XLA flags
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=BUDGET_S)
    elapsed = time.time() - t0
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed (rc={proc.returncode}) "
        f"after {elapsed:.0f}s\nstderr tail:\n{proc.stderr[-2000:]}")
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout[-2000:]
    assert elapsed < BUDGET_S
