"""CI-style hook for the driver's correctness gate (VERDICT r5 task 7):
the DuckDB oracle replica (scripts/check_oracles.py) wired into a pytest
marker so it can run with the suite instead of only by hand per the
verify recipe.

Opt-in on purpose: the full gate costs ~3-4 minutes of Spark+DuckDB
work, and the frozen driver contract times `pytest tests/ -x -q` — so
the default suite stays fast and this test skips unless
SPARK_GRAFT_ORACLE_GATE=1 is set (run it as
`SPARK_GRAFT_ORACLE_GATE=1 python -m pytest tests/test_oracle_gate.py -q`
or `... -m oracle`)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.oracle

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_ORACLE_GATE") != "1",
    reason="full DuckDB oracle gate (~3-4 min); opt in with SPARK_GRAFT_ORACLE_GATE=1",
)
def test_oracle_gate():
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "check_oracles.py"), sf_dir],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    sys.stdout.write(proc.stdout[-4000:])
    assert proc.returncode == 0, (
        "oracle gate reported failures:\n"
        + proc.stdout[-2000:]
        + proc.stderr[-500:]
    )
