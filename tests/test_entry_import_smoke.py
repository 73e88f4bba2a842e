"""Pre-commit-shaped smoke test (VERDICT r7 "Next round" #8): the r7
regression was a committed HEAD whose workload package could not even be
IMPORTED (missing _REGISTRATION_ORDER entries tripped the import-time
set-equality assert), which zeroed the round's entire verification
surface.  This test makes that failure mode structurally impossible to
commit past a pytest run: it imports __spark_entry__ in a FRESH
subprocess (the in-process import may already be cached by conftest) and
drives the full queries()/oracle_sql() adapter surface without Spark.

Fast (< 5 s, no SparkSession) — run it first when in doubt:
    python -m pytest tests/test_entry_import_smoke.py -q
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import __spark_entry__ as e
from comlake_core_spark.workloads import DRIVER_WINDOW, REGISTRY, ordered_names

qs = e.queries()
os_ = e.oracle_sql()
assert len(qs) == len(REGISTRY), (len(qs), len(REGISTRY))
assert list(qs)[:50] == DRIVER_WINDOW
assert set(os_) <= set(qs)
assert all(callable(f) for f in qs.values())
assert all(isinstance(s, str) and s.strip() for s in os_.values())
# every driver-window entry must have a full value-hash oracle
missing = [n for n in DRIVER_WINDOW if n not in os_]
assert not missing, f"window entries without oracle_sql: {missing}"
print(f"OK {len(qs)} workloads, {len(os_)} oracles")
"""


def test_fresh_process_import_and_adapter_surface():
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (
        "fresh-process import of __spark_entry__ failed — this is the r7 "
        f"registry-breakage failure mode:\n{proc.stderr[-4000:]}"
    )
    assert proc.stdout.startswith("OK ")
