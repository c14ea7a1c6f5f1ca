"""Catalog-registry consistency guard.

Round 9 shipped a snapshot in which a query was registered in a
workload module but missing from ``_PRIORITY_ORDER``, so
``load_all()`` raised and every catalog consumer (driver
``queries()``, bench, pytest collection) died at import. This test —
plus the ``.git/hooks/pre-commit`` smoke installed by
``tools/install_hooks.py`` — pins the invariant directly.
"""

from __future__ import annotations

import subprocess
import sys


def test_load_all_is_consistent():
    import hadoop_multiple_streaming_spark.workloads as w

    w.load_all()
    assert set(w.QUERIES) == set(w._PRIORITY_ORDER)
    assert list(w.QUERIES) == w._PRIORITY_ORDER
    # every oracle corresponds to a registered query
    assert set(w.ORACLES) <= set(w.QUERIES)
    # rows-only (no-oracle) queries stay a deliberate, short list
    no_oracle = set(w.QUERIES) - set(w.ORACLES)
    assert no_oracle <= {"events_approx_profile"}, no_oracle


def test_registry_smoke_subprocess():
    """The exact command the pre-commit hook runs, from a clean
    interpreter (catches import-order issues the in-process test
    can't)."""
    proc = subprocess.run(
        [sys.executable, "tools/registry_smoke.py"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
