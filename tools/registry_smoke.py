#!/usr/bin/env python
"""0.5s sanity: the workload catalog must load and be ordered.

Run by the pre-commit hook (see tools/install_hooks.py) so a snapshot
can never again be committed with a registered query missing from
``_PRIORITY_ORDER`` (the round-9 failure mode: ``load_all()`` raised,
zeroing correctness, bench, and pytest simultaneously).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hadoop_multiple_streaming_spark.workloads as w  # noqa: E402

w.load_all()
assert list(w.QUERIES) == w._PRIORITY_ORDER
assert set(w.ORACLES) <= set(w.QUERIES)
print(f"registry OK: {len(w.QUERIES)} queries, {len(w.ORACLES)} oracles")
