"""Diff per-query plan fingerprints between two bench artifacts —
the round-over-round plan-regression check (an extra Exchange, a lost
ReusedExchange, a join-strategy flip) without reading full plans.

    python tools/diff_plans.py OLD.json NEW.json

Accepts either fingerprint carrier shape: a sidecar written by
bench.py ({"sf": .., "plans": {query: {op: n}}}) or an older
BENCH_LOCAL_r{N}.json whose payload embeds "plans". Prints one line
per query whose operator counts changed, plus queries present on only
one side; exits 0 always (informational — the judge of what a plan
change MEANS is the human or the plan-hygiene tests).
"""

from __future__ import annotations

import json
import sys


def load_plans(path: str) -> dict[str, dict[str, int]]:
    with open(path) as fh:
        doc = json.load(fh)
    return doc.get("plans", {})


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = load_plans(sys.argv[1]), load_plans(sys.argv[2])
    changed = 0
    for q in sorted(set(old) | set(new)):
        if q not in old:
            print(f"NEW     {q}: {json.dumps(new[q], sort_keys=True)}")
            changed += 1
            continue
        if q not in new:
            print(f"GONE    {q}")
            changed += 1
            continue
        ops = sorted(set(old[q]) | set(new[q]))
        delta = {
            op: (old[q].get(op, 0), new[q].get(op, 0))
            for op in ops
            if old[q].get(op, 0) != new[q].get(op, 0)
        }
        if delta:
            pretty = ", ".join(f"{op} {a}->{b}" for op, (a, b) in delta.items())
            print(f"CHANGED {q}: {pretty}")
            changed += 1
    print(f"\n{changed} queries with plan changes "
          f"({len(old)} old / {len(new)} new fingerprints)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
