"""Same-day controlled A/B of the round-10 session defaults on the FULL
sf0.1 bench (VERDICT r10 'Next round' item 1).

Round 10 changed two session-wide defaults in the same round the sf0.1
bench moved 27 s -> 39 s locally: spark.io.compression.codec lz4->zstd
and spark.cleaner.periodicGC.interval 30min->5min. The zstd change was
only A/B'd at sf2.0 on 4 work-dominated queries — never on the full
floor-dominated sf0.1 bench, so the regression is not attributable.

This harness runs the 4-config grid {lz4,zstd} x {5min,30min},
INTERLEAVED (A B C D A B C D ...) so slow host drift hits every config
equally, min-of-REPS per config, each run a fresh OS process (fresh
JVM — codec conf is effectively static for shuffle blocks already
written). Plan fingerprints are disabled (untimed re-execution pass
would double wall time and is config-independent).

Usage:  python tools/ab_codec_bench.py [reps]   # default 2
Writes tools/ab_codec_results.json and prints a markdown table for
DEPLOY.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("lz4", "30min"),   # round-8 defaults
    ("zstd", "30min"),  # codec only
    ("lz4", "5min"),    # gc only
    ("zstd", "5min"),   # round-10 defaults
]


def run_once(codec: str, gc: str) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_IO_CODEC": codec,
            "SPARK_GRAFT_PERIODIC_GC": gc,
            "SPARK_GRAFT_PLAN_FINGERPRINTS": "0",
            "SPARK_GRAFT_SF_DIR": env.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
            ),
            "SPARK_GRAFT_CPUS": env.get("SPARK_GRAFT_CPUS", "32"),
        }
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    wall = time.time() - t0
    line = None
    for ln in reversed(out.stdout.strip().splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
            break
    parsed = json.loads(line) if line else None
    return {
        "codec": codec,
        "gc": gc,
        "rc": out.returncode,
        "wall": round(wall, 1),
        "total": parsed["value"] if parsed else None,
        "queries": parsed["queries"] if parsed else None,
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    runs: list[dict] = []
    for rep in range(reps):
        for codec, gc in CONFIGS:
            r = run_once(codec, gc)
            r["rep"] = rep
            runs.append(r)
            print(
                f"[ab] rep={rep} codec={codec} gc={gc} "
                f"total={r['total']} wall={r['wall']}s rc={r['rc']}",
                flush=True,
            )
    best: dict[tuple, dict] = {}
    for r in runs:
        if r["total"] is None:
            continue
        key = (r["codec"], r["gc"])
        if key not in best or r["total"] < best[key]["total"]:
            best[key] = r
    table = ["| codec | periodicGC | min total (s) | runs |", "|---|---|---|---|"]
    for codec, gc in CONFIGS:
        b = best.get((codec, gc))
        alln = [r["total"] for r in runs if (r["codec"], r["gc"]) == (codec, gc)]
        table.append(
            f"| {codec} | {gc} | "
            f"{b['total'] if b else 'DNF'} | {alln} |"
        )
    md = "\n".join(table)
    print(md)
    with open(os.path.join(REPO, "tools", "ab_codec_results.json"), "w") as f:
        json.dump({"runs": runs, "table_md": md}, f, indent=1)


if __name__ == "__main__":
    main()
