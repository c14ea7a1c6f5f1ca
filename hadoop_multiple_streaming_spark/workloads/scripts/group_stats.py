#!/usr/bin/env python3
"""Per-GROUP reducer for grouped_pipe_reduce: receives ONE key's
sorted lines per invocation (full process isolation between keys —
the applyInPandas flavor of P2) and emits count + first/last value.
State (cnt/first/last) never leaks across keys because each group is
a fresh process."""
import sys

cnt = 0
first = last = None
key = None
for line in sys.stdin:
    key, _, val = line.rstrip("\n").partition("\t")
    if first is None:
        first = val
    last = val
    cnt += 1
if key is not None:
    sys.stdout.write(f"{key}\t{cnt},{first},{last}\n")
