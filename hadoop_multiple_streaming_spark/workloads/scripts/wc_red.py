#!/usr/bin/env python3
"""Wordcount reducer — relies on Hadoop-reducer semantics: the engine
feeds the WHOLE sorted partition (`key\tvalue` lines, key-contiguous)
through one subprocess (reference PipeReducer, RedStreamJob.java:745-762)."""
import sys

cur = None
total = 0
for line in sys.stdin:
    key, _, val = line.rstrip("\n").partition("\t")
    if key != cur:
        if cur is not None:
            sys.stdout.write(f"{cur}\t{total}\n")
        cur, total = key, 0
    total += int(val or 0)
if cur is not None:
    sys.stdout.write(f"{cur}\t{total}\n")
