#!/usr/bin/env python3
"""Wordcount mapper — the canonical Hadoop-streaming user executable
(reference README.md:8-11 branch flavors). stdin lines -> `word\t1`."""
import sys

for line in sys.stdin:
    for w in line.rstrip("\n").split(" "):
        if w:
            sys.stdout.write(w + "\t1\n")
