#!/usr/bin/env python3
"""Print the latest values of selected columns from a union-header
metrics.csv (ephemeral round-5 monitoring helper)."""
import csv
import sys

path = sys.argv[1]
want = sys.argv[2:] or ["step", "val/loss", "val/precision_ln",
                        "val/recall_ln", "val/precision_rice",
                        "val/recall_rice", "train/loss"]
rows = list(csv.DictReader(open(path)))
latest = {}
for row in rows:
    for k in want:
        v = row.get(k)
        if v not in (None, ""):
            latest[k] = (row.get("step", "?"), v)
for k in want:
    if k in latest:
        print(f"{k:>22s} @step {latest[k][0]:>6s} = {latest[k][1]}")
