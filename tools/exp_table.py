#!/usr/bin/env python3
"""Emit the BENCH_sf1.md exponent table rows from two Bench JSON outputs.

Usage: python3 tools/exp_table.py /tmp/bench_sf01_new.json /tmp/bench_sf1_new.json
Exponent = log10(min_sf1 / min_sf01) for the 10x rehearsal.
"""
import json
import math
import sys


def load(path):
    line = open(path).read()
    return json.loads(line[line.index("{"):])


a = load(sys.argv[1])["min"]
b = load(sys.argv[2])["min"]
for q in sorted(set(a) & set(b)):
    if a[q] <= 0 or b[q] <= 0:
        print(f"| {q} | ERR | ERR | - | - | |")
        continue
    ratio = b[q] / a[q]
    exp = math.log10(ratio) if ratio > 0 else float("nan")
    print(f"| {q} | {a[q]:.2f} | {b[q]:.2f} | {ratio:.1f} | {exp:.2f} | |")
print()
print("sf0.1 mins", json.dumps({k: round(v, 3) for k, v in sorted(a.items())}))
print("sf1 mins", json.dumps({k: round(v, 3) for k, v in sorted(b.items())}))
