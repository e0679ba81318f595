#!/usr/bin/env python3
"""Diff two BENCH_METRICS artifacts (written by graft.Bench's
SparkListener) and print the queries whose PLAN-level resource metrics
moved — shuffle read/write bytes and task counts are exactly
reproducible for a fixed plan + fixture, so any change here is a real
plan change, immune to the +-2x wall-clock noise that makes seconds
incomparable across rounds.

Usage: python3 tools/diff_metrics.py OLD.json NEW.json [pct_threshold=10]
"""
import json, sys


def main(old_path, new_path, thresh=10.0):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    keys = ("shuffle_read_b", "shuffle_write_b", "tasks",
            "mem_spill_b", "disk_spill_b")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    moved = 0
    for q in sorted(set(old) & set(new)):
        deltas = []
        for k in keys:
            a, b = old[q].get(k, 0), new[q].get(k, 0)
            if a == b:
                continue
            pct = 100.0 * (b - a) / a if a else float("inf")
            if abs(pct) >= thresh or (a == 0) != (b == 0):
                deltas.append(f"{k} {a} -> {b} ({pct:+.1f}%)")
        if deltas:
            moved += 1
            print(f"{q}: " + "; ".join(deltas))
    print(f"\n{moved} quer{'y' if moved == 1 else 'ies'} moved "
          f">= {thresh}% on plan metrics "
          f"({len(set(old) & set(new))} compared)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
