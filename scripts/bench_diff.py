#!/usr/bin/env python3
"""Calib-normalized comparison of two Bench metric JSON lines.

Usage: bench_diff.py OLD.json NEW.json

Accepts either a raw `{"metric":...}` line (as Bench prints) or the
driver's BENCH_r{N}.json wrapper (uses its `tail` / `parsed` field).
Normalized delta = (new_sec / new_calib) / (old_sec / old_calib) - 1 —
the calib probe divides out machine drift, so this compares PLANS, not
the box's mood (README §Bench calibration).
"""
import json
import sys


def load(path):
    with open(path) as f:
        raw = f.read().strip()
    d = None
    for cand in (raw, raw.splitlines()[0]):
        try:
            d = json.loads(cand)
            break
        except json.JSONDecodeError:
            continue
    if d is not None and "queries" in d:
        return d
    if d is not None and "parsed" in d and isinstance(d["parsed"], dict):
        return d["parsed"]
    if d is not None and "tail" in d:
        return json.loads('{"metric":"x"' + d["tail"].splitlines()[0])
    for line in raw.splitlines():
        if '"metric"' in line:
            return json.loads(line)
    raise SystemExit(f"{path}: no bench metric line found")


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    co, cn = old.get("calib"), new.get("calib")
    if not co or not cn:
        print("WARNING: missing calib in one side; falling back to raw deltas")
        co = cn = 1.0
    print(f"calib: old={co:.3f} new={cn:.3f}   "
          f"total: old={old['value']:.2f}s new={new['value']:.2f}s")
    rows = []
    for q, sec in sorted(new["queries"].items()):
        if q in old["queries"]:
            delta = (sec / cn) / (old["queries"][q] / co) - 1
            rows.append((delta, f"{q:28s} old={old['queries'][q]:6.2f} "
                                f"new={sec:6.2f}  norm {delta:+.0%}"))
        else:
            rows.append((0.0, f"{q:28s} NEW        new={sec:6.2f}"))
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)
    gone = sorted(set(old["queries"]) - set(new["queries"]))
    for q in gone:
        print(f"{q:28s} REMOVED    old={old['queries'][q]:6.2f}")


if __name__ == "__main__":
    main()
