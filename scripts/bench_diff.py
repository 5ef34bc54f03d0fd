#!/usr/bin/env python3
"""Calib-normalized comparison of two Bench metric JSON lines.

Usage: bench_diff.py OLD.json NEW.json

Accepts either a raw `{"metric":...}` line (as Bench prints) or the
driver's BENCH_r{N}.json wrapper (uses its `tail` / `parsed` field).
Normalized delta = (new_sec / new_calib) / (old_sec / old_calib) - 1 —
the calib probe divides out machine drift, so this compares PLANS, not
the box's mood (README §Bench calibration).

Cold-run outliers: each query's FIRST run pays JIT + codegen compilation
and can be 4-9x its steady state (measured in the r12 driver run). The
per-query `queries` seconds are best-of-3 and immune; wall-clock and any
naive mean are NOT. When `runs` are present, queries whose first run
exceeds 2x their best are flagged so nobody mistakes warmup for a plan
regression.
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
    if d is not None and ("queries" in d or "best" in d):
        return _fill_best(d)
    if d is not None and "parsed" in d and isinstance(d["parsed"], dict):
        return d["parsed"]
    if d is not None and "tail" in d:
        r = _from_tail(d["tail"])
        if r is not None:
            return r
    for line in raw.splitlines():
        if '"metric"' in line:
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"{path}: no bench metric line found")


def _fill_best(d):
    """r16+ lines carry a compact `best` map at the line's END (the part
    the driver's tail-keeping wrapper preserves) — it is authoritative
    over a front-truncated `queries`."""
    if isinstance(d.get("best"), dict):
        q = d.setdefault("queries", {})
        q.update({k: v for k, v in d["best"].items() if k != "__trunc"})
        # a reopened-tail q can still carry the '__trunc' stub or
        # list-valued (mis-bound runs) entries here — the value
        # fallback must not sum junk (or crash on a list).
        d.setdefault("value", sum(v for k, v in q.items()
                                  if k != "__trunc"
                                  and isinstance(v, (int, float))))
    return d


def _finish_tail(d):
    """Normalize a reopened-tail parse into the canonical metric dict.

    A reopening prefix like '{"metric":"x","queries":{"' can swallow
    the RUNS arrays into `queries` (list values) when the cut landed
    mid-runs — move list-valued entries back to `runs`, then rebuild
    `queries` as best-of-runs and total them."""
    d = _fill_best(d)
    q = d.setdefault("queries", {})
    runs = d["runs"] if isinstance(d.get("runs"), dict) else {}
    d["runs"] = runs
    for k in list(q):
        if isinstance(q[k], list):
            v = q.pop(k)
            if k != "__trunc":
                runs.setdefault(k, v)
    q.pop("__trunc", None)
    runs.pop("__trunc", None)
    # `queries` IS min(runs) by Bench's own definition, so runs-derived
    # minima OVERWRITE reopened values — a cut landing mid-
    # `queries_normalized` can mis-bind normalized values into the
    # reopened `queries` stub, and the overwrite corrects it losslessly.
    for k, r in runs.items():
        if isinstance(r, list) and r:
            q[k] = min(r)
    if not q:
        return None  # nothing salvageable — caller keeps scanning
    d.setdefault("value", sum(v for v in q.values()
                              if isinstance(v, (int, float))))
    return d


def _from_tail(tail):
    """Reconstruct the metric dict from the driver's truncated tail.

    The driver keeps only the END of Bench's metric line, usually cut
    mid-way through the `queries` map (often mid-number). Try prefixes
    that re-open the object at the plausible cut points; failing that,
    re-derive `queries` as best-of-runs from the intact `runs` map."""
    t = tail.splitlines()[0]
    # cut points seen in driver wrappers, in order of how much survives:
    # before `queries`, mid-`queries` (at a key or mid-number), and
    # mid-`runs` (at a key or inside a run ARRAY — the r14 shape).
    # r16+ field order puts `runs` FIRST and the compact `best` + calib
    # at the tail end, so the same reopening prefixes cover both orders
    # (duplicate JSON keys resolve to the LAST occurrence — the real,
    # surviving map wins over the reopening stub).
    # mid-key cuts of the FIRST surviving field re-key it as runs /
    # queries (t.find('":') locates the partial key's end).
    kcut = t.find('":')
    midkey = [p + t[kcut:] for p in ('{"metric":"x","runs',
                                     '{"metric":"x","queries')] \
        if 0 <= kcut < 24 else []
    for cand in ['{"metric":"x"' + t,
                 '{"metric":"x","' + t,
                 '{"metric":"x","runs":' + t,
                 '{"metric":"x","runs"' + t,
                 '{"metric":"x","runs":{' + t,
                 '{"metric":"x","runs":{"' + t,
                 '{"metric":"x","queries":{' + t,
                 '{"metric":"x","queries":{"__trunc":0.' + t,
                 '{"metric":"x","queries":{"' + t,
                 '{"metric":"x","queries":{},"runs":{"__trunc":[0.' + t,
                 '{"metric":"x","queries":{},"runs":{"' + t,
                 '{"metric":"x","queries":{},"calib_runs":[0.' + t,
                 '{"metric":"x","queries":{},"queries_normalized":{"__trunc":0.' + t,
                 '{"metric":"x","queries":{},"queries_normalized":{"' + t] + midkey:
        try:
            d = json.loads(cand)
        except json.JSONDecodeError:
            continue
        if ("queries" in d or "best" in d or
                isinstance(d.get("runs"), dict)) and "calib" in d:
            r = _finish_tail(d)
            if r is not None:
                return r
    # generic resync: the cut can land mid-key or mid-value anywhere; try
    # reopening the object at each `,"` boundary in the survived text
    # (nested maps make early boundaries fail to parse — later ones, at
    # the true top level, succeed; take the FIRST that parses with the
    # compact record intact).
    pos = t.find(',"')
    while pos >= 0:
        try:
            d = json.loads('{"metric":"x"' + t[pos:])
        except json.JSONDecodeError:
            d = None
        if d is not None and ("queries" in d or "best" in d or
                isinstance(d.get("runs"), dict)) and "calib" in d:
            r = _finish_tail(d)
            if r is not None:
                return r
        pos = t.find(',"', pos + 1)
    i = t.find('"runs"')
    if i >= 0:
        try:
            d = json.loads("{" + t[i:])
        except json.JSONDecodeError:
            return None
        runs = {q: r for q, r in d.get("runs", {}).items()
                if isinstance(r, list) and r}
        if runs:
            d["queries"] = {q: min(r) for q, r in runs.items()}
            d.setdefault("value", sum(d["queries"].values()))
            return d
    return None


def cold_outliers(d):
    """Queries whose first run exceeds 2x their best — warmup, not plan."""
    out = []
    for q, runs in sorted(d.get("runs", {}).items()):
        if isinstance(runs, list) and len(runs) >= 2 and min(runs) > 0:
            ratio = runs[0] / min(runs)
            if ratio > 2.0:
                out.append((q, ratio, runs[0], min(runs)))
    return out


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
        osec = old["queries"].get(q)
        if osec is None:
            rows.append((0.0, f"{q:28s} NEW        new={sec:6.2f}"))
        elif osec <= 0:
            # a sub-centisecond query recorded as 0.0 — no meaningful
            # normalization; emit the row raw instead of dying.
            rows.append((0.0, f"{q:28s} old={osec:6.2f} "
                              f"new={sec:6.2f}  norm n/a (old=0)"))
        else:
            delta = (sec / cn) / (osec / co) - 1
            rows.append((delta, f"{q:28s} old={osec:6.2f} "
                                f"new={sec:6.2f}  norm {delta:+.0%}"))
    for _, line in sorted(rows, key=lambda r: -r[0]):
        print(line)
    gone = sorted(set(old["queries"]) - set(new["queries"]))
    for q in gone:
        print(f"{q:28s} REMOVED    old={old['queries'][q]:6.2f}")
    cold = cold_outliers(new)
    if cold:
        print("\ncold-run outliers in NEW (first run > 2x best — JIT/codegen "
              "warmup; best-of-3 seconds above are unaffected):")
        for q, ratio, first, best in cold:
            print(f"  {q:28s} first={first:6.2f} best={best:6.2f}  x{ratio:.1f}")


if __name__ == "__main__":
    main()
