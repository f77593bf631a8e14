#!/usr/bin/env python3
"""Bench-regression tripwire. Usage:
    python3 tools/bench_diff.py OLD.json NEW.json [--ratio 1.5] [--floor 0.5]

Compares two bench JSON lines (bench_full.json / bench_only.json /
BENCH_r*.json all share the shape {"queries": {name: seconds, ...}})
and exits 1 if any query regressed by more than --ratio, so drifts
like round 6's graph_local_clustering (+69%) are caught at commit
time, not judge time.

Rules:
  * A query is only judged if it appears in BOTH files; added/removed
    queries are reported informationally.
  * Queries under --floor seconds in the OLD run are exempt from the
    ratio check (0.1s -> 0.2s is scheduler jitter, not a regression);
    they still fail if they newly exceed 1.0s absolute.
  * A -1 sentinel (crashed query) in NEW is always a failure; in OLD
    it exempts the query (it can only get better).
  * Bench numbers interfere within a shared JVM run — re-time a
    flagged query solo (SPARK_GRAFT_ONLY=<name>) before believing it.
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    # BENCH_r*.json wraps the line under "parsed" when the driver
    # could parse it; fall through to the raw shape otherwise.
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return doc["queries"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), None)
        for a in sys.argv[1:] if a.startswith("--"))
    if len(args) != 2:
        sys.exit(__doc__)
    ratio = float(opts.get("ratio") or 1.5)
    floor = float(opts.get("floor") or 0.5)
    old, new = load(args[0]), load(args[1])

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"[info] {len(added)} added: {', '.join(added)}")
    if removed:
        print(f"[info] {len(removed)} removed: {', '.join(removed)}")

    failures = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if n < 0:
            failures.append(f"{name}: CRASHED (old {o:.3f}s)")
        elif o < 0:
            continue  # was crashed; any finite time is progress
        elif o < floor:
            if n > 1.0:
                failures.append(
                    f"{name}: {o:.3f}s -> {n:.3f}s (sub-floor query "
                    f"newly above 1.0s absolute)")
        elif n > o * ratio:
            failures.append(f"{name}: {o:.3f}s -> {n:.3f}s ({n / o:.2f}x)")

    ot = sum(v for v in old.values() if v >= 0)
    nt = sum(v for v in new.values() if v >= 0)
    print(f"[info] total {ot:.1f}s -> {nt:.1f}s over "
          f"{len(set(old) & set(new))} shared queries")
    if failures:
        print(f"REGRESSIONS (> {ratio}x, old >= {floor}s):")
        for f in failures:
            print(f"  {f}")
        sys.exit(1)
    print("OK: no per-query regression beyond the threshold")


if __name__ == "__main__":
    main()
