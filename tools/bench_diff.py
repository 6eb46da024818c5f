#!/usr/bin/env python3
"""Compare two graft Bench JSON artifacts (driver-side tooling, like
check_oracle.py — NOT an engine dependency).

Usage: bench_diff.py OLD.json NEW.json [abs_threshold_s]

Prints the total delta, queries added/removed, and per-query deltas
exceeding max(abs_threshold_s, 30%) — the host has external CPU load, so
sub-threshold movement is noise (measured ±8% on totals; see SURVEY
round-5 closing numbers). Accepts either a raw Bench line or a
driver-side BENCH_r{N}.json whose `tail` field wraps it.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" not in d and "tail" in d:
        text = d["tail"]
        d = None
    if d is None:
        m = re.search(r'\{"metric".*\}', text)
        if not m:
            sys.exit(f"no bench JSON found in {path}")
        d = json.loads(m.group(0))
    return d


def main(old_path, new_path, abs_thresh=0.5):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] - old['value']:+.1f}s); "
          f"shared {len(shared)}: {sum(oq[q] for q in shared):.1f}s -> "
          f"{sum(nq[q] for q in shared):.1f}s")
    for label, names in (("added", set(nq) - set(oq)), ("removed", set(oq) - set(nq))):
        if names:
            src = nq if label == "added" else oq
            print(f"{label}: " + ", ".join(
                f"{q}={src[q]:.2f}s" for q in sorted(names)))
    moved = [(q, oq[q], nq[q]) for q in shared
             if abs(nq[q] - oq[q]) > max(abs_thresh, 0.3 * oq[q])]
    for q, a, b in sorted(moved, key=lambda t: -(abs(t[2] - t[1]))):
        print(f"  {q}: {a:.2f}s -> {b:.2f}s ({b - a:+.2f}s)")
    if not moved:
        print("  no per-query delta beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 0.5))
