#!/usr/bin/env python3
"""Common-subset comparison of two Bench JSON artifacts.

Usage: python3 tools/bench_ratio.py <old.json> <new.json> [topN]

Prints the shared-query count, sum-over-shared ratio (new/old), and the
largest per-query regressions — the self-audit the round verdicts run on
BENCH_r*.json files. Conditions stamps (loadavg, runs) are echoed when
present so contended recordings are visible in the same breath.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and "tail" in d:
        # driver-recorded artifacts truncate the bench line into a
        # partial "tail" string — recover whatever per-query pairs
        # survived (the first pair may be cut mid-name; regex skips it)
        import re
        d["queries"] = {m.group(1): float(m.group(2)) for m in re.finditer(
            r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', d["tail"])}
        d["queries"].pop("value", None)
    return d


def main(old_path, new_path, top_n=10):
    old, new = load(old_path), load(new_path)
    for label, d in (("old", old), ("new", new)):
        cond = {k: d.get(k) for k in
                ("value", "n_queries", "loadavg_start", "loadavg_end",
                 "runs_per_query", "cpus") if k in d}
        print(f"{label}: {cond}")
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    os_ = sum(oq[q] for q in shared)
    ns = sum(nq[q] for q in shared)
    print(f"shared queries: {len(shared)}  old {os_:.1f}s  new {ns:.1f}s  "
          f"ratio {ns / os_:.3f}")
    deltas = sorted(((nq[q] - oq[q], nq[q], oq[q], q) for q in shared),
                    reverse=True)
    print(f"top {top_n} regressions (delta_s, new_s, old_s):")
    for d, n, o, q in deltas[:top_n]:
        print(f"  {d:+7.2f}  {n:7.2f}  {o:7.2f}  {q}")
    only_new = sorted(set(nq) - set(oq), key=lambda q: -nq[q])
    if only_new:
        tot = sum(nq[q] for q in only_new)
        print(f"new-only queries: {len(only_new)} totalling {tot:.1f}s; "
              "heaviest:")
        for q in only_new[:top_n]:
            print(f"  {nq[q]:7.2f}  {q}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
