#!/usr/bin/env python3
"""Diff two BENCH.json per-query warm records: top movers, totals.

Usage: bench_diff.py OLD.json NEW.json [N]
"""
import json
import sys


def load(p):
    with open(p) as f:
        b = json.load(f)
    # driver-side records wrap the payload under "parsed" (no per-query
    # map there — those need the repo-side BENCH.json)
    return b


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    ow, nw = old["queries_warm"], new["queries_warm"]
    shared = sorted(set(ow) & set(nw))
    only_old = set(ow) - set(nw)
    only_new = set(nw) - set(ow)
    tot_o = sum(v for k, v in ow.items() if k in shared and v >= 0)
    tot_n = sum(v for k, v in nw.items() if k in shared and v >= 0)
    print(f"shared {len(shared)} queries: warm {tot_o:.1f} -> {tot_n:.1f} s "
          f"({tot_n / tot_o:.3f}x)")
    if only_old:
        print(f"removed ({len(only_old)}): {sorted(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): "
              f"{sorted((nw[k], k) for k in only_new)}")
    movers = sorted(shared, key=lambda k: nw[k] - ow[k])
    print(f"\n-- top {n} improvements (warm sec old -> new, delta) --")
    for k in movers[:n]:
        d = nw[k] - ow[k]
        if d < -0.05:
            print(f"{ow[k]:7.2f} -> {nw[k]:7.2f}  {d:+6.2f}  {k}")
    print(f"\n-- top {n} regressions --")
    for k in reversed(movers[-n:]):
        d = nw[k] - ow[k]
        if d > 0.05:
            print(f"{ow[k]:7.2f} -> {nw[k]:7.2f}  {d:+6.2f}  {k}")
    print(f"\n-- top {n} by new warm time --")
    for k in sorted(nw, key=lambda k: -nw[k])[:n]:
        o = ow.get(k, float("nan"))
        print(f"{o:7.2f} -> {nw[k]:7.2f}  {k}")


if __name__ == "__main__":
    main()
