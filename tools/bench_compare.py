#!/usr/bin/env python3
"""Compare two Bench JSON outputs (or BENCH_*.json artifacts with a
'parsed' wrapper): per-query min ratios, sorted by factor, flagging
movers beyond a threshold. Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [threshold=2.0]
Tooling only."""
import json
import sys


def load(path):
    d = json.load(open(path))
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d.get("queries_min") or d.get("queries")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    common = sorted(set(old) & set(new))
    rows = [(k, old[k], new[k], new[k] / old[k]) for k in common
            if old[k] and new[k]]
    rows.sort(key=lambda r: r[3])
    print(f"common={len(common)} only_old={sorted(set(old)-set(new))} "
          f"only_new={sorted(set(new)-set(old))}")
    movers = [r for r in rows if r[3] > thr or r[3] < 1 / thr]
    print(f"movers beyond x{thr}: {len(movers)}")
    for k, a, b, f in movers:
        print(f"  {k}: {a:.3f} -> {b:.3f}  x{f:.2f}")
    tot_old = sum(r[1] for r in rows)
    tot_new = sum(r[2] for r in rows)
    print(f"suite(common): {tot_old:.1f} -> {tot_new:.1f} "
          f"x{tot_new / tot_old:.3f}")
    print("slowest new:", [(k, round(b, 2)) for k, _, b, _ in
                           sorted(rows, key=lambda r: -r[2])[:8]])


if __name__ == "__main__":
    main()
