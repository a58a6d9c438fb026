#!/usr/bin/env python3
"""Compare two BENCH json artifacts query-by-query.

Usage: compare_bench.py OLD.json NEW.json [ratio_flag_threshold]

Prints shared-query ratios (new/old), flags regressions above the
threshold (default 2.0), and summarizes totals, MAD, pass loads, and
scale-block ratios so a round-over-round certification is one command.
"""
import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    only_new = sorted(set(nq) - set(oq))
    print(f"shared queries: {len(shared)}; new-only: {len(only_new)} "
          f"({', '.join(only_new) if only_new else '-'})")
    shared_old = sum(oq[q] for q in shared)
    shared_new = sum(nq[q] for q in shared)
    print(f"shared-total: {shared_old:.2f}s -> {shared_new:.2f}s "
          f"({shared_new / shared_old:.2f}x)")
    print(f"grand total: {old['value']:.2f}s -> {new['value']:.2f}s "
          f"(new-only adds {sum(nq[q] for q in only_new):.2f}s)")
    for k in ("total_mad_sec", "pass_totals", "pass_loadavg",
              "rejected_passes", "load_gate"):
        print(f"  {k}: {old.get(k)} -> {new.get(k)}")
    regressions = [(q, oq[q], nq[q]) for q in shared
                   if oq[q] > 0 and nq[q] / oq[q] > flag]
    improvements = [(q, oq[q], nq[q]) for q in shared
                    if nq[q] > 0.05 and oq[q] > 0 and nq[q] / oq[q] < 0.6]
    print(f"\nregressions >{flag}x ({len(regressions)}):")
    for q, a, b in sorted(regressions, key=lambda r: -r[2] / r[1]):
        print(f"  {q}: {a:.3f}s -> {b:.3f}s ({b / a:.1f}x)")
    print(f"improvements <0.6x ({len(improvements)}):")
    for q, a, b in sorted(improvements, key=lambda r: r[2] / r[1]):
        print(f"  {q}: {a:.3f}s -> {b:.3f}s ({b / a:.2f}x)")
    so, sn = old.get("scale", {}), new.get("scale", {})
    ro, rn = so.get("ratio_vs_base", {}), sn.get("ratio_vs_base", {})
    if rn:
        print("\nscale ratio_vs_base (old -> new):")
        for q in sorted(rn):
            o = f"{ro[q]:.1f}" if q in ro else "-"
            print(f"  {q}: {o} -> {rn[q]:.1f}")


if __name__ == "__main__":
    main()
