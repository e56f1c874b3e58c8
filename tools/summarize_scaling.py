"""Summarize scaling_results.jsonl -> BENCH_SCALING.json + markdown table.

efficiency = (T_low / T_high) / (cpus_high / cpus_low)  (BASELINE.md)
"""

from __future__ import annotations

import json
import statistics
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else ".bench_cache/scaling_results.jsonl"
    rows = [json.loads(l) for l in open(path) if l.strip()]
    by_cpus: dict[int, list[dict]] = {}
    for r in rows:
        by_cpus.setdefault(r["cpus"], []).append(r)
    summary = {}
    for cpus, rs in sorted(by_cpus.items()):
        walls = [r["wall_s"] for r in rs]
        pps = [r["pairs_per_sec"] for r in rs]
        summary[cpus] = {
            "reps": len(rs),
            "wall_s_all": walls,
            "wall_s_median": statistics.median(walls),
            "pairs_per_sec_median": statistics.median(pps),
            "rows_per_sec_median": round(rs[0]["rows"] / statistics.median(walls), 1),
            "pairs": rs[0]["pairs"],
            "rows": rs[0]["rows"],
        }
    out = {"runs": summary}
    cpus_sorted = sorted(summary)
    if len(cpus_sorted) == 2:
        lo, hi = cpus_sorted
        t_lo = summary[lo]["wall_s_median"]
        t_hi = summary[hi]["wall_s_median"]
        eff = (t_lo / t_hi) / (hi / lo)
        out["scaling"] = {
            "cpus_low": lo, "cpus_high": hi,
            "t_low_median_s": t_lo, "t_high_median_s": t_hi,
            "speedup": round(t_lo / t_hi, 3),
            "ideal_speedup": hi / lo,
            "efficiency": round(eff, 3),
        }
    print(json.dumps(out, indent=2))
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(out, f, indent=2)
    if "scaling" in out:
        s = out["scaling"]
        print(f"\n| parallelism | median wall (s) | pairs/sec |")
        print(f"|---|---|---|")
        for c in cpus_sorted:
            print(f"| local[{c}] | {summary[c]['wall_s_median']} | {summary[c]['pairs_per_sec_median']} |")
        print(f"\nspeedup {s['speedup']}x of ideal {s['ideal_speedup']}x -> efficiency {s['efficiency']}")


if __name__ == "__main__":
    main()
