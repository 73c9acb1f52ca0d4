#!/usr/bin/env python3
"""Merge N full graft.Bench runs into one committed bench.json (dev tool).

The committed bench.json is the builder's per-query floor over several
full idle runs (min-of-N protocol, round 12+). With the round-14
self-diagnosing format each sample is [wall, cpuSec, extBusyFrac]; the
merge keeps, per query:
  - "queries": the minimum wall across every sample of every run (the
    headline floor, same meaning as before);
  - "samples": the CONCATENATION of all runs' samples (the full record —
    a reader can see the spread and the cpu/ext channels of every run,
    which is what makes a later driver-vs-committed delta attributable);
plus recomputed totals and diagnostics over the merged record.

Usage: python3 tools/merge_bench.py out.json run1.json run2.json ...
"""
import json
import sys


def main(out: str, runs: list) -> int:
    datas = [json.load(open(r)) for r in runs]
    names = sorted(set().union(*[d["queries"].keys() for d in datas]))
    samples = {n: sum((d.get("samples", {}).get(n, []) for d in datas), [])
               for n in names}
    # fall back to the headline wall if a legacy run carries no samples
    for n in names:
        if not samples[n]:
            samples[n] = [[min(d["queries"][n] for d in datas
                               if n in d["queries"]), -1.0, 0.0]]
    floor = {n: min(s[0] for s in samples[n]) for n in names}
    floor_cpu = {n: min(samples[n], key=lambda s: s[0])[1] for n in names}
    total = sum(floor.values())
    cpu_total = sum(v for v in floor_cpu.values() if v >= 0)
    exts = sorted(s[2] for ss in samples.values() for s in ss)
    ext_median = exts[len(exts) // 2] if exts else 0.0
    errors = {}
    for d in datas:
        errors.update(d.get("errors", {}))
    merged = {
        "metric": "total", "value": round(total, 3), "unit": "sec",
        "queries": {n: round(floor[n], 3) for n in names},
        "samples": samples,
        "errors": errors,
        "load_suspect": False,  # a merged floor is by construction the
                                # least-loaded observation of each query
        "cpu_sec_total": round(cpu_total, 3),
        "cpu_per_wall": round(cpu_total / total, 3) if total else 0.0,
        "ext_busy_median": round(ext_median, 3),
        "cores": datas[0].get("cores", 0),
        "load_reason": f"min-of-{len(datas)}-full-runs merge",
        "run_totals": [d["value"] for d in datas],
        "sf": datas[0].get("sf", ""),
    }
    with open(out, "w") as f:
        json.dump(merged, f)
    print(f"{out}: {len(names)} queries, floor total {total:.1f}s, "
          f"run totals {[round(v, 1) for v in merged['run_totals']]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2:]))
