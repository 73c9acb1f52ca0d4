#!/usr/bin/env python3
"""100x slope spot-check for the steepest 10x queries (round-7 verdict #6).

The r7 SCALE.md run measured 10x ratios; the three steepest stable queries
(doc_pii_redact 9.9x, doc_bpe_stats 9.4x, events_in_windows 7.7x) are all
believed per-character/per-row linear — this tool adds ONE MORE DECADE on
just those queries to show the 10x->100x ratio is again ~10x (linear), not
a quadratic onset that the first decade hid.

Reuses scale_slope's structure-preserving corpus builder with COPIES=100
(documents: per-copy token prefixes keep copies disjoint; events: strided
user_ids keep per-user sequences identical). Writes SCALE100.md in cwd for
manual merge into SCALE.md.

Usage: GRAFT_BENCH_CMD='tools/run_main.sh graft.Bench' \
       python3 tools/scale_slope100.py [base_sf_dir] [work_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scale_slope as ss

QUERIES = "doc_pii_redact,doc_bpe_stats,events_in_windows"


def main(base: str, work: str) -> int:
    out10 = os.path.join(work, "scale10")
    out100 = os.path.join(work, "scale100")
    if not os.path.isdir(out10):
        ss.build_corpus(base, out10)
    if not os.path.isdir(out100):
        ss.COPIES = 100
        ss.build_corpus(base, out100)
        ss.COPIES = 10
    ss.PREFIXES = QUERIES
    t1 = ss.bench(base)
    t10 = ss.bench(out10)
    t100 = ss.bench(out100)
    lines = [
        "## 100x addendum: the three steepest 10x queries",
        "",
        "One more decade (COPIES=100, same structure-preserving replica "
        "rules) on the queries whose 10x ratios were the steepest. A "
        "per-character/per-row linear plan shows a second-decade ratio "
        "(100x/10x) of ~10x again; a quadratic onset would blow past it.",
        "",
        "| query | 1x sec | 10x sec | 100x sec | 10x/1x | 100x/10x |",
        "|---|---|---|---|---|---|",
    ]
    worst2 = 0.0
    for q in sorted(t1):
        if q in t10 and q in t100:
            r1 = t10[q] / t1[q] if t1[q] > 0 else float("inf")
            r2 = t100[q] / t10[q] if t10[q] > 0 else float("inf")
            worst2 = max(worst2, r2)
            lines.append(f"| {q} | {t1[q]:.2f} | {t10[q]:.2f} | "
                         f"{t100[q]:.2f} | {r1:.1f}x | {r2:.1f}x |")
    lines += ["", f"Worst second-decade ratio: {worst2:.1f}x "
              "(linear expectation ~10x; bound 15x)."]
    with open("SCALE100.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0 if worst2 < 15 else 1


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_scale"
    sys.exit(main(base, work))
