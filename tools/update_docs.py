#!/usr/bin/env python3
"""Regenerate machine-derived counts in README.md (dev tool, round-13
verdict #7: counts must be generated artifacts, not hand-edited prose —
README.md shipped three rounds saying "209 driver queries" after the map
had grown).

Sources of truth:
  - query count: the tracked bench.json (written by every FULL graft.Bench
    run — its per-query map is exactly SparkEntry.queries' key set; the
    bench errors out if any query fails, so a committed bench.json is a
    complete enumeration);
  - spec count: pass the total from the last `sbt test` run as --tests N
    (there is no tracked artifact carrying it; omit to leave it unchanged).

Rewrites, in place:
  - "ALL <n> driver queries"   -> bench.json query count
  - "<n> scalatest specs"      -> --tests value

Usage: python3 tools/update_docs.py [--tests N]
"""
import json
import re
import sys


def main() -> int:
    tests = None
    if "--tests" in sys.argv:
        tests = int(sys.argv[sys.argv.index("--tests") + 1])
    n = len(json.load(open("bench.json"))["queries"])
    text = open("README.md").read()
    text, k1 = re.subn(r"ALL \d+ driver queries", f"ALL {n} driver queries", text)
    k2 = 0
    if tests is not None:
        text, k2 = re.subn(r"\d+ scalatest specs", f"{tests} scalatest specs", text)
    open("README.md", "w").write(text)
    print(f"README.md: {k1} query-count site(s) -> {n}"
          + (f", {k2} spec-count site(s) -> {tests}" if tests is not None else ""))
    return 0 if k1 > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
