#!/usr/bin/env python3
"""Splice a freshly-generated plan appendix into PLANS.md (dev tool).

Replaces everything from the first "===== " line to EOF with the contents
of the given file (the output of `tools/run_main.sh graft.Explain`).
Usage: python3 tools/splice_appendix.py /tmp/appendix.txt
"""
import sys


def main(path: str) -> int:
    with open("PLANS.md") as f:
        plans = f.read()
    cut = plans.find("\n===== ")
    if cut < 0:
        print("no appendix marker found in PLANS.md", file=sys.stderr)
        return 1
    with open(path) as f:
        appendix = f.read()
    if "===== " not in appendix:
        print("generated appendix looks empty — refusing", file=sys.stderr)
        return 1
    with open("PLANS.md", "w") as f:
        f.write(plans[: cut + 1] + appendix.rstrip() + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
