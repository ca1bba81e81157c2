#!/usr/bin/env python3
"""Hard identity check for PLANS.md regeneration.

Usage: python3 tools/plans_check.py <committed_PLANS.md> <fresh_table.md>

Parses the `| query | exchanges | ... |` rows from both files and FAILS
(exit 1) if any seat present in BOTH has a different row — a silent plan
regression. New seats (fresh only) and retired seats (committed only)
are reported but allowed; the caller decides whether retirement was
intentional. This is the CI-grade form of the informal diff the
regeneration notes used to do by hand.
"""
import re
import sys


def rows(path):
    out = {}
    for line in open(path):
        m = re.match(r"^\|\s*([a-z0-9_]+)\s*\|(.+)\|\s*$", line)
        if m and m.group(1) not in ("query",):
            out[m.group(1)] = "|".join(c.strip() for c in m.group(2).split("|"))
    return out


def main():
    committed, fresh = sys.argv[1], sys.argv[2]
    a, b = rows(committed), rows(fresh)
    changed = {k: (a[k], b[k]) for k in a.keys() & b.keys() if a[k] != b[k]}
    new = sorted(b.keys() - a.keys())
    gone = sorted(a.keys() - b.keys())
    print(f"committed rows: {len(a)}  fresh rows: {len(b)}")
    if new:
        print(f"new seats ({len(new)}): {', '.join(new)}")
    if gone:
        print(f"retired seats ({len(gone)}): {', '.join(gone)}")
    if changed:
        print(f"CHANGED rows ({len(changed)}) — plan regression or "
              "un-annotated plan change:")
        for k, (x, y) in sorted(changed.items()):
            print(f"  {k}:\n    committed: {x}\n    fresh:     {y}")
        sys.exit(1)
    print("identity check PASSED: every shared row is bit-identical")


if __name__ == "__main__":
    main()
