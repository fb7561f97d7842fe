"""Standing round-close gate: the whole registry at every gate scale.

Round 12 ran the first complete three-scale full-registry sweep
(sf0.001/sf0.01/sf0.1, 476/476 green at each) — VERDICT r12 #3 asks for
that expectation to be encoded so it survives builder turnover. This
runner executes every REGISTRY entry against its DuckDB oracle at each
scale (via tools/check_queries.check) and emits ONE summary line per
scale, e.g.::

    sf0.001: 476/476 PASS, 0 failures
    sf0.01:  476/476 PASS, 0 failures
    sf0.1:   476/476 PASS, 0 failures

Usage: python tools/full_sweep.py [sf_dir ...]
(default: the three driver gate scales). Exit code 1 on any failure.

Too slow for per-commit CI (tens of minutes at sf0.1) — this is the
round-CLOSE checklist command; the per-commit gates stay pytest plus
targeted check_queries runs. Quote the three lines in PERFORMANCE.md's
round-close notes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.check_queries import check  # noqa: E402
from iniz_exporters_spark.session import get_spark  # noqa: E402

DEFAULT_SCALES = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    scales = sys.argv[1:] or DEFAULT_SCALES
    spark = get_spark("full-sweep")
    bad = False
    summary = []
    for sf_dir in scales:
        label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        t0 = time.time()
        checked, failures = check(spark, sf_dir, quiet=True)
        npass = checked - len(failures)
        line = (
            f"{label}: {npass}/{checked} PASS, {len(failures)} failures"
            + (f" {failures}" if failures else "")
            + f"  ({time.time() - t0:.0f}s)"
        )
        print(line, flush=True)
        summary.append(line)
        bad = bad or bool(failures)
    print("\n=== three-scale full-registry sweep ===")
    for line in summary:
        print(line)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
