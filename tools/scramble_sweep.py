"""Whole-registry partition-scramble sweep (round-12's new verification
axis, made repeatable).

Runs every REGISTRY query twice at sf0.001 — baseline vs every base
table forced through a round-robin ``repartition(7)`` (a layout no
production read would produce) — and requires bit-identical canonical
output (columns sorted, floats at 9 decimals, rows sorted). A mismatch
means the query leaks partition layout into its results (RNG,
fp-summation order, arbitrary-row-win aggregates), which the DuckDB
oracle gate alone cannot distinguish from luck.

Too slow for per-commit CI (the curated suite in
tests/test_partition_invariance.py remains the per-commit gate); this
is a round-close sweep. Usage:

    python tools/scramble_sweep.py [sf_dir]

Prints one FAIL line per mismatching query and a final summary line.
Exit code 1 on any mismatch/error.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from iniz_exporters_spark.catalog import Catalog  # noqa: E402
from iniz_exporters_spark.queries import REGISTRY  # noqa: E402
from iniz_exporters_spark.session import get_spark  # noqa: E402


def canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(r[c]) for c in cols) for r in df.collect()]
    rows.sort()
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("scramble-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    orig = Catalog._read_parquet

    def scrambled(self, table):
        return orig(self, table).repartition(7)

    bad = []
    t0 = time.time()
    for i, (name, spec) in enumerate(REGISTRY.items(), 1):
        try:
            Catalog._read_parquet = orig
            base = canon(spec.fn(spark, sf_dir))
            Catalog._read_parquet = scrambled
            scr = canon(spec.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            bad.append(name)
            print(f"FAIL  {name}: error: {e}")
            continue
        finally:
            Catalog._read_parquet = orig
        if base != scr:
            bad.append(name)
            print(f"FAIL  {name}: output differs under repartition(7)")
        if i % 50 == 0:
            print(
                f"...{i}/{len(REGISTRY)} swept "
                f"({time.time() - t0:.0f}s, {len(bad)} failures)",
                flush=True,
            )
    ok = len(REGISTRY) - len(bad)
    print(
        f"\nscramble sweep @ {sf_dir}: {ok}/{len(REGISTRY)} identical, "
        f"{len(bad)} failures" + (f": {bad}" if bad else "")
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
