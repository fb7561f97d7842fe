"""Sweep every registered oracle for hash-hazard output types.

DuckDB widens integer SUMs to HUGEINT (int128) while Spark stays BIGINT;
a driver-side normalizer that renders HUGEINT differently than BIGINT will
hash-diverge on identical values (this is what bit `pivot_static` in r01).
This tool DESCRIBEs each oracle at a given sf dir and flags any column whose
DuckDB type is HUGEINT/UHUGEINT, plus any nullable aggregate returning NULL
where Spark would return 0 is left to the per-query COALESCE convention.

Usage: python tools/oracle_type_sweep.py [sf_dir]
"""
import sys

import duckdb

sys.path.insert(0, ".")
from __spark_entry__ import oracle_sql  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name, sql in sorted(oracle_sql().items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DESCRIBE failed: {e}")
            bad += 1
            continue
        hazards = [(c, ty) for c, ty, *_ in desc if "HUGEINT" in ty.upper()]
        if hazards:
            print(f"{name}: {hazards}")
            bad += 1
    print(f"{bad} oracle(s) with HUGEINT output columns")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
