"""bench.py contract: the driver parses its single JSON line per round —
a silent format break would lose the BENCH_r{N} artifact."""

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line_with_all_headline_queries():
    from iniz_exporters_spark.queries import REGISTRY

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_RUNS="2",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, out.stdout[-2000:]
    payload = json.loads(json_lines[0])
    assert payload["metric"] == "headline_query_wall_seconds"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    headline = {n for n, s in REGISTRY.items() if s.headline}
    assert set(payload["queries"]) == headline
    assert payload["value"] > 0
    assert abs(sum(payload["queries"].values()) - payload["value"]) < 0.01
    # medians-of-N contract: raw runs emitted per query, median is the
    # reported time
    import statistics

    assert set(payload["runs"]) == headline
    for name, rs in payload["runs"].items():
        assert len(rs) == 2
        assert payload["queries"][name] == round(statistics.median(rs), 3)


def test_every_oracle_parses_with_no_hugeint_columns():
    """Fast regression guard (DuckDB only, no Spark): every registered
    oracle must DESCRIBE cleanly against the test tables, and no output
    column may be HUGEINT — DuckDB widens integer SUMs to int128 while
    Spark stays BIGINT, and the driver's normalizer hash-diverges on that
    (the r01 pivot_static failure class)."""
    import duckdb

    from iniz_exporters_spark.catalog import TESTDATA_TABLES
    from iniz_exporters_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    problems = []
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            continue
        try:
            desc = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: DESCRIBE failed: {e}")
            continue
        for col, ty, *_ in desc:
            if "HUGEINT" in ty.upper():
                problems.append(f"{name}: {col} is {ty}")
    assert not problems, problems
