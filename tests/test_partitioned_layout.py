"""Hive-partitioned layout: write shape, dynamic overwrite, pruning.

The properties that matter at 100 TB: (1) a partitioned write must not
explode into per-task file fragments, (2) overwriting one slice must not
truncate its siblings, (3) a filter on a partition column must prune at
PLANNING time (PartitionFilters in the FileScan) so unrelated directories
are never opened, for parquet AND orc.
"""

import os

import pyspark.sql.functions as F

from iniz_exporters_spark.sources.partitioned import (
    overwrite_partitions,
    partition_filters,
    read_pruned,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_write_partitioned_one_file_per_partition(spark, tmp_path):
    root = str(tmp_path / "bylang")
    write_partitioned(_docs(spark), root, ["lang"])
    for d in os.listdir(root):
        if not d.startswith("lang="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
    back = read_pruned(spark, root)
    assert back.count() == _docs(spark).count()
    assert set(back.columns) == set(_docs(spark).columns)


def test_write_partitioned_fanout_bounds_files(spark, tmp_path):
    root = str(tmp_path / "fan")
    write_partitioned(
        _docs(spark), root, ["lang"], files_per_partition=3
    )
    for d in os.listdir(root):
        if not d.startswith("lang="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        ]
        assert 1 <= len(files) <= 3, (d, files)
    assert read_pruned(spark, root).count() == _docs(spark).count()


def test_partition_filter_prunes_at_planning_time(spark, tmp_path):
    root = str(tmp_path / "pruned")
    write_partitioned(_docs(spark), root, ["lang"])
    q = read_pruned(spark, root).filter(F.col("lang") == "en")
    pf = partition_filters(q)
    assert "lang" in pf and "en" in pf, pf
    # equality on a partition column must NOT appear as a data filter
    # over row groups — the PushedFilters CLAUSE stays free of lang
    # (the clause shares its FileScan line with the projection, so parse
    # it out rather than matching the whole line)
    plan = q._jdf.queryExecution().toString()
    clauses = [
        ln.split("PushedFilters:", 1)[1].split("]", 1)[0]
        for ln in plan.splitlines()
        if "PushedFilters:" in ln
    ]
    assert clauses and all("lang" not in c for c in clauses), clauses
    want = (
        _docs(spark).filter(F.col("lang") == "en").count()
    )
    assert q.count() == want


def test_dynamic_overwrite_touches_only_present_partitions(
    spark, tmp_path
):
    root = str(tmp_path / "dyn")
    docs = _docs(spark)
    write_partitioned(docs, root, ["lang"])
    before = {
        r["lang"]: r["n"]
        for r in read_pruned(spark, root)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # rewrite ONE partition with half its rows
    en_half = docs.filter(
        (F.col("lang") == "en") & (F.col("doc_id") % 2 == 0)
    )
    overwrite_partitions(en_half, root, ["lang"])
    after = {
        r["lang"]: r["n"]
        for r in read_pruned(spark, root)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert after["en"] == en_half.count()
    for lang, n in before.items():
        if lang != "en":
            assert after[lang] == n, lang


def test_orc_roundtrip_with_partition_pruning(spark, tmp_path):
    root = str(tmp_path / "orcds")
    write_partitioned(_docs(spark), root, ["lang"], fmt="orc")
    q = read_pruned(spark, root, fmt="orc").filter(
        F.col("lang") == "de"
    )
    pf = partition_filters(q)
    assert "lang" in pf and "de" in pf, pf
    want = _docs(spark).filter(F.col("lang") == "de").count()
    assert q.count() == want
    # non-partition predicate pushdown works for ORC too
    q2 = read_pruned(spark, root, fmt="orc").filter(
        F.col("n_chars") > 500
    )
    plan = q2._jdf.queryExecution().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("n_chars" in ln for ln in pushed), pushed
