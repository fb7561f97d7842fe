"""Source-format contracts beyond the default single-file parquet reads."""


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appended files may add columns: mergeSchema must surface the union
    schema with NULLs for files lacking the column — the contract a
    long-lived 100 TB table relies on when producers evolve."""
    p = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], ["k", "v"]).write.parquet(p + "/d1")
    spark.createDataFrame(
        [(2, "b", 9.5)], ["k", "v", "score"]
    ).write.parquet(p + "/d2")
    df = spark.read.option("mergeSchema", "true").parquet(p + "/*")
    assert set(df.columns) == {"k", "v", "score"}
    got = {r["k"]: r["score"] for r in df.collect()}
    assert got == {1: None, 2: 9.5}


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy layout: a filter on the partition column must
    become a PartitionFilter (directories skipped at planning), not a data
    filter over every file — the core 100 TB layout contract."""
    import pyspark.sql.functions as F

    from iniz_exporters_spark.catalog import Catalog

    p = str(tmp_path / "docs_by_lang")
    Catalog(spark, "/root/testdata/sf0.001").documents.write.partitionBy(
        "lang"
    ).parquet(p)
    df = spark.read.parquet(p).filter(F.col("lang") == "en")
    plan = df._jdf.queryExecution().toString()
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part and any("lang" in ln for ln in part), plan
    assert df.count() > 0


def test_dynamic_partition_overwrite_preserves_others(spark, tmp_path):
    """partitionOverwriteMode=dynamic rewrites ONLY the partitions present
    in the incoming frame; static mode would truncate the whole table."""
    p = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("en", 1), ("fr", 2), ("de", 3)], ["lang", "v"]
    )
    base.write.partitionBy("lang").parquet(p)
    patch = spark.createDataFrame([("fr", 99)], ["lang", "v"])
    (
        patch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang")
        .parquet(p)
    )
    got = {r["lang"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert got == {"en": 1, "fr": 99, "de": 3}


def test_compact_parquet_dir_reduces_files_preserves_rows(spark, tmp_path):
    import glob

    from iniz_exporters_spark.sources.compact import compact_parquet_dir

    p = str(tmp_path / "frag")
    # 32 tiny files
    spark.range(0, 1000).repartition(32).write.parquet(p)
    before = len(glob.glob(p + "/*.parquet"))
    assert before >= 16
    rows_before = sorted(r["id"] for r in spark.read.parquet(p).collect())

    n = compact_parquet_dir(spark, p, target_file_bytes=1 << 30)
    after = len(glob.glob(p + "/*.parquet"))
    assert n == 1 and after == 1
    rows_after = sorted(r["id"] for r in spark.read.parquet(p).collect())
    assert rows_after == rows_before


def test_vacuum_snapshots_keeps_pointer_target(spark, tmp_path):
    from iniz_exporters_spark.streaming.sinks import (
        read_snapshot,
        upsert_sink,
        vacuum_snapshots,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    # three batches -> three versions
    for i, rows in enumerate([[(1, "a", 1)], [(2, "b", 1)], [(3, "c", 1)]]):
        spark.createDataFrame(rows, ["k", "v", "seq"]).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema("k BIGINT, v STRING, seq BIGINT").parquet(src)
        q = upsert_sink(stream, out, str(tmp_path / f"ck{i}"), ["k"], "seq")
        q.awaitTermination(120)

    removed = vacuum_snapshots(out, keep=1)
    assert removed  # old versions actually deleted
    snap = {r["k"]: r["v"] for r in read_snapshot(spark, out).collect()}
    assert snap == {1: "a", 2: "b", 3: "c"}  # pointer target intact


def test_json_orc_csv_roundtrip_matches_parquet(spark, tmp_path):
    """The documents table written and re-read through every bundled
    columnar/text format must produce identical rows — the format layer
    is swappable without touching any operator."""
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = sorted(map(tuple, src.collect()))

    j = str(tmp_path / "docs_json")
    src.write.mode("overwrite").json(j)
    got_json = spark.read.schema(src.schema).json(j)
    assert sorted(map(tuple, got_json.collect())) == want

    o = str(tmp_path / "docs_orc")
    src.write.mode("overwrite").orc(o)
    assert sorted(map(tuple, spark.read.orc(o).collect())) == want

    # CSV needs quoting/escaping for embedded newlines + an explicit
    # schema (CSV carries no types); multiLine handles quoted newlines
    c = str(tmp_path / "docs_csv")
    src.write.mode("overwrite").option("header", True).option(
        "escape", '"'
    ).csv(c)
    got_csv = spark.read.schema(src.schema).option("header", True).option(
        "escape", '"'
    ).option("multiLine", True).csv(c)
    assert sorted(map(tuple, got_csv.collect())) == want


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DPP: a selective filter on the DIM side must inject a
    dynamicpruningexpression into the fact scan's PartitionFilters — at
    100 TB this is what turns a star join over a partitioned fact table
    into a read of only the matching partitions, without the query author
    repeating the dim predicate on the fact side."""
    import pyspark.sql.functions as F

    p = str(tmp_path / "fact")
    fact = spark.range(0, 10_000).select(
        (F.col("id") % 10).alias("region_id"), F.col("id").alias("amount")
    )
    fact.write.partitionBy("region_id").parquet(p)
    dim = spark.createDataFrame(
        [(i, f"r{i}") for i in range(10)], ["rid", "rname"]
    )
    j = (
        spark.read.parquet(p)
        .join(dim, F.col("region_id") == F.col("rid"))
        .filter(F.col("rname") == "r3")
        .groupBy("rname")
        .agg(F.sum("amount").alias("s"))
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    pruned = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "dynamicpruning" in ln.lower()
    ]
    assert pruned, plan
    # and the pruning is an optimization, not a semantics change
    assert [tuple(r) for r in j.collect()] == [("r3", 4_998_000)]


# ---------------------------------------------------------------------------
# JSONL source/sink (sources/jsonl.py)
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip_with_shard_control(spark, tmp_path):
    from iniz_exporters_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl_shards(docs, out, n_shards=3, shard_by="source")
    import glob

    shards = glob.glob(out + "/part-*.json.gz")
    assert len(shards) == 3  # explicit shard control, gzip by default
    back = read_jsonl(
        spark, out,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    want = {tuple(r) for r in docs.collect()}
    got = {
        tuple(r)
        for r in back.drop("_corrupt_record").select(*docs.columns)
        .collect()
    }
    assert got == want


def test_jsonl_corrupt_lines_survive_and_are_counted(spark, tmp_path):
    import gzip
    import os

    from iniz_exporters_spark.sources.jsonl import (
        corrupt_line_report,
        read_jsonl,
    )

    src = str(tmp_path / "mixed")
    os.makedirs(src)
    with gzip.open(src + "/shard0.json.gz", "wt") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("{this is not json at all\n")
        f.write('{"doc_id": 2, "text": "also ok"}\n')
        f.write('{"doc_id": "NaNaNa"}\n')  # type mismatch -> corrupt
    df = read_jsonl(spark, src, "doc_id long, text string")
    rep = corrupt_line_report(df, "doc_id").collect()[0]
    assert rep["n_rows"] == 4
    assert rep["n_corrupt"] == 2
    assert rep["n_anchor_nonnull"] == 2
    assert abs(rep["corrupt_rate"] - 0.5) < 1e-9
    good = df.filter("_corrupt_record IS NULL")
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    # malformed raw lines are preserved verbatim for quarantine
    bad = [
        r["_corrupt_record"]
        for r in df.filter("_corrupt_record IS NOT NULL").collect()
    ]
    assert any("not json" in b for b in bad)


def test_jsonl_corrupt_col_detected_by_field_name_not_substring(
    spark, tmp_path
):
    """ADVICE r11: a user column whose NAME merely contains
    '_corrupt_record' (e.g. ``my_corrupt_records``) must not suppress the
    quarantine append — presence is decided by parsing the DDL and
    comparing field names exactly."""
    import gzip
    import os

    from iniz_exporters_spark.sources.jsonl import read_jsonl

    src = str(tmp_path / "lookalike")
    os.makedirs(src)
    with gzip.open(src + "/shard0.json.gz", "wt") as f:
        f.write('{"doc_id": 1, "my_corrupt_records": "x"}\n')
        f.write("{broken line\n")
    df = read_jsonl(
        spark, src, "doc_id long, my_corrupt_records string"
    )
    assert "_corrupt_record" in df.columns  # append happened
    bad = df.filter("_corrupt_record IS NOT NULL").collect()
    assert len(bad) == 1 and "broken" in bad[0]["_corrupt_record"]
    # and the true quarantine column round-trips without doubling
    df2 = read_jsonl(
        spark, src, "doc_id long, _corrupt_record string"
    )
    assert df2.columns.count("_corrupt_record") == 1


def test_jsonl_shard_count_honored_upward_and_stable(spark, tmp_path):
    """Review fixes: n_shards must be honored even when the source frame
    has FEWER partitions (coalesce could only shrink), and shard
    membership under shard_by must be identical across reruns."""
    import glob

    from iniz_exporters_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl_shards,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .coalesce(1)  # worst case: a single upstream partition
    )
    ddl = (
        "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )

    def membership(out):
        m = {}
        for shard in sorted(glob.glob(out + "/part-*.json.gz")):
            for r in read_jsonl(spark, shard, ddl).collect():
                m[r["doc_id"]] = shard.split("/")[-1].split("-")[1]
        return m

    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_jsonl_shards(docs, out1, n_shards=8, shard_by="doc_id")
    write_jsonl_shards(docs, out2, n_shards=8, shard_by="doc_id")
    assert len(glob.glob(out1 + "/part-*.json.gz")) == 8
    # hash(doc_id) % 8 membership replays exactly
    assert membership(out1) == membership(out2)


def test_jsonl_corrupt_report_zero_on_empty_input(spark, tmp_path):
    import gzip
    import os

    from iniz_exporters_spark.sources.jsonl import (
        corrupt_line_report,
        read_jsonl,
    )

    src = str(tmp_path / "empty")
    os.makedirs(src)
    with gzip.open(src + "/shard0.json.gz", "wt") as f:
        f.write("")  # zero lines
    rep = corrupt_line_report(
        read_jsonl(spark, src, "doc_id long, text string"), "doc_id"
    ).collect()[0]
    # zeros, never NULLs (review fix: a gate comparing n_corrupt > k
    # must not TypeError on an empty intake)
    assert rep["n_rows"] == 0
    assert rep["n_corrupt"] == 0
    assert rep["corrupt_rate"] == 0.0


def test_jsonl_schema_roundtrip_with_corrupt_col_already_present(
    spark, tmp_path
):
    import gzip
    import os

    from iniz_exporters_spark.sources.jsonl import read_jsonl

    src = str(tmp_path / "rt")
    os.makedirs(src)
    with gzip.open(src + "/s.json.gz", "wt") as f:
        f.write('{"doc_id": 1}\n')
    # a DDL that already carries _corrupt_record (round-tripped from an
    # earlier read) must not be double-appended
    df = read_jsonl(
        spark, src, "doc_id long, _corrupt_record string"
    )
    assert df.columns.count("_corrupt_record") == 1
    assert df.collect()[0]["doc_id"] == 1
