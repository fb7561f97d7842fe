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
