"""spread_for_kernel contract tests (ADVICE r5 #1).

The file-split estimate is valid only for bare scans; a plan containing a
shuffle has a (possibly AQE-coalesced) shuffle partition count the scan
metadata cannot see. `_is_bare_scan` gates the estimate; these tests pin
the gate and the end behavior: small inputs get spread to >= cores,
shuffle-bearing plans never take the scan-estimate path.
"""

import pyspark.sql.functions as F

from iniz_exporters_spark.session import (
    _is_bare_scan,
    spread_for_kernel,
)

SF = "/root/testdata/sf0.001"


def test_bare_scan_detected(spark):
    df = spark.read.parquet(f"{SF}/nation.parquet")
    assert _is_bare_scan(df)
    assert _is_bare_scan(df.select("n_nationkey").filter("n_nationkey > 3"))


def test_shuffle_plans_not_bare(spark):
    n = spark.read.parquet(f"{SF}/nation.parquet")
    r = spark.read.parquet(f"{SF}/region.parquet")
    assert not _is_bare_scan(n.groupBy("n_regionkey").count())
    assert not _is_bare_scan(n.join(r, n.n_regionkey == r.r_regionkey))
    assert not _is_bare_scan(n.distinct())
    assert not _is_bare_scan(n.repartition(4))


def test_small_scan_is_spread_to_cores(spark):
    df = spark.read.parquet(f"{SF}/nation.parquet")
    target = spark.sparkContext.defaultParallelism
    out = spread_for_kernel(df)
    assert out.rdd.getNumPartitions() >= target


def test_shuffle_plan_spread_uses_physical_count(spark):
    """An aggregated frame that AQE coalesces to few partitions must still
    be spread for the kernel — the scan estimate (32 splits would look
    'already wide') must not mask the post-shuffle reality."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    out = spread_for_kernel(agg)
    assert (
        out.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )


# --- r15: metadata_df (driver-list frames in ONE slice) ---------------------


def test_metadata_df_single_partition_and_order(spark):
    """Every driver-built metadata frame must plan as ONE input slice —
    createDataFrame's default defaultParallelism slicing dispatched 32
    Python-worker tasks per broadcast build on local[32] (r15 profile:
    pq_adc_topk LUT stage 32 tasks/8.05 s summed -> 1 task/0.21 s)."""
    from iniz_exporters_spark.session import metadata_df

    rows = [(i, f"v{i}") for i in range(7)]
    df = metadata_df(spark, rows, "k int, v string")
    assert df.rdd.getNumPartitions() == 1
    # same rows, same order as the input list (parallelize preserves it)
    assert [(r["k"], r["v"]) for r in df.collect()] == rows


def test_metadata_df_struct_type_schema(spark):
    from pyspark.sql import types as T

    from iniz_exporters_spark.session import metadata_df

    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.DoubleType(), True),
        ]
    )
    df = metadata_df(spark, [(1, 2.5), (2, None)], schema)
    assert df.schema == schema
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 2
