"""Sketch contracts: HLL distinct estimation + composition, CMS frequency
bounds. No DuckDB oracle (estimates are implementation-defined), so the
bounds ARE the contract."""

import pyspark.sql.functions as F

from iniz_exporters_spark.operators.sketches import (
    cms_heavy_hitters,
    hll_distinct_by_group,
    hll_partition_sketches,
    hll_rollup,
)

SF = "/root/testdata/sf0.01"


def test_hll_estimate_within_relative_error(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    est = {
        r["o_orderpriority"]: r["n_distinct_est"]
        for r in hll_distinct_by_group(
            o, "o_orderpriority", "o_custkey"
        ).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, n in exact.items():
        # lgk=12 -> ~1.6% expected rel err; assert a loose 5% bound
        assert abs(est[k] - n) / n < 0.05, (k, est[k], n)


def test_hll_union_of_partition_sketches_equals_whole(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    part = o.withColumn("shard", F.col("o_orderkey") % 7)
    sk = hll_partition_sketches(part, "shard", "o_orderpriority", "o_custkey")
    assert sk.count() == 5 * 7  # 5 priorities x 7 shards, sketch-sized frame
    rolled = {
        r["o_orderpriority"]: r["n_distinct_est"]
        for r in hll_rollup(sk, "o_orderpriority").collect()
    }
    whole = {
        r["o_orderpriority"]: r["n_distinct_est"]
        for r in hll_distinct_by_group(
            o, "o_orderpriority", "o_custkey"
        ).collect()
    }
    # union composition: rolling up shard sketches answers within the
    # sketch's error envelope of the whole-frame estimate (not bit-equal:
    # sparse->dense mode transitions differ between the two paths)
    assert rolled.keys() == whole.keys()
    for k in whole:
        assert abs(rolled[k] - whole[k]) / whole[k] < 0.02, (
            k, rolled[k], whole[k],
        )
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(rolled[k] - n) / n < 0.05, (k, rolled[k], n)


def test_cms_overestimates_within_eps(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    toks = d.select(
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != ""
            )
        ).alias("tok")
    )
    sketch = cms_heavy_hitters(toks, "tok", eps=0.001, confidence=0.99)
    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(20)
        .collect()
    }
    total = toks.count()
    assert sketch.totalCount() == total
    for tok, n in exact.items():
        est = sketch.estimateCount(tok)
        assert est >= n  # CMS never underestimates
        assert est - n <= 0.001 * total  # and overshoots by <= eps*N
