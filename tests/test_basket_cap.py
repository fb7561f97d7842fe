"""Hot-basket fan-out guard for the basket-pair query family.

`adamic_adar_q` and `association_rules_q` self-join (order, part) on the
order key; uncapped, one pathological 100k-item basket emits 10^10 pairs
from a single shuffle key. `_capped_baskets` truncates every basket to
its BASKET_CAP smallest partkeys before pairing (same ROW_NUMBER cap in
the DuckDB oracles), bounding per-key fan-out at BASKET_CAP^2. These
tests pin that contract with a synthetic hot basket (VERDICT r5 #2 /
next-round #4).
"""

import pyspark.sql.functions as F

from iniz_exporters_spark.queries import BASKET_CAP, _capped_baskets


def _hot_basket_df(spark, hot_n=5000):
    """One hot order (5k parts) plus two normal baskets."""
    hot = spark.range(hot_n).select(
        F.lit(1).alias("o"), F.col("id").alias("p")
    )
    normal = spark.createDataFrame(
        [(2, 10), (2, 11), (2, 12), (3, 7)], "o long, p long"
    )
    return hot.unionByName(normal)


def test_cap_bounds_per_basket_rows(spark):
    capped = _capped_baskets(_hot_basket_df(spark))
    per_key = {
        r["o"]: r["n"]
        for r in capped.groupBy("o").agg(F.count("*").alias("n")).collect()
    }
    assert per_key[1] == BASKET_CAP  # hot basket truncated
    assert per_key[2] == 3 and per_key[3] == 1  # normals untouched


def test_cap_keeps_smallest_partkeys_deterministically(spark):
    capped = _capped_baskets(_hot_basket_df(spark))
    kept = sorted(
        r["p"] for r in capped.filter("o = 1").select("p").collect()
    )
    assert kept == list(range(BASKET_CAP))


def test_pair_join_fanout_is_bounded(spark):
    """The downstream a.o = b.o, pa < pb self-join on the capped table must
    emit at most C(BASKET_CAP, 2) pairs per basket — not C(5000, 2)."""
    op = _capped_baskets(_hot_basket_df(spark))
    a = op.select("o", F.col("p").alias("pa"))
    b = op.select("o", F.col("p").alias("pb"))
    pairs = a.join(b, "o").filter(F.col("pa") < F.col("pb"))
    hot_pairs = pairs.filter("o = 1").count()
    assert hot_pairs == BASKET_CAP * (BASKET_CAP - 1) // 2


def test_cap_is_noop_on_tpch_baskets(spark):
    """TPC-H orders hold <= 7 distinct parts, so the cap must not change
    the pair set at test scale (oracle parity precondition)."""
    from iniz_exporters_spark.catalog import Catalog

    li = Catalog(spark, "/root/testdata/sf0.001").lineitem
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    assert _capped_baskets(op).count() == op.count()
