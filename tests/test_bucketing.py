"""Bucketed-table co-location: joins and aggs on the bucket key must plan
with ZERO shuffle exchanges, and results must match the plain-join answer."""

import pytest

from iniz_exporters_spark.sources.bucketing import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], 8, path=str(wh / "orders_b")
    )
    write_bucketed(
        lineitem,
        "lineitem_b",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=str(wh / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    ot, lt = bucketed_tables
    joined = (
        spark.table(lt)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table(ot), on="o_orderkey")
    )
    assert exchange_count(joined) == 0, joined._jdf.queryExecution().toString()


def test_bucketed_self_join_helper_shuffle_free(spark, bucketed_tables):
    ot, _ = bucketed_tables
    selfj = bucketed_join(spark, ot, ot, on=["o_orderkey"], how="inner")
    assert exchange_count(selfj) == 0


def test_bucketed_agg_is_shuffle_free(spark, bucketed_tables):
    _, lt = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").count()
    assert exchange_count(agg) == 0


def test_plain_join_does_shuffle(spark):
    # control: the same join off bare parquet paths must exchange both sides
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lineitem.withColumnRenamed("l_orderkey", "o_orderkey").join(
            orders, on="o_orderkey"
        )
        assert exchange_count(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    ot, lt = bucketed_tables
    fast = (
        spark.table(lt)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table(ot), on="o_orderkey")
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    plain = lineitem.withColumnRenamed("l_orderkey", "o_orderkey").join(
        orders, on="o_orderkey"
    )
    assert fast.count() == plain.count()
    assert sorted(fast.columns) == sorted(plain.columns)
