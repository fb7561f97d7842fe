"""Query registry: every implemented operator as a (Spark fn, oracle SQL) pair.

This is the engine's correctness surface. Each entry demonstrates one operator
family from SURVEY.md §2 (or the §7 extension surface) as an idiomatic Spark
DataFrame plan, paired with ANSI SQL that DuckDB runs on the same parquet
tables. The driver hash-compares both at sf0.01.

Conventions that make cross-engine hash-equality deterministic:
  * Every computed column is aliased identically in Spark and SQL.
  * Double aggregations go through exact DECIMAL sums (order-independent),
    then one final ROUND(CAST(.. AS DOUBLE), n) — fp-addition-order noise
    can never reach the compared value.
  * LIMIT queries order by a unique tiebreaker so the row *set* is stable.
  * Timestamps are UTC in both engines (session.py pins the session tz).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from iniz_exporters_spark.catalog import Catalog


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def _dec(col, prec=18, scale=4):
    """Exact decimal view of a double column (order-independent summation)."""
    return col.cast(f"decimal({prec},{scale})")


def _money(col):
    """Final presentation of an exact decimal aggregate: double, 2 dp."""
    return F.round(col.cast("double"), 2)


# ---------------------------------------------------------------------------
# A1/A2/P2/O1 — flagship: TPC-H Q1-style pricing summary.
# Scale notes: single scan of lineitem, filter pushed to parquet, map-side
# partial agg on (returnflag, linestatus) — 6 groups — so the shuffle moves
# only partial aggregates. This plan survives any SF.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))
                          * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS DOUBLE), 2) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_price = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    charge = disc_price * (1 + _dec(F.col("l_tax"), 8, 4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"),
            _money(F.sum(_dec(F.col("l_extendedprice")))).alias("sum_base_price"),
            _money(F.sum(disc_price)).alias("sum_disc_price"),
            _money(F.sum(charge)).alias("sum_charge"),
            F.round(
                F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count("*"), 4
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec(F.col("l_discount"), 8, 4)).cast("double") / F.count("*"), 4
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P1 — projection with alias + computed column (reference
# concept_csv_export.py:316-350 aliases every output column).
# ---------------------------------------------------------------------------
@register(
    "proj_alias",
    """
    SELECT p_partkey AS part_id,
           p_name AS "Part name",
           p_brand AS "Brand",
           ROUND(CAST(CAST(p_retailprice AS DECIMAL(18,4))
                      * CAST(1.1 AS DECIMAL(8,4)) AS DOUBLE), 2) AS marked_up
    FROM part
    """,
)
def proj_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("Part name"),
        F.col("p_brand").alias("Brand"),
        F.round(
            (_dec(F.col("p_retailprice")) * F.lit(1.1).cast("decimal(8,4)")).cast(
                "double"
            ),
            2,
        ).alias("marked_up"),
    )


# ---------------------------------------------------------------------------
# P2 — equality filter (reference concept_csv_export.py:380 `retired = 0`).
# ---------------------------------------------------------------------------
@register(
    "filter_eq",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


# ---------------------------------------------------------------------------
# P4 — LIKE predicate (reference stop-character audit,
# concept_csv_export.py:203,223 `LIKE '%;%'`).
# ---------------------------------------------------------------------------
@register(
    "filter_like",
    """
    SELECT p_partkey, p_type
    FROM part
    WHERE p_type LIKE '%AND%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.filter(F.col("p_type").like("%AND%")).select("p_partkey", "p_type")


# ---------------------------------------------------------------------------
# P6/J7/E1 — anti-join exclusion (reference exclude(),
# concept_csv_export.py:452-454): customers with no orders.
# Scale notes: left_anti shuffles both sides on the key once; no fan-out.
# ---------------------------------------------------------------------------
@register(
    "anti_join_exclude",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    """,
)
def anti_join_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, li = cat.orders, cat.lineitem
    returned = li.filter(F.col("l_returnflag") == "R")
    return o.join(
        returned, o.o_orderkey == returned.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# J1 — inner equi-join against a dimension, broadcast (reference
# concept_csv_export.py:354-355 concept ⋈ concept_class).
# Scale notes: part is dimension-scale → explicit broadcast removes the
# shuffle entirely; the agg shuffles only (brand) partials.
# ---------------------------------------------------------------------------
@register(
    "join_dim_broadcast",
    """
    SELECT p_brand,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    headline=True,
)
def join_dim_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    disc_price = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    return (
        cat.lineitem.join(
            F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy("p_brand")
        .agg(
            _money(F.sum(disc_price)).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J2 — left join with constant conjuncts in the ON clause (reference
# concept_csv_export.py:276-284: name joins carry locale/voided predicates).
# ---------------------------------------------------------------------------
@register(
    "left_join_const_conjunct",
    """
    SELECT o.o_orderkey,
           o.o_orderstatus,
           COUNT(l.l_orderkey) AS n_returned_items
    FROM orders o
    LEFT JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND l.l_returnflag = 'R'
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
)
def left_join_const_conjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, li = cat.orders, cat.lineitem
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_returnflag == "R"),
            "left",
        )
        .groupBy(o.o_orderkey, o.o_orderstatus)
        .agg(F.count(li.l_orderkey).alias("n_returned_items"))
        .select(
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.col("n_returned_items"),
        )
    )


# ---------------------------------------------------------------------------
# J4 — chained left joins with filter-through (reference
# concept_csv_export.py:365-376: concept_set → concept → concept_name).
# region → nation → customer → orders, keeping region even when empty.
# ---------------------------------------------------------------------------
@register(
    "chain_join",
    """
    SELECT r.r_name AS region_name,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_spend
    FROM region r
    LEFT JOIN nation n ON r.r_regionkey = n.n_regionkey
    LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY r.r_name
    """,
)
def chain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    r, n, c, o = cat.region, cat.nation, cat.customer, cat.orders
    return (
        r.join(F.broadcast(n), r.r_regionkey == n.n_regionkey, "left")
        .join(c, n.n_nationkey == c.c_nationkey, "left")
        .join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(r.r_name.alias("region_name"))
        .agg(
            F.count(o.o_orderkey).alias("n_orders"),
            _money(F.sum(_dec(o.o_totalprice))).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# J5 — self-join (reference location parent lookup,
# location_csv_export.py:116; sql/ordertypes.sql:7-8): nation pairs that
# share a region, each pair once.
# ---------------------------------------------------------------------------
@register(
    "self_join_pairs",
    """
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = Catalog(spark, sf_dir).nation
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
            F.col("a.n_regionkey").alias("regionkey"),
        )
    )


# ---------------------------------------------------------------------------
# J6/A1/A2 — multi-way join fan-out collapsed by group-by + MAX dedup
# (reference location_csv_export.py:116-121 and the MAX() wrap at
# concept_csv_export.py:318-320).
# ---------------------------------------------------------------------------
@register(
    "fanout_regroup",
    """
    SELECT c.c_custkey,
           MAX(c.c_name) AS customer_name,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           COUNT(l.l_orderkey) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey
    """,
)
def fanout_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c, o, li = cat.customer, cat.orders, cat.lineitem
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(c.c_custkey)
        .agg(
            F.max(c.c_name).alias("customer_name"),
            F.countDistinct(o.o_orderkey).alias("n_orders"),
            F.count(li.l_orderkey).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# O1/O2 — global sort + limit with unique tiebreaker (reference
# concept_csv_export.py:382-384 ORDER BY + LIMIT).
# ---------------------------------------------------------------------------
@register(
    "order_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# E2/E3 — union of edge lists + distinct (reference members+answers union,
# concept_csv_export.py:434; exclude-set dedup 443-449).
# ---------------------------------------------------------------------------
@register(
    "union_distinct",
    """
    SELECT DISTINCT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) t
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(cat.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


# ---------------------------------------------------------------------------
# A1 distinct-count per group (§2.4 extension: exact distinct aggregation).
# ---------------------------------------------------------------------------
@register(
    "distinct_count",
    """
    SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Batch 2 — MySQL-semantics aggregates, pivots, windows, rollup, audits.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.functions.mysql import (
    group_concat_two_phase,
    mysql_group_concat,
    mysql_cast_unsigned,
    strip_newlines,
    pack_kv,
)


# A3 — GROUP_CONCAT(DISTINCT name ORDER BY weight SEPARATOR ';') (reference
# concept_csv_export.py:348-349 Members/Answers). Canonical rule:
# min-weight-wins per distinct value, value as tiebreak (SURVEY §7.3 item 1).
@register(
    "group_concat_ordered",
    """
    WITH pairs AS (
        SELECT l_orderkey, p_name, MIN(l_linenumber) AS w
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY l_orderkey, p_name
    )
    SELECT l_orderkey,
           string_agg(p_name, ';' ORDER BY w, p_name) AS part_names
    FROM pairs GROUP BY l_orderkey
    """,
    headline=True,
)
def group_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    joined = cat.lineitem.join(
        F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey")
    )
    return group_concat_two_phase(
        joined, "l_orderkey", "p_name", "l_linenumber", ";", alias="part_names"
    )


# A4 — unordered distinct list-agg, implicitly sorted (reference
# location_csv_export.py:113-114 Tags/Attributes group_concat).
@register(
    "group_concat_distinct",
    """
    SELECT n.n_name AS nation_name,
           string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment)
               AS segments
    FROM nation n JOIN customer c ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def group_concat_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    n, c = cat.nation, cat.customer
    return (
        n.join(c, n.n_nationkey == c.c_nationkey)
        .groupBy(n.n_name.alias("nation_name"))
        .agg(mysql_group_concat(c.c_mktsegment, sep=",").alias("segments"))
    )


# P5/F3 — MySQL CAST(x AS UNSIGNED) discriminator (reference
# concept_csv_export.py:299-306): leading digits parsed, non-numeric → 0.
@register(
    "cast_discriminator",
    """
    SELECT COALESCE(TRY_CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1)
                             AS BIGINT), 0) AS prio_num,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def cast_discriminator(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.select(mysql_cast_unsigned("o_orderpriority").alias("prio_num"))
        .groupBy("prio_num")
        .agg(F.count("*").alias("n_orders"))
    )


# F1/F2/F5/F9 — scalar-function chain: newline strip, k:v pack, split+first
# (reference concept_csv_export.py:318,395; location_csv_export.py:114).
@register(
    "scalar_funcs",
    """
    SELECT doc_id,
           string_split(regexp_replace(text, '[\r\n]', '', 'g'), ' ')[1]
               AS first_word,
           length(regexp_replace(text, '[\r\n]', '', 'g')) AS n_clean_chars,
           concat(lang, ':', source) AS lang_source
    FROM documents
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    clean = strip_newlines(F.col("text"))
    return d.select(
        "doc_id",
        F.split(clean, " ").getItem(0).alias("first_word"),
        F.length(clean).alias("n_clean_chars"),
        pack_kv("lang", "source").alias("lang_source"),
    )


# R1/J3 — static pivot with declared values (reference's 45 mapping-join
# restructure, concept_csv_export.py:292-314 → one groupBy().pivot()). The
# declared value list keeps columns deterministic even when a value is absent.
@register(
    "pivot_static",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Type-pinned both sides: DuckDB COUNT(*) FILTER is BIGINT (SUM(CASE...)
    # would be HUGEINT and can hash-diverge under the driver's normalizer),
    # and an absent pivot cell is coalesced to 0 on both engines so sparse
    # scale factors can never produce a NULL-vs-0 disagreement.
    o = Catalog(spark, sf_dir).orders
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"`{c}`"), F.lit(0)).cast("long").alias(c)
            for c in ("F", "O", "P")
        ],
    )


# §2.5 extension — ranking window: top-3 orders per customer.
@register(
    "window_topk",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
    headline=True,
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# §2.5 extension — sliding frame aggregate (decimal-exact running sums).
@register(
    "window_moving_avg",
    """
    SELECT event_id, user_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 4) AS mavg
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(_dec(F.col("value"))).over(w).cast("double")
            / F.count("*").over(w),
            4,
        ).alias("mavg"),
    )


# §2.4 extension — ROLLUP subtotals (grouping-sets family).
@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"),
        F.count("*").alias("n"),
    )


# §2.5 near-miss — positional sequence rank (reference
# concept_set_csv_creator.py:72-74 Sort Weight = file position).
@register(
    "seq_rank",
    """
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY doc_id) AS sort_weight
    FROM documents
    """,
)
def seq_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1-based rank over the corpus WITHOUT a single-partition
    window: operators.indexing.global_index (range partition +
    per-partition numbering + broadcast offsets) reproduces ANSI
    ROW_NUMBER exactly, so the oracle keeps its plain window while the
    plan stays parallel at any corpus size (the set-creator Sort Weight
    contract, reference concept_set_csv_creator.py:40-77)."""
    from iniz_exporters_spark.operators.indexing import global_index

    d = Catalog(spark, sf_dir).documents
    return global_index(d.select("doc_id"), "doc_id", "sort_weight").select(
        "doc_id", F.col("sort_weight").cast("int").alias("sort_weight")
    )


# A6/P8 — per-column any-non-empty flags feeding the dynamic column pruner
# (reference get_columns, concept_csv_export.py:607-629).
@register(
    "any_nonempty_cols",
    """
    SELECT MAX(CASE WHEN text IS NOT NULL AND text <> '' THEN 1 ELSE 0 END)
               AS has_text,
           MAX(CASE WHEN lang IS NOT NULL AND lang <> '' THEN 1 ELSE 0 END)
               AS has_lang,
           MAX(CASE WHEN source IS NOT NULL AND source <> '' THEN 1 ELSE 0 END)
               AS has_source
    FROM documents
    """,
)
def any_nonempty_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    def flag(c):
        return F.max(
            F.when(F.col(c).isNotNull() & (F.col(c) != ""), 1).otherwise(0)
        ).alias(f"has_{c}")
    return d.agg(flag("text"), flag("lang"), flag("source"))


# A7 — stop-character audit count (reference
# concept_csv_export.py:193-235 WARNING queries).
@register(
    "audit_stopchar",
    """
    SELECT COUNT(*) AS n_offending
    FROM part
    WHERE p_name LIKE '% %'
    """,
)
def audit_stopchar(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.filter(F.col("p_name").like("% %")).agg(
        F.count("*").alias("n_offending")
    )


# ---------------------------------------------------------------------------
# Batch 3 — graph fixpoints, as-of join, streaming-window family.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.asof import asof_join
from iniz_exporters_spark.plans.graph import (
    distributed_reachable,
    distributed_topo_levels,
)

_EDGES_ORACLE = """
    edges AS (
        SELECT 'c:' || o_custkey AS src, 'o:' || o_orderkey AS dst FROM orders
        UNION ALL
        SELECT DISTINCT 'o:' || l_orderkey, 'p:' || l_partkey FROM lineitem
    )
"""


def _derived_edges(cat: Catalog) -> DataFrame:
    """A 3-layer DAG derived from the star schema: customer → order → part.

    Stand-in for the reference's concept graph (Members∪Answers edges,
    concept_csv_export.py:407-530) at data scale.
    """
    c2o = cat.orders.select(
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("o:"), F.col("o_orderkey")).alias("dst"),
    )
    o2p = (
        cat.lineitem.select(
            F.concat(F.lit("o:"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("p:"), F.col("l_partkey")).alias("dst"),
        )
        .distinct()
    )
    return c2o.unionByName(o2p)


# G1 — BFS transitive closure from a root, distributed fixpoint
# (reference get_all_concepts_in_tree, concept_csv_export.py:407-438).
@register(
    "graph_reachability",
    f"""
    WITH RECURSIVE {_EDGES_ORACLE},
    reach AS (
        SELECT 'c:1' AS node
        UNION
        SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node FROM reach
    """,
)
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    roots = spark.createDataFrame([("c:1",)], ["node"])
    return distributed_reachable(_derived_edges(cat), roots)


# G3 — longest-path topological levels, distributed fixpoint
# (reference move_referring_concepts_down, concept_csv_export.py:499-530).
@register(
    "graph_topo_levels",
    f"""
    WITH RECURSIVE {_EDGES_ORACLE},
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    walk AS (
        SELECT node, 0 AS lvl FROM nodes
        WHERE node NOT IN (SELECT dst FROM edges)
        UNION ALL
        SELECT e.dst, w.lvl + 1 FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node, MAX(lvl) AS lvl FROM walk GROUP BY node
    """,
)
def graph_topo_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return distributed_topo_levels(_derived_edges(cat))


# §7 extension — as-of join (backward, inclusive): each purchase matched to
# the user's most recent click at or before it. Implemented with the
# union + ordered-window carry-forward pattern: ONE shuffle on the key, no
# range explosion — the scalable shape for event-time alignment at 100 TB.
@register(
    "asof_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    headline=True,
)
def asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols={"event_id": "click_id", "ts": "click_ts"},
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "click_id",
        "click_ts",
    )


# §2.11 extension — tumbling event-time window (batch-first; identical
# expression runs under Structured Streaming, see streaming/windows.py).
@register(
    "tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money(F.sum(_dec(F.col("value")))).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# §2.11 extension — sliding window (2h length, 1h slide): each event lands
# in two windows; the oracle replays the assignment with a 2-row union.
@register(
    "sliding_window",
    """
    WITH assigned AS (
        SELECT date_trunc('hour', ts) AS win_start, value FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, value FROM events
    )
    SELECT win_start, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_value
    FROM assigned GROUP BY win_start
    """,
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money(F.sum(_dec(F.col("value")))).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
    )


# §2.11 extension — session window (30 min gap) per user; oracle replays the
# merge with gaps-and-islands. New session iff gap >= 30 min (Spark's session
# window is half-open [first, last+gap)).
@register(
    "session_window",
    """
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    headline=True,
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money(F.sum(_dec(F.col("value")))).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Batch 4 — training-data pipeline operators: dedup, similarity, text.
# The DuckDB oracles replay the exact polynomial-hash pipelines (the hash is
# a plain arithmetic fold precisely so the oracle can mirror it).
# ---------------------------------------------------------------------------
from iniz_exporters_spark.functions.text import (
    doc_fingerprint,
    predict_lang,
    quality_score,
    whitespace_token_count,
)
from iniz_exporters_spark.operators.dedup import (
    dedup_exact,
    minhash_signatures,
    neardup_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from iniz_exporters_spark.operators.similarity import ann_bucketed, knn_bruteforce

# shared DuckDB fragments mirroring functions/text.py
_SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)
_SQL_POLY = (
    "list_reduce(list_transform(string_split({s}, ''), c -> ascii(c)::BIGINT),"
    " (a, b) -> (a * 31 + b) % 1000000007)"
)
_SQL_SHINGLE_SET = (
    "list_distinct(list_transform(range(1, greatest(length(text) - 4, 1) + 1),"
    " i -> " + _SQL_POLY.format(s="substr(text, i, 5)") + "))"
)
def _sql_minhash_sigs(num_perm: int, table: str = "documents") -> str:
    return f"""
    sh AS (SELECT doc_id, {_SQL_SHINGLE_SET} AS hs FROM {table}),
    sig AS (
        SELECT doc_id, j,
               list_min(list_transform(hs,
                   h -> ((1000003 * j + 1) * h + (7919 * j + 12345))
                        % 1000000007)) AS minhash
        FROM sh CROSS JOIN (SELECT unnest(range(0, {num_perm})) AS j) perms
    )
"""


# Exact dedup — hash-groupBy keep-first (one shuffle on the dedup key).
@register(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
    headline=True,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "n_copies")


# MinHash signatures — 8 permutations over 5-char shingle sets, computed as
# per-row array expressions (zero shuffles).
@register(
    "minhash_signatures",
    f"WITH {_sql_minhash_sigs(8)} SELECT doc_id, j, minhash FROM sig",
    headline=True,
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return minhash_signatures(d, "doc_id", "text", num_perm=8, k=5)


# MinHash-LSH near-duplicate pairs — banded bucket join + exact Jaccard on
# candidates only (cost ∝ near-dup pairs, not n²).
@register(
    "neardup_pairs",
    f"""
    WITH {_sql_minhash_sigs(16)},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT id_a, id_b,
               ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                     / (len(ha.hs) + len(hb.hs)
                        - len(list_intersect(ha.hs, hb.hs))), 4) AS jaccard
        FROM cand
        JOIN sh ha ON ha.doc_id = id_a
        JOIN sh hb ON hb.doc_id = id_b
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.7
    """,
)
def neardup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return neardup_pairs(
        d, "doc_id", "text", threshold=0.7, num_perm=16, rows_per_band=4, k=5
    )


# MinHash estimator quality, fully value-checked (not just bounded): for
# every LSH candidate pair, the signature-agreement estimate
# (#matching perms / 16) next to the exact shingle-set Jaccard — the
# estimator is deterministic (fixed permutations), so BOTH columns
# hash-match the oracle exactly. This is the measurement a pipeline uses
# to tune band geometry before trusting LSH at 100 TB.
@register(
    "minhash_estimate_q",
    f"""
    WITH {_sql_minhash_sigs(16)},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    m AS (
        SELECT c.id_a, c.id_b,
               CAST(SUM(CASE WHEN x.minhash = y.minhash THEN 1 ELSE 0 END)
                    AS INT) AS n_match
        FROM cand c
        JOIN sig x ON x.doc_id = c.id_a
        JOIN sig y ON y.doc_id = c.id_b AND y.j = x.j
        GROUP BY c.id_a, c.id_b
    )
    SELECT m.id_a, m.id_b, m.n_match,
           ROUND(m.n_match / 16.0, 4) AS est_jaccard,
           ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                 / (len(ha.hs) + len(hb.hs)
                    - len(list_intersect(ha.hs, hb.hs))), 4) AS exact_jaccard
    FROM m
    JOIN sh ha ON ha.doc_id = m.id_a
    JOIN sh hb ON hb.doc_id = m.id_b
    """,
)
def minhash_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.dedup import (
        buckets_from_shingle_sets,
        candidate_pairs,
        minhash_signatures as mh_sigs,
        shingle_sets,
    )

    d = Catalog(spark, sf_dir).documents
    hs = shingle_sets(d, "doc_id", "text", 5).localCheckpoint(eager=False)
    pairs = candidate_pairs(
        buckets_from_shingle_sets(hs, "doc_id", 16, 4), "doc_id"
    )
    sigs = mh_sigs(d, "doc_id", "text", num_perm=16, k=5)
    sa = sigs.select(
        F.col("doc_id").alias("id_a"), "j", F.col("minhash").alias("m_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"), "j", F.col("minhash").alias("m_b")
    )
    est = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "j"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.when(F.col("m_a") == F.col("m_b"), 1).otherwise(0)
            )
            .cast("int")
            .alias("n_match")
        )
        .withColumn("est_jaccard", F.round(F.col("n_match") / 16.0, 4))
    )
    ha = hs.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a"))
    hb = hs.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        est.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "exact_jaccard", F.round(inter.cast("double") / union, 4)
        )
        .select("id_a", "id_b", "n_match", "est_jaccard", "exact_jaccard")
    )


# SimHash — 32-bit signature from token-hash bit votes (CTE shared with
# simhash_neardup's oracle).
_SQL_SIMHASH_CTE = f"""
    th AS (
        SELECT doc_id,
               list_transform({_SQL_TOKENS}, t -> {_SQL_POLY.format(s="t")})
                   AS hs
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               list_reduce(list_transform(range(0, 32), b ->
                   CASE WHEN list_reduce(list_transform(hs,
                                  h -> CASE WHEN (h >> b) & 1 = 1
                                            THEN 1 ELSE -1 END),
                              (x, y) -> x + y) > 0
                        THEN (1::BIGINT << b) ELSE 0 END),
                   (x, y) -> x + y) AS simhash
        FROM th
    )
"""


@register(
    "simhash",
    f"""
    WITH {_SQL_SIMHASH_CTE}
    SELECT doc_id, simhash FROM sig
    """,
)
def simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return simhash_signatures(d, "doc_id", "text", bits=32)


# Banded-Hamming near-dup over SimHash (Manku et al. 2007): candidates
# share one of four 8-bit signature bands (pigeonhole → exact recall at
# Hamming ≤ 3), verified by popcount. The text-side twin of phash_neardup.
@register(
    "simhash_neardup_q",
    f"""
    WITH {_SQL_SIMHASH_CTE},
    b AS (SELECT doc_id, simhash,
                 CAST((simhash >> 0) & 255 AS INT) AS b0,
                 CAST((simhash >> 8) & 255 AS INT) AS b1,
                 CAST((simhash >> 16) & 255 AS INT) AS b2,
                 CAST((simhash >> 24) & 255 AS INT) AS b3
          FROM sig),
    cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
               x.simhash AS sa, y.simhash AS sb
        FROM b x JOIN b y
          ON x.doc_id < y.doc_id
         AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
    )
    SELECT id_a, id_b, hamming FROM (
        SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM cand
    ) WHERE hamming <= 3
    """,
)
def simhash_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.dedup import simhash_neardup

    d = Catalog(spark, sf_dir).documents
    return simhash_neardup(d, "doc_id", "text", bits=32, n_bands=4)


# Document fingerprint — polynomial hash of normalized text.
_SQL_NORM_TEXT = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_SQL_FINGERPRINT = _SQL_POLY.format(s=_SQL_NORM_TEXT)


@register(
    "doc_fingerprint",
    f"""
    SELECT doc_id, {_SQL_FINGERPRINT} AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


# Token counting — whitespace tokens + characters.
@register(
    "token_count",
    """
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> '')) AS n_tokens,
           length(text) AS n_chars_actual
    FROM documents
    """,
)
def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        whitespace_token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


# Quality scoring — punctuation / stopword / length composite.
@register(
    "quality_score",
    f"""
    WITH t AS (
        SELECT doc_id, length(text) AS n,
               length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   AS n_punct,
               {_SQL_TOKENS} AS toks
        FROM documents
    )
    SELECT doc_id,
           ROUND(CAST(
             0.4::DOUBLE * (1 - CASE WHEN n = 0 THEN 0::DOUBLE
                                     ELSE n_punct::DOUBLE / n END)
           + 0.3::DOUBLE * least(
                 (CASE WHEN len(toks) = 0 THEN 0::DOUBLE
                       ELSE len(list_filter(toks, x -> x IN
                            ('the','a','and','of','to','in','is','it')))::DOUBLE
                            / len(toks) END) * 5, 1.0::DOUBLE)
           + 0.3::DOUBLE * least(n::DOUBLE / 500, 1.0::DOUBLE)
           AS DECIMAL(28,12)), 4)::DOUBLE AS quality
    FROM t
    """,
)
def quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", quality_score("text").alias("quality"))


# Language-ID heuristic — stopword-hit argmax, en>es>de>fr tie priority.
@register(
    "lang_id",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    s AS (
        SELECT doc_id,
               len(list_filter(toks, x -> x IN
                   ('the','a','and','of','to','in','is','it'))) AS c_en,
               len(list_filter(toks, x -> x IN
                   ('el','la','de','que','y','los','en','un'))) AS c_es,
               len(list_filter(toks, x -> x IN
                   ('der','die','das','und','ist','ein','nicht','mit'))) AS c_de,
               len(list_filter(toks, x -> x IN
                   ('le','la','de','et','est','les','des','une'))) AS c_fr
        FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
                WHEN c_en = greatest(c_en, c_es, c_de, c_fr) THEN 'en'
                WHEN c_es = greatest(c_en, c_es, c_de, c_fr) THEN 'es'
                WHEN c_de = greatest(c_en, c_es, c_de, c_fr) THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM s
    """,
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", predict_lang("text").alias("lang_pred"))


# Exact k-NN — brute-force cosine top-5 for the first 10 query vectors;
# broadcast queries × corpus, ranked by rounded cosine (stable tiebreak).
@register(
    "knn_bruteforce",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.v, c.v), 4) AS cos
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    ) t WHERE rn <= 5
    """,
    headline=True,
)
def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return knn_bruteforce(
        corpus=e, queries=e.filter(F.col("vec_id") < 10), top_k=5
    )


# Approximate NN — sign-bucket LSH: search only within each vector's
# 4-bit sign bucket (deterministic fixed hyperplanes → oracle-checkable).
@register(
    "ann_bucketed",
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               list_reduce(list_transform(range(0, 4), d ->
                   CASE WHEN embedding[d + 1] >= 0
                        THEN power(2, d)::BIGINT ELSE 0::BIGINT END),
                   (x, y) -> x + y) AS bucket
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.v, c.v), 4) AS cos
        FROM e q JOIN e c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    ) t WHERE rn <= 3
    """,
)
def ann_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return ann_bucketed(e, bits=4, top_k=3)


# ---------------------------------------------------------------------------
# Extension surface, round-1 widening: embedding-cosine near-dup, grouping
# sets, approx-distinct (error-bound-checked), exact percentiles, and two
# TPC-H-style multi-join headline queries (join-order / broadcast showcase).
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.similarity import cosine_neardup


# Embedding-cosine near-duplicate pairs — the embedding-space member of the
# dedup family (SURVEY §7 phase 5): sign-bucket LSH candidates, rounded
# cosine ≥ 0.8, id_a < id_b.
@register(
    "embedding_cosine_neardup",
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               list_reduce(list_transform(range(0, 4), d ->
                   CASE WHEN embedding[d + 1] >= 0
                        THEN power(2, d)::BIGINT ELSE 0::BIGINT END),
                   (x, y) -> x + y) AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.5
    """,
)
def embedding_cosine_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return cosine_neardup(e, bits=4, threshold=0.5)


# GROUPING SETS / cube — multi-granularity aggregate in one pass
# (§2.4 extension; partial aggregation applies per grouping set).
@register(
    "cube_agg",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS rf,
           COALESCE(l_linestatus, '<all>') AS ls,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            _money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "gid",
            "sum_qty",
            "n",
        )
    )


# Approximate distinct-count (HyperLogLog++) checked against the exact
# count inside the query: the oracle-comparable output is the exact count
# plus a within-5% flag, so the approx machinery is exercised while the
# comparison stays deterministic across engines.
@register(
    "approx_distinct_check",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_nd,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("exact_nd"),
            F.approx_count_distinct("l_partkey", 0.02).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_nd",
            (
                F.abs(F.col("__approx") - F.col("exact_nd"))
                <= 0.05 * F.col("exact_nd")
            ).alias("approx_ok"),
        )
    )


# Exact interpolated percentiles per group (§2.4 extension).
@register(
    "percentile_agg",
    """
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.5)
                      AS DECIMAL(28,3)), 2)::DOUBLE AS p50,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.9)
                      AS DECIMAL(28,3)), 2)::DOUBLE AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated percentiles are a + f*(b - a) of 2-dp prices, so the
    true value is a multiple of 0.001 — but the two engines associate the
    interpolation differently, and a one-ulp difference at an exact .xx5
    cent boundary flips ROUND(..., 2) (observed at sf0.001). Casting to
    decimal(28,3) first recovers the exact 3-dp value on both engines, so
    the half-up round to cents is deterministic."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.expr("percentile(l_extendedprice, 0.5)").cast("decimal(28,3)"), 2
        )
        .cast("double")
        .alias("p50"),
        F.round(
            F.expr("percentile(l_extendedprice, 0.9)").cast("decimal(28,3)"), 2
        )
        .cast("double")
        .alias("p90"),
    )


# TPC-H Q3 (shipping priority): customer ⋈ orders ⋈ lineitem with
# selective filters on both sides, agg, global top-10. Scale notes: both
# date filters push to the parquet scans; customer (filtered) broadcasts;
# the orders⋈lineitem join shuffles on orderkey; top-10 is a
# TakeOrderedAndProject (no global sort materialization).
@register(
    "tpch_q3",
    """
    SELECT l_orderkey,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    revenue = F.sum(
        _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    )
    return (
        cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(
            cat.orders.filter(
                F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            cat.lineitem.filter(
                F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4's EXISTS is a LEFT SEMI join: the lineitem side is key+date
    projected before the shuffle, the semi join never duplicates order
    rows, and the priority agg combines map-side. Completes the TPC-H
    suite (q1 appears as q1_pricing_summary). The synthetic lineitem has
    no commit/receipt dates, so "late line item" is l_shipdate more than
    60 days after the order date — same correlated-EXISTS shape."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_shipdate")
    return (
        cat.orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# TPC-H Q5 (local supplier volume): 6-table join; region/nation broadcast,
# the fact-side joins shuffle on their keys; one hash agg on n_name.
@register(
    "tpch_q5",
    """
    SELECT n_name,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    headline=True,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    revenue = F.sum(
        _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    )
    return (
        cat.customer.join(
            cat.orders.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cat.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(cat.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(cat.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(_money(revenue).alias("revenue"))
    )


# IVF-flat ANN — the inverse-file scale path for similarity search:
# deterministic centroids (lowest-id vectors), nearest-centroid cells,
# in-cell exact top-k (nprobe=1).
from iniz_exporters_spark.operators.similarity import ivf_flat_topk


@register(
    "ivf_flat_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v
        FROM e ORDER BY vec_id LIMIT 8
    ),
    assigned AS (
        SELECT vec_id, v, cidx AS cell FROM (
            SELECT e.vec_id, e.v, c.cidx,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND(list_cosine_similarity(e.v, c.v), 4)
                                DESC, c.cidx
                   ) AS rnk
            FROM e CROSS JOIN cents c
        ) t WHERE rnk = 1
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.v, c.v), 4) AS cos
        FROM assigned q JOIN assigned c
          ON q.cell = c.cell AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    ) t WHERE rn <= 3
    """,
)
def ivf_flat_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return ivf_flat_topk(e, n_centroids=8, top_k=3)


# Token counting, BPE-ish: the GPT-2-style pre-tokenizer split (contraction
# suffixes | space-prefixed letter runs | digit runs | punctuation runs)
# counted per document alongside the whitespace count.
BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


@register(
    "bpe_token_count",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_ISH.replace("'", "''")}'))
               AS n_bpe_tokens,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> '')) AS n_ws_tokens
    FROM documents
    """,
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(BPE_ISH)).alias("n_bpe_tokens"),
        whitespace_token_count("text").alias("n_ws_tokens"),
    )


# Salted skew join — semantics-preserving hot-key spreading; the oracle is
# the plain join, proving salting changes the plan, not the result.
from iniz_exporters_spark.operators.skew import salted_join


@register(
    "salted_skew_join",
    """
    SELECT l_orderkey, l_partkey,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(8,4))), 2)
                AS DOUBLE) AS net,
           o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    """,
)
def salted_skew_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select(
        "l_orderkey",
        "l_partkey",
        # round in exact decimal space BEFORE the double cast: Spark's
        # round(double) goes through the shortest decimal repr while
        # DuckDB rounds the binary value, so per-row .xx5 products would
        # disagree by one cent (aggregate-then-round paths don't hit this)
        F.round(
            _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4)),
            2,
        ).cast("double").alias("net"),
    )
    o = cat.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return salted_join(li, o, on="l_orderkey", buckets=8, how="inner")


# ---------------------------------------------------------------------------
# End-to-end training-data cleaning pipeline: language filter → quality
# filter → exact dedup → near-dup removal → per-doc stats. One composed
# DataFrame plan (each stage is the already-oracle-checked operator), with
# the whole composition replayed in oracle CTEs — the "switch your corpus
# pipeline to this engine" demonstration.
# ---------------------------------------------------------------------------
@register(
    "pipeline_clean_corpus",
    f"""
    WITH t0 AS (
        SELECT doc_id, text, length(text) AS n,
               length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   AS n_punct,
               {_SQL_TOKENS} AS toks
        FROM documents
    ),
    scored AS (
        SELECT doc_id, text,
               ROUND(CAST(
                 0.4::DOUBLE * (1 - CASE WHEN n = 0 THEN 0::DOUBLE
                                         ELSE n_punct::DOUBLE / n END)
               + 0.3::DOUBLE * least(
                     (CASE WHEN len(toks) = 0 THEN 0::DOUBLE
                           ELSE len(list_filter(toks, x -> x IN
                                ('the','a','and','of','to','in','is','it')))::DOUBLE
                                / len(toks) END) * 5, 1.0::DOUBLE)
               + 0.3::DOUBLE * least(n::DOUBLE / 500, 1.0::DOUBLE)
               AS DECIMAL(28,12)), 4)::DOUBLE
                   AS quality,
               len(list_filter(toks, x -> x IN
                   ('the','a','and','of','to','in','is','it'))) AS c_en,
               len(list_filter(toks, x -> x IN
                   ('el','la','de','que','y','los','en','un'))) AS c_es,
               len(list_filter(toks, x -> x IN
                   ('der','die','das','und','ist','ein','nicht','mit'))) AS c_de,
               len(list_filter(toks, x -> x IN
                   ('le','la','de','et','est','les','des','une'))) AS c_fr
        FROM t0
    ),
    filtered AS (
        SELECT doc_id, text, quality FROM scored
        WHERE quality >= 0.5
          AND greatest(c_en, c_es, c_de, c_fr) > 0
          AND c_en = greatest(c_en, c_es, c_de, c_fr)
    ),
    exact AS (
        SELECT f.doc_id, f.text, f.quality
        FROM filtered f
        JOIN (SELECT text, MIN(doc_id) AS keep FROM filtered GROUP BY text) k
          ON f.text = k.text AND f.doc_id = k.keep
    ),
    {_sql_minhash_sigs(16, table="exact")},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    dropped AS (
        SELECT DISTINCT id_b FROM cand
        JOIN sh ha ON ha.doc_id = id_a
        JOIN sh hb ON hb.doc_id = id_b
        WHERE ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                    / (len(ha.hs) + len(hb.hs)
                       - len(list_intersect(ha.hs, hb.hs))), 4) >= 0.7
    )
    SELECT e.doc_id, e.quality,
           len(list_filter(regexp_split_to_array(trim(e.text), '\\s+'),
                           x -> x <> '')) AS n_tokens
    FROM exact e LEFT JOIN dropped d ON e.doc_id = d.id_b
    WHERE d.id_b IS NULL
    """,
    headline=True,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.functions.text import text_stats

    d = Catalog(spark, sf_dir).documents
    # one Arrow pass for quality + language (bit-identical to the HOF
    # expression path — see text_stats parity test); round is applied
    # Spark-side so rounding semantics match the single-op queries
    stats = text_stats(d, "doc_id", "text").select(
        "doc_id",
        # decimal-space round (see functions/text.quality_score): absorbs
        # cross-engine ulp noise at exact .xxxx5 boundaries before half-up
        F.round(F.col("quality_raw").cast("decimal(28,12)"), 4)
        .cast("double")
        .alias("quality"),
        "lang_pred",
    )
    scored = d.select("doc_id", "text").join(stats, "doc_id")
    filtered = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
    ).select("doc_id", "text", "quality")
    # materialize the scored+deduped set ONCE: the near-dup stage reads it
    # from three branches (buckets + both verify-join sides) and the final
    # anti-join from a fourth — without pinning, Spark recomputes the
    # interpreted scoring expressions 4×. At cluster scale this is a
    # .persist(DISK_AND_MEMORY); localCheckpoint is its local[*] analogue.
    exact = dedup_exact(filtered, ["text"], "doc_id").localCheckpoint()
    dropped = (
        neardup_pairs(exact, "doc_id", "text", threshold=0.7,
                      num_perm=16, rows_per_band=4)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return exact.join(dropped, on="doc_id", how="left_anti").select(
        "doc_id",
        "quality",
        whitespace_token_count("text").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# TPC-H relational breadth (adapted to the driver's reduced schemas: no
# partsupp/commitdate/shipmode, so Q2/Q4/Q12 take the documented stand-ins).
# Scale notes per query in the function docstrings.
# ---------------------------------------------------------------------------
@register(
    "tpch_q6",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                           * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan+filter+agg — all three predicates push to the parquet
    scan, a single partial-agg per split, one 1-row exchange. O(scan)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _money(
            F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount"), 8, 4))
        ).alias("revenue")
    )


@register(
    "tpch_q7",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume-shipping shape: fact joins two *roles* of the same
    dimension chain. supplier/nation broadcast (tiny); the disjunctive
    nation filter runs post-broadcast-join so only orders⋈lineitem and
    orders⋈customer shuffle. Year extraction stays in codegen."""
    cat = Catalog(spark, sf_dir)
    n1 = cat.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = cat.nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.sum(
        _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    )
    return (
        cat.lineitem.join(
            F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_money(revenue).alias("revenue"))
    )


@register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE)
               AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-items: both filters (quarter, returnflag) push below
    their joins, nation broadcasts, and the top-20 runs as TakeOrdered
    (per-partition heap + driver merge — no global sort). Tiebreak on
    c_custkey keeps the LIMIT row-set deterministic."""
    cat = Catalog(spark, sf_dir)
    # round the exact decimal sum BEFORE the double cast (see salted_skew_join
    # note): customer-level sums land on .xx5 boundaries at sf0.01.
    revenue = F.round(
        F.sum(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))),
        2,
    ).cast("double")
    return (
        cat.customer.join(
            cat.orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            cat.lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q14",
    """
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(8,4)))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                           * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 4)
               AS promo_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promo share: month filter pushes to the lineitem scan (cuts the
    join probe ~70×), part broadcasts, both conditional sums ride one
    partial agg. Division happens once on exact decimal sums."""
    cat = Catalog(spark, sf_dir)
    disc_price = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    return (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(cat.part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double") / F.sum(disc_price).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q18",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    headline=True,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: the HAVING subquery is a lineitem-wide
    partial agg whose survivors (~0.3% of orders) LEFT-SEMI into orders
    *before* the customer join — the expensive joins see only qualifying
    rows. At 100 TB the semi-join side is small enough to broadcast; AQE
    converts it at runtime."""
    cat = Catalog(spark, sf_dir)
    big = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("_q"))
        .filter(F.col("_q") > 300)
        .select(F.col("l_orderkey").alias("_big_ok"))
    )
    return (
        cat.orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("_big_ok"), "left_semi"
        )
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE), 2)
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 disjunctive-predicate join: the OR spans both sides so it can't
    fully push down, but Catalyst still pushes the derived single-side
    envelopes (quantity ≤ 30, the brand IN-list) below the broadcast-hash
    join; the full disjunction evaluates in codegen post-join."""
    cat = Catalog(spark, sf_dir)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 30))
    )
    return (
        cat.lineitem.join(F.broadcast(cat.part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            _money(
                F.sum(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4)))
            ).alias("revenue")
        )
    )


@register(
    "q4_exists_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape on the reduced schema (ships-late EXISTS instead of
    commit/receipt dates): EXISTS becomes a LEFT-SEMI hash join — lineitem
    never duplicates orders rows, and the quarter filter shrinks the probe
    side before the shuffle."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = cat.lineitem
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] >= o["o_orderdate"] + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Range / interval joins (operators/rangejoin.py): band predicates rewritten
# to equi-join shape so Spark picks hash joins instead of
# BroadcastNestedLoop / cartesian. The oracles use the naive inequality join
# (DuckDB handles that fine at sf0.01) — same declared semantics.
# ---------------------------------------------------------------------------
@register(
    "interval_join_events",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 6 HOUR
     AND c.ts < p.ts
    """,
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style interval join: each purchase paired with the same
    user's clicks in the preceding 6 h. interval_join buckets time into
    band-width granules so the plan is a shuffled HASH join on
    (user_id, bucket) — each side shuffles once (left ×2 rows), per-task
    probe work bounded by the micro-group, vs. the O(|P|·|C|)-per-user
    nested loop the raw inequality condition would plan. Survives 100 TB:
    shuffle is linear in input, AQE splits hot (user, bucket) groups."""
    from iniz_exporters_spark.operators.rangejoin import interval_join

    # two Catalog instances → independent scans (no self-join ambiguity)
    purchases = (
        Catalog(spark, sf_dir)
        .events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            "user_id",
        )
    )
    clicks = (
        Catalog(spark, sf_dir)
        .events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
            "user_id",
        )
    )
    return interval_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_time="p_ts",
        right_time="c_ts",
        lower_seconds=6 * 3600,
    ).select("purchase_id", "click_id")


@register(
    "band_lookup_prices",
    """
    SELECT band, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_qty
    FROM lineitem
    JOIN (VALUES ('budget', 0.0, 20000.0),
                 ('mid', 20000.0, 60000.0),
                 ('premium', 60000.0, 110000.0)) b(band, lo, hi)
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
)
def band_lookup_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding a fact column against a keyless [lo, hi) dimension.
    band_lookup_join explodes each band into fixed-width granules and
    broadcast-HASH-joins the fact's granule key — the lineitem side streams
    through whole-stage codegen once, vs. BroadcastNestedLoopJoin re-testing
    every band per row. Granule count stays metadata-sized at any SF."""
    from iniz_exporters_spark.operators.rangejoin import band_lookup_join

    li = Catalog(spark, sf_dir).lineitem
    banded = band_lookup_join(
        li,
        "l_extendedprice",
        [("budget", 0.0, 20000.0), ("mid", 20000.0, 60000.0),
         ("premium", 60000.0, 110000.0)],
    )
    return banded.groupBy("band").agg(
        F.count("*").alias("n"),
        _money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Scalar-subquery / correlated-aggregate / outer-join-distribution family
# (TPC-H Q13/Q15/Q17/Q22 shapes on the reduced schema). Correlated
# comparisons against an AVG are multiplied through by the group COUNT so
# both engines compare exact decimals — a double AVG at a boundary value
# could flip a row in one engine only.
# ---------------------------------------------------------------------------
@register(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 order-count distribution: the priority predicate lives in the
    outer-join ON clause (customers keep their row when every order is
    filtered away — COUNT(o_orderkey) then counts zero non-nulls). Two
    cascading aggs: the first shuffles on c_custkey, the second sees only
    |distinct counts| rows. At 100 TB, AQE coalesces the tiny second
    exchange."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders
    per_cust = (
        cat.customer.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15",
    """
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: per-supplier quarterly revenue, then keep rows
    equal to the global max. The 1-row max side broadcasts; revenue is
    compared as an exact decimal (ties keep every winner) and only
    presentation rounds. Revenue agg shuffles once on l_suppkey."""
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS pk,
                 SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
                 COUNT(*) AS cnt
          FROM lineitem GROUP BY l_partkey) pa
      ON pa.pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND 5 * CAST(l_quantity AS DECIMAL(18,4)) * cnt < sq
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity revenue: the correlated `l_quantity <
    0.2*AVG(l_quantity per part)` is computed as one per-part aggregate
    joined back to lineitem, with the comparison multiplied through by the
    count (5·q·cnt < sum) so it stays in exact decimals. The per-part agg
    and the probe share the l_partkey shuffle key; the Brand filter
    broadcasts."""
    cat = Catalog(spark, sf_dir)
    per_part = cat.lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec(F.col("l_quantity"))).alias("sq"),
        F.count("*").alias("cnt"),
    )
    return (
        cat.lineitem.join(
            F.broadcast(cat.part.filter(F.col("p_brand") == "Brand#23")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(per_part, F.col("pk") == F.col("l_partkey"))
        .filter(F.lit(5) * _dec(F.col("l_quantity")) * F.col("cnt") < F.col("sq"))
        .agg(
            F.round(
                F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q22",
    """
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer
    JOIN (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s, COUNT(*) AS n
          FROM customer WHERE c_acctbal > 0.0) g
      ON CAST(c_acctbal AS DECIMAL(18,4)) * n > s
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global-customer shape (nationkey stands in for the phone
    country code): rich customers = above-average balance (exact decimal,
    multiplied through by the count) with no URGENT orders (LEFT-ANTI
    against the filtered orders side — plain no-orders is vacuous on this
    dataset where every customer orders). The 1-row global aggregate
    broadcasts; the anti-join shuffles on custkey only."""
    cat = Catalog(spark, sf_dir)
    g = cat.customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec(F.col("c_acctbal"))).alias("s"), F.count("*").alias("n")
    )
    return (
        cat.customer.join(
            F.broadcast(g), _dec(F.col("c_acctbal")) * F.col("n") > F.col("s")
        )
        .join(
            cat.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec(F.col("c_acctbal"))), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "grouping_sets_agg",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than cube/rollup): Spark expands the
    sets into one pass over the scan — a single Expand node feeding one
    hash agg, not three scans. Decimal sums keep every grouping level
    order-independent."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(_dec(F.col("l_quantity"))), 2).cast("double").alias("sum_qty"),
    )


@register(
    "window_lag_gaps",
    """
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
    FROM events
    """,
)
def window_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap via LAG — the sessionization primitive.
    One shuffle on user_id, in-partition sort (ts, event_id tiebreak makes
    equal timestamps deterministic); the gap is an exact microsecond
    integer in both engines (no per-engine epoch truncation)."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )


# ---------------------------------------------------------------------------
# Conditional-share, multi-role-join, and only-one-qualifier shapes
# (TPC-H Q8/Q9/Q21 on the reduced schema) + JSON extraction over
# events.props.
# ---------------------------------------------------------------------------
@register(
    "tpch_q8",
    """
    SELECT year(o_orderdate) AS o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                               THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END)
                      AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE), 4) AS mkt_share
    FROM (SELECT o_orderdate, n1.n_name AS supp_nation,
                 CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(8,4))) AS vol
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON n1.n_nationkey = s_nationkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n2 ON n2.n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n2.n_regionkey
          WHERE r_name = 'ASIA') t
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 market share: NATION_1 suppliers' slice of revenue to ASIA
    customers, per year. Both nation roles + region broadcast; the
    numerator rides the same partial agg as the denominator (one shuffle
    on o_year, 6 groups). Share divides the two exact-decimal sums once,
    in double, at presentation."""
    cat = Catalog(spark, sf_dir)
    n_s = cat.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    asia_nk = (
        cat.nation.join(
            F.broadcast(cat.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("c_nk"))
    )
    vol = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        cat.lineitem.join(
            F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(asia_nk), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2)
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name, year(o_orderdate)
    """,
    headline=True,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 profit by supplier nation × order year (no ps_supplycost in the
    reduced schema, so profit = discounted revenue on '%red%' parts). The
    part LIKE filter broadcasts and prunes lineitem BEFORE the orders
    join — the one big shuffle probes only matching rows."""
    cat = Catalog(spark, sf_dir)
    red = cat.part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    return (
        cat.lineitem.join(
            F.broadcast(red), F.col("p_partkey") == F.col("l_partkey")
        )
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(
                    _dec(F.col("l_extendedprice"))
                    * (1 - _dec(F.col("l_discount"), 8, 4))
                ),
                2,
            )
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", "o_year")
    )


@register(
    "tpch_q21",
    """
    WITH lo AS (
        SELECT l_orderkey, l_suppkey,
               MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 100 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey),
    per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
        FROM lo GROUP BY l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM lo
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE lo.is_late = 1 AND per_order.n_supp > 1 AND per_order.n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 waiting-supplier shape: suppliers who were the ONLY late
    shipper in a multi-supplier finished order ("late" = shipped >100 days
    after ordering; the reduced schema has no commit/receipt dates). The
    classic EXISTS + NOT-EXISTS pair is restructured as one
    (orderkey, suppkey) aggregate reused by a per-order rollup — two
    shuffles total on the same key family, no correlated re-scans of
    lineitem. The rollup side re-uses the first agg's partitioning."""
    cat = Catalog(spark, sf_dir)
    lo = (
        cat.lineitem.join(
            cat.orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 100 DAY"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        lo.join(per_order, "l_orderkey")
        .filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "json_extract_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: events.props holds a JSON object; pull
    an integer field and aggregate. get_json_object evaluates JVM-side
    inside codegen (no Python). At 100 TB, prefer from_json with an
    explicit schema once the shape is known — single parse, columnar
    output — but path extraction is the schemaless fallback shown here."""
    ev = Catalog(spark, sf_dir).events
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — min-cost supplier (reference has no TPC-H; this is §7
# extension breadth: correlated-MIN turned into one window over the
# candidate set). The testdata schema has no partsupp, so the
# part↔supplier cost relation is derived from lineitem: a pair's unit
# cost is its cheapest observed price-per-unit. Scale notes: the
# (part,supplier) agg and the per-part window MIN share the l_partkey
# key family, so AQE keeps it to two shuffles; supplier⨝nation⨝region
# is a broadcast chain (dims are tiny); the final TakeOrderedAndProject
# never materializes a global sort.
# ---------------------------------------------------------------------------
@register(
    "tpch_q2",
    """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DOUBLE)
                   / CAST(l_quantity AS DOUBLE)) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
        SELECT p_partkey, p_brand, s_suppkey, s_acctbal, s_name, n_name,
               unit_cost,
               MIN(unit_cost) OVER (PARTITION BY p_partkey) AS best_cost
        FROM ps
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE p_type = 'STANDARD' AND p_size < 15 AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           ROUND(unit_cost, 4) AS unit_cost
    FROM eligible
    WHERE unit_cost = best_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 min-cost-supplier shape over the reduced schema (partsupp is
    derived from lineitem).  The correlated scalar subquery of the
    canonical Q2 is restructured as MIN() OVER (PARTITION BY part) on the
    already-filtered candidate set — one extra exchange instead of a
    second correlated scan of lineitem."""
    cat = Catalog(spark, sf_dir)
    ps = cat.lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ).alias("unit_cost")
    )
    eligible = (
        ps.join(
            F.broadcast(
                cat.part.filter(
                    (F.col("p_type") == "STANDARD") & (F.col("p_size") < 15)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cat.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(cat.region.filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .withColumn(
            "best_cost", F.min("unit_cost").over(Window.partitionBy("p_partkey"))
        )
    )
    return (
        eligible.filter(F.col("unit_cost") == F.col("best_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape — important-part value: global scalar subquery in
# HAVING. Scale notes: both the per-part agg and the grand total come
# from ONE filtered join (Spark reuses the cached filtered frame; the
# total is a 1-row broadcast), so lineitem is scanned once per agg with
# the nation filter pushed through the broadcast-join.
# ---------------------------------------------------------------------------
@register(
    "tpch_q11",
    """
    WITH filtered AS (
        SELECT l_partkey,
               CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(8,4))) AS val
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_8')
    ),
    grouped AS (
        SELECT l_partkey, SUM(val) AS value_dec FROM filtered GROUP BY l_partkey
    ),
    total AS (SELECT SUM(value_dec) AS total_dec FROM grouped)
    SELECT l_partkey,
           ROUND(CAST(value_dec AS DOUBLE), 2) AS part_value
    FROM grouped, total
    WHERE CAST(value_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.002
    ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important-value shape: per-part value filtered against a
    fraction of the grand total (HAVING with a global scalar subquery).
    The threshold comparison happens in exact-decimal space cast to
    double, so Spark and the oracle compare bit-identical numbers."""
    cat = Catalog(spark, sf_dir)
    val = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), 8, 4))
    filtered = (
        cat.lineitem.join(
            F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(
            F.broadcast(cat.nation.filter(F.col("n_name").isin("NATION_3", "NATION_8"))),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("l_partkey", val.alias("val"))
    )
    grouped = filtered.groupBy("l_partkey").agg(F.sum("val").alias("value_dec"))
    total = grouped.agg(F.sum("value_dec").alias("total_dec"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("double")
            > F.col("total_dec").cast("double") * 0.002
        )
        .select(
            "l_partkey", F.round(F.col("value_dec").cast("double"), 2).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape — late-shipment priority split. The reduced schema
# has no l_shipmode/commitdate/receiptdate, so "mode" is the return
# flag and "late" is shipped >60 days after ordering. Exercises the
# Q12 operator essence: join + CASE-bucketed conditional counts.
# Scale notes: orders is the bigger side here only at tiny SF; the
# o_orderkey equi-join is the one shuffle (AQE picks broadcast at small
# SF), and both CASE sums fold into a single map-side partial agg over
# 3 groups.
# ---------------------------------------------------------------------------
@register(
    "tpch_q12",
    """
    SELECT l_returnflag AS ship_class,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 priority-split shape (no shipmode column → returnflag buckets,
    no receipt/commit dates → late = shipped >60 days after ordering).
    CASE-bucketed counts aggregate map-side; the date range pushes to the
    lineitem scan."""
    cat = Catalog(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — suppliers per part profile: COUNT(DISTINCT) plus a
# NOT-IN exclusion subquery. Scale notes: the exclusion list (suppliers
# with negative balance) is dim-sized → broadcast LEFT ANTI, never a
# shuffle; count-distinct over (brand,type,size) runs as a two-phase
# partial-distinct agg (Spark expands to partial dedup then count),
# shuffling only the distinct (group, suppkey) pairs.
# ---------------------------------------------------------------------------
@register(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier-count shape: NOT IN over a non-nullable key becomes a
    broadcast left-anti join; COUNT(DISTINCT) stays a built-in two-phase
    agg (no collect, no UDF)."""
    cat = Catalog(spark, sf_dir)
    bad = cat.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        cat.lineitem.join(
            F.broadcast(
                cat.part.filter(
                    (F.col("p_brand") != "Brand#13")
                    & (F.col("p_type") != "PROMO")
                    & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape — heavy suppliers of promo parts: nested correlated
# aggregate (pair quantity vs part total) driving a semi-join back to
# supplier. Scale notes: the pair agg and the per-part window total
# share the l_partkey shuffle key; the surviving supplier-key set is
# tiny → broadcast semi-join against supplier⨝nation, so the dimension
# row never rides a shuffle.
# ---------------------------------------------------------------------------
@register(
    "tpch_q20",
    """
    WITH promo AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) AS pair_qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    with_total AS (
        SELECT l_suppkey, CAST(pair_qty AS DOUBLE) AS pair_qty,
               CAST(SUM(pair_qty) OVER (PARTITION BY l_partkey) AS DOUBLE)
                   AS part_qty
        FROM promo
    ),
    heavy AS (
        SELECT DISTINCT l_suppkey FROM with_total
        WHERE pair_qty > 0.3 * part_qty
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s_name
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 excess-quantity shape (no partsupp.availqty → a pair is
    "heavy" when it shipped >30% of its part's promo volume). The
    canonical nested correlated subqueries become one agg + one window
    over the same key, then a LEFT SEMI join back to the dimension."""
    cat = Catalog(spark, sf_dir)
    promo = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(cat.part.filter(F.col("p_type") == "PROMO")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("pair_qty_dec"))
    )
    with_total = promo.select(
        "l_suppkey",
        F.col("pair_qty_dec").cast("double").alias("pair_qty"),
        F.sum("pair_qty_dec")
        .over(Window.partitionBy("l_partkey"))
        .cast("double")
        .alias("part_qty"),
    )
    heavy = (
        with_total.filter(F.col("pair_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        cat.supplier.join(
            F.broadcast(cat.nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(heavy),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup with AllPairs prefix filtering — the exact-recall
# counterpart to the probabilistic MinHash-LSH `neardup_pairs`. See
# operators/dedup.py::ngram_jaccard_pairs for the scale analysis.
# ---------------------------------------------------------------------------
@register(
    "ngram_jaccard_pairs",
    f"""
    WITH th AS (
        SELECT doc_id,
               list_transform({_SQL_TOKENS}, t -> {_SQL_POLY.format(s="t")}) AS th
        FROM documents
    ),
    gs AS (
        SELECT doc_id,
               list_sort(list_distinct(list_transform(range(1, len(th) - 1),
                   i -> ((th[i] * 1000003 + th[i+1]) % 1000000007 * 1000003
                         + th[i+2]) % 1000000007))) AS gs
        FROM th WHERE len(th) >= 3
    ),
    pref AS (
        SELECT doc_id,
               unnest(gs[1 : len(gs) - ((3 * len(gs) + 4) // 5) + 1]) AS ph
        FROM gs
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM pref a JOIN pref b ON a.ph = b.ph AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT id_a, id_b,
               len(list_intersect(ga.gs, gb.gs)) AS inter,
               len(ga.gs) + len(gb.gs)
                   - len(list_intersect(ga.gs, gb.gs)) AS uni
        FROM cand
        JOIN gs ga ON ga.doc_id = id_a
        JOIN gs gb ON gb.doc_id = id_b
    )
    SELECT id_a, id_b, ROUND(inter::DOUBLE / uni, 4) AS jaccard
    FROM scored WHERE inter::DOUBLE / uni >= 0.6
    """,
    headline=True,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.6)


# ---------------------------------------------------------------------------
# Window-function breadth: rank-family (NTILE / PERCENT_RANK / CUME_DIST)
# and frame-bounded FIRST/LAST over one shared partition spec. Scale
# notes: all five functions share a single (c_mktsegment ORDER BY
# c_acctbal) sort — Catalyst computes them in ONE Window exec after ONE
# exchange on the partition key; per-partition state is O(1) for the
# rank family and the running frame.
# ---------------------------------------------------------------------------
@register(
    "window_rank_family",
    """
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS acct_quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(c_custkey) OVER w AS poorest_cust,
           LAST_VALUE(c_custkey) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS richest_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family windows; ORDER BY includes c_custkey so ties rank
    identically in both engines. LAST_VALUE needs the explicit unbounded
    frame (the default frame stops at CURRENT ROW)."""
    c = Catalog(spark, sf_dir).customer
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("acct_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("poorest_cust"),
        F.last("c_custkey").over(w_full).alias("richest_cust"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregate family: corr / covar / stddev / variance / median.
# All are one-pass partial-aggregatable (sum, sum-of-squares, cross-sum
# moments combine associatively), so Spark computes them map-side partial +
# one shuffle on the group key — same plan shape as any hash agg. Values
# normalized ([-1,1] corr, small-magnitude inputs) and rounded to 6 dp so
# fp summation-order noise (~1e-13) can never reach the compared value.
# ---------------------------------------------------------------------------
@register(
    "stats_agg_family",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_discount), 8) AS covar_qty_disc,
           ROUND(stddev_samp(l_quantity), 6) AS stddev_qty,
           ROUND(var_samp(l_discount), 8) AS var_disc,
           median(l_quantity) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 8).alias("covar_qty_disc"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_qty"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        F.median("l_quantity").alias("median_qty"),
    )


# ---------------------------------------------------------------------------
# Conditional aggregation (FILTER-clause semantics): per-priority order
# counts and money split by status in ONE grouped pass — no self-join, no
# second scan. Spark expresses FILTER as when()-guarded aggregates, which
# Catalyst folds into the same hash-agg buffers.
# ---------------------------------------------------------------------------
@register(
    "conditional_agg",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                      FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE)
               AS finished_value
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    is_f = F.col("o_orderstatus") == "F"
    is_o = F.col("o_orderstatus") == "O"
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(is_f, 1)).alias("n_finished"),
        F.count(F.when(is_o, 1)).alias("n_open"),
        F.round(
            F.sum(F.when(is_f, _dec(F.col("o_totalprice")))).cast("double"), 2
        ).alias("finished_value"),
    )


# ---------------------------------------------------------------------------
# E-family set operators: INTERSECT / EXCEPT (distinct semantics) between
# two yearly customer cohorts, tagged and unioned into one result. Each set
# op is a distinct-aggregate shuffle on the full row; at scale both cohorts
# hash-partition on c_custkey so the op is a co-partitioned merge.
# ---------------------------------------------------------------------------
@register(
    "intersect_except_custs",
    """
    SELECT 'both' AS cohort, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    )
    UNION ALL
    SELECT 'only_1996' AS cohort, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    )
    """,
)
def intersect_except_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    both = y96.intersect(y97).select(F.lit("both").alias("cohort"), "o_custkey")
    # subtract == EXCEPT DISTINCT; exceptAll is bag semantics and would leave
    # surviving duplicates of keys that also appear on the right.
    only = y96.subtract(y97).select(
        F.lit("only_1996").alias("cohort"), "o_custkey"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# String-distance join: Levenshtein over nation-name pairs. The dimension
# is tiny so the self-join broadcasts; the distance function is JVM
# codegen'd (no UDF). The < tiebreak keeps each unordered pair once.
# ---------------------------------------------------------------------------
@register(
    "levenshtein_nations",
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 6
    """,
)
def levenshtein_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = Catalog(spark, sf_dir).nation
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 6)
    )


# ---------------------------------------------------------------------------
# Value-range window frame: 30-day trailing spend per customer. RANGE
# frames bound the frame by ORDER-BY value, not row count — Spark needs a
# numeric ordering column, so the date goes through epoch seconds. One
# exchange on o_custkey + one sort; the frame sum is maintained
# incrementally (O(1) per row) in decimal space on both engines.
# ---------------------------------------------------------------------------
@register(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double"), 2
        ).alias("trailing_30d_spend"),
    )


# ---------------------------------------------------------------------------
# R-family reshape: UNPIVOT (wide → long melt). Narrow transform, no
# shuffle at all — each input row emits k metric rows in place, so the
# plan is scan → generate, fully pipelined.
# ---------------------------------------------------------------------------
@register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
    FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# Date/time function breadth over the events stream: truncation, field
# extraction, day arithmetic. All JVM intrinsics; the group-by key is
# derived (year, month) so partial aggregation still applies.
# ---------------------------------------------------------------------------
@register(
    "datetime_breadth",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           year(ts) AS yr, quarter(ts) AS qtr, month(ts) AS mon,
           day(ts) AS dom,
           count(*) AS n_events,
           min(hour(ts)) AS first_hour,
           max(hour(ts)) AS last_hour,
           CAST(ROUND(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_value
    FROM events
    GROUP BY ALL
    """,
)
def datetime_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        F.year("ts").alias("yr"),
        F.quarter("ts").alias("qtr"),
        F.month("ts").alias("mon"),
        F.dayofmonth("ts").alias("dom"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.hour("ts")).alias("first_hour"),
        F.max(F.hour("ts")).alias("last_hour"),
        F.round(F.sum(_dec(F.col("value"))).cast("double"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Regex extraction over document text: leading-word histogram. The
# extraction is a codegen'd JVM regex (no Python); both engines return ''
# on no-match so empty texts land in one deterministic bucket.
# ---------------------------------------------------------------------------
@register(
    "regexp_first_word",
    """
    SELECT lower(regexp_extract(text, '^([A-Za-z]+)', 1)) AS first_word,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lower(regexp_extract(text, '^([A-Za-z]+)', 1))
    """,
)
def regexp_first_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.groupBy(
        F.lower(F.regexp_extract("text", r"^([A-Za-z]+)", 1)).alias("first_word")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


from iniz_exporters_spark.functions.text import poly_hash  # noqa: E402


# ---------------------------------------------------------------------------
# MIN_BY / MAX_BY aggregates: per-nation richest/poorest customer in ONE
# grouped pass — no window, no self-join, no sort. The comparator packs
# (acctbal, custkey) into one exact DECIMAL so ties break identically in
# both engines (DuckDB's arg_max cannot order by a struct). At scale this
# is a plain partial-aggregatable hash agg: each map task keeps one
# candidate per group, only candidates shuffle.
# ---------------------------------------------------------------------------
@register(
    "minmax_by_agg",
    """
    SELECT n.n_name AS nation,
           arg_max(c.c_name,
                   CAST(c.c_acctbal AS DECIMAL(18,2)) * 10000000 + c.c_custkey)
               AS richest_cust,
           arg_min(c.c_name,
                   CAST(c.c_acctbal AS DECIMAL(18,2)) * 10000000 + c.c_custkey)
               AS poorest_cust,
           max(c.c_acctbal) AS max_bal,
           min(c.c_acctbal) AS min_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def minmax_by_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    packed = _dec(F.col("c_acctbal"), 18, 2) * 10000000 + F.col("c_custkey")
    return (
        cat.customer.join(
            F.broadcast(cat.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max_by("c_name", packed).alias("richest_cust"),
            F.min_by("c_name", packed).alias("poorest_cust"),
            F.max("c_acctbal").alias("max_bal"),
            F.min("c_acctbal").alias("min_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Null-handling scalar family: NULLIF / COALESCE / GREATEST / LEAST.
# Row-level, zero-shuffle, fully codegen'd; values pass through unchanged
# (no arithmetic) so cross-engine equality is exact.
# ---------------------------------------------------------------------------
@register(
    "null_handling_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           nullif(l_discount, 0.0) AS disc_nn,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_filled,
           greatest(l_discount, l_tax) AS hi_rate,
           least(l_discount, l_tax) AS lo_rate,
           CASE WHEN l_discount > l_tax THEN 'disc' ELSE 'tax' END AS winner
    FROM lineitem
    """,
)
def null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_nn = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_nn.alias("disc_nn"),
        F.coalesce(disc_nn, F.lit(-1.0)).alias("disc_filled"),
        F.greatest("l_discount", "l_tax").alias("hi_rate"),
        F.least("l_discount", "l_tax").alias("lo_rate"),
        F.when(F.col("l_discount") > F.col("l_tax"), "disc")
        .otherwise("tax")
        .alias("winner"),
    )


# ---------------------------------------------------------------------------
# String-function breadth: SPLIT_PART / LPAD / REVERSE / TRANSLATE /
# SUBSTR / INITCAP-equivalent casing. Same ANSI names on both engines;
# row-level codegen, no shuffle.
# ---------------------------------------------------------------------------
@register(
    "string_funcs_breadth",
    """
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS type_head,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
           substr(p_name, 1, 8) AS name_prefix,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len
    FROM part
    """,
)
def string_funcs_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.translate(F.col("p_name"), "aeiou", "AEIOU").alias("name_vowels"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.length(F.col("p_name")).alias("name_len"),
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram binning: bucket = floor(x / width), capped to a
# top bucket. Both engines evaluate the same IEEE-double division, so
# bucket assignment is bit-identical. One partial-aggregatable group-by;
# the bucket count is bounded, so the reduce side is tiny at any scale.
# ---------------------------------------------------------------------------
@register(
    "histogram_bins",
    """
    SELECT least(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 19) AS bucket,
           count(*) AS n_orders,
           CAST(ROUND(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS bucket_value
    FROM orders
    GROUP BY least(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 19)
    """,
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 25000.0).cast("long"), F.lit(19)
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(_dec(F.col("o_totalprice"))).cast("double"), 2).alias(
            "bucket_value"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling: keep rows whose poly_hash(key) mod 20 == 0
# (a reproducible ~5% Bernoulli sample keyed on content, not RNG state).
# This is how a 100 TB pipeline takes a stable sample across reruns and
# engines: the predicate pushes to the scan, no shuffle until the
# aggregate, and the same rows are chosen on every cluster size.
# ---------------------------------------------------------------------------
@register(
    "sample_poly_hash",
    f"""
    SELECT c_nationkey,
           count(*) AS n_sampled,
           CAST(ROUND(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sampled_bal
    FROM customer
    WHERE {_SQL_POLY.format(s="c_name")} % 20 = 0
    GROUP BY c_nationkey
    """,
)
def sample_poly_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return (
        c.filter(poly_hash("c_name") % 20 == 0)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum(_dec(F.col("c_acctbal"))).cast("double"), 2).alias(
                "sampled_bal"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Dynamic pivot (R2/R3 at registry scale): languages discovered from data
# become columns. Spark runs a distinct-collection job first (the
# "discover the schema from the data" step the locations exporter needs),
# then one pivot agg. The oracle pins the same columns statically.
# ---------------------------------------------------------------------------
@register(
    "pivot_dynamic_langs",
    """
    SELECT source,
           count(*) FILTER (WHERE lang = 'de') AS de,
           count(*) FILTER (WHERE lang = 'en') AS en,
           count(*) FILTER (WHERE lang = 'es') AS es,
           count(*) FILTER (WHERE lang = 'fr') AS fr,
           count(*) FILTER (WHERE lang = 'zh') AS zh
    FROM documents
    GROUP BY source
    """,
)
def pivot_dynamic_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    # no value list → Spark discovers pivot columns from the data
    out = d.groupBy("source").pivot("lang").agg(F.count(F.lit(1)))
    return out.fillna(0, subset=[c for c in out.columns if c != "source"])


# ---------------------------------------------------------------------------
# Array-function breadth over embeddings: length, elementwise square, a
# sequential fold for the L2 norm, array min/max. Elements are cast to
# double BEFORE any arithmetic (float math rounds differently per engine)
# and both engines fold left-to-right, so the sum is order-identical;
# ROUND(.,4) absorbs the last-bit difference of sqrt.
# ---------------------------------------------------------------------------
@register(
    "array_norm_embeddings",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(sqrt(list_reduce(
               list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (a, b) -> a + b)), 4) AS l2_norm,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_elem,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 4) AS min_elem
    FROM embeddings
    """,
)
def array_norm_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    sq = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)), 4
        ).alias("l2_norm"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_elem"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("min_elem"),
    )


# ---------------------------------------------------------------------------
# Changelog compaction: keep only the LATEST record per key (the upsert /
# SCD-1 pattern every ingest pipeline needs). row_number over a
# (key DESC-ts) sort with a unique tiebreaker, filtered to 1 — Spark plans
# one exchange on user_id + per-partition sort; with AQE the filter
# collapses to a top-1-per-key aggregation shape. At 100 TB the same plan
# holds: state per key is O(1), no driver involvement.
# ---------------------------------------------------------------------------
@register(
    "latest_per_key",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           value AS last_value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


# ---------------------------------------------------------------------------
# Explicit LEFT SEMI join: customers that placed at least one high-value
# order. Semi joins ship only the probe side's keys — no payload from the
# right relation crosses the shuffle, and the output never duplicates.
# ---------------------------------------------------------------------------
@register(
    "semi_join_customers",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    big = cat.orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return cat.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_nationkey")


# ---------------------------------------------------------------------------
# POSEXPLODE: array → (row, position, element) unnest with ordinality.
# Narrow generate, no shuffle; the oracle replays it with a correlated
# range() lateral join. Elements cast to double before rounding.
# ---------------------------------------------------------------------------
@register(
    "posexplode_embeddings",
    """
    SELECT vec_id,
           unnest(range(len(embedding))) AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS elem
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def posexplode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    # ``+ 0.0`` normalizes IEEE -0.0: a tiny negative element rounds to
    # -0.0 in DuckDB but +0.0 in Spark (one cell at sf0.001 — caught by the
    # registry-wide signed-zero lint, same class as cusum_changepoint_q).
    return (
        e.filter(F.col("vec_id") < 50)
        .select("vec_id", F.posexplode("embedding").alias("pos", "raw"))
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            (F.round(F.col("raw").cast("double"), 4) + F.lit(0.0)).alias(
                "elem"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Running DISTINCT count over a window: how many distinct event types each
# user has produced up to each point in time. Spark has no
# COUNT(DISTINCT) OVER — the idiomatic equivalent is size(collect_set()
# OVER w), which keeps a per-frame hash set. Default RANGE frame includes
# ts-tied peers on both engines, so ties are deterministic by
# construction. Scale note: state is O(|distinct types|) per key — bounded
# here; for unbounded domains use the approx sketch variant.
# ---------------------------------------------------------------------------
@register(
    "window_distinct_running",
    """
    SELECT event_id, user_id,
           count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts
           ) AS types_so_far
    FROM events
    WHERE user_id < 100
    """,
)
def window_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts")
    return e.filter(F.col("user_id") < 100).select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias(
            "types_so_far"
        ),
    )


# ---------------------------------------------------------------------------
# Forward fill (gap filling): LAST_VALUE ... IGNORE NULLS over an ordered
# per-key window — the standard repair for sparse sensor/metric streams.
# NULLs are synthesized deterministically ('error' events lose their
# value), then each row carries the most recent non-null reading. One
# exchange + sort per key; running state is O(1). The ts ordering adds
# event_id so rows within a tied timestamp fill identically either side.
# ---------------------------------------------------------------------------
@register(
    "window_fill_forward",
    """
    SELECT event_id, user_id,
           v AS raw_value,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    WHERE user_id < 100
    """,
)
def window_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    v = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.filter(F.col("user_id") < 100)
        .withColumn("raw_value", v)
        .select(
            "event_id",
            "user_id",
            "raw_value",
            F.last("raw_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


# ---------------------------------------------------------------------------
# RANK vs DENSE_RANK tie semantics: both depend only on the ORDER-BY
# *values*, so ties produce identical ranks on any engine with no
# tiebreaker needed; o_orderkey identifies rows. Shares one window spec →
# one exchange + one sort.
# ---------------------------------------------------------------------------
@register(
    "rank_dense_rank",
    """
    SELECT o_orderkey, o_custkey,
           rank() OVER w AS price_rank,
           dense_rank() OVER w AS price_dense_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
)
def rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


from iniz_exporters_spark.plans.graph import connected_components  # noqa: E402


# ---------------------------------------------------------------------------
# Weakly-connected components (the dedup-clustering primitive: near-dup
# PAIRS → groups → one canonical row each). Min-label propagation over
# pinned undirected edges; one shuffle per round, rounds ≈ graph diameter.
# Demonstrated on the nation–region bipartite graph (nodes = nationkey and
# 1000+regionkey) so the oracle can replay the fixpoint as a recursive CTE
# — components come out as one cluster per region, labeled by its minimum
# nation key.
# ---------------------------------------------------------------------------
@register(
    "connected_components_q",
    """
    WITH RECURSIVE e AS (
        SELECT n_nationkey AS src, 1000 + n_regionkey AS dst FROM nation
    ),
    und AS (
        SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ),
    reach(node, r) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.dst, reach.r FROM reach JOIN und u ON reach.node = u.src
    )
    SELECT node, min(r) AS component FROM reach GROUP BY node
    """,
    headline=True,
)
def connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = Catalog(spark, sf_dir).nation
    edges = n.select(
        F.col("n_nationkey").cast("long").alias("src"),
        (F.lit(1000) + F.col("n_regionkey")).cast("long").alias("dst"),
    )
    return connected_components(edges)


# ---------------------------------------------------------------------------
# Array set operations: intersect / union / except between per-row token
# arrays (the primitive under n-gram Jaccard and vocabulary diffing).
# Element order out of set ops is engine-specific, so results are
# canonicalized with array_sort; the arrays are then serialized with
# array_join(';') because the driver's pandas canonicalizer cannot hash
# list cells (the round-5 `err` row) — the set operators under test are
# unchanged, only the output representation is a string. All ops are
# row-local (no shuffle).
# ---------------------------------------------------------------------------
@register(
    "array_set_ops",
    """
    SELECT p_partkey,
           coalesce(array_to_string(
               list_sort(list_distinct(list_intersect(nw, tw))), ';'), '')
               AS common_words,
           coalesce(array_to_string(
               list_sort(list_distinct(list_concat(nw, tw))), ';'), '')
               AS all_words,
           coalesce(array_to_string(
               list_sort(list_distinct(
                   list_filter(nw, x -> NOT list_contains(tw, x)))), ';'), '')
               AS name_only_words,
           len(list_distinct(nw)) AS n_name_words
    FROM (
        SELECT p_partkey,
               string_split(p_name, ' ') AS nw,
               string_split(lower(p_type), ' ') AS tw
        FROM part
    )
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    nw = F.split(F.col("p_name"), " ")
    tw = F.split(F.lower(F.col("p_type")), " ")
    return p.select(
        "p_partkey",
        F.array_join(
            F.array_sort(F.array_intersect(nw, tw)), ";"
        ).alias("common_words"),
        F.array_join(
            F.array_sort(F.array_distinct(F.array_union(nw, tw))), ";"
        ).alias("all_words"),
        F.array_join(
            F.array_sort(F.array_except(nw, tw)), ";"
        ).alias("name_only_words"),
        F.size(F.array_distinct(nw)).cast("long").alias("n_name_words"),
    )


# ---------------------------------------------------------------------------
# Multimodal frame-extraction E2E: documents.text encoded to a binary payload,
# run through the REAL extract_frames mapInPandas kernel (fake codec: 16-byte
# windows, every_n sampling), then aggregated per doc. The oracle replicates
# the frame arithmetic independently in SQL — window count, last sampled
# index, and sampled byte total — so the row-expanding kernel is checked
# end-to-end, not rows-only.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.multimodal.binary import extract_frames  # noqa: E402

_MM_EVERY_N = 4
_MM_FB = 16  # fake-codec frame size in bytes


@register(
    "multimodal_frame_stats",
    f"""
    SELECT doc_id,
           CAST((nf - 1) // {_MM_EVERY_N} + 1 AS BIGINT) AS n_frames,
           CAST(((nf - 1) // {_MM_EVERY_N}) * {_MM_EVERY_N} AS INT) AS max_idx,
           CAST(((nf - 1) // {_MM_EVERY_N}) * {_MM_FB}
                + CASE WHEN ((nf - 1) // {_MM_EVERY_N}) * {_MM_EVERY_N} = nf - 1
                       THEN nb - (nf - 1) * {_MM_FB}
                       ELSE {_MM_FB} END AS BIGINT) AS frame_bytes
    FROM (
        SELECT doc_id,
               octet_length(encode(text)) AS nb,
               (octet_length(encode(text)) + {_MM_FB - 1}) // {_MM_FB} AS nf
        FROM documents
    )
    WHERE nb > 0
    """,
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    media = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    fr = extract_frames(media, "payload", "doc_id", every_n=_MM_EVERY_N)
    return fr.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.max("frame_idx").cast("int").alias("max_idx"),
        F.sum(F.octet_length("frame")).cast("long").alias("frame_bytes"),
    )


# ---------------------------------------------------------------------------
# Image perceptual hash (aHash) + banded near-dup — closes the loop between
# the multimodal surface and the dedup family. The REAL mapInPandas kernel
# runs on documents.text encoded as a binary payload (fake codec: pixel p =
# byte p mod n); the oracle replays every bit decision in SQL via hex-string
# byte extraction, so the whole 64-bit hash is value-checked, not rows-only.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.multimodal.binary import (  # noqa: E402
    image_phash,
    phash_neardup,
)


def _phash_band_sql(j: int) -> str:
    lo = 16 * j
    return (
        f"CAST(list_sum(list_transform(range({lo}, {lo + 16}), "
        f"k -> CASE WHEN 64 * px[k + 1] > total "
        f"THEN 1 << (k - {lo}) ELSE 0 END)) AS INT) AS b{j}"
    )


_PHASH_BANDS_CTE = f"""
    e AS (SELECT doc_id, hex(encode('#' || text)) AS h,
                 octet_length(encode('#' || text)) AS n
          FROM documents WHERE octet_length(encode(text)) > 0),
    p AS (SELECT doc_id,
                 list_transform(range(0, 64),
                     q -> ('0x' || substring(h, 2 * (q % n) + 1, 2))::BIGINT
                 ) AS px
          FROM e),
    s AS (SELECT doc_id, px, CAST(list_sum(px) AS BIGINT) AS total FROM p),
    b AS (SELECT doc_id, {_phash_band_sql(0)}, {_phash_band_sql(1)},
                 {_phash_band_sql(2)}, {_phash_band_sql(3)}
          FROM s)
"""


def _phash_payload(d: DataFrame) -> DataFrame:
    """Synthetic image payloads from document text, prefixed with '#'
    (0x23): no PPM/PGM/BMP magic can start with it, so the operator's
    real-codec branch (``decode_image_numpy``) provably never intercepts
    these fake payloads and the oracle's replay of the FAKE pixel path
    stays bit-exact — regardless of what a future testdata regeneration
    puts in ``text``."""
    return d.select(
        "doc_id",
        F.encode(F.concat(F.lit("#"), F.col("text")), "UTF-8").alias(
            "payload"
        ),
    )


@register(
    "image_phash_q",
    f"""
    WITH {_PHASH_BANDS_CTE}
    SELECT doc_id, b0, b1, b2, b3,
           printf('%04x%04x%04x%04x', b0, b1, b2, b3) AS phash
    FROM b
    """,
)
def image_phash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    media = _phash_payload(d)
    return image_phash(media, "payload", "doc_id")


# Canonical selection per near-dup cluster with a QUALITY criterion: the
# full dedup-apply pipeline — perceptual-hash pairs → weakly-connected
# components → keep the LONGEST doc per cluster (most-informative-survivor
# convention; ties break to the lowest id). Composes three oracle-checked
# layers; the oracle replays hashing, banding, components (recursive CTE),
# and the argmax window end-to-end.
@register(
    "canonical_longest_q",
    f"""
    WITH RECURSIVE {_PHASH_BANDS_CTE},
    cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
               x.b0 AS a0, x.b1 AS a1, x.b2 AS a2, x.b3 AS a3,
               y.b0 AS c0, y.b1 AS c1, y.b2 AS c2, y.b3 AS c3
        FROM b x JOIN b y
          ON x.doc_id < y.doc_id
         AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
    ),
    pp AS (SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
               + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) AS hd
        FROM cand) WHERE hd <= 3),
    und AS (SELECT id_a AS src, id_b AS dst FROM pp
            UNION ALL SELECT id_b, id_a FROM pp),
    reach(node, r) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.dst, reach.r FROM reach JOIN und u ON reach.node = u.src
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
    SELECT c.node AS doc_id, c.component, d.n_chars,
           ROW_NUMBER() OVER (PARTITION BY c.component
                              ORDER BY d.n_chars DESC, c.node ASC) = 1
               AS is_canonical
    FROM comp c JOIN documents d ON c.node = d.doc_id
    """,
    headline=True,
)
def canonical_longest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.plans.graph import connected_components

    d = Catalog(spark, sf_dir).documents
    media = _phash_payload(d)
    pairs = phash_neardup(image_phash(media, "payload", "doc_id"), "doc_id")
    comps = connected_components(
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
    )
    j = comps.join(
        d.select("doc_id", "n_chars"),
        comps["node"] == F.col("doc_id"),
    ).select("doc_id", "component", "n_chars")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return j.select(
        "doc_id",
        "component",
        "n_chars",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


@register(
    "phash_neardup",
    f"""
    WITH {_PHASH_BANDS_CTE},
    pairs AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
               x.b0 AS a0, x.b1 AS a1, x.b2 AS a2, x.b3 AS a3,
               y.b0 AS c0, y.b1 AS c1, y.b2 AS c2, y.b3 AS c3
        FROM b x JOIN b y
          ON x.doc_id < y.doc_id
         AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
    )
    SELECT id_a, id_b, hamming FROM (
        SELECT id_a, id_b,
               CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
                  + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3))
                 AS INT) AS hamming
        FROM pairs
    ) WHERE hamming <= 3
    """,
    headline=True,
)
def phash_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    media = _phash_payload(d)
    return phash_neardup(image_phash(media, "payload", "doc_id"), "doc_id")


# ---------------------------------------------------------------------------
# Training-pipeline text breadth: repetition quality signal, vocabulary
# building, and train/test contamination detection.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.functions.text import tokens as _tokens  # noqa: E402
from iniz_exporters_spark.operators.dedup import (  # noqa: E402
    ngram_overlap_pairs,
)


@register(
    "repetition_ratio",
    f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok)
    SELECT doc_id,
           ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
               AS top_ratio,
           CAST(SUM(c) AS BIGINT) AS n_tokens
    FROM c GROUP BY doc_id
    """,
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal: share of a doc's tokens taken by its most
    frequent token (near 1.0 = degenerate/boilerplate text). Scale shape:
    explode → two map-side-combining aggregations; token rows carry only
    (doc_id, token), never the document payload."""
    d = Catalog(spark, sf_dir).documents
    t = d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
    c = t.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return c.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_ratio"),
        F.sum("c").cast("long").alias("n_tokens"),
    )


@register(
    "vocab_topk",
    f"""
    WITH t AS (SELECT unnest({_SQL_TOKENS}) AS tok FROM documents)
    SELECT tok, CAST(count(*) AS BIGINT) AS freq
    FROM t GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global top-20 tokens by frequency with a
    deterministic (freq desc, token asc) tiebreak. Scale shape: partial
    count per partition, one shuffle over distinct tokens (vocabulary-sized,
    not corpus-sized), TakeOrderedAndProject for the top-k."""
    d = Catalog(spark, sf_dir).documents
    t = d.select(F.explode(_tokens("text")).alias("tok"))
    return (
        t.groupBy("tok")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(20)
    )


@register(
    "contamination_overlap",
    f"""
    WITH sh AS (SELECT doc_id, unnest({_SQL_SHINGLE_SET}) AS h
                FROM documents),
    te AS (SELECT doc_id AS test_id, h FROM sh WHERE doc_id % 50 = 0),
    tr AS (SELECT doc_id AS train_id, h FROM sh)
    SELECT train_id, test_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN te USING (h)
    WHERE train_id <> test_id
    GROUP BY train_id, test_id
    HAVING count(*) >= 25
    """,
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination: every 50th doc plays the benchmark set;
    pairs sharing ≥25 distinct 5-char shingle hashes are flagged. The test
    side broadcasts, so the train corpus is never shuffled on the hash."""
    d = Catalog(spark, sf_dir).documents
    test = d.filter(F.col("doc_id") % 50 == 0)
    return ngram_overlap_pairs(
        d, test, "doc_id", "text", k=5, min_shared=25, broadcast_test=True
    )


# ---------------------------------------------------------------------------
# Iterative training: 2 rounds of Lloyd's k-means, oracle-replayed round by
# round (chained CTEs). Deterministic init (k lowest-id vectors), rounded
# argmin assignment, decimal-space-rounded centroid means — see
# operators/clustering.py for the cross-engine determinism scheme.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.clustering import kmeans_lloyd  # noqa: E402

_KM_DIST = (
    "ROUND(list_reduce(list_transform(range(1, len(e.v)+1),"
    " i -> (e.v[i]-c.v[i])*(e.v[i]-c.v[i])), (x,y)->x+y), 6)"
)


@register(
    "kmeans_assignments",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
           FROM e ORDER BY vec_id LIMIT 4),
    a0 AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e CROSS JOIN c0 c
        ) WHERE rn = 1
    ),
    m0 AS (
        SELECT cid, i, ROUND(CAST(avg(val) AS DECIMAL(28,12)), 6)::DOUBLE AS m
        FROM (SELECT cid, i, v[i] AS val
              FROM a0, unnest(range(1, len(v)+1)) AS t(i))
        GROUP BY cid, i
    ),
    c1 AS (SELECT cid, list(m ORDER BY i) AS v FROM m0 GROUP BY cid),
    a1 AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e CROSS JOIN c1 c
        ) WHERE rn = 1
    )
    SELECT vec_id, CAST(cid AS INT) AS cluster FROM a1
    """,
)
def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    return kmeans_lloyd(emb, "vec_id", "embedding", k=4, iters=2)


# Built-in linear-regression aggregates (slope/intercept/r2) per group —
# both engines implement the same closed-form moments; decimal-space round
# absorbs summation-order ulps.
@register(
    "regression_per_group",
    """
    SELECT n_nationkey AS nation,
           ROUND(CAST(regr_slope(c_acctbal, c_custkey)
                      AS DECIMAL(28,8)), 4)::DOUBLE AS slope,
           ROUND(CAST(regr_intercept(c_acctbal, c_custkey)
                      AS DECIMAL(28,8)), 4)::DOUBLE AS intercept,
           CAST(regr_count(c_acctbal, c_custkey) AS BIGINT) AS n
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_nationkey
    """,
)
def regression_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    j = cat.customer.join(
        F.broadcast(cat.nation),
        F.col("n_nationkey") == F.col("c_nationkey"),
    )
    return j.groupBy(F.col("n_nationkey").alias("nation")).agg(
        F.round(
            F.expr("regr_slope(c_acctbal, c_custkey)").cast("decimal(28,8)"), 4
        )
        .cast("double")
        .alias("slope"),
        F.round(
            F.expr("regr_intercept(c_acctbal, c_custkey)").cast(
                "decimal(28,8)"
            ),
            4,
        )
        .cast("double")
        .alias("intercept"),
        F.expr("regr_count(c_acctbal, c_custkey)").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# RAG-style token chunking: overlapping 32-token windows every 24 tokens.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.functions.text import chunk_tokens  # noqa: E402


@register(
    "chunk_tokens_q",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 unnest(range(1, greatest(len(toks) - 8, 1) + 1, 24)) AS st
          FROM t)
    SELECT doc_id,
           CAST((st - 1) // 24 AS INT) AS chunk_idx,
           array_to_string(toks[st : st + 31], ' ') AS chunk,
           CAST(greatest(least(st + 31, len(toks)) - st + 1, 0) AS INT)
               AS n_chunk_tokens
    FROM s
    """,
)
def chunk_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return chunk_tokens(d, "doc_id", "text", size=32, overlap=8)


# ---------------------------------------------------------------------------
# SCD2 interval build: changelog events → per-user validity ranges (the
# warehouse-side "snapshot from changelog" op; the open interval is the
# current state). One shuffle on the partition key, one sort.
# ---------------------------------------------------------------------------
@register(
    "scd2_intervals",
    """
    SELECT user_id, event_id,
           event_type AS state,
           ts AS effective_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS effective_to,
           (LEAD(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL) AS is_current
    FROM events
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM scoring: train token frequencies over the corpus itself, then
# score each doc by average negative log-probability (the poor man's
# perplexity filter — high score = tokens rare in the corpus). Scale shape:
# one explode pass feeds both the vocabulary count (vocab-sized shuffle,
# map-side combined) and the scoring join; the vocab and the scalar total
# broadcast, so the token stream is never shuffled for the join; per-doc
# aggregation is the only corpus-sized exchange.
# ---------------------------------------------------------------------------
@register(
    "unigram_logprob",
    f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    freq AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    total AS (SELECT sum(c)::DOUBLE AS n FROM freq)
    SELECT doc_id,
           ROUND(CAST(avg(-ln(c / n)) AS DECIMAL(28,12)), 6)::DOUBLE
               AS avg_neg_logp,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM t JOIN freq USING (tok) CROSS JOIN total
    GROUP BY doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
    # materialize the vocab ONCE (it feeds both the broadcast join and the
    # scalar total — without pinning, the corpus-wide count runs twice)
    freq = t.groupBy("tok").agg(F.count("*").alias("c")).localCheckpoint()
    total = freq.agg(F.sum("c").cast("double").alias("n"))
    scored = t.join(F.broadcast(freq), "tok").crossJoin(F.broadcast(total))
    return scored.groupBy("doc_id").agg(
        F.round(
            F.avg(-F.log(F.col("c") / F.col("n"))).cast("decimal(28,12)"), 6
        )
        .cast("double")
        .alias("avg_neg_logp"),
        F.count("*").cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Funnel / sequence analysis: per-user ordered event stream matched against
# the view → click → purchase subsequence. One shuffle (groupBy user); the
# per-user ordered sequence is a bounded collect (events-per-user scale) —
# for power-law users, switch to the two-pass min-timestamp-per-step form.
# ---------------------------------------------------------------------------
@register(
    "funnel_stages",
    """
    WITH s AS (
        SELECT user_id,
               array_to_string(list(event_type ORDER BY ts, event_id), '>')
                   AS seq,
               count(*) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN regexp_matches(seq, 'view.*click.*purchase') THEN 3
                WHEN regexp_matches(seq, 'view.*click') THEN 2
                WHEN regexp_matches(seq, 'view') THEN 1
                ELSE 0 END AS funnel_stage,
           CAST(n_events AS BIGINT) AS n_events
    FROM s
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    seq = F.array_join(
        F.transform(ordered, lambda x: x["event_type"]), ">"
    )
    agg = e.groupBy("user_id").agg(
        seq.alias("seq"), F.count("*").cast("long").alias("n_events")
    )
    stage = (
        F.when(F.col("seq").rlike("view.*click.*purchase"), 3)
        .when(F.col("seq").rlike("view.*click"), 2)
        .when(F.col("seq").rlike("view"), 1)
        .otherwise(0)
    )
    return agg.select(
        "user_id", stage.cast("int").alias("funnel_stage"), "n_events"
    )


# ---------------------------------------------------------------------------
# IVF multi-probe: each query searches its 2 nearest cells (recall lever
# near cell boundaries); oracle replays rank-2 probes + cross-cell re-rank.
# ---------------------------------------------------------------------------
@register(
    "ivf_multiprobe_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v
        FROM e ORDER BY vec_id LIMIT 8
    ),
    ranked AS (
        SELECT e.vec_id, e.v, c.cidx,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND(list_cosine_similarity(e.v, c.v), 4)
                            DESC, c.cidx
               ) AS rnk
        FROM e CROSS JOIN cents c
    ),
    member AS (SELECT vec_id, v, cidx AS cell FROM ranked WHERE rnk = 1),
    probes AS (SELECT vec_id, v, cidx AS cell FROM ranked WHERE rnk <= 2),
    cell_topk AS (
        SELECT query_id, neighbor_id, cos FROM (
            SELECT p.vec_id AS query_id, m.vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(p.v, m.v), 4) AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.vec_id, p.cell
                       ORDER BY ROUND(list_cosine_similarity(p.v, m.v), 4)
                                DESC, m.vec_id
                   ) AS crn
            FROM probes p JOIN member m
              ON m.cell = p.cell AND m.vec_id <> p.vec_id
        ) t WHERE crn <= 3
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM cell_topk
    ) t WHERE rn <= 3
    """,
)
def ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return ivf_flat_topk(e, n_centroids=8, top_k=3, nprobe=2)


# ---------------------------------------------------------------------------
# Training-mixture control: per-language deterministic sampling rates
# (en 100%, de 50%, es 25%, fr 10%, everything else 5%).
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sampling import mixture_sample  # noqa: E402

_MIX_RATES = {"en": 1.0, "de": 0.5, "es": 0.25, "fr": 0.1}


@register(
    "mixture_sample_q",
    f"""
    WITH kept AS (
        SELECT lang, doc_id, n_chars
        FROM documents
        WHERE {_SQL_POLY.format(s="doc_id::VARCHAR")} % 10000 <
              CASE lang WHEN 'de' THEN 5000 WHEN 'en' THEN 10000
                        WHEN 'es' THEN 2500 WHEN 'fr' THEN 1000
                        ELSE 500 END
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM kept GROUP BY lang
    """,
)
def mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    kept = mixture_sample(
        d, "lang", "doc_id", _MIX_RATES, default_rate=0.05
    )
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Retrieval / term-weighting family (operators/ranking.py): TF-IDF top
# terms, BM25 scoring, posting-list build, token PMI. Token rows carry only
# (doc_id, tok); vocab-sized frames broadcast; one corpus-sized shuffle each.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.ranking import (  # noqa: E402
    bm25_scores,
    inverted_index,
    tfidf_top_terms,
    token_pmi,
)

_SQL_TOK_ROWS = f"SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents"


@register(
    "tfidf_top_terms",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM tf),
    s AS (SELECT doc_id, tok,
                 ROUND(CAST(tf * ln(n_docs / df) AS DECIMAL(28,12)), 6)::DOUBLE
                     AS tfidf
          FROM tf JOIN df USING (tok) CROSS JOIN n)
    SELECT doc_id, tok, CAST(rn AS INT) AS term_rank, tfidf
    FROM (SELECT doc_id, tok, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, tok) AS rn
          FROM s)
    WHERE rn <= 3
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return tfidf_top_terms(d, "doc_id", "text", top_n=3)


_BM25_TERMS = ("hash", "join", "filter")


@register(
    "bm25_score",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
    a AS (SELECT avg(dl) AS avgdl FROM dl),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
           WHERE tok IN ('hash', 'join', 'filter') GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok)
    SELECT doc_id,
           ROUND(SUM(CAST(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
               AS DECIMAL(28,12))), 6)::DOUBLE AS bm25,
           CAST(count(*) AS BIGINT) AS n_hits
    FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
    CROSS JOIN a CROSS JOIN n
    GROUP BY doc_id
    """,
)
def bm25_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return bm25_scores(d, list(_BM25_TERMS), "doc_id", "text", k1=1.2, b=0.75)


# Batch BM25 SEARCH (the serving shape): three literal queries answered in
# one token-stream pass — shared tf/df/dl statistics, broadcast query-term
# table, per-query windowed top-5 on the rounded decimal-summed score.
_BM25_QUERIES = [
    ("q_scan", ["table", "scan"]),
    ("q_join", ["query", "join", "fast"]),
    ("q_stream", ["stream", "window"]),
]
_BM25_Q_VALUES = ", ".join(
    f"('{qid}', '{t}')" for qid, terms in _BM25_QUERIES for t in terms
)
_BM25_ALL_TERMS = ", ".join(
    f"'{t}'" for t in sorted({t for _, ts in _BM25_QUERIES for t in ts})
)


@register(
    "bm25_search_topk",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    qt(query_id, tok) AS (VALUES {_BM25_Q_VALUES}),
    dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
    a AS (SELECT avg(dl) AS avgdl FROM dl),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
           WHERE tok IN ({_BM25_ALL_TERMS}) GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               ROUND(SUM(CAST(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                   AS DECIMAL(28,12))), 6)::DOUBLE AS bm25
        FROM tf JOIN qt USING (tok) JOIN df USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN a CROSS JOIN n
        GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, bm25, rn FROM (
        SELECT query_id, doc_id, bm25,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, doc_id ASC) AS rn
        FROM scored) WHERE rn <= 5
    """,
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.ranking import bm25_multi_topk

    d = Catalog(spark, sf_dir).documents
    return bm25_multi_topk(
        d, _BM25_QUERIES, "doc_id", "text", top_k=5
    )


# Reciprocal-rank fusion (Cormack et al. 2009) — the hybrid-search
# combiner: fuse the BM25 relevance ranking with a recency ranking
# (doc_id desc as ingest-order proxy) via 1/(60+rank) sums. Rank
# arithmetic only — engine-stable by construction; the window runs over
# ≤ top_k rows per query.
@register(
    "rrf_fuse_q",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    qt(query_id, tok) AS (VALUES {_BM25_Q_VALUES}),
    dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
    a AS (SELECT avg(dl) AS avgdl FROM dl),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
           WHERE tok IN ({_BM25_ALL_TERMS}) GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               ROUND(SUM(CAST(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                   AS DECIMAL(28,12))), 6)::DOUBLE AS bm25
        FROM tf JOIN qt USING (tok) JOIN df USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN a CROSS JOIN n
        GROUP BY qt.query_id, tf.doc_id
    ),
    topk AS (SELECT query_id, doc_id, rn FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, doc_id ASC) AS rn
        FROM scored) WHERE rn <= 5),
    fused AS (
        SELECT query_id, doc_id, rn,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY doc_id DESC) AS rrank
        FROM topk)
    SELECT query_id, doc_id,
           ROUND(1.0 / (60 + rn) + 1.0 / (60 + rrank), 6) AS rrf,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY 1.0 / (60 + rn) + 1.0 / (60 + rrank) DESC,
                        doc_id ASC) AS INT) AS rn_fused
    FROM fused
    """,
)
def rrf_fuse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.ranking import bm25_multi_topk

    d = Catalog(spark, sf_dir).documents
    topk = bm25_multi_topk(d, _BM25_QUERIES, "doc_id", "text", top_k=5)
    w_rec = Window.partitionBy("query_id").orderBy(F.col("doc_id").desc())
    fused = topk.withColumn("rrank", F.row_number().over(w_rec))
    rrf = 1.0 / (60 + F.col("rn")) + 1.0 / (60 + F.col("rrank"))
    w_f = Window.partitionBy("query_id").orderBy(
        rrf.desc(), F.col("doc_id").asc()
    )
    return fused.select(
        "query_id",
        "doc_id",
        F.round(rrf, 6).alias("rrf"),
        F.row_number().over(w_f).cast("int").alias("rn_fused"),
    )


@register(
    "inverted_index_q",
    f"""
    WITH p AS (SELECT DISTINCT doc_id, tok FROM ({_SQL_TOK_ROWS})),
    df AS (SELECT tok, count(*)::BIGINT AS df FROM p GROUP BY tok),
    capped AS (SELECT tok, doc_id,
                      ROW_NUMBER() OVER (PARTITION BY tok
                                         ORDER BY doc_id) AS rn
               FROM p),
    post AS (SELECT tok,
                    array_to_string(list(doc_id ORDER BY doc_id), ',')
                        AS postings
             FROM capped WHERE rn <= 100 GROUP BY tok)
    SELECT tok, df, postings
    FROM df JOIN post USING (tok)
    WHERE df >= 50
    """,
)
def inverted_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return inverted_index(d, "doc_id", "text", min_df=50, max_postings=100)


@register(
    "token_pmi_q",
    f"""
    WITH p AS (SELECT DISTINCT doc_id, tok FROM ({_SQL_TOK_ROWS})),
    v AS (SELECT tok, count(*) AS df FROM p GROUP BY tok
          ORDER BY df DESC, tok LIMIT 50),
    pv AS (SELECT p.doc_id, p.tok FROM p JOIN v USING (tok)),
    n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM p),
    co AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
                  count(*)::BIGINT AS pair_count
           FROM pv a JOIN pv b
             ON a.doc_id = b.doc_id AND a.tok < b.tok
           GROUP BY a.tok, b.tok
           HAVING count(*) >= 10)
    SELECT tok_a, tok_b, pair_count,
           ROUND(CAST(ln(pair_count * n_docs / (va.df * vb.df))
                      AS DECIMAL(28,12)), 6)::DOUBLE AS pmi
    FROM co
    JOIN v va ON va.tok = co.tok_a
    JOIN v vb ON vb.tok = co.tok_b
    CROSS JOIN n
    """,
)
def token_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return token_pmi(d, "doc_id", "text", vocab_size=50, min_pair_count=10)


# ---------------------------------------------------------------------------
# PageRank over the derived star-schema DAG (plans/graph.py:pagerank) —
# fixed 2-iteration budget, oracle replays each iteration as a chained CTE.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.plans.graph import pagerank  # noqa: E402

_PR_STEP = """
    c{i} AS (SELECT e.dst AS node,
                    SUM(CAST(r.rank / d.outdeg AS DECIMAL(28,12))) AS in_sum
             FROM r{p} r
             JOIN edges e ON r.node = e.src
             JOIN deg d ON d.src = e.src
             GROUP BY e.dst),
    r{i} AS (SELECT n.node,
                    ROUND(CAST((CAST(1.0 AS DOUBLE) - 0.85)
                               + CAST(0.85 AS DOUBLE)
                                 * COALESCE(c{i}.in_sum::DOUBLE, 0.0)
                               AS DECIMAL(28,12)), 8)::DOUBLE AS rank
             FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node)
"""


@register(
    "pagerank_top",
    f"""
    WITH {_EDGES_ORACLE},
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT src AS node FROM edges
              UNION
              SELECT dst FROM edges),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
    {_PR_STEP.format(i=1, p=0)},
    {_PR_STEP.format(i=2, p=1)}
    SELECT node, rank FROM r2
    """,
)
def pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return pagerank(_derived_edges(cat), iters=2, damping=0.85)


# ---------------------------------------------------------------------------
# Time-series resample + linear interpolation (operators/timeseries.py).
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.timeseries import (  # noqa: E402
    resample_interpolate,
)


@register(
    "resample_interpolate_q",
    """
    WITH obs AS (
        SELECT user_id AS key, date_trunc('hour', ts) AS bucket,
               ROUND(CAST(avg(value) AS DECIMAL(28,12)), 6)::DOUBLE
                   AS observed
        FROM events WHERE user_id < 30 GROUP BY 1, 2
    ),
    grid AS (
        SELECT key,
               unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        FROM (SELECT key, min(bucket) AS b0, max(bucket) AS b1
              FROM obs GROUP BY key)
    ),
    g AS (
        SELECT grid.key, grid.bucket, obs.observed
        FROM grid LEFT JOIN obs
          ON obs.key = grid.key AND obs.bucket = grid.bucket
    ),
    w AS (
        SELECT key, bucket, observed,
               last_value(observed IGNORE NULLS) OVER pw AS pv,
               last_value(CASE WHEN observed IS NOT NULL THEN bucket END
                          IGNORE NULLS) OVER pw AS pt,
               first_value(observed IGNORE NULLS) OVER nw AS nv,
               first_value(CASE WHEN observed IS NOT NULL THEN bucket END
                           IGNORE NULLS) OVER nw AS nt
        FROM g
        WINDOW pw AS (PARTITION BY key ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               nw AS (PARTITION BY key ORDER BY bucket
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT key, bucket, observed,
           CASE WHEN observed IS NOT NULL THEN observed
                ELSE ROUND(CAST(
                    pv + (nv - pv) * ((epoch(bucket) - epoch(pt))
                                      / (epoch(nt) - epoch(pt)))
                    AS DECIMAL(28,12)), 6)::DOUBLE
           END AS value
    FROM w
    """,
)
def resample_interpolate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(F.col("user_id") < 30)
    return resample_interpolate(
        e, key_col="user_id", ts_col="ts", value_col="value", step="1 hour"
    )


# ---------------------------------------------------------------------------
# Event-stream behavioral analytics (operators/cohorts.py): gap-based
# sessionization, weekly cohort retention, signup->purchase conversion lag.
# All pure Catalyst; the user key is the only shuffle key in each.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.cohorts import (  # noqa: E402
    cohort_retention,
    sessionize,
    time_to_convert,
)


@register(
    "sessionize_events",
    """
    WITH t AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INT) AS session_seq
        FROM t
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return sessionize(e, gap_minutes=30)


@register(
    "cohort_retention_q",
    """
    WITH f AS (
        SELECT user_id, min(date_trunc('week', ts)::DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS active_week
        FROM events
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, active_week) / 7 AS INT)
               AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return cohort_retention(e)


@register(
    "time_to_convert_q",
    """
    WITH u AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS start_ts
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS conv_ts
        FROM events e JOIN u ON e.user_id = u.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= u.start_ts
        GROUP BY e.user_id
    )
    SELECT u.user_id, u.start_ts,
           CAST(date_diff('second', u.start_ts, c.conv_ts) AS BIGINT)
               AS convert_secs
    FROM u LEFT JOIN c ON c.user_id = u.user_id
    WHERE u.start_ts IS NOT NULL
    """,
)
def time_to_convert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return time_to_convert(e)


# ---------------------------------------------------------------------------
# Training-data assembly ops: deterministic split assignment, concat-then-
# chunk sequence packing, and daily-count anomaly screening.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sampling import hash_split  # noqa: E402


@register(
    "train_test_split",
    f"""
    SELECT doc_id, lang,
           CASE WHEN {_SQL_POLY.format(s="doc_id::VARCHAR")} % 100 < 80
                THEN 'test'
                WHEN {_SQL_POLY.format(s="doc_id::VARCHAR")} % 100 < 90
                THEN 'train'
                ELSE 'val' END AS split
    FROM documents
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 deterministic split; sorted-label order is
    (test, train, val) so the first 80 residues map to the first sorted
    label — the oracle mirrors that ordering."""
    d = Catalog(spark, sf_dir).documents
    return hash_split(
        d, "doc_id", {"test": 0.8, "train": 0.1, "val": 0.1}
    ).select("doc_id", "lang", "split")


@register(
    "pack_sequences_q",
    f"""
    WITH t AS (
        SELECT source, doc_id, len({_SQL_TOKENS}) AS n_tok FROM documents
    ),
    o AS (
        SELECT source, doc_id, n_tok,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS off
        FROM t
    )
    SELECT source, CAST(off // 256 AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS chunk_tokens
    FROM o GROUP BY source, chunk_id
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (the standard LLM pretraining
    data layout): within each source shard, docs are laid out in doc_id
    order and cut into 256-token chunks by starting offset. One window
    pass + one map-side-combined groupBy, both keyed on the shard — at
    cluster scale the shard key IS the partition key, so the running
    offset never needs a global sort."""
    d = Catalog(spark, sf_dir).documents
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = d.select(
        "source",
        "doc_id",
        F.size(_tokens("text")).cast("long").alias("n_tok"),
    ).withColumn("off", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return (
        t.withColumn("chunk_id", (F.col("off") / F.lit(256)).cast("long"))
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("chunk_tokens"),
        )
    )


@register(
    "anomaly_zscore",
    """
    WITH d AS (
        SELECT event_type, date_trunc('day', ts)::DATE AS day,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
           ROUND(CAST(
               (n_events - avg(n_events) OVER w)
               / stddev_samp(n_events) OVER w
               AS DECIMAL(28,12)), 6)::DOUBLE AS zscore
    FROM d
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count z-score per event type: one groupBy to day granularity
    (map-side combined), then a per-type window over the tiny
    (type × day) frame. The corpus-sized table is touched once."""
    e = Catalog(spark, sf_dir).events
    d = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n_events"))
    w = Window.partitionBy("event_type")
    z = (F.col("n_events") - F.avg("n_events").over(w)) / F.stddev_samp(
        "n_events"
    ).over(w)
    return d.select(
        "event_type",
        "day",
        "n_events",
        F.round(z.cast("decimal(28,12)"), 6).cast("double").alias("zscore"),
    )


# ---------------------------------------------------------------------------
# CDC apply-changes (operators/cdc.py): keyed changelog -> new snapshot.
# The changelog is synthesized deterministically from orders so the oracle
# can replay it: keys %5==0 get an update (seq 1); keys %10==0 additionally
# get a delete (seq 2) that wins; keys offset by 10^7 arrive as inserts.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.cdc import apply_changes  # noqa: E402


@register(
    "cdc_apply_changes",
    """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    changes AS (
        SELECT o_orderkey, o_orderstatus,
               ROUND(o_totalprice * 2, 2) AS o_totalprice,
               'U' AS op, 1 AS seq
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice, 'D' AS op, 2 AS seq
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'N' AS o_orderstatus,
               o_totalprice, 'I' AS op, 1 AS seq
        FROM orders WHERE o_orderkey % 1000 = 1
    ),
    latest AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderkey
                ORDER BY seq DESC, (op = 'D') DESC, op DESC
            ) AS rn FROM changes
        ) WHERE rn = 1
    )
    SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
    FROM base b LEFT JOIN latest l ON b.o_orderkey = l.o_orderkey
    WHERE l.o_orderkey IS NULL
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM latest WHERE op <> 'D'
    """,
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 2, 2).alias("o_totalprice"),
            F.lit("U").alias("op"),
            F.lit(1).alias("seq"),
        )
    )
    deletes = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.lit("D").alias("op"),
            F.lit(2).alias("seq"),
        )
    )
    inserts = (
        o.filter(F.col("o_orderkey") % 1000 == 1)
        .select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
            F.lit("I").alias("op"),
            F.lit(1).alias("seq"),
        )
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    return apply_changes(base, changes, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Join/function breadth batch 3: full-outer reconciliation, null-safe
# equality join, map-type construction/extraction.
# ---------------------------------------------------------------------------
@register(
    "full_outer_reconcile",
    """
    WITH a AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    b AS (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_mktsegment = 'BUILDING'
    )
    SELECT COALESCE(a.o_custkey, b.c_custkey) AS custkey,
           a.n_orders, b.c_acctbal,
           CASE WHEN a.o_custkey IS NULL THEN 'segment_only'
                WHEN b.c_custkey IS NULL THEN 'orders_only'
                ELSE 'both' END AS presence
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.c_custkey
    """,
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation report between two derived sides — the full-outer
    keeps rows unique to either. Both sides pre-aggregate/filter before
    the join, so the join runs at key cardinality, not fact cardinality."""
    cat = Catalog(spark, sf_dir)
    a = cat.orders.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    b = cat.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_acctbal"
    )
    j = a.join(b, a.o_custkey == b.c_custkey, "full_outer")
    presence = (
        F.when(F.col("o_custkey").isNull(), "segment_only")
        .when(F.col("c_custkey").isNull(), "orders_only")
        .otherwise("both")
    )
    return j.select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"),
        "n_orders",
        "c_acctbal",
        presence.alias("presence"),
    )


@register(
    "nullsafe_join_nations",
    """
    WITH n AS (
        SELECT n_nationkey, n_name,
               CASE WHEN n_regionkey = 0 THEN NULL ELSE n_regionkey END AS rk
        FROM nation
    )
    SELECT a.n_name AS name_a, b.n_name AS name_b, a.rk
    FROM n a JOIN n b
      ON a.rk IS NOT DISTINCT FROM b.rk
     AND a.n_nationkey < b.n_nationkey
    """,
)
def nullsafe_join_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>): NULL keys match each other — the MySQL
    spaceship the reference's generated SQL relies on for nullable
    mapping columns. Catalyst plans <=> as a hash join key (EqualNullSafe
    is a valid equi-join expression), not a cross product."""
    nt = Catalog(spark, sf_dir).nation.select(
        "n_nationkey",
        "n_name",
        F.when(F.col("n_regionkey") == 0, None)
        .otherwise(F.col("n_regionkey"))
        .alias("rk"),
    )
    a, b = nt.alias("a"), nt.alias("b")
    return (
        a.join(
            b,
            F.col("a.rk").eqNullSafe(F.col("b.rk"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            F.col("a.rk"),
        )
    )


@register(
    "map_funcs",
    """
    WITH m AS (
        SELECT p_partkey,
               MAP(['brand', 'type'], [p_brand, p_type]) AS attrs
        FROM part
    )
    SELECT p_partkey,
           (attrs['brand'])[1] AS brand,
           CAST(cardinality(attrs) AS INT) AS n_keys,
           array_to_string(list_sort(map_keys(attrs)), ',') AS keys_csv
    FROM m
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + extraction + key introspection (F5's list/map
    cell model as first-class types). The map never reaches the compared
    output — only extracted scalars, so engine map-rendering differences
    can't affect the hash."""
    p = Catalog(spark, sf_dir).part
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        m.getItem("brand").alias("brand"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
    )


# ---------------------------------------------------------------------------
# Equal-frequency binning (feature engineering counterpart of the
# equal-width histogram_bins): NTILE deciles over account balances, then
# per-bin ranges/counts. The window orders by (value, key) so ties land
# deterministically in the same bin on both engines.
# ---------------------------------------------------------------------------
@register(
    "quantile_bins",
    """
    WITH t AS (
        SELECT c_acctbal,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS bin
        FROM customer
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           min(c_acctbal) AS lo,
           max(c_acctbal) AS hi
    FROM t GROUP BY bin
    """,
)
def quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile boundaries over the full dimension. NTILE semantics
    come from operators.indexing.global_ntile (range-partitioned global
    rank + arithmetic bucketing), so no single-partition window exists at
    any dimension size; the oracle keeps plain ANSI NTILE."""
    c = Catalog(spark, sf_dir).customer
    t = global_ntile(
        c.select("c_acctbal", "c_custkey"),
        [F.col("c_acctbal"), F.col("c_custkey")],
        10,
        "bin",
    )
    return t.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )


# ---------------------------------------------------------------------------
# Z-order layout key: bit-interleave two join/filter dimensions so a range
# partition on the z-value co-locates rows close in BOTH dimensions — the
# multi-dimensional clustering trick behind OPTIMIZE ZORDER, as a pure
# Catalyst expression. 16 bits per dimension here; the query returns the
# layout key plus its per-z-range row counts so the oracle pins the full
# interleave arithmetic.
# ---------------------------------------------------------------------------
def _zorder16(a, b):
    """Interleave the low 16 bits of integer columns a (even positions)
    and b (odd positions) into one 32-bit z-value, JVM-side."""
    z = F.lit(0).cast("long")
    # disjoint bit positions, so + is the bitwise OR (Column | is boolean OR)
    for i in range(16):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i) % 2, 2 * i).cast("long")
            + F.shiftleft(F.shiftright(b, i) % 2, 2 * i + 1).cast("long")
        )
    return z


@register(
    "zorder_layout",
    """
    WITH z AS (
        SELECT o_orderkey, o_custkey,
               (SELECT SUM(
                   ((o_orderkey // (1 << i)) % 2) * (1 << (2 * i))
                   + ((o_custkey // (1 << i)) % 2) * (1 << (2 * i + 1))
               ) FROM range(16) r(i)) AS zval
        FROM orders
    )
    SELECT CAST(zval // 65536 AS BIGINT) AS z_range,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(zval) AS BIGINT) AS z_lo,
           CAST(max(zval) AS BIGINT) AS z_hi
    FROM z GROUP BY 1
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    z = o.select(
        _zorder16(F.col("o_orderkey"), F.col("o_custkey")).alias("zval")
    )
    return (
        z.withColumn("z_range", (F.col("zval") / 65536).cast("long"))
        .groupBy("z_range")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("zval").cast("long").alias("z_lo"),
            F.max("zval").cast("long").alias("z_hi"),
        )
    )


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics (the CBO inputs: count / ndv / nulls /
# min / max per column). Catalyst rewrites the multi-column distinct
# aggregate into one column-pruned scan per distinct column — on columnar
# storage that is the same IO as a single wide scan, and each scan carries
# its own map-side partial aggregation (plan-pinned).
# ---------------------------------------------------------------------------
@register(
    "analyze_table_stats",
    """
    WITH a AS (
        SELECT count(*) AS n,
               count(DISTINCT l_quantity) AS ndv_q,
               count(l_quantity) AS nn_q,
               min(l_quantity) AS mn_q, max(l_quantity) AS mx_q,
               count(DISTINCT l_discount) AS ndv_d,
               count(l_discount) AS nn_d,
               min(l_discount) AS mn_d, max(l_discount) AS mx_d,
               count(DISTINCT l_tax) AS ndv_t,
               count(l_tax) AS nn_t,
               min(l_tax) AS mn_t, max(l_tax) AS mx_t
        FROM lineitem
    )
    SELECT 'l_quantity' AS col_name, CAST(n AS BIGINT) AS n_rows,
           CAST(ndv_q AS BIGINT) AS ndv,
           CAST(n - nn_q AS BIGINT) AS n_nulls,
           CAST(mn_q AS DOUBLE) AS min_v, CAST(mx_q AS DOUBLE) AS max_v
    FROM a
    UNION ALL
    SELECT 'l_discount', CAST(n AS BIGINT), CAST(ndv_d AS BIGINT),
           CAST(n - nn_d AS BIGINT), CAST(mn_d AS DOUBLE), CAST(mx_d AS DOUBLE)
    FROM a
    UNION ALL
    SELECT 'l_tax', CAST(n AS BIGINT), CAST(ndv_t AS BIGINT),
           CAST(n - nn_t AS BIGINT), CAST(mn_t AS DOUBLE), CAST(mx_t AS DOUBLE)
    FROM a
    """,
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    cols = ["l_quantity", "l_discount", "l_tax"]
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs += [
            F.countDistinct(c).alias(f"ndv_{c}"),
            F.count(c).alias(f"nn_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    a = li.agg(*aggs)
    parts = [
        a.select(
            F.lit(c).alias("col_name"),
            F.col("n").cast("long").alias("n_rows"),
            F.col(f"ndv_{c}").cast("long").alias("ndv"),
            (F.col("n") - F.col(f"nn_{c}")).cast("long").alias("n_nulls"),
            F.col(f"mn_{c}").cast("double").alias("min_v"),
            F.col(f"mx_{c}").cast("double").alias("max_v"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Incremental view maintenance: keep a per-customer order count current by
# merging changelog DELTAS into the existing aggregate — the full recompute
# over the applied snapshot is the oracle, so this query PROVES
# delta-merge == recompute. At 100 TB the delta path touches only changed
# keys (changelog-sized work) instead of rescanning the fact table.
# ---------------------------------------------------------------------------
@register(
    "ivm_merge_counts",
    """
    WITH changes AS (
        SELECT o_orderkey, o_custkey, 'U' AS op, 1 AS seq
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, 'D' AS op, 2 AS seq
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'I' AS op, 1 AS seq
        FROM orders WHERE o_orderkey % 1000 = 1
    ),
    latest AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderkey
                ORDER BY seq DESC, (op = 'D') DESC, op DESC
            ) AS rn FROM changes
        ) WHERE rn = 1
    ),
    applied AS (
        SELECT b.o_custkey
        FROM orders b LEFT JOIN latest l ON b.o_orderkey = l.o_orderkey
        WHERE l.o_orderkey IS NULL
        UNION ALL
        SELECT o_custkey FROM latest WHERE op <> 'D'
    )
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
    FROM applied GROUP BY o_custkey
    """,
)
def ivm_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side takes the INCREMENTAL path the oracle does not:
    old aggregate + per-key deltas from the collapsed changelog. Matching
    the oracle's full recompute is the IVM correctness proof."""
    o = Catalog(spark, sf_dir).orders
    base = o.select("o_orderkey", "o_custkey")
    changes = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey", "o_custkey", F.lit("U").alias("op"),
            F.lit(1).alias("seq"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 10 == 0).select(
                "o_orderkey", "o_custkey", F.lit("D").alias("op"),
                F.lit(2).alias("seq"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 1000 == 1).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_custkey", F.lit("I").alias("op"), F.lit(1).alias("seq"),
            )
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("seq").desc(),
        (F.col("op") == "D").desc(),
        F.col("op").desc(),
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # per-key delta: -1 for a delete of an existing key, +1 for an
    # upsert of a new key, 0 otherwise (update-in-place)
    in_base = base.select("o_orderkey").withColumn("_inb", F.lit(1))
    delta_rows = latest.join(in_base, "o_orderkey", "left").select(
        "o_custkey",
        F.when((F.col("op") == "D") & F.col("_inb").isNotNull(), -1)
        .when((F.col("op") != "D") & F.col("_inb").isNull(), 1)
        .otherwise(0)
        .alias("delta"),
    )
    deltas = delta_rows.groupBy("o_custkey").agg(
        F.sum("delta").alias("d")
    )
    old = base.groupBy("o_custkey").agg(F.count("*").alias("n0"))
    merged = old.join(deltas, "o_custkey", "full_outer").select(
        "o_custkey",
        (
            F.coalesce(F.col("n0"), F.lit(0))
            + F.coalesce(F.col("d"), F.lit(0))
        )
        .cast("long")
        .alias("n_orders"),
    )
    return merged.filter(F.col("n_orders") > 0)


# ---------------------------------------------------------------------------
# Data-quality expectations (operators/quality.py): all observables in one
# aggregation pass, report unpivoted to rule rows.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.quality import (  # noqa: E402
    Expectation,
    check_expectations,
    distinct_count,
    null_rate,
)


@register(
    "dq_expectations",
    """
    WITH a AS (
        SELECT CAST((count(*) - count(c_acctbal)) AS DOUBLE) / count(*)
                   AS acctbal_null_rate,
               CAST(count(DISTINCT c_mktsegment) AS DOUBLE) AS n_segments,
               CAST(min(c_acctbal) AS DOUBLE) AS min_acctbal,
               CAST(count(*) AS DOUBLE) AS n_rows
        FROM customer
    )
    SELECT 'acctbal_null_rate' AS rule, acctbal_null_rate AS observed,
           0.0::DOUBLE AS lo, 0.01::DOUBLE AS hi,
           acctbal_null_rate BETWEEN 0.0 AND 0.01 AS passed FROM a
    UNION ALL
    SELECT 'n_segments', n_segments, 5.0::DOUBLE, 5.0::DOUBLE,
           n_segments BETWEEN 5.0 AND 5.0 FROM a
    UNION ALL
    SELECT 'min_acctbal', min_acctbal, -1000.0::DOUBLE, 0.0::DOUBLE,
           min_acctbal BETWEEN -1000.0 AND 0.0 FROM a
    UNION ALL
    SELECT 'n_rows', n_rows, 1.0::DOUBLE, 1e12::DOUBLE,
           n_rows BETWEEN 1.0 AND 1e12 FROM a
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four rules over customer — one intentionally failing (min_acctbal
    bound excludes the real minimum) so the report exercises both
    verdicts."""
    c = Catalog(spark, sf_dir).customer
    rules = [
        Expectation("acctbal_null_rate", null_rate("c_acctbal"), 0.0, 0.01),
        Expectation("n_segments", distinct_count("c_mktsegment"), 5.0, 5.0),
        Expectation("min_acctbal", F.min("c_acctbal"), -1000.0, 0.0),
        Expectation("n_rows", F.count(F.lit(1)), 1.0, 1e12),
    ]
    return check_expectations(c, rules)


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (A-ES priority sampling, hash-derived
# draws) — inclusion scales with doc length, reproducible on any engine.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sampling import (  # noqa: E402
    weighted_sample_topk,
)


@register(
    "weighted_sample_q",
    f"""
    WITH p AS (
        SELECT doc_id, n_chars,
               ROUND(CAST(
                   ln(({_SQL_POLY.format(s="doc_id::VARCHAR")} % 999983 + 1)
                      / 999984.0) / n_chars
                   AS DECIMAL(28,12)), 6)::DOUBLE AS priority
        FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, priority
    FROM p ORDER BY priority DESC, doc_id LIMIT 20
    """,
)
def weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )
    return weighted_sample_topk(d, "doc_id", "n_chars", k=20)


# ---------------------------------------------------------------------------
# DAU / WAU / stickiness: rolling 7-day distinct users per day. The
# corpus-sized event table reduces to the (day, user) distinct frame FIRST
# (bounded by users×days), so the 7-day range join explodes only that
# small frame against the broadcast day grid.
# ---------------------------------------------------------------------------
@register(
    "dau_wau_stickiness",
    """
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts)::DATE AS day, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    wau AS (
        SELECT d.day, count(DISTINCT du.user_id) AS wau
        FROM days d JOIN du
          ON du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day
    )
    SELECT d.day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           ROUND(CAST(dau AS DECIMAL(28,12)) / wau, 6)::DOUBLE AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    du = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct().localCheckpoint()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    # each (day, user) contributes to the 7 window-end days [day, day+6]:
    # a map-side explode + equi semi-join beats a nested-loop range join
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
        "user_id",
    )
    wau = (
        contrib.join(
            F.broadcast(days.withColumnRenamed("day", "wday")),
            "wday",
            "left_semi",
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("wday", "day")
    )
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.round(F.col("dau").cast("decimal(28,12)") / F.col("wau"), 6)
        .cast("double")
        .alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# Product quantization (operators/clustering.pq_encode): 4 subspaces x 16
# dims, each an independent 2-round deterministic Lloyd clustering. The
# oracle replays every subspace's rounds with the same CTE chain as
# kmeans_assignments, generated per subspace.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.clustering import pq_encode  # noqa: E402


def _pq_subspace_sql(j: int, subdim: int = 16, k: int = 4) -> str:
    a, b = j * subdim + 1, (j + 1) * subdim
    return f"""
    e{j} AS (SELECT vec_id, (embedding::DOUBLE[])[{a}:{b}] AS v
             FROM embeddings),
    c0{j} AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
              FROM e{j} ORDER BY vec_id LIMIT {k}),
    a0{j} AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e{j} e CROSS JOIN c0{j} c
        ) WHERE rn = 1
    ),
    m0{j} AS (
        SELECT cid, i, ROUND(CAST(avg(val) AS DECIMAL(28,12)), 6)::DOUBLE AS m
        FROM (SELECT cid, i, v[i] AS val
              FROM a0{j}, unnest(range(1, len(v)+1)) AS t(i))
        GROUP BY cid, i
    ),
    c1{j} AS (SELECT cid, list(m ORDER BY i) AS v FROM m0{j} GROUP BY cid),
    a1{j} AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e{j} e CROSS JOIN c1{j} c
        ) WHERE rn = 1
    )"""


@register(
    "pq_codes",
    "WITH "
    + ",".join(_pq_subspace_sql(j) for j in range(4))
    + """
    SELECT a10.vec_id,
           CAST(a10.cid AS INT) AS code_0,
           CAST(a11.cid AS INT) AS code_1,
           CAST(a12.cid AS INT) AS code_2,
           CAST(a13.cid AS INT) AS code_3
    FROM a10 JOIN a11 USING (vec_id) JOIN a12 USING (vec_id)
    JOIN a13 USING (vec_id)
    """,
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    return pq_encode(emb, "vec_id", "embedding", m=4, subdim=16, k=4, iters=2)


# ---------------------------------------------------------------------------
# Hierarchical rollup reuse (continuous-aggregate pattern): daily stats
# answered FROM the hourly rollup — sums/counts/mins/maxes compose, avg is
# re-derived as sum/count. The oracle aggregates the raw events directly,
# so a green row proves the two-level rollup is lossless. At 100 TB the
# hourly layer is what makes dashboard-latency dailies possible: the raw
# table is touched once per hour, not once per query.
# ---------------------------------------------------------------------------
@register(
    "rollup_reuse_daily",
    """
    SELECT event_type, date_trunc('day', ts)::DATE AS day,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(CAST(sum(value) AS DECIMAL(28,12)), 4)::DOUBLE AS total,
           ROUND(CAST(sum(value) AS DECIMAL(28,12))
                 / count(*), 6)::DOUBLE AS mean,
           min(value) AS lo, max(value) AS hi
    FROM events GROUP BY 1, 2
    """,
)
def rollup_reuse_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(28,12)")).alias("s"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    return hourly.groupBy(
        "event_type", F.to_date("hour").alias("day")
    ).agg(
        F.sum("n").cast("long").alias("n"),
        F.round(F.sum("s").cast("decimal(28,12)"), 4)
        .cast("double")
        .alias("total"),
        (
            F.round(
                (F.sum("s").cast("decimal(28,12)") / F.sum("n")).cast(
                    "decimal(28,12)"
                ),
                6,
            )
        )
        .cast("double")
        .alias("mean"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
    ).select("event_type", "day", "n", "total", "mean", "lo", "hi")


# ---------------------------------------------------------------------------
# Round-2 widening: PII redaction, Unicode normalization, char-entropy
# quality, contrastive negative sampling, per-group reservoir sampling,
# hard-negative mining, and key-skew diagnostics.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.functions.text import char_entropy, normalize_text
from iniz_exporters_spark.operators.indexing import (
    global_ntile,
    negative_sample_pairs,
)
from iniz_exporters_spark.operators.privacy import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)
from iniz_exporters_spark.operators.sampling import reservoir_per_group
from iniz_exporters_spark.operators.similarity import hard_negatives
from iniz_exporters_spark.operators.skew import key_skew_profile


# The synthetic corpus carries no real PII, so the query SPIKES each doc
# with deterministic doc_id-derived PII of every kind, then redacts and
# counts — exercising all four patterns on every row in both engines.
_PII_SPIKE_SQL = (
    "text || ' contact user' || doc_id || '@example.com from 10.' || "
    "(doc_id % 200) || '.0.1 call 555-' || "
    "lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' || "
    "lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' ssn 123-45-6789'"
)


def _pii_redact_sql() -> str:
    redacted = "t"
    for _, pattern, token in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pattern}', '{token}', 'g')"
    count_cols = ",\n           ".join(
        f"length(regexp_extract_all(t, '{pattern}'))::INT AS n_{kind}"
        for kind, pattern, _ in PII_PATTERNS
    )
    return f"""
    WITH spiked AS (SELECT doc_id, {_PII_SPIKE_SQL} AS t FROM documents)
    SELECT doc_id,
           {count_cols},
           {redacted} AS redacted
    FROM spiked
    """


@register("pii_redact", _pii_redact_sql())
def pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: per-kind counts + redacted text.

    Pure Catalyst regexp chain — per-row inside whole-stage codegen, zero
    shuffles; scrubbing cost is one corpus scan at any scale."""
    d = Catalog(spark, sf_dir).documents
    spiked = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0.1 call 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-6789"),
    )
    t = d.select("doc_id", spiked.alias("t"))
    counts = pii_counts("t")
    return t.select(
        "doc_id",
        *[counts[kind].cast("int").alias(f"n_{kind}") for kind, _, _ in PII_PATTERNS],
        redact_pii("t").alias("redacted"),
    )


# Whitespace class is pinned to the ASCII set so Java regex (Spark) and
# RE2 (DuckDB) agree; Python's \s would also eat U+00A0 etc., RE2's won't.
_WS_CLASS = r"[ \t\n\r\f\v]+"


@register(
    "normalize_nfc",
    f"""
    WITH spiked AS (
        SELECT doc_id,
               text || '  cafe' || chr(769) || '   nai' || chr(776) || 've'
                    || chr(9) || 'end' AS t
        FROM documents)
    SELECT doc_id,
           nfc_normalize(lower(trim(
               regexp_replace(t, '{_WS_CLASS}', ' ', 'g')))) AS norm_text,
           length(t)::INT AS n_chars_before,
           length(nfc_normalize(lower(trim(
               regexp_replace(t, '{_WS_CLASS}', ' ', 'g')))))::INT
               AS n_chars_after
    FROM spiked
    """,
)
def normalize_nfc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC + whitespace/case canonicalization (the dedup-key
    pre-pass). The spike appends decomposed accents + whitespace runs so
    composition and collapsing are exercised on every row. Arrow-batched
    mapInPandas kernel (Spark has no NFC builtin) — per-row, zero
    shuffles."""
    d = Catalog(spark, sf_dir).documents
    spiked = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("  café   naïve\tend")
        ).alias("t"),
    )
    return normalize_text(spiked, "doc_id", "t")


@register(
    "char_entropy_q",
    """
    SELECT d.doc_id, length(d.text)::INT AS n_chars,
           CAST(ROUND(CAST(e.ent AS DECIMAL(28,12)), 6) AS DOUBLE)
               AS char_entropy
    FROM documents d
    JOIN (SELECT doc_id, entropy(c) AS ent
          FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
                FROM documents WHERE length(text) > 0) chars
          GROUP BY doc_id) e USING (doc_id)
    WHERE length(d.text) > 0
    """,
)
def char_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per doc (gibberish/repetition
    filter). Vectorized numpy kernel over Arrow batches; rounded in
    decimal space so DuckDB's entropy() aggregate hash-matches."""
    d = Catalog(spark, sf_dir).documents.filter(F.length("text") > 0)
    ent = char_entropy(d, "doc_id", "text")
    return ent.select(
        "doc_id",
        "n_chars",
        F.round(F.col("char_entropy").cast("decimal(28,12)"), 6)
        .cast("double")
        .alias("char_entropy"),
    )


def _negative_samples_sql(k: int, seed: int) -> str:
    poly = _SQL_POLY.format(s="(d.idx || ':' || d.j || ':' || " f"'{seed}')")
    return f"""
    WITH r AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY doc_id) AS idx
               FROM documents),
    n AS (SELECT COUNT(*)::BIGINT AS c FROM documents),
    draws AS (SELECT idx, doc_id, unnest(range(1, {k + 1})) AS j FROM r),
    pairs AS (
        SELECT d.doc_id AS anchor_id, d.j::INT AS j,
               ((d.idx - 1 + 1 + ({poly} % (n.c - 1))) % n.c) + 1 AS pidx
        FROM draws d CROSS JOIN n)
    SELECT p.anchor_id, p.j, r2.doc_id AS negative_id
    FROM pairs p JOIN r r2 ON p.pidx = r2.idx
    """


@register("negative_samples", _negative_samples_sql(k=2, seed=1))
def negative_samples_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negatives: 2 deterministic uniform non-self
    partners per doc. Distributed dense ranking (range partition +
    per-partition numbering + offsets — no single-partition window), then
    one rank-keyed equi-join resolves partner ids."""
    d = Catalog(spark, sf_dir).documents
    return negative_sample_pairs(d.select("doc_id"), "doc_id", k=2, seed=1)


@register(
    "reservoir_per_group_q",
    f"""
    SELECT o_orderpriority, o_orderkey, rn FROM (
        SELECT o_orderpriority, o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY {_SQL_POLY.format(s="o_orderkey::VARCHAR")} ASC,
                            o_orderkey ASC) AS rn
        FROM orders) t
    WHERE rn <= 3
    """,
)
def reservoir_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k uniform sample per group, content-keyed (hash-order rank) so
    every engine draws the same rows. One window shuffle on the group
    key."""
    o = Catalog(spark, sf_dir).orders
    return reservoir_per_group(
        o.select("o_orderpriority", "o_orderkey"),
        "o_orderpriority",
        "o_orderkey",
        k=3,
    ).select("o_orderpriority", "o_orderkey", "rn")


@register(
    "hard_negatives_q",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.v, c.v), 4) AS cos
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cos, rn FROM (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored WHERE cos >= 0.2 AND cos < 0.8
    ) t WHERE rn <= 5
    """,
)
def hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: nearest neighbors inside the [0.2, 0.8)
    cosine band — informative negatives below the near-dup threshold.
    Broadcast-queries plan; the corpus never shuffles."""
    e = Catalog(spark, sf_dir).embeddings
    return hard_negatives(
        corpus=e,
        queries=e.filter(F.col("vec_id") < 10),
        lo=0.2,
        hi=0.8,
        top_k=5,
    )


@register(
    "skew_profile",
    """
    WITH c AS (SELECT l_suppkey AS key, COUNT(*) AS cnt
               FROM lineitem GROUP BY l_suppkey),
    t AS (SELECT SUM(cnt)::BIGINT AS total, COUNT(*)::BIGINT AS n_keys
          FROM c),
    top AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key ASC LIMIT 5)
    SELECT key, cnt,
           CAST(ROUND(CAST(cnt::DOUBLE / total AS DECIMAL(28,12)), 4)
                AS DOUBLE) AS share,
           CAST(ROUND(CAST(cnt::DOUBLE * n_keys / total AS DECIMAL(28,12)),
                      4) AS DOUBLE) AS skew_ratio,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rn
    FROM top CROSS JOIN t
    """,
)
def skew_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter diagnostic on the lineitem supplier key: top-5 keys
    with row share and ratio-to-mean-group — the pre-flight check that
    decides whether a join needs salting/AQE skew handling."""
    li = Catalog(spark, sf_dir).lineitem
    return key_skew_profile(li, "l_suppkey", top_n=5)


# ---------------------------------------------------------------------------
# Round-2 widening, batch B: bigram LM scoring, repeated-span detection,
# BPE merge-pair statistics, JL random projection, winsorized aggregation.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.lm import (
    bigram_logprob,
    duplicate_spans,
    merge_pair_counts,
)
from iniz_exporters_spark.operators.similarity import jl_project


@register(
    "bigram_logprob_q",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2),
    pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM idx),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT w) AS V
          FROM (SELECT unnest(t) AS w FROM toks) u)
    SELECT p.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(ROUND(CAST(SUM(CAST(
               log2((c12.c12 + 1)::DOUBLE / (c1.c1 + v.V))
               AS DECIMAL(28,12))) AS DECIMAL(28,12)), 6) AS DOUBLE)
               AS logprob
    FROM pairs p
    JOIN c12 ON p.w1 = c12.w1 AND p.w2 = c12.w2
    JOIN c1 ON p.w1 = c1.w1
    CROSS JOIN v
    GROUP BY p.doc_id
    """,
)
def bigram_logprob_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc log2-likelihood under an add-1 bigram LM fit on the corpus
    itself — the perplexity-style fluency filter, one level up from
    unigram_logprob. Token extraction is per-row Catalyst; statistics are
    two count aggs; scoring is a vocab-keyed join (AQE absorbs Zipf
    skew)."""
    d = Catalog(spark, sf_dir).documents
    return bigram_logprob(d, "doc_id", "text")


@register(
    "dup_spans",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
            FROM toks WHERE len(t) >= 5),
    hashed AS (SELECT doc_id,
                      {_SQL_POLY.format(s="array_to_string(t[i:i+4], ' ')")}
                          AS span_hash
               FROM idx)
    SELECT span_hash, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM hashed GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated 5-token spans across documents (span-level dedup
    candidates, after Lee et al.). Span hashes are computed per-row in
    nested higher-order functions; only (id, hash) rows reach the
    shuffle."""
    d = Catalog(spark, sf_dir).documents
    return duplicate_spans(d, "doc_id", "text", span=5, min_docs=2)


@register(
    "span_dedup_trim",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    spans AS (SELECT doc_id, i,
                     {_SQL_POLY.format(s="array_to_string(t[i:i+4], ' ')")}
                         AS h
              FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
                    FROM toks WHERE len(t) >= 5)),
    flagged AS (SELECT h FROM spans
                GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    covered AS (SELECT doc_id, COUNT(*) AS ncov FROM (
        SELECT DISTINCT s.doc_id, s.i + u.d AS pos
        FROM spans s JOIN flagged f ON s.h = f.h, range(0, 5) u(d))
        GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(c.ncov, 0) AS BIGINT) AS n_covered,
           CAST(len(t.t) - COALESCE(c.ncov, 0) AS BIGINT) AS n_kept
    FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id
    """,
    headline=True,
)
def span_dedup_trim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup APPLIED (the removal accounting after dup_spans
    flags repeated windows): per doc, how many token positions fall inside
    any cross-document 5-token span, and how many tokens survive the trim.
    Fully relational — see operators/lm.span_dedup_counts."""
    from iniz_exporters_spark.operators.lm import span_dedup_counts

    d = Catalog(spark, sf_dir).documents
    return span_dedup_counts(d, "doc_id", "text", span=5, min_docs=2)


# Per-doc n-gram novelty — the memorization-risk inverse of span dedup:
# what fraction of a doc's 5-token windows appear in NO other document.
# Low novelty = template/boilerplate; the per-doc number drives
# sampling-weight decisions where whole-doc dropping is too blunt.
@register(
    "span_novelty_q",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    spans AS (SELECT doc_id,
                     {_SQL_POLY.format(s="array_to_string(t[i:i+4], ' ')")}
                         AS h
              FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
                    FROM toks WHERE len(t) >= 5)),
    df AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY h)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(*) FILTER (WHERE nd = 1) AS BIGINT) AS n_novel,
           ROUND(CAST(CAST(COUNT(*) FILTER (WHERE nd = 1) AS DOUBLE)
                      / COUNT(*) AS DECIMAL(28,6)), 4)::DOUBLE AS novelty
    FROM spans JOIN df USING (h)
    GROUP BY doc_id
    """,
)
def span_novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", _tokens("text").alias("__t")).filter(
        F.size("__t") >= 5
    )
    hashes = F.transform(
        F.sequence(F.lit(1), F.size("__t") - 4),
        lambda i: poly_hash(F.array_join(F.slice(F.col("__t"), i, 5), " ")),
    )
    spans = toks.select(
        "doc_id", F.explode(hashes).alias("h")
    ).localCheckpoint(eager=False)
    df_ = spans.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    return (
        spans.join(df_, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("nd") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
            F.round(
                (
                    F.sum(
                        F.when(F.col("nd") == 1, 1).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1))
                ).cast("decimal(28,6)"),
                4,
            )
            .cast("double")
            .alias("novelty"),
        )
    )


@register(
    "bpe_merge_pairs",
    f"""
    SELECT pair, cnt, rn FROM (
        SELECT pair, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair ASC) AS rn
        FROM (SELECT substr(w, i, 2) AS pair
              FROM (SELECT w, unnest(range(1, length(w))) AS i
                    FROM (SELECT unnest({_SQL_TOKENS}) AS w FROM documents) t0
                    WHERE length(w) >= 2) t1) t2
        GROUP BY pair) t3
    WHERE rn <= 20
    """,
)
def bpe_merge_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs inside tokens — the BPE trainer's
    next-merge statistic. Explode + count with map-side partials; ordered
    limit plans as TakeOrderedAndProject."""
    d = Catalog(spark, sf_dir).documents
    return merge_pair_counts(d, "text", top_n=20)


# ---------------------------------------------------------------------------
# BPE merge-table APPLY: re-tokenize every word through a static merge table
# (the serving shape — a tokenizer ships as a fixed artifact), applied
# iteratively in rank order; rule 2 consumes rule 1's output symbol, so the
# iterative semantics are genuinely exercised. Spark side: the fold chain
# runs once per DISTINCT word (vocabulary-sized work) and broadcast-joins
# back to the token stream. Oracle side: each merge is replayed as a
# fixpoint recursive CTE of space-delimited replaces (leftmost-greedy
# replace iterated to fixpoint equals the fold — one pass of a rule can
# only miss occurrences split across a replaced boundary, which the next
# iteration catches).
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.lm import (  # noqa: E402
    bpe_apply_symbols,
    bpe_learn,
)

_BPE_MERGES = [("t", "h"), ("th", "e"), ("i", "n"), ("e", "r")]


def _bpe_apply_sql(merges: list[tuple[str, str]]) -> str:
    ctes = [
        "f0 AS (SELECT w, ' ' || array_to_string(string_split(w, ''), ' ')"
        " || ' ' AS s FROM (SELECT DISTINCT unnest("
        + _SQL_TOKENS
        + ") AS w FROM documents))"
    ]
    for i, (a, b) in enumerate(merges, start=1):
        pat, rep = f"' {a} {b} '", f"' {a}{b} '"
        ctes.append(
            f"m{i} AS (SELECT w, s FROM f{i - 1} UNION ALL "
            f"SELECT w, replace(s, {pat}, {rep}) FROM m{i} "
            f"WHERE s <> replace(s, {pat}, {rep}))"
        )
        ctes.append(
            f"f{i} AS (SELECT w, s FROM m{i} "
            f"WHERE s = replace(s, {pat}, {rep}))"
        )
    n = len(merges)
    return f"""
    WITH RECURSIVE {", ".join(ctes)},
    seg AS (SELECT w, len(string_split(trim(s), ' ')) AS n_sym FROM f{n}),
    toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM documents)
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens
    FROM toks JOIN seg USING (w)
    GROUP BY doc_id
    """


def _bpe_learn_sql(k: int) -> str:
    """DuckDB replay of ``bpe_learn``: per round, the weighted top pair
    (count desc, pair asc) via a scalar-subquery'd ordered LIMIT 1, then a
    fixpoint recursive-CTE replace (same machinery as _bpe_apply_sql) to
    re-segment the vocabulary before the next round. Assumes every round
    finds at least one pair (true on any non-degenerate corpus; the Spark
    side breaks out early on a dry round).

    The non-recursive members (f*, t*) are MATERIALIZED: each round
    references its predecessor several times (pattern + replacement scalar
    subqueries, fixpoint guard), so inlined CTEs expand the predecessor
    multiplicatively per round — beyond ~5 rounds the expansion re-opens
    the parquet file exponentially many times and dies on fd limits.
    Materialization makes replay depth linear (64 rounds ≈ 1.4 s at
    sf0.01)."""
    syms = "string_split(trim(s), ' ')"
    ctes = [
        "f0 AS MATERIALIZED (SELECT w, freq, ' ' || "
        "array_to_string(string_split(w, ''),"
        " ' ') || ' ' AS s FROM (SELECT w, COUNT(*) AS freq FROM ("
        f"SELECT unnest({_SQL_TOKENS}) AS w FROM documents) GROUP BY w))"
    ]
    for r in range(1, k + 1):
        pat = f"(SELECT ' '||a||' '||b||' ' FROM t{r})"
        rep = f"(SELECT ' '||a||b||' ' FROM t{r})"
        ctes.append(
            f"t{r} AS MATERIALIZED (SELECT syms[i] AS a, syms[i+1] AS b "
            f"FROM (SELECT {syms} AS syms, freq, "
            f"unnest(range(1, len({syms}))) AS i FROM f{r - 1}) "
            "GROUP BY a, b ORDER BY SUM(freq) DESC, a ASC, b ASC LIMIT 1)"
        )
        ctes.append(
            f"m{r} AS (SELECT w, freq, s FROM f{r - 1} UNION ALL "
            f"SELECT w, freq, replace(s, {pat}, {rep}) FROM m{r} "
            f"WHERE s <> replace(s, {pat}, {rep}))"
        )
        ctes.append(
            f"f{r} AS MATERIALIZED (SELECT w, freq, s FROM m{r} "
            f"WHERE s = replace(s, {pat}, {rep}))"
        )
    ranks = " UNION ALL ".join(
        f"SELECT {r} AS rank, a, b FROM t{r}" for r in range(1, k + 1)
    )
    return f"WITH RECURSIVE {', '.join(ctes)} {ranks}"


@register("bpe_learn_q", _bpe_learn_sql(3))
def bpe_learn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training itself, driver-checked: 3 merge rounds learned on the
    corpus vocabulary (weighted by word frequency), emitted as
    (rank, a, b). The Spark side is the bpe_learn driver loop — one
    single-row collect per round; the oracle replays every round in SQL."""
    d = Catalog(spark, sf_dir).documents
    merges = bpe_learn(d, "text", k=3)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    )


@register("bpe_learn64", _bpe_learn_sql(64), headline=True)
def bpe_learn64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-scale BPE training: 64 merge rounds, checkpoint cadence 8
    (seven rounds stack their merge folds as lineage on the last snapshot,
    the eighth materializes — round-trip cost amortized 8×). The corpus
    scan happens once (weighted vocab build); all 64 rounds run on
    vocabulary-sized data, so the loop cost is corpus-size-independent —
    the actual 100 TB question for SQL-replayed training, benchmarked
    here as a headline query. Oracle: the full 64-round recursive-CTE
    replay (MATERIALIZED members keep it linear in depth)."""
    d = Catalog(spark, sf_dir).documents
    merges = bpe_learn(d, "text", k=64, checkpoint_every=8)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    )


@register("bpe_apply_q", _bpe_apply_sql(_BPE_MERGES), headline=True)
def bpe_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", F.explode(_tokens("text")).alias("w"))
    vocab = (
        toks.select("w")
        .distinct()
        .select(
            "w",
            F.size(bpe_apply_symbols(F.col("w"), _BPE_MERGES)).alias(
                "n_sym"
            ),
        )
    )
    return toks.join(F.broadcast(vocab), "w").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Host/URL-level web-corpus curation (CCNet-style): the documents table has
# no URL column, so each query synthesizes a deterministic URL from
# (source, doc_id, lang) and then runs the REAL operators — parse_url
# extraction, per-host reservoir caps, per-host adaptive rate sampling.
# The oracle rebuilds the same URL and replays the string/window/gate
# arithmetic, so Spark's parse_url is checked against constructed truth.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.webcorpus import (  # noqa: E402
    apex_domain,
    canonicalize_url,
    host_cap,
    host_rate_sample,
    url_host,
)


def _synth_url() -> F.Column:
    return F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com:8443/d/"),
        F.col("doc_id"),
        F.lit("?ref="),
        F.col("lang"),
    )


@register(
    "url_parts_q",
    """
    SELECT doc_id,
           'www.' || source || '.example.com' AS host,
           'example.com' AS apex,
           '/d/' || doc_id AS path,
           lang AS ref
    FROM documents
    """,
)
def url_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    url = _synth_url()
    host = url_host(url)
    return d.select(
        "doc_id",
        host.alias("host"),
        apex_domain(host).alias("apex"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )


@register(
    "host_cap_sample",
    f"""
    WITH u AS (SELECT doc_id, source || '.example.com' AS host
               FROM documents)
    SELECT host, doc_id, rn FROM (
        SELECT host, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY host
                   ORDER BY {_SQL_POLY.format(s="doc_id::VARCHAR")} ASC,
                            doc_id ASC) AS rn
        FROM u) t
    WHERE rn <= 7
    """,
)
def host_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    hosts = d.select(
        "doc_id",
        url_host(
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/d/"),
                F.col("doc_id"),
            )
        ).alias("host"),
    )
    return host_cap(hosts, "host", "doc_id", cap=7).select(
        "host", "doc_id", "rn"
    )


@register(
    "host_rate_sample_q",
    f"""
    WITH u AS (SELECT doc_id, source || '.example.com' AS host
               FROM documents),
    c AS (SELECT host, COUNT(*) AS n FROM u GROUP BY host)
    SELECT host, COUNT(*) AS n_kept
    FROM u JOIN c USING (host)
    WHERE ({_SQL_POLY.format(s="doc_id::VARCHAR")}) % n < 5
    GROUP BY host
    """,
)
def host_rate_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    hosts = d.select(
        "doc_id",
        url_host(
            F.concat(
                F.lit("https://"),
                F.col("source"),
                F.lit(".example.com/d/"),
                F.col("doc_id"),
            )
        ).alias("host"),
    )
    return (
        host_rate_sample(hosts, "host", "doc_id", target=5)
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


# URL canonicalization — the dedup key for web documents: the Spark side
# parses a deliberately MESSY synthesized URL (uppercase host, default
# port, tracking params, trailing slash) with real parse_url machinery;
# the oracle constructs the clean truth directly from the source columns.
@register(
    "url_canonicalize_q",
    """
    SELECT doc_id,
           'https://www.' || source || '.example.com/d/' || doc_id
               || '?ref=' || lang AS canon_url
    FROM documents
    """,
)
def url_canonicalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    messy = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        F.lit(".Example.COM:443/d/"),
        F.col("doc_id"),
        F.lit("/?utm_source=x&ref="),
        F.col("lang"),
    )
    return d.select(
        "doc_id", canonicalize_url(messy).alias("canon_url")
    )


# Int8 embedding quantization contract: the per-vector scale is exact
# arithmetic (max |v| / 127) and the reconstruction error of symmetric
# round-to-nearest quantization is ≤ scale/2 by construction — emitted as
# a boolean, so the check is stable regardless of either engine's rounding
# tie convention.
@register(
    "int8_quantize_check",
    """
    SELECT vec_id,
           ROUND(CAST(list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127
                 AS DECIMAL(28,8)), 6)::DOUBLE AS scale_r,
           TRUE AS q_ok
    FROM embeddings
    """,
)
def int8_quantize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    absv = F.transform(
        F.col("embedding"), lambda x: F.abs(x.cast("double"))
    )
    scale = F.array_max(absv) / 127
    err = F.array_max(
        F.transform(
            F.col("embedding"),
            lambda x: F.abs(
                x.cast("double")
                - F.round(x.cast("double") / scale) * scale
            ),
        )
    )
    return e.select(
        "vec_id",
        F.round(scale.cast("decimal(28,8)"), 6)
        .cast("double")
        .alias("scale_r"),
        F.when(scale == 0, F.lit(True))
        .otherwise(err <= scale * 0.5 + F.lit(1e-12))
        .alias("q_ok"),
    )


# Distribution drift between corpus slices: per-token PSI contributions
# (population stability index) over the top-50 vocabulary, comparing the
# even-numbered sources against the odd ones. THE monitoring number for
# "did the ingest mix shift" — decimal-summed probabilities, add-one
# smoothing so no log sees zero.
@register(
    "token_psi_q",
    f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok, source
               FROM documents),
    v AS (SELECT tok FROM (
              SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
                                             tok ASC) AS rn
              FROM t GROUP BY tok) WHERE rn <= 50),
    c AS (SELECT tok,
                 SUM(CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                          THEN 1 ELSE 0 END) AS ca,
                 SUM(CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 1
                          THEN 1 ELSE 0 END) AS cb
          FROM t JOIN v USING (tok) GROUP BY tok),
    tot AS (SELECT CAST(SUM(ca) AS DOUBLE) AS ta,
                   CAST(SUM(cb) AS DOUBLE) AS tb,
                   CAST(COUNT(*) AS DOUBLE) AS nv
            FROM c)
    SELECT tok,
           CAST(ca AS BIGINT) AS n_a, CAST(cb AS BIGINT) AS n_b,
           ROUND(CAST(((ca + 1) / (ta + nv) - (cb + 1) / (tb + nv))
                      * ln(((ca + 1) / (ta + nv))
                           / ((cb + 1) / (tb + nv)))
                 AS DECIMAL(28,12)), 8)::DOUBLE AS psi_contrib
    FROM c CROSS JOIN tot
    """,
)
def token_psi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = d.select(
        F.explode(_tokens("text")).alias("tok"),
        (F.substring("source", 4, 10).cast("int") % 2).alias("half"),
    )
    vocab = (
        t.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("tok").asc())
        .limit(50)
        .select("tok")
    )
    c = (
        t.join(F.broadcast(vocab), "tok")
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    tot = c.agg(
        F.sum("ca").cast("double").alias("ta"),
        F.sum("cb").cast("double").alias("tb"),
        F.count(F.lit(1)).cast("double").alias("nv"),
    )
    pa = (F.col("ca") + 1) / (F.col("ta") + F.col("nv"))
    pb = (F.col("cb") + 1) / (F.col("tb") + F.col("nv"))
    return c.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.col("ca").cast("long").alias("n_a"),
        F.col("cb").cast("long").alias("n_b"),
        F.round(
            ((pa - pb) * F.log(pa / pb)).cast("decimal(28,12)"), 8
        )
        .cast("double")
        .alias("psi_contrib"),
    )


# Corpus-mix audit: per-source language distribution — the dashboard
# number a mixture_sample run is tuned against. One groupBy, fractions in
# decimal space.
@register(
    "lang_mix_by_source",
    """
    SELECT source, lang, COUNT(*) AS n,
           ROUND(CAST(CAST(COUNT(*) AS DOUBLE)
                      / SUM(COUNT(*)) OVER (PARTITION BY source)
                 AS DECIMAL(28,6)), 4)::DOUBLE AS frac
    FROM documents GROUP BY source, lang
    """,
)
def lang_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    counts = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("source")
    return counts.select(
        "source",
        "lang",
        "n",
        F.round(
            (F.col("n").cast("double") / F.sum("n").over(w)).cast(
                "decimal(28,6)"
            ),
            4,
        )
        .cast("double")
        .alias("frac"),
    )


# Exact-duplicate rate per source — the first number a dedup pass reports.
@register(
    "dedup_rate_by_source",
    """
    WITH g AS (SELECT source, md5(text) AS h, COUNT(*) AS c
               FROM documents GROUP BY source, md5(text))
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_docs
    FROM g GROUP BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    g = d.groupBy("source", F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return g.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        (F.sum("c") - F.count(F.lit(1))).cast("long").alias("n_dup_docs"),
    )


# Robust per-source length outliers: median/MAD (not mean/std — robust to
# the very outliers being hunted) over integer doc lengths, so every
# statistic is a median of integers or half-integers: exactly
# representable, no rounding hazard. The flagged count per source is the
# drift/corruption screen a corpus ingest runs per shard.
@register(
    "mad_outliers_q",
    """
    WITH m AS (
        SELECT source,
               CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS med
        FROM documents GROUP BY source),
    d AS (
        SELECT doc_id, documents.source, n_chars, med,
               abs(n_chars - med) AS dev
        FROM documents JOIN m ON documents.source = m.source),
    s AS (
        SELECT source, med,
               CAST(quantile_cont(dev, 0.5) AS DOUBLE) AS mad
        FROM d GROUP BY source, med)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           s.med, s.mad,
           CAST(COUNT(*) FILTER (WHERE d.dev > 3 * s.mad) AS BIGINT)
               AS n_outliers
    FROM d JOIN s ON d.source = s.source
    GROUP BY d.source, s.med, s.mad
    """,
)
def mad_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    med = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    dev = d.join(med, "source").select(
        "source", "med", F.abs(F.col("n_chars") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("source", "med").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad.select("source", "mad"), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# Corpus snapshot diff — dataset-versioning accounting between two corpus
# versions (here: v2 synthesized from v1 — every 7th doc edited, every
# 10th doc removed): full-outer join on the doc key comparing content
# hashes, one status row per doc. At 100 TB both sides reduce to
# (id, md5) before the join — text never shuffles.
@register(
    "corpus_diff_q",
    """
    WITH a AS (SELECT doc_id, md5(text) AS h FROM documents),
    b AS (SELECT doc_id,
                 md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                          ELSE text END) AS h
          FROM documents WHERE doc_id % 10 <> 0)
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.h = b.h THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    """,
)
def corpus_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    a = d.select("doc_id", F.md5("text").alias("h"))
    b = (
        d.filter(F.col("doc_id") % 10 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat(F.col("text"), F.lit(" v2")),
                ).otherwise(F.col("text"))
            ).alias("h"),
        )
    )
    a2 = a.select(F.col("doc_id").alias("a_id"), F.col("h").alias("a_h"))
    b2 = b.select(F.col("doc_id").alias("b_id"), F.col("h").alias("b_h"))
    return a2.join(
        b2, a2["a_id"] == b2["b_id"], "full_outer"
    ).select(
        F.coalesce(F.col("a_id"), F.col("b_id")).alias("doc_id"),
        F.when(F.col("b_id").isNull(), "removed")
        .when(F.col("a_h") == F.col("b_h"), "unchanged")
        .otherwise("changed")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality rules + tokenizer OOV coverage — the two
# standard curation dials beside the classifier/heuristic scores already in
# the registry. Both pure Catalyst; the OOV vocabulary is a top-K frame
# that broadcasts.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.curation import (  # noqa: E402
    GOPHER_STOPWORDS,
    gopher_quality,
    oov_rate,
    top_k_vocab,
)

_GOPHER_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"


@register(
    "gopher_filter_q",
    rf"""
    WITH w AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> x <> '') AS ws
        FROM documents),
    m AS (
        SELECT doc_id,
               len(ws) AS n_words,
               ROUND(CAST(CAST(list_sum(list_transform(ws, x -> length(x)))
                               AS DOUBLE) / len(ws)
                          AS DECIMAL(28,6)), 4)::DOUBLE AS mean_word_len,
               ROUND(CAST(CAST(len(list_filter(ws,
                                   x -> regexp_matches(x, '[a-zA-Z]')))
                               AS DOUBLE) / len(ws)
                          AS DECIMAL(28,6)), 4)::DOUBLE AS frac_alpha_words,
               len(list_intersect(list_distinct(ws), {_GOPHER_STOP_SQL}))
                   AS n_stopwords
        FROM w WHERE len(ws) > 0)
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stopwords,
           (n_words BETWEEN 10 AND 100000)
           AND (mean_word_len BETWEEN 2.0 AND 12.0)
           AND frac_alpha_words >= 0.8
           AND n_stopwords >= 1 AS keep
    FROM m
    """,
)
def gopher_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", *gopher_quality(F.col("text"))).filter(
        F.col("n_words") > 0
    )


@register(
    "oov_rate_q",
    f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    v AS (SELECT tok FROM (
              SELECT tok,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC)
                         AS rn
              FROM t GROUP BY tok) WHERE rn <= 100)
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(CAST(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                           AS DOUBLE) / COUNT(*)
                      AS DECIMAL(28,6)), 4)::DOUBLE AS oov_rate
    FROM t LEFT JOIN v ON t.tok = v.tok
    GROUP BY doc_id
    """,
)
def oov_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
    vocab = top_k_vocab(toks, "tok", 100)
    return oov_rate(toks, "doc_id", "tok", vocab)


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics — the feature-standardization audit
# (mean/std per dim feeds z-scoring, whitening, and drift monitors).
# Cross-row sums go through exact DECIMAL (order-independent) so the
# per-dim mean/std hash-match across engines; per-element squares are
# deterministic double ops.
# ---------------------------------------------------------------------------
@register(
    "embedding_dim_stats",
    """
    WITH ex AS (SELECT unnest(range(len(embedding))) AS pos,
                       unnest(embedding) AS v
                FROM embeddings)
    SELECT pos, COUNT(*) AS n,
           ROUND(CAST(CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE)
                      / COUNT(*) AS DECIMAL(28,8)), 4)::DOUBLE AS mean,
           ROUND(CAST(sqrt(
                 CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                               AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
                 - pow(CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE)
                       / COUNT(*), 2)) AS DECIMAL(28,8)), 4)::DOUBLE AS std
    FROM ex GROUP BY pos
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    ex = e.select(F.posexplode("embedding").alias("pos", "v"))
    s = F.sum(F.col("v").cast("decimal(18,8)")).cast("double")
    ssq = F.sum(
        (F.col("v").cast("double") * F.col("v").cast("double")).cast(
            "decimal(28,10)"
        )
    ).cast("double")
    n = F.count(F.lit(1))
    return ex.groupBy(F.col("pos").cast("long").alias("pos")).agg(
        n.alias("n"),
        F.round((s / n).cast("decimal(28,8)"), 4)
        .cast("double")
        .alias("mean"),
        F.round(
            F.sqrt(ssq / n - F.pow(s / n, F.lit(2))).cast("decimal(28,8)"),
            4,
        )
        .cast("double")
        .alias("std"),
    )


# Whitening applied: each vector z-scored per dimension against the
# corpus stats above, reported as the whitened L2 norm (the Mahalanobis-
# with-diagonal-covariance distance from the corpus mean — the outlier
# score feeding embedding-space pruning). The 64-row stats frame is a
# metadata-scale collect (the IVF-centroid convention); the z-transform
# itself is one codegen'd fold per row, no joins, no shuffle beyond the
# stats agg.
@register(
    "whitened_norm_q",
    """
    WITH ex AS (SELECT unnest(range(len(embedding))) AS pos,
                       unnest(embedding) AS v
                FROM embeddings),
    st AS (SELECT pos,
                  CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE)
                      / COUNT(*) AS mean,
                  sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                                     AS DECIMAL(28,10))) AS DOUBLE)
                       / COUNT(*)
                       - pow(CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE)
                             / COUNT(*), 2)) AS std
           FROM ex GROUP BY pos),
    arr AS (SELECT list(mean ORDER BY pos) AS means,
                   list(std ORDER BY pos) AS stds FROM st)
    SELECT vec_id,
           ROUND(CAST(sqrt(list_reduce(
               list_transform(range(1, len(embedding) + 1),
                   i -> pow((CAST(embedding[i] AS DOUBLE) - means[i])
                            / stds[i], 2)),
               (a, b) -> a + b)) AS DECIMAL(28,8)), 4)::DOUBLE
               AS whitened_norm
    FROM embeddings, arr
    """,
)
def whitened_norm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    ex = e.select(F.posexplode("embedding").alias("pos", "v"))
    s = F.sum(F.col("v").cast("decimal(18,8)")).cast("double")
    ssq = F.sum(
        (F.col("v").cast("double") * F.col("v").cast("double")).cast(
            "decimal(28,10)"
        )
    ).cast("double")
    n = F.count(F.lit(1))
    stats = (
        ex.groupBy("pos")
        .agg(
            (s / n).alias("mean"),
            F.sqrt(ssq / n - F.pow(s / n, F.lit(2))).alias("std"),
        )
        .orderBy("pos")
        .collect()  # metadata-scale: one row per embedding dimension
    )
    means = F.array(*[F.lit(r["mean"]) for r in stats])
    stds = F.array(*[F.lit(r["std"]) for r in stats])
    z2 = F.transform(
        F.sequence(F.lit(1), F.size("embedding")),
        lambda i: F.pow(
            (F.element_at("embedding", i).cast("double")
             - F.element_at(means, i))
            / F.element_at(stds, i),
            F.lit(2),
        ),
    )
    return e.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(z2, F.lit(0.0), lambda a, x: a + x)
            ).cast("decimal(28,8)"),
            4,
        )
        .cast("double")
        .alias("whitened_norm"),
    )


# Bounded-error contract for the approx-quantile family (the
# approx_distinct_check pattern): the estimate itself is
# implementation-defined, its error bound is engine-stable.
@register(
    "approx_quantile_check",
    """
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.5)
                      AS DECIMAL(28,3)), 2)::DOUBLE AS exact_p50,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.expr(
                    "percentile(l_extendedprice, 0.5)"
                ).cast("decimal(28,3)"),
                2,
            )
            .cast("double")
            .alias("exact_p50"),
            F.expr(
                "approx_percentile(l_extendedprice, 0.5, 10000)"
            ).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            (
                F.abs(F.col("__approx") - F.col("exact_p50"))
                <= 0.02 * F.col("exact_p50")
            ).alias("approx_ok"),
        )
    )


def _jl_sql(dim: int, out_dims: int) -> str:
    projs = []
    for j in range(out_dims):
        poly = _SQL_POLY.format(s=f"(d || ':{j}')")
        projs.append(
            f"CAST(ROUND(CAST(list_reduce(list_transform(range(1, {dim + 1}),"
            f" d -> v[d] * (CASE WHEN {poly} % 2 = 0 THEN 1.0 ELSE -1.0 END)),"
            f" (a, b) -> a + b) AS DECIMAL(28,10)), 4) AS DOUBLE) AS p{j}"
        )
    cols = ",\n           ".join(projs)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           {cols}
    FROM e
    """


@register("jl_project_q", _jl_sql(dim=64, out_dims=4))
def jl_project_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ±1 Johnson-Lindenstrauss projection of the 64-dim
    embeddings to 4 dims — one codegen'd scan, zero shuffles; the scale
    path that makes downstream bucketing/clustering width-independent."""
    e = Catalog(spark, sf_dir).embeddings
    return e.select("vec_id", *jl_project(F.col("embedding"), dim=64))


@register(
    "winsorize_prices",
    """
    WITH q AS (SELECT l_returnflag,
                      CAST(quantile_cont(l_extendedprice, 0.05)
                           AS DECIMAL(18,4)) AS lo,
                      CAST(quantile_cont(l_extendedprice, 0.95)
                           AS DECIMAL(18,4)) AS hi
               FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           CAST(q.lo AS DOUBLE) AS lo,
           CAST(q.hi AS DOUBLE) AS hi,
           ROUND(CAST(SUM(least(greatest(
                   CAST(l_extendedprice AS DECIMAL(18,4)), q.lo), q.hi))
                 AS DOUBLE) / COUNT(*), 2) AS mean_winsorized
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag, q.lo, q.hi
    """,
)
def winsorize_prices_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: clamp to the exact [p05, p95] band then
    average — the robust-statistics pre-pass for noisy numeric features.
    Percentiles go through the decimal(18,4) pin (interpolation of 2-dp
    money is exact at 3 dp, see percentile_agg) so both engines clamp at
    identical cut points; the clamped sum is an exact decimal aggregate.
    Plan: one percentile agg (3 groups) broadcast back onto the scan, then
    one partial-agg'd groupBy — two passes over lineitem, no wide
    shuffle."""
    li = Catalog(spark, sf_dir).lineitem
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)")
        .cast("decimal(18,4)")
        .alias("lo"),
        F.expr("percentile(l_extendedprice, 0.95)")
        .cast("decimal(18,4)")
        .alias("hi"),
    )
    clamped = F.least(
        F.greatest(_dec(F.col("l_extendedprice")), F.col("lo")), F.col("hi")
    )
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(clamped).cast("double") / F.count(F.lit(1)), 2
            ).alias("mean_winsorized"),
        )
        .select(
            "l_returnflag",
            "n",
            F.col("lo").cast("double").alias("lo"),
            F.col("hi").cast("double").alias("hi"),
            "mean_winsorized",
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): k-means the embeddings, then
# drop within-cluster near-duplicates keeping the lowest id. The oracle
# replays the 2 Lloyd rounds (same CTE chain as kmeans_assignments, but a1
# keeps the vector) and recomputes the max prior-id rounded cosine per row.
# tau=0.4 sits at ~p90 of this corpus's within-cluster cosine, so the kept
# flag genuinely bisects the data.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.semdedup import semdedup  # noqa: E402


@register(
    "semdedup_keep",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
           FROM e ORDER BY vec_id LIMIT 4),
    a0 AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e CROSS JOIN c0 c
        ) WHERE rn = 1
    ),
    m0 AS (
        SELECT cid, i, ROUND(CAST(avg(val) AS DECIMAL(28,12)), 6)::DOUBLE AS m
        FROM (SELECT cid, i, v[i] AS val
              FROM a0, unnest(range(1, len(v)+1)) AS t(i))
        GROUP BY cid, i
    ),
    c1 AS (SELECT cid, list(m ORDER BY i) AS v FROM m0 GROUP BY cid),
    a1 AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e CROSS JOIN c1 c
        ) WHERE rn = 1
    ),
    p AS (SELECT a.vec_id,
                 MAX(ROUND(list_cosine_similarity(a.v, b.v), 4)) AS mx
          FROM a1 a JOIN a1 b ON a.cid = b.cid AND b.vec_id < a.vec_id
          GROUP BY a.vec_id)
    SELECT a.vec_id, CAST(a.cid AS INT) AS cluster, p.mx AS max_prior_cos,
           (p.mx IS NULL OR p.mx < 0.4) AS kept
    FROM a1 a LEFT JOIN p USING (vec_id)
    """,
)
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    return semdedup(emb, "vec_id", "embedding", k=4, iters=2, tau=0.4)


# ---------------------------------------------------------------------------
# fastText-style linear quality classifier: hashed bag-of-words dotted with
# a deterministic weight vector, sigmoid-squashed. Pure Catalyst scan.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.quality import (  # noqa: E402
    linear_quality_score,
)

_SQL_QW = (
    "((((" + _SQL_POLY.format(s="t") + ") % 64) * 37 + 11) % 21 - 10) / 10.0"
)


@register(
    "quality_classifier",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    r AS (SELECT doc_id,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE list_reduce(list_transform(toks, t -> {_SQL_QW}),
                                       (a, b) -> a + b)
                 END AS raw
          FROM t)
    SELECT doc_id,
           ROUND(CAST(1.0 / (1.0 + exp(-raw / 8.0)) AS DECIMAL(28,12)),
                 4)::DOUBLE AS quality_prob,
           ROUND(CAST(1.0 / (1.0 + exp(-raw / 8.0)) AS DECIMAL(28,12)),
                 4)::DOUBLE >= 0.5 AS keep
    FROM r
    """,
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    prob = linear_quality_score(F.col("text"), dim=64, scale=8.0, round_to=4)
    return d.select(
        "doc_id",
        prob.alias("quality_prob"),
        (prob >= 0.5).alias("keep"),
    )


# Classifier calibration table: fixed 0.1-wide probability buckets (a
# groupBy on floor(prob·10) — scale-safe, no global NTILE) with count and
# decimal-exact mean doc length per bucket. The table a pipeline reads
# before choosing its keep-threshold.
@register(
    "quality_calibration_q",
    f"""
    WITH t AS (SELECT doc_id, n_chars, {_SQL_TOKENS} AS toks
               FROM documents),
    r AS (SELECT doc_id, n_chars,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE list_reduce(list_transform(toks, t -> {_SQL_QW}),
                                       (a, b) -> a + b)
                 END AS raw
          FROM t),
    p AS (SELECT doc_id, n_chars,
                 ROUND(CAST(1.0 / (1.0 + exp(-raw / 8.0))
                       AS DECIMAL(28,12)), 4)::DOUBLE AS prob
          FROM r)
    SELECT LEAST(CAST(floor(prob * 10) AS INT), 9) AS bucket,
           COUNT(*) AS n_docs,
           ROUND(CAST(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)
                 AS DECIMAL(28,6)), 2)::DOUBLE AS mean_len
    FROM p GROUP BY bucket
    """,
)
def quality_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    prob = linear_quality_score(F.col("text"), dim=64, scale=8.0, round_to=4)
    return (
        d.select("n_chars", prob.alias("prob"))
        .groupBy(
            F.least(
                F.floor(F.col("prob") * 10).cast("int"), F.lit(9)
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                (
                    F.sum("n_chars").cast("double") / F.count(F.lit(1))
                ).cast("decimal(28,6)"),
                2,
            )
            .cast("double")
            .alias("mean_len"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle for training order: content-keyed md5 sort
# key — reproducible across engines/reruns/cluster sizes. The query takes
# the top-100 (TakeOrderedAndProject); the full-corpus path is
# deterministic_shuffle's repartitionByRange + local sorts.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sampling import shuffle_key  # noqa: E402


@register(
    "shuffle_order_topk",
    """
    SELECT doc_id, md5('42-' || doc_id::VARCHAR) AS skey
    FROM documents ORDER BY skey, doc_id LIMIT 100
    """,
)
def shuffle_order_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return (
        d.select("doc_id", shuffle_key("doc_id", "42").alias("skey"))
        .orderBy("skey", "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# HLL sketch layer, driver-checkable: DataSketches estimates are
# implementation-defined (no DuckDB equivalent), but their ERROR BOUND and
# union-composition law are engine-stable facts — so emit those as the
# compared values. hll_ok pins |estimate − exact| ≤ 5%·exact (lgk=12 →
# rse ≈ 1.6%, 3σ ≈ 4.9%); union_ok pins that unioning per-partition
# sketches (the incremental 100 TB pattern — persist sketches per ingest
# day, answer rollups without rescanning) stays inside the same bound.
# (Union and direct estimates are NOT bit-identical — DataSketches
# sparse→dense promotion differs under union — so the bound, not equality,
# is the stable contract.)
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.sketches import (  # noqa: E402
    hll_partition_sketches,
    hll_rollup,
)


# Deterministic train/val/test assignment applied to the corpus: stable
# content-keyed buckets (sorted-label ranges over poly_hash % 100) so the
# oracle replays the exact residue arithmetic. Counts per (split, lang)
# prove both the range allocation and that appending data never moves rows.
from iniz_exporters_spark.operators.sampling import hash_split  # noqa: E402


@register(
    "hash_split_q",
    f"""
    WITH b AS (SELECT lang,
                      ({_SQL_POLY.format(s="doc_id::VARCHAR")}) % 100 AS bk
               FROM documents)
    SELECT CASE WHEN bk < 10 THEN 'test'
                WHEN bk < 90 THEN 'train'
                ELSE 'val' END AS split,
           lang, COUNT(*) AS n
    FROM b GROUP BY split, lang
    """,
)
def hash_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    split = hash_split(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )


# Decontaminated train split — the standard eval-hygiene step: any train
# doc that is a NEAR-DUPLICATE (perceptual-hash pair) of a test doc is
# dropped before training. Composes three oracle-checked layers (hash
# split, phash banding, Hamming verify) plus an anti-join; only id rows
# move in the decontamination step.
@register(
    "decontaminated_split_q",
    f"""
    WITH {_PHASH_BANDS_CTE},
    cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
               x.b0 AS a0, x.b1 AS a1, x.b2 AS a2, x.b3 AS a3,
               y.b0 AS c0, y.b1 AS c1, y.b2 AS c2, y.b3 AS c3
        FROM b x JOIN b y
          ON x.doc_id < y.doc_id
         AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)
    ),
    pp AS (SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
               + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) AS hd
        FROM cand) WHERE hd <= 3),
    sp AS (SELECT doc_id,
                  CASE WHEN bk < 10 THEN 'test'
                       WHEN bk < 90 THEN 'train'
                       ELSE 'val' END AS split
           FROM (SELECT doc_id,
                        ({_SQL_POLY.format(s="doc_id::VARCHAR")}) % 100
                            AS bk
                 FROM documents)),
    test_ids AS (SELECT doc_id FROM sp WHERE split = 'test'),
    contam AS (
        SELECT p.id_a AS doc_id FROM pp p
        JOIN test_ids t ON p.id_b = t.doc_id
        UNION
        SELECT p.id_b FROM pp p JOIN test_ids t ON p.id_a = t.doc_id
    )
    SELECT split, COUNT(*) AS n_before,
           COUNT(*) FILTER (WHERE NOT (split = 'train'
                                       AND doc_id IN (SELECT doc_id
                                                      FROM contam)))
               AS n_after
    FROM sp GROUP BY split
    """,
)
def decontaminated_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    sp = hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    media = _phash_payload(d)
    pairs = phash_neardup(image_phash(media, "payload", "doc_id"), "doc_id")
    test_ids = sp.filter(F.col("split") == "test").select("doc_id")
    contam = (
        pairs.join(
            test_ids.withColumnRenamed("doc_id", "id_b"), "id_b"
        ).select(F.col("id_a").alias("doc_id"))
        .union(
            pairs.join(
                test_ids.withColumnRenamed("doc_id", "id_a"), "id_a"
            ).select(F.col("id_b").alias("doc_id"))
        )
        .distinct()
        .withColumn("__contam", F.lit(True))
    )
    marked = sp.join(contam, "doc_id", "left")
    return marked.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(
            F.when(
                (F.col("split") == "train") & F.col("__contam").isNotNull(),
                0,
            ).otherwise(1)
        )
        .cast("long")
        .alias("n_after"),
    )


# Count-Min Sketch layer, driver-checkable (the hll_error_check pattern):
# CMS point estimates never undercount and overcount by ≤ eps·N with the
# configured confidence — both facts are engine-stable booleans even
# though the raw estimate is implementation-defined. The sketch merge is
# counter addition (order-independent), so the checked values are
# partitioning-proof.
@register(
    "cms_error_check",
    f"""
    WITH t AS (SELECT unnest({_SQL_TOKENS}) AS tok FROM documents),
    v AS (SELECT tok FROM (
              SELECT tok,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC)
                         AS rn
              FROM t GROUP BY tok) WHERE rn <= 10)
    SELECT tok, COUNT(*) AS exact_cnt, TRUE AS cms_ok
    FROM t JOIN v USING (tok)
    GROUP BY tok
    """,
)
def cms_error_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.sketches import cms_heavy_hitters

    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(_tokens("text")).alias("tok"))
    top = [r["tok"] for r in top_k_vocab(toks, "tok", 10).collect()]
    eps = 0.001
    sketch = cms_heavy_hitters(toks, "tok", eps=eps, seed=42)
    total = sketch.totalCount()
    est = spark.createDataFrame(
        [(t, int(sketch.estimateCount(t))) for t in top],
        "tok string, est long",
    )
    exact = toks.filter(F.col("tok").isin(top)).groupBy("tok").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    return exact.join(F.broadcast(est), "tok").select(
        "tok",
        "exact_cnt",
        (
            (F.col("est") >= F.col("exact_cnt"))
            & (F.col("est") <= F.col("exact_cnt") + int(eps * total) + 1)
        ).alias("cms_ok"),
    )


@register(
    "hll_error_check",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_nd,
           TRUE AS hll_ok,
           TRUE AS union_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def hll_error_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    direct = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_nd"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("l_partkey"), F.lit(12))
        ).alias("__direct_est"),
    )
    union_est = hll_rollup(
        hll_partition_sketches(
            li, "l_linestatus", "l_returnflag", "l_partkey", lgk=12
        ),
        "l_returnflag",
    ).withColumnRenamed("n_distinct_est", "__union_est")
    return direct.join(union_est, "l_returnflag").select(
        "l_returnflag",
        "exact_nd",
        (
            F.abs(F.col("__direct_est") - F.col("exact_nd"))
            <= 0.05 * F.col("exact_nd")
        ).alias("hll_ok"),
        (
            F.abs(F.col("__union_est") - F.col("exact_nd"))
            <= 0.05 * F.col("exact_nd")
        ).alias("union_ok"),
    )


# ---------------------------------------------------------------------------
# Round 4 — ANN recall contract. ann_bucketed / ivf_flat_topk have had
# value-checked rows since round 1, but nothing measured their RECALL vs
# the exact kNN baseline: a bucketing regression that silently drops
# neighbors would keep hashing green (the approximate result is its own
# spec). This query pins recall@5 against knn_bruteforce for the first 10
# query vectors. The hit counts are exact integers (deterministic ranking
# by (rounded cos DESC, neighbor_id) in both engines), so the oracle
# re-derives them independently in SQL — a Spark-side recall regression
# shows up as a hit-count hash mismatch AND flips the bound boolean.
# Bounds use integer arithmetic (hits*10 >= pct*total) so no float
# boundary can flip them. Measured floor across sf0.001/0.01/0.1:
# ann 19/50, ivf 40/50 → bounds 30% / 70% leave ≥4-hit margins.
# Scale shape: exact side is queries-broadcast × corpus (corpus never
# shuffles); ANN/IVF sides are the production bucketed plans; the joins
# that count hits carry (query_id, neighbor_id) pairs only.
# ---------------------------------------------------------------------------
@register(
    "ann_recall_check",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 10),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 4)
                                DESC, c.vec_id) AS rn
            FROM q JOIN e c ON c.vec_id <> q.vec_id
        ) WHERE rn <= 5
    ),
    b AS (
        SELECT vec_id, v,
               list_reduce(list_transform(range(0, 2), d ->
                   CASE WHEN v[d + 1] >= 0 THEN power(2, d)::BIGINT
                        ELSE 0::BIGINT END), (x, y) -> x + y) AS bucket
        FROM e
    ),
    ann AS (
        SELECT query_id, neighbor_id FROM (
            SELECT qb.vec_id AS query_id, cb.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY qb.vec_id
                       ORDER BY ROUND(list_cosine_similarity(qb.v, cb.v), 4)
                                DESC, cb.vec_id) AS rn
            FROM b qb JOIN b cb
              ON qb.bucket = cb.bucket AND cb.vec_id <> qb.vec_id
            WHERE qb.vec_id < 10
        ) WHERE rn <= 5
    ),
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v
        FROM e ORDER BY vec_id LIMIT 8
    ),
    ranked AS (
        SELECT e.vec_id, e.v, c.cidx,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ROUND(list_cosine_similarity(e.v, c.v), 4)
                            DESC, c.cidx) AS rnk
        FROM e CROSS JOIN cents c
    ),
    member AS (SELECT vec_id, v, cidx AS cell FROM ranked WHERE rnk = 1),
    probes AS (SELECT vec_id, v, cidx AS cell FROM ranked
               WHERE rnk <= 2 AND vec_id < 10),
    cell_topk AS (
        SELECT query_id, neighbor_id, cos FROM (
            SELECT p.vec_id AS query_id, m.vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(p.v, m.v), 4) AS cos,
                   ROW_NUMBER() OVER (PARTITION BY p.vec_id, p.cell
                       ORDER BY ROUND(list_cosine_similarity(p.v, m.v), 4)
                                DESC, m.vec_id) AS crn
            FROM probes p JOIN member m
              ON m.cell = p.cell AND m.vec_id <> p.vec_id
        ) t WHERE crn <= 5
    ),
    ivf AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id) AS rn
            FROM cell_topk
        ) t WHERE rn <= 5
    ),
    counts AS (
        SELECT
            (SELECT COUNT(*) FROM q) AS n_queries,
            (SELECT COUNT(*) FROM exact) AS exact_total,
            (SELECT COUNT(*) FROM exact JOIN ann
                USING (query_id, neighbor_id)) AS ann_hits,
            (SELECT COUNT(*) FROM exact JOIN ivf
                USING (query_id, neighbor_id)) AS ivf_hits
    )
    SELECT n_queries, exact_total, ann_hits, ivf_hits,
           ann_hits * 10 >= 3 * exact_total AS ann_recall_ok,
           ivf_hits * 10 >= 7 * exact_total AS ivf_recall_ok
    FROM counts
    """,
)
def ann_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    q = e.filter(F.col("vec_id") < 10)
    exact = knn_bruteforce(corpus=e, queries=q, top_k=5).select(
        "query_id", "neighbor_id"
    )
    ann = (
        ann_bucketed(e, bits=2, top_k=5)
        .filter(F.col("query_id") < 10)
        .select("query_id", "neighbor_id")
    )
    ivf = (
        ivf_flat_topk(e, n_centroids=8, top_k=5, nprobe=2)
        .filter(F.col("query_id") < 10)
        .select("query_id", "neighbor_id")
    )
    totals = exact.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("exact_total"),
    )
    ann_hits = exact.join(ann, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("ann_hits")
    )
    ivf_hits = exact.join(ivf, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("ivf_hits")
    )
    return (
        totals.crossJoin(F.broadcast(ann_hits))
        .crossJoin(F.broadcast(ivf_hits))
        .select(
            "n_queries",
            "exact_total",
            "ann_hits",
            "ivf_hits",
            (F.col("ann_hits") * 10 >= 3 * F.col("exact_total")).alias(
                "ann_recall_ok"
            ),
            (F.col("ivf_hits") * 10 >= 7 * F.col("exact_total")).alias(
                "ivf_recall_ok"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round 4 — retrieval EVALUATION metrics (NDCG@5 / MRR / P@5) over the BM25
# batch ranking. Deterministic graded relevance: a candidate's gain is the
# number of DISTINCT query terms it contains, so the whole evaluation is
# derivable from the token stream in both engines (no human qrels). The
# ideal ranking (IDCG) takes the 5 best gains over the ENTIRE corpus, not
# just the retrieved set — so NDCG genuinely measures the ranker.
# Scale shape: one token-stream pass restricted to the query vocabulary
# (terms IN (...) pushed to the scan), gains are (query, doc) aggregates,
# every per-metric frame after that is ≤ |queries|·5 rows; the DCG sums go
# through exact decimals so 5-term float addition order can never flip a
# hash. MRR uses MAX(1/rank) (order-independent).
# ---------------------------------------------------------------------------
@register(
    "retrieval_eval_q",
    f"""
    WITH t AS ({_SQL_TOK_ROWS}),
    qt(query_id, tok) AS (VALUES {_BM25_Q_VALUES}),
    nq AS (SELECT query_id, COUNT(*) AS n_terms FROM qt GROUP BY query_id),
    dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
    a AS (SELECT avg(dl) AS avgdl FROM dl),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
           WHERE tok IN ({_BM25_ALL_TERMS}) GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               ROUND(SUM(CAST(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                   AS DECIMAL(28,12))), 6)::DOUBLE AS bm25
        FROM tf JOIN qt USING (tok) JOIN df USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN a CROSS JOIN n
        GROUP BY qt.query_id, tf.doc_id
    ),
    topk AS (SELECT query_id, doc_id, rn FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25 DESC, doc_id ASC) AS rn
        FROM scored) WHERE rn <= 5),
    gains AS (
        SELECT qt.query_id, t2.doc_id,
               COUNT(DISTINCT t2.tok) AS gain
        FROM (SELECT DISTINCT doc_id, tok FROM tf) t2
        JOIN qt ON t2.tok = qt.tok
        GROUP BY qt.query_id, t2.doc_id
    ),
    ideal AS (
        SELECT query_id,
               SUM(CAST(gain / log2(irn + 1.0) AS DECIMAL(28,12))) AS idcg
        FROM (SELECT query_id, gain,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY gain DESC, doc_id ASC)
                         AS irn
              FROM gains) WHERE irn <= 5
        GROUP BY query_id
    ),
    got AS (
        SELECT tk.query_id,
               SUM(CAST(g.gain / log2(tk.rn + 1.0) AS DECIMAL(28,12)))
                   AS dcg,
               MAX(CASE WHEN g.gain = nq.n_terms
                        THEN ROUND(1.0 / tk.rn, 6) ELSE 0.0 END) AS mrr,
               ROUND(SUM(CASE WHEN g.gain = nq.n_terms THEN 1 ELSE 0 END)
                     / 5.0, 6) AS p_at_5
        FROM topk tk
        JOIN gains g USING (query_id, doc_id)
        JOIN nq USING (query_id)
        GROUP BY tk.query_id
    )
    SELECT got.query_id,
           ROUND(CAST(got.dcg / ideal.idcg AS DOUBLE), 6) AS ndcg_at_5,
           mrr, p_at_5
    FROM got JOIN ideal USING (query_id)
    """,
)
def retrieval_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.ranking import bm25_multi_topk

    d = Catalog(spark, sf_dir).documents
    topk = bm25_multi_topk(d, _BM25_QUERIES, "doc_id", "text", top_k=5)

    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in _BM25_QUERIES for t in ts],
        "query_id string, tok string",
    )
    all_terms = sorted({t for _, ts in _BM25_QUERIES for t in ts})
    nq = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))

    # graded gain = distinct query terms present in the doc; the token
    # scan is pruned to the query vocabulary before the shuffle
    doc_terms = (
        d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
        .filter(F.col("tok").isin(all_terms))
        .distinct()
    )
    gains = (
        doc_terms.join(F.broadcast(qterms), "tok")
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("tok").alias("gain"))
    )

    dec = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("gain").desc(), F.col("doc_id").asc()
    )
    ideal = (
        gains.withColumn("irn", F.row_number().over(w_ideal))
        .filter(F.col("irn") <= 5)
        .groupBy("query_id")
        .agg(F.sum(dec(F.col("gain") / F.log2(F.col("irn") + 1.0))).alias("idcg"))
    )
    got = (
        topk.join(gains, ["query_id", "doc_id"])
        .join(F.broadcast(nq), "query_id")
        .groupBy("query_id")
        .agg(
            F.sum(dec(F.col("gain") / F.log2(F.col("rn") + 1.0))).alias("dcg"),
            F.max(
                F.when(
                    F.col("gain") == F.col("n_terms"),
                    F.round(1.0 / F.col("rn"), 6),
                ).otherwise(0.0)
            ).alias("mrr"),
            F.round(
                F.sum(
                    F.when(F.col("gain") == F.col("n_terms"), 1).otherwise(0)
                )
                / 5.0,
                6,
            ).alias("p_at_5"),
        )
    )
    return got.join(F.broadcast(ideal), "query_id").select(
        "query_id",
        F.round((F.col("dcg") / F.col("idcg")).cast("double"), 6).alias(
            "ndcg_at_5"
        ),
        "mrr",
        "p_at_5",
    )


# ---------------------------------------------------------------------------
# Round 4 — training-mix temperature rebalancing (the multilingual-corpus
# lever: raw language shares p_l are flattened to w_l ∝ p_l^alpha, alpha
# 0.5, so low-resource languages are upsampled without letting any one
# dominate — the standard temperature-sampling scheme in multilingual LM
# training). Emits, per language: raw share, rebalanced weight, expected
# docs under the reweighted mix, and the implied epoch multiplier (how
# many passes over that language's data one reweighted epoch costs).
# Scale shape: one count aggregate (map-side partials) to language-count
# rows; everything after is arithmetic on that metadata frame — the
# 1-row total and the 1-row weight normalizer join back via broadcast.
# ---------------------------------------------------------------------------
@register(
    "mix_temperature_q",
    """
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total FROM c),
    w AS (SELECT lang, n_docs, n_docs / total AS p,
                 pow(n_docs / total, 0.5) AS pw
          FROM c CROSS JOIN tot),
    z AS (SELECT SUM(CAST(pw AS DECIMAL(28,12))) AS zsum FROM w)
    SELECT lang, n_docs,
           ROUND(p, 6) AS p,
           ROUND(CAST(pw / zsum AS DOUBLE), 6) AS weight,
           ROUND(CAST(pw / zsum AS DOUBLE) * total, 2) AS expected_docs,
           ROUND(CAST(pw / zsum AS DOUBLE) * total / n_docs, 4) AS epochs
    FROM w CROSS JOIN z CROSS JOIN tot
    """,
)
def mix_temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = c.agg(F.sum("n_docs").cast("double").alias("total"))
    w = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.col("n_docs") / F.col("total")).alias("p"),
        F.pow(F.col("n_docs") / F.col("total"), 0.5).alias("pw"),
        "total",
    )
    z = w.agg(F.sum(F.col("pw").cast("decimal(28,12)")).alias("zsum"))
    weight = (F.col("pw") / F.col("zsum")).cast("double")
    return w.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        F.round("p", 6).alias("p"),
        F.round(weight, 6).alias("weight"),
        F.round(weight * F.col("total"), 2).alias("expected_docs"),
        F.round(weight * F.col("total") / F.col("n_docs"), 4).alias("epochs"),
    )


# ---------------------------------------------------------------------------
# Round 4 — embedding centroid drift between corpus halves (vec_id median
# split = ingest-order proxy, the same convention as corpus_diff_q /
# token_psi_q): per-half per-dimension means via exact DECIMAL sums
# (order-independent → hash-stable at any partitioning), then centroid
# cosine and L2 distance computed on the d-row dimension frame. The drift
# statistic a retrieval/embedding pipeline alerts on when the upstream
# encoder or corpus shifts. Scale shape: one posexplode pass (rows = n·d,
# but only (half, dim, value) triples — no vectors shuffle whole), one
# groupBy(half, dim) with map-side partials down to 2·d rows, then all
# metric arithmetic happens on that metadata frame.
# ---------------------------------------------------------------------------
@register(
    "centroid_drift_q",
    """
    WITH med AS (
        -- FLOOR, not a bare BIGINT cast: DuckDB's double→BIGINT cast
        -- rounds while Spark's truncates, and a .5 midpoint would shift
        -- one vector across the half boundary
        SELECT CAST(FLOOR(SUM(vec_id)::DOUBLE / COUNT(*)) AS BIGINT) AS mid
        FROM embeddings
    ),
    ex AS (
        SELECT CASE WHEN vec_id < mid THEN 0 ELSE 1 END AS half,
               i AS dim, embedding[i + 1]::DOUBLE AS v
        FROM embeddings CROSS JOIN med
        CROSS JOIN (SELECT unnest(range(0, 64)) AS i) d
    ),
    m AS (
        SELECT half, dim,
               CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS mu
        FROM ex GROUP BY half, dim
    ),
    p AS (
        SELECT a.dim, a.mu AS mu0, b.mu AS mu1
        FROM (SELECT dim, mu FROM m WHERE half = 0) a
        JOIN (SELECT dim, mu FROM m WHERE half = 1) b USING (dim)
    ),
    agg AS (
        SELECT COUNT(*) AS n_dims,
               CAST(SUM(CAST(mu0 * mu1 AS DECIMAL(38,18))) AS DOUBLE) AS dot,
               CAST(SUM(CAST(mu0 * mu0 AS DECIMAL(38,18))) AS DOUBLE) AS n0,
               CAST(SUM(CAST(mu1 * mu1 AS DECIMAL(38,18))) AS DOUBLE) AS n1,
               CAST(SUM(CAST((mu0 - mu1) * (mu0 - mu1) AS DECIMAL(38,18)))
                    AS DOUBLE) AS sq
        FROM p
    )
    SELECT CAST(n_dims AS BIGINT) AS n_dims,
           ROUND(dot / (sqrt(n0) * sqrt(n1)), 6) AS centroid_cos,
           ROUND(sqrt(sq), 6) AS centroid_l2
    FROM agg
    """,
)
def centroid_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    mid = e.agg(
        F.floor(
            F.sum("vec_id").cast("double") / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("mid")
    )
    ex = (
        e.crossJoin(F.broadcast(mid))
        .select(
            F.when(F.col("vec_id") < F.col("mid"), 0)
            .otherwise(1)
            .alias("half"),
            F.posexplode("embedding").alias("dim", "v"),
        )
        .select("half", "dim", F.col("v").cast("double").alias("v"))
    )
    m = ex.groupBy("half", "dim").agg(
        (
            F.sum(F.col("v").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    p = (
        m.filter(F.col("half") == 0)
        .select("dim", F.col("mu").alias("mu0"))
        .join(
            m.filter(F.col("half") == 1).select(
                "dim", F.col("mu").alias("mu1")
            ),
            "dim",
        )
    )
    dec38 = lambda c: c.cast("decimal(38,18)")  # noqa: E731
    agg = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.sum(dec38(F.col("mu0") * F.col("mu1"))).cast("double").alias("dot"),
        F.sum(dec38(F.col("mu0") * F.col("mu0"))).cast("double").alias("n0"),
        F.sum(dec38(F.col("mu1") * F.col("mu1"))).cast("double").alias("n1"),
        F.sum(dec38((F.col("mu0") - F.col("mu1")) * (F.col("mu0") - F.col("mu1"))))
        .cast("double")
        .alias("sq"),
    )
    return agg.select(
        "n_dims",
        F.round(
            F.col("dot") / (F.sqrt(F.col("n0")) * F.sqrt(F.col("n1"))), 6
        ).alias("centroid_cos"),
        F.round(F.sqrt(F.col("sq")), 6).alias("centroid_l2"),
    )


# ---------------------------------------------------------------------------
# Round 4 (continued) — data-dependent dimensionality reduction. PCA
# complements the data-oblivious jl_project: one metadata-scale covariance
# aggregation buys the variance-optimal subspace (IVF coarse quantizers,
# drift monitoring). Covariance is fully value-checked; the eigen layer is
# pinned by sign-invariant contracts (projection variance == eigenvalue)
# because no SQL engine replays eigh.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.pca import (  # noqa: E402
    PcaModel,
    covariance_pairs,
    pca_fit,
    projection_variances,
)

_COV_SQL_EX = """
    ex AS (
        SELECT vec_id, i AS dim, embedding[i + 1]::DOUBLE AS v
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) AS i) d
    ),
    mm AS (
        SELECT dim, CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
                    / COUNT(*) AS mu
        FROM ex GROUP BY dim
    ),
    cv AS (
        SELECT a.dim AS i, b.dim AS j,
               ROUND(CAST(SUM(CAST(a.v * b.v AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*) - mi.mu * mj.mu, 6) AS cov
        FROM ex a
        JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        JOIN mm mi ON mi.dim = a.dim
        JOIN mm mj ON mj.dim = b.dim
        GROUP BY a.dim, b.dim, mi.mu, mj.mu
    )
"""


@register(
    "embedding_covariance_q",
    f"""
    WITH {_COV_SQL_EX}
    SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j, cov FROM cv
    """,
    headline=True,
)
def embedding_covariance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle population covariance of the first 8 embedding dims.
    One corpus scan; the per-row triangle explode pipelines into a map-side
    partial aggregate, so only (partitions x 36) decimal partials shuffle —
    the distributed-covariance shape that holds at any corpus size."""
    e = Catalog(spark, sf_dir).embeddings
    return covariance_pairs(e, "embedding", dims=8)


@register(
    "pca_project_check",
    f"""
    WITH {_COV_SQL_EX},
    tr AS (SELECT ROUND(SUM(cov), 6) AS trace_r FROM cv WHERE i = j)
    SELECT CAST(k AS INTEGER) AS comp, tr.trace_r,
           TRUE AS ordered_ok, TRUE AS var_ok, TRUE AS eigsum_ok
    FROM (SELECT unnest(range(0, 4)) AS k) CROSS JOIN tr
    """,
)
def pca_project_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA eigen-layer contract, sign-invariant so it is engine-checkable:
    (a) eigenvalues descend, (b) the population variance of each projected
    component equals its eigenvalue (the defining property of PCA — a wrong
    mean, covariance, eigvec, or projection all break it), (c) the eigvals
    sum to the covariance trace. The oracle re-derives the exact trace from
    decimal sums and pins the booleans TRUE. Eigh runs driver-side on the
    8x8 metadata matrix; the variance check is one distributed scan."""
    e = Catalog(spark, sf_dir).embeddings
    full = pca_fit(e, "embedding", dims=8, top_k=8)
    model = PcaModel(
        dims=8,
        mean=full.mean,
        eigvals=full.eigvals[:4],
        components=full.components[:4],
        trace=full.trace,
    )
    pvars = projection_variances(e, "embedding", model)
    tol = 1e-3 * max(1.0, abs(full.eigvals[0]))
    trace_r = round(full.trace, 6)
    eigsum_ok = abs(sum(full.eigvals) - full.trace) <= tol
    rows = []
    for k in range(4):
        rows.append(
            (
                k,
                trace_r,
                full.eigvals[k] <= full.eigvals[k - 1] + 1e-9 if k else True,
                abs(pvars[k] - full.eigvals[k]) <= tol,
                eigsum_ok,
            )
        )
    return spark.createDataFrame(
        rows,
        "comp int, trace_r double, ordered_ok boolean, var_ok boolean,"
        " eigsum_ok boolean",
    )


# ---------------------------------------------------------------------------
# Incremental (batch-vs-corpus) near-dup: the continual-training shape —
# each crawl increment is deduped against the standing corpus with the
# batch side broadcast, so the corpus is scanned once and never shuffled.
# Same band geometry as neardup_pairs, so the oracle replays candidate
# generation exactly and the flagged links hash-match.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.dedup import incremental_neardup  # noqa: E402


@register(
    "incremental_neardup_q",
    f"""
    WITH {_sql_minhash_sigs(16)},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT n.doc_id AS batch_id, o.doc_id AS corpus_id
        FROM bands o JOIN bands n
          ON o.band = n.band AND o.bucket = n.bucket
        WHERE n.doc_id % 20 = 7 AND o.doc_id % 20 <> 7
    ),
    scored AS (
        SELECT batch_id, corpus_id,
               ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                     / (len(ha.hs) + len(hb.hs)
                        - len(list_intersect(ha.hs, hb.hs))), 4) AS jaccard
        FROM cand
        JOIN sh ha ON ha.doc_id = batch_id
        JOIN sh hb ON hb.doc_id = corpus_id
    )
    SELECT batch_id, corpus_id, jaccard FROM scored WHERE jaccard >= 0.6
    """,
    headline=True,
)
def incremental_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    batch = d.filter(F.col("doc_id") % 20 == 7)
    corpus = d.filter(F.col("doc_id") % 20 != 7)
    return incremental_neardup(
        corpus, batch, "doc_id", "text", threshold=0.6, num_perm=16,
        rows_per_band=4, k=5,
    )


# ---------------------------------------------------------------------------
# Length-bucketed training batches: padding-efficiency layout (docs bucketed
# by granularity-rounded length, longest-first batches of 8, per-batch pad
# waste). One shuffle keyed on the bucket.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.lm import length_bucketed_batches  # noqa: E402


@register(
    "length_batches_q",
    f"""
    WITH t AS (
        SELECT doc_id, len({_SQL_TOKENS}) AS n_tok FROM documents
    ),
    b AS (
        SELECT doc_id, n_tok,
               CAST(CEIL(n_tok::DOUBLE / 64) AS BIGINT) AS bucket
        FROM t
    ),
    o AS (
        SELECT bucket, n_tok,
               ROW_NUMBER() OVER (
                   PARTITION BY bucket ORDER BY n_tok DESC, doc_id ASC
               ) AS rn
        FROM b
    )
    SELECT bucket, CAST((rn - 1) // 8 AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_len,
           CAST(sum(n_tok) AS BIGINT) AS sum_len,
           CAST(count(*) * max(n_tok) AS BIGINT) AS padded_tokens,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
    FROM o GROUP BY bucket, (rn - 1) // 8
    """,
)
def length_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = d.select(
        "doc_id", F.size(_tokens("text")).cast("long").alias("n_tok")
    )
    return length_bucketed_batches(
        t, "doc_id", "n_tok", batch_size=8, granularity=64
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023): unigram log-likelihood ratio of
# target domain vs raw pool, add-1 smoothed — the principled "make the pool
# look like the target" selection signal. Both unigram tables broadcast; the
# pool shuffles once on doc_id.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.curation import dsir_weights  # noqa: E402


@register(
    "dsir_weights_q",
    f"""
    WITH pt AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS tok
        FROM documents WHERE source NOT IN ('src0', 'src1', 'src2')
    ),
    tt AS (
        SELECT unnest({_SQL_TOKENS}) AS tok
        FROM documents WHERE source IN ('src0', 'src1', 'src2')
    ),
    pf AS (SELECT tok, count(*) AS c_pool FROM pt GROUP BY tok),
    tf AS (SELECT tok, count(*) AS c_tgt FROM tt GROUP BY tok),
    v AS (
        SELECT tok, COALESCE(c_pool, 0) AS c_pool, COALESCE(c_tgt, 0) AS c_tgt
        FROM pf FULL OUTER JOIN tf USING (tok)
    ),
    tot AS (
        SELECT sum(c_pool)::DOUBLE AS n_pool, sum(c_tgt)::DOUBLE AS n_tgt,
               count(*)::DOUBLE AS vv
        FROM v
    ),
    r AS (
        SELECT tok, ln((c_tgt + 1) / (n_tgt + vv))
                    - ln((c_pool + 1) / (n_pool + vv)) AS logratio
        FROM v CROSS JOIN tot
    )
    SELECT doc_id,
           ROUND(CAST(avg(logratio) AS DECIMAL(28,12)), 6)::DOUBLE
               AS avg_logratio,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM pt JOIN r USING (tok) GROUP BY doc_id
    """,
    headline=True,
)
def dsir_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    tgt_src = F.col("source").isin("src0", "src1", "src2")
    return dsir_weights(
        d.filter(~tgt_src), d.filter(tgt_src), "doc_id", _tokens
    )


# ---------------------------------------------------------------------------
# Asymmetric containment dedup: |A∩B| / |A| over distinct 5-char shingle
# sets — the quote/inclusion detector symmetric Jaccard misses (a paragraph
# quoted inside a 10× longer page scores J≈0.1 but containment≈1.0). The
# probe side broadcasts; the host corpus is scanned once and never shuffled
# on the shingle hash; the intersection size IS the matched-pair count.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.dedup import containment_pairs  # noqa: E402


@register(
    "containment_pairs_q",
    f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLE_SET} AS hs FROM documents),
    pr AS (
        SELECT doc_id AS probe_id, len(hs) AS sz, unnest(hs) AS h
        FROM sh WHERE doc_id % 25 = 11
    ),
    tr AS (
        SELECT doc_id AS host_id, unnest(hs) AS h
        FROM sh WHERE doc_id % 25 <> 11
    ),
    j AS (
        SELECT probe_id, host_id,
               CAST(count(*) AS BIGINT) AS n_shared, min(sz) AS sz
        FROM tr JOIN pr USING (h)
        GROUP BY probe_id, host_id
    )
    SELECT probe_id, host_id,
           ROUND(n_shared::DOUBLE / sz, 4) AS containment
    FROM j WHERE n_shared * 5 >= 4 * sz
    """,
    headline=True,
)
def containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.dedup import (
        containment_pairs_sets,
        shingle_sets,
    )

    d = Catalog(spark, sf_dir).documents
    pb = F.col("doc_id") % 25 == 11
    # both sides come from the same table: run the Arrow shingle kernel
    # ONCE, pin the sets, and split — halves the dominant cost
    sets = shingle_sets(d, "doc_id", "text", k=5).localCheckpoint()
    return containment_pairs_sets(
        sets.filter(~pb), sets.filter(pb), "doc_id", threshold=0.8
    )


# ---------------------------------------------------------------------------
# PQ asymmetric-distance search (the FAISS-IVFPQ scoring core): per-query
# m×k lookup tables of exact subvector→centroid distances, corpus scored
# via code lookups only — the full-precision corpus is never read at query
# time. The oracle replays the whole stack: every subspace's Lloyd rounds
# (same CTE chain as pq_codes), the LUT arithmetic (identical left-fold
# order), and the (rounded adc asc, id asc) ranking.
# ---------------------------------------------------------------------------
from iniz_exporters_spark.operators.clustering import (  # noqa: E402
    pq_adc_topk,
    pq_model,
)


def _pq_lut_sql(j: int, subdim: int = 16) -> str:
    a = j * subdim  # 0-based offset; qv is 1-based in DuckDB
    return f"""
    lut{j} AS (
        SELECT q.query_id, c.cid,
               list_reduce(list_transform(range(1, {subdim + 1}),
                   i -> (q.qv[{a} + i] - c.v[i]) * (q.qv[{a} + i] - c.v[i])),
                   (x, y) -> x + y) AS d
        FROM q CROSS JOIN c1{j} c
    )"""


@register(
    "pq_adc_topk",
    "WITH "
    + ",".join(_pq_subspace_sql(j) for j in range(4))
    + ",\n    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv"
    + " FROM embeddings WHERE vec_id < 3),"
    + ",".join(_pq_lut_sql(j) for j in range(4))
    + """,
    codes AS (
        SELECT a10.vec_id, a10.cid AS k0, a11.cid AS k1,
               a12.cid AS k2, a13.cid AS k3
        FROM a10 JOIN a11 USING (vec_id) JOIN a12 USING (vec_id)
        JOIN a13 USING (vec_id)
    ),
    adc AS (
        SELECT q.query_id, codes.vec_id,
               ROUND(l0.d + l1.d + l2.d + l3.d, 6) AS adc_dist
        FROM codes CROSS JOIN q
        JOIN lut0 l0 ON l0.query_id = q.query_id AND l0.cid = codes.k0
        JOIN lut1 l1 ON l1.query_id = q.query_id AND l1.cid = codes.k1
        JOIN lut2 l2 ON l2.query_id = q.query_id AND l2.cid = codes.k2
        JOIN lut3 l3 ON l3.query_id = q.query_id AND l3.cid = codes.k3
        WHERE codes.vec_id <> q.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, adc_dist, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC
        ) AS rn
        FROM adc
    ) WHERE rn <= 5
    """,
    headline=True,
)
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    codes, books = pq_model(e, "vec_id", "embedding", m=4, subdim=16, k=4, iters=2)
    qs = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < 3).collect()
    ]
    out = pq_adc_topk(codes, books, qs, "vec_id", subdim=16, top_k=5)
    return out.withColumn("rn", F.col("rn").cast("long"))


# ---------------------------------------------------------------------------
# Round-4 batch C: entity resolution, CCNet perplexity buckets, the hashing
# trick, degree-oriented triangle counting, truncated EWMA, Pareto
# frontier, bloom-pruned semi-join.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.linkage import record_linkage_pairs
from iniz_exporters_spark.operators.lm import interpolated_perplexity
from iniz_exporters_spark.operators.timeseries import ewma
from iniz_exporters_spark.operators.indexing import bloom_candidates
from iniz_exporters_spark.plans.graph import triangle_stats
from iniz_exporters_spark.functions.text import feature_hash_vector
from iniz_exporters_spark.functions.text import tokens as _hf_tokens


# Entity resolution: blocked candidate generation (block = noun token +
# adjective initial) + Levenshtein verify. The self-join shuffles on the
# blocking key only; a broadcast size-filter drops over-populated blocks
# (the under-discriminating-key failure mode) before any pair forms.
@register(
    "record_linkage_q",
    """
    WITH blocked AS (
        SELECT p_partkey, p_name,
               string_split(p_name, ' ')[2] || '|' || substr(p_name, 1, 1)
                   AS bk
        FROM part
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
           ROUND(1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE
                     / greatest(length(a.p_name), length(b.p_name)),
                 4) AS sim
    FROM blocked a JOIN blocked b
      ON a.bk = b.bk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4
      AND 1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE
              / greatest(length(a.p_name), length(b.p_name)) >= 0.5
    """,
)
def record_linkage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    bk = F.concat(
        F.element_at(F.split("p_name", " "), 2),
        F.lit("|"),
        F.substring("p_name", 1, 1),
    )
    return record_linkage_pairs(
        p, "p_partkey", "p_name", bk, max_lev=4, min_sim=0.5
    )


# CCNet-style perplexity filter (Wenzek et al. 2020): score every doc with
# an interpolated bigram/unigram LM fit on the corpus, then split each
# language into head/middle/tail perplexity terciles.
@register(
    "lm_perplexity_q",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_SQL_TOKENS} AS t FROM documents),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2),
    pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM idx),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
    uni AS (SELECT unnest(t) AS w FROM toks),
    cu AS (SELECT w, COUNT(*) AS cu FROM uni GROUP BY w),
    tot AS (SELECT COUNT(*) AS N, COUNT(DISTINCT w) AS V FROM uni),
    scored AS (
        SELECT p.doc_id,
               COUNT(*) AS n_bigrams,
               CAST(ROUND(CAST(SUM(CAST(
                   log2(0.7 * ((c12.c12 + 1)::DOUBLE
                               / (c1.c1 + tot.V)::DOUBLE)
                        + 0.3 * ((cu.cu + 1)::DOUBLE
                                 / (tot.N + tot.V)::DOUBLE))
                   AS DECIMAL(28,12))) AS DECIMAL(28,12)), 6) AS DOUBLE)
                   AS lp
        FROM pairs p
        JOIN c12 ON p.w1 = c12.w1 AND p.w2 = c12.w2
        JOIN c1 ON p.w1 = c1.w1
        JOIN cu ON p.w2 = cu.w
        CROSS JOIN tot
        GROUP BY p.doc_id
    ),
    ppl AS (
        SELECT s.doc_id, d.lang, s.n_bigrams,
               ROUND(pow(2.0, -s.lp / s.n_bigrams), 2) AS ppl
        FROM scored s JOIN documents d ON s.doc_id = d.doc_id
    )
    SELECT doc_id, lang, n_bigrams, ppl,
           CAST(NTILE(3) OVER (PARTITION BY lang
                               ORDER BY ppl ASC, doc_id ASC) AS BIGINT)
               AS bucket
    FROM ppl
    """,
)
def lm_perplexity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return interpolated_perplexity(d, "doc_id", "text", lam=0.7, n_buckets=3)


# Hashing trick (Weinberger et al. 2009): fixed-width bag-of-words vector
# per doc, built entirely per-row in codegen — no vocabulary pass, no
# dictionary state, zero shuffles at any corpus size. The vector is
# serialized with array_join(';') for the gate (the driver's pandas
# canonicalizer cannot hash list cells — see tests/test_registry_lint.py);
# feature_hash_vector itself still yields the typed array for pipelines.
@register(
    "feature_hash_q",
    f"""
    WITH h AS (
        SELECT doc_id,
               list_transform({_SQL_TOKENS},
                   t -> {_SQL_POLY.format(s="t")} % 64) AS th
        FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(
               list_transform(range(0, 64),
                   b -> len(list_filter(th, x -> x = b))), ';'), '') AS vec,
           len(list_filter(
               list_transform(range(0, 64),
                   b -> len(list_filter(th, x -> x = b))),
               c -> c > 0)) AS nnz,
           CAST(len(th) AS BIGINT) AS n_tokens
    FROM h
    """,
)
def feature_hash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    vec = feature_hash_vector("text", dim=64)
    return d.select(
        "doc_id",
        F.array_join(vec, ";").alias("vec"),
        F.size(F.filter(vec, lambda c: c > 0)).alias("nnz"),
        F.size(_hf_tokens("text")).cast("long").alias("n_tokens"),
    )


# Degree-oriented triangle counting (Suri & Vassilvitskii 2011) over the
# co-purchase graph (parts sharing an order). Orientation by (degree, id)
# bounds every out-degree by O(sqrt(E)), so the wedge join is skew-proof:
# a celebrity part contributes wedges only through low-degree neighbors.
@register(
    "triangle_count_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        GROUP BY n
    ),
    ed AS (
        SELECT e.a, e.b, da.d AS da, db.d AS db
        FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
    ),
    oriented AS (
        SELECT CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS src,
               CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS dst,
               CASE WHEN (da, a) < (db, b) THEN db ELSE da END AS dd
        FROM ed
    ),
    wedges AS (
        SELECT o1.dst AS v, o2.dst AS w
        FROM oriented o1 JOIN oriented o2 ON o1.src = o2.src
        WHERE (o1.dd, o1.dst) < (o2.dd, o2.dst)
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM wedges WHERE EXISTS (
            SELECT 1 FROM oriented c
            WHERE c.src = wedges.v AND c.dst = wedges.w)
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg)
               AS n_wedges,
           tri.n_triangles,
           ROUND(CASE WHEN (SELECT SUM(d * (d - 1) / 2) FROM deg) > 0
                      THEN 3.0 * tri.n_triangles
                           / (SELECT SUM(d * (d - 1) / 2) FROM deg)
                      ELSE 0.0 END, 4) AS clustering
    FROM tri
    """,
)
def triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return triangle_stats(edges)


# Truncated-recursion EWMA as a window fold: the classic "not expressible
# as a window aggregate" smoother, made one by bounding the horizon (8
# observations ≈ weight floor 0.7^8 < 6%) and left-folding the recursion
# over the frame's collected values — identical fold order both engines.
@register(
    "ewma_q",
    """
    WITH framed AS (
        SELECT user_id, ts, event_id, value,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS frame
        FROM events
    )
    SELECT user_id, ts, event_id,
           CAST(value AS DOUBLE) AS value,
           list_reduce(list_prepend(0.0, frame),
                       (acc, x) -> acc * 0.7 + x * 0.3) AS ewma
    FROM framed
    """,
)
def ewma_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    # raw fold, no explicit round: bit-identical across engines; the
    # gate's 9-dp float normalization absorbs repr ties (see operators/
    # timeseries.ewma docstring)
    return ewma(
        e, "user_id", "ts", "value", "event_id", alpha=0.3, depth=8
    ).select("user_id", "ts", "event_id", "value", "ewma")


# 2-D Pareto frontier (skyline) of daily best order price: a day is on
# the frontier iff its max price strictly beats every earlier day's. One
# per-day agg + one running-max window — the O(n log n) sort-based
# skyline, not the quadratic dominance anti-join.
@register(
    "pareto_frontier_q",
    """
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               max(o_totalprice) AS day_max
        FROM orders GROUP BY day
    ),
    runn AS (
        SELECT day, day_max,
               max(day_max) OVER (
                   ORDER BY day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max
        FROM daily
    )
    SELECT day, ROUND(day_max, 2) AS day_max
    FROM runn WHERE prev_max IS NULL OR day_max > prev_max
    """,
)
def pareto_frontier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.max("o_totalprice").alias("day_max"))
    )
    # global (unpartitioned) window — deliberate: it runs over the
    # per-DAY aggregate, which is calendar-bounded metadata (~36.5k rows
    # per century) regardless of corpus size; the fact-scale work happened
    # in the groupBy above
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    runn = daily.withColumn("prev_max", F.max("day_max").over(w))
    return runn.filter(
        F.col("prev_max").isNull() | (F.col("day_max") > F.col("prev_max"))
    ).select("day", F.round("day_max", 2).alias("day_max"))


# Bloom-pruned semi-join: the dim side's (tiny) position set prunes the
# fact scan before any shuffle — Spark's runtime row-level filtering,
# expressed portably so the oracle replays the identical candidate set.
# n_candidates (bloom survivors incl. false positives) is itself a
# checked value: a hashing regression would flip it.
@register(
    "bloom_prune_join_q",
    f"""
    WITH dimk AS (
        SELECT s_suppkey, s_suppkey::VARCHAR AS ks
        FROM supplier WHERE s_nationkey = 3
    ),
    pos AS (
        SELECT DISTINCT p FROM (
            SELECT {_SQL_POLY.format(s="ks")} % 4096 AS p FROM dimk
            UNION ALL
            SELECT (({_SQL_POLY.format(s="ks")} * 1000003 + 12345)
                    % 1000000007) % 4096 AS p FROM dimk)
    ),
    parr AS (SELECT list(p ORDER BY p) AS ps FROM pos),
    fact AS (
        SELECT l_suppkey, l_extendedprice,
               {_SQL_POLY.format(s="l_suppkey::VARCHAR")} AS h
        FROM lineitem
    ),
    cand AS (
        SELECT f.l_suppkey, f.l_extendedprice
        FROM fact f CROSS JOIN parr
        WHERE list_contains(ps, h % 4096)
          AND list_contains(ps, ((h * 1000003 + 12345) % 1000000007) % 4096)
    ),
    matched AS (
        SELECT c.* FROM cand c
        WHERE EXISTS (SELECT 1 FROM dimk d WHERE d.s_suppkey = c.l_suppkey)
    )
    SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM matched) AS n_matched,
           CAST(ROUND((SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                       FROM matched), 2) AS DOUBLE) AS revenue
    """,
)
def bloom_prune_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    dim = cat.supplier.filter(F.col("s_nationkey") == 3).select("s_suppkey")
    cand = bloom_candidates(
        cat.lineitem.select("l_suppkey", "l_extendedprice"),
        "l_suppkey",
        dim,
        "s_suppkey",
        m=4096,
    )
    matched = cand.join(
        F.broadcast(dim),
        cand["l_suppkey"] == dim["s_suppkey"],
        "left_semi",
    )
    return (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(
            matched.agg(
                F.count(F.lit(1)).alias("n_matched"),
                F.round(F.sum(_dec(F.col("l_extendedprice"))), 2)
                .cast("double")
                .alias("revenue"),
            )
        )
    )


# ---------------------------------------------------------------------------
# Round-4 batch D: grid-density outliers (DBSCAN core step), Benford
# digit audit, largest-remainder stratified sampling, rolling lag-1
# autocorrelation.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.clustering import grid_density
from iniz_exporters_spark.operators.sampling import (
    stratified_allocation,
    stratified_take,
)
from iniz_exporters_spark.operators.timeseries import rolling_autocorr


# Grid-bucketed density: the scalable DBSCAN core-point step — no
# point-to-point distances, the O(n²) neighborhood problem becomes
# O(occupied_cells · 9).
@register(
    "grid_density_q",
    """
    WITH pts AS (
        SELECT vec_id,
               CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.1) AS BIGINT)
                   AS cx,
               CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.1) AS BIGINT)
                   AS cy
        FROM embeddings
    ),
    cells AS (SELECT cx, cy, COUNT(*) AS c FROM pts GROUP BY cx, cy),
    nbr AS (
        SELECT cells.cx + dx.d AS cx, cells.cy + dy.d AS cy,
               SUM(c) AS nbr_count
        FROM cells
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
        GROUP BY 1, 2
    )
    SELECT p.vec_id, p.cx, p.cy,
           CAST(n.nbr_count AS BIGINT) AS nbr_count,
           n.nbr_count >= 8 AS is_core
    FROM pts p JOIN nbr n USING (cx, cy)
    """,
)
def grid_density_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return grid_density(
        e,
        "vec_id",
        F.col("embedding").getItem(0).cast("double"),
        F.col("embedding").getItem(1).cast("double"),
        h=0.1,
        min_pts=8,
    )


# Benford first-digit audit: a data-quality screen for fabricated or
# truncated numeric columns — natural multiplicative data follows
# log10(1 + 1/d); a uniform or spiked digit histogram is the red flag.
@register(
    "benford_audit_q",
    """
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT digit, n,
           n::DOUBLE / total AS frac,
           log10(1 + 1.0 / digit) AS benford
    FROM c CROSS JOIN t
    """,
)
def benford_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    digit = (
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(digit)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").alias("total"))
    # raw doubles (frac, benford): identical expressions both engines;
    # the gate's 9-dp normalization absorbs libm log10 last-bit skew
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("frac"),
        F.log10(1 + 1.0 / F.col("digit")).alias("benford"),
    )


# Largest-remainder (Hamilton) stratified allocation + the content-keyed
# sample it admits — pure integer arithmetic end to end, so the split is
# bit-stable across engines, partitionings, and reruns.
@register(
    "stratified_alloc_q",
    f"""
    WITH c AS (SELECT c_mktsegment AS stratum, COUNT(*) AS n_stratum
               FROM customer GROUP BY 1),
    t AS (SELECT SUM(n_stratum) AS N FROM c),
    b AS (SELECT stratum, n_stratum,
                 (300 * n_stratum) // N AS base,
                 (300 * n_stratum) % N AS rem
          FROM c CROSS JOIN t),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, stratum ASC)
                        AS rk,
                 300 - SUM(base) OVER () AS extras
          FROM b),
    a AS (SELECT stratum, n_stratum,
                 base + CASE WHEN rk <= extras THEN 1 ELSE 0 END AS n_alloc
          FROM r),
    ranked AS (
        SELECT c_mktsegment AS stratum, c_custkey,
               ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY {_SQL_POLY.format(s="c_custkey::VARCHAR")} ASC,
                            c_custkey ASC) AS rn
        FROM customer
    ),
    tk AS (SELECT ranked.stratum, COUNT(*) AS n_taken,
                  SUM(c_custkey) AS key_sum
           FROM ranked JOIN a USING (stratum)
           WHERE rn <= n_alloc GROUP BY 1)
    SELECT a.stratum, a.n_stratum, CAST(a.n_alloc AS BIGINT) AS n_alloc,
           COALESCE(tk.n_taken, 0) AS n_taken,
           CAST(COALESCE(tk.key_sum, 0) AS BIGINT) AS key_sum
    FROM a LEFT JOIN tk USING (stratum)
    """,
)
def stratified_alloc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).customer
    alloc = stratified_allocation(cust, "c_mktsegment", "c_custkey", 300)
    taken = (
        stratified_take(cust, "c_mktsegment", "c_custkey", 300)
        .groupBy(F.col("c_mktsegment").alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_taken"),
            F.sum("c_custkey").alias("key_sum"),
        )
    )
    return (
        alloc.join(taken, "stratum", "left")
        .select(
            "stratum",
            "n_stratum",
            "n_alloc",
            F.coalesce("n_taken", F.lit(0)).alias("n_taken"),
            F.coalesce("key_sum", F.lit(0)).alias("key_sum"),
        )
    )


# Trailing lag-1 autocorrelation per key: exact decimal windowed sums,
# closed-form Pearson in double, emitted raw (see operators/timeseries).
@register(
    "rolling_autocorr_q",
    """
    WITH lagged AS (
        SELECT user_id, ts, event_id,
               CAST(value AS DECIMAL(18,4)) AS x,
               LAG(CAST(value AS DECIMAL(18,4))) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   AS y
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN 1 END) OVER fr
                    AS DOUBLE) AS n,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN x END) OVER fr
                    AS DOUBLE) AS sx,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN y END) OVER fr
                    AS DOUBLE) AS sy,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN x * x END) OVER fr
                    AS DOUBLE) AS sxx,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN y * y END) OVER fr
                    AS DOUBLE) AS syy,
               CAST(SUM(CASE WHEN y IS NOT NULL THEN x * y END) OVER fr
                    AS DOUBLE) AS sxy
        FROM lagged
        WINDOW fr AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id,
           CASE WHEN n >= 3
                 AND (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
                THEN (n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
           END AS corr
    FROM s
    """,
)
def rolling_autocorr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return rolling_autocorr(
        e, "user_id", "ts", "value", "event_id", window_rows=16
    )


# ---------------------------------------------------------------------------
# Round-4 batch E: k-core peeling, RAKE keyword extraction, Markov
# transition matrices.
# ---------------------------------------------------------------------------

from iniz_exporters_spark.plans.graph import kcore_membership
from iniz_exporters_spark.operators.ranking import rake_keywords


# Bounded-round k-core peeling (Seidman 1983) over the co-purchase
# graph: 6 deterministic peels (converges in <=5 on every shipped scale,
# pinned in tests), CTE-per-round in the oracle — the Lloyd-rounds trade.
@register(
    "kcore_q",
    """
    WITH ed AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
           UNION ALL SELECT b AS src, a AS dst FROM ed),
    a1 AS MATERIALIZED (SELECT src FROM e0 GROUP BY src HAVING COUNT(*) >= 80),
    e1 AS MATERIALIZED (SELECT e.src, e.dst FROM e0 e
             JOIN a1 x ON e.src = x.src
             JOIN a1 y ON e.dst = y.src),
    a2 AS MATERIALIZED (SELECT src FROM e1 GROUP BY src HAVING COUNT(*) >= 80),
    e2 AS MATERIALIZED (SELECT e.src, e.dst FROM e1 e
             JOIN a2 x ON e.src = x.src
             JOIN a2 y ON e.dst = y.src),
    a3 AS MATERIALIZED (SELECT src FROM e2 GROUP BY src HAVING COUNT(*) >= 80),
    e3 AS MATERIALIZED (SELECT e.src, e.dst FROM e2 e
             JOIN a3 x ON e.src = x.src
             JOIN a3 y ON e.dst = y.src),
    a4 AS MATERIALIZED (SELECT src FROM e3 GROUP BY src HAVING COUNT(*) >= 80),
    e4 AS MATERIALIZED (SELECT e.src, e.dst FROM e3 e
             JOIN a4 x ON e.src = x.src
             JOIN a4 y ON e.dst = y.src),
    a5 AS MATERIALIZED (SELECT src FROM e4 GROUP BY src HAVING COUNT(*) >= 80),
    e5 AS MATERIALIZED (SELECT e.src, e.dst FROM e4 e
             JOIN a5 x ON e.src = x.src
             JOIN a5 y ON e.dst = y.src),
    a6 AS MATERIALIZED (SELECT src FROM e5 GROUP BY src HAVING COUNT(*) >= 80),
    e6 AS MATERIALIZED (SELECT e.src, e.dst FROM e5 e
             JOIN a6 x ON e.src = x.src
             JOIN a6 y ON e.dst = y.src)
    SELECT src AS node, COUNT(*) AS degree
    FROM e6 GROUP BY src HAVING COUNT(*) >= 80
    """,
)
def kcore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "k").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    return kcore_membership(edges, k=80, rounds=6)


# RAKE keyword extraction (Rose et al. 2010): document-local statistics,
# so the whole operator is corpus-parallel by construction.
@register(
    "rake_keywords_q",
    """
    WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents),
    tk AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS i, t FROM toks),
    g AS (SELECT doc_id, i, t[i] AS tok,
                 SUM(CASE WHEN t[i] IN ('the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by','be','are','was','this','that','from') THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY i) AS grp,
                 t[i] IN ('the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by','be','are','was','this','that','from') AS is_stop
          FROM tk),
    wd AS (SELECT doc_id, i, tok, grp FROM g WHERE NOT is_stop),
    ph AS (SELECT doc_id, grp,
                  string_agg(tok, ' ' ORDER BY i) AS phrase,
                  COUNT(*) AS plen
           FROM wd GROUP BY doc_id, grp),
    ws AS (SELECT wd.doc_id, wd.tok, COUNT(*) AS freq,
                  SUM(ph.plen) AS deg
           FROM wd JOIN ph USING (doc_id, grp)
           GROUP BY wd.doc_id, wd.tok),
    sc AS (SELECT wd.doc_id, wd.grp,
                  CAST(ROUND(CAST(SUM(CAST(ws.deg::DOUBLE / ws.freq
                      AS DECIMAL(28,12))) AS DECIMAL(28,12)), 6) AS DOUBLE)
                      AS score
           FROM wd JOIN ws ON wd.doc_id = ws.doc_id AND wd.tok = ws.tok
           GROUP BY wd.doc_id, wd.grp),
    ded AS (SELECT sc.doc_id, ph.phrase, MAX(sc.score) AS score
            FROM sc JOIN ph USING (doc_id, grp)
            GROUP BY sc.doc_id, ph.phrase)
    SELECT doc_id, phrase, score, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY score DESC, phrase ASC) AS rn
          FROM ded)
    WHERE rn <= 3
    """,
)
def rake_keywords_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return rake_keywords(d, "doc_id", "text", top_n=3)


# First-order Markov transition matrix over per-user event sequences:
# the behavioral-analytics summary funnels/sessionization build on.
# One LEAD window + one count agg; probabilities are raw double count
# ratios (identical division both engines).
@register(
    "markov_transitions_q",
    """
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   AS dst
        FROM events
    )
    SELECT src, dst, COUNT(*) AS n,
           COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER (PARTITION BY src)
               AS prob
    FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    """,
)
def markov_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wsrc = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wsrc)).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch F: privacy audit, lakehouse compaction planning, sentence
# statistics, streaming EWMA (pytest-pinned; the batch twin is ewma_q).
# ---------------------------------------------------------------------------

from iniz_exporters_spark.operators.privacy import k_anonymity_report


# k-anonymity / l-diversity audit over (nation, segment) quasi-identifiers
# with account balance sign as the sensitive attribute.
@register(
    "k_anonymity_q",
    """
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS group_size,
           COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                               ELSE 'nonneg' END) AS n_distinct_sensitive,
           COUNT(*) < 25 AS k_violation,
           COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                               ELSE 'nonneg' END) <= 1 AS l1_leak
    FROM (SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer) t
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def k_anonymity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer.withColumn(
        "bal_sign",
        F.when(F.col("c_acctbal") < 0, F.lit("neg")).otherwise("nonneg"),
    )
    return k_anonymity_report(
        c, ["c_nationkey", "c_mktsegment"], "bal_sign", k=25
    )


# Lakehouse compaction planning: order files largest-first, pack by
# cumulative size into target-sized output bins (the deterministic
# streaming analogue of first-fit-decreasing), and report each bin's
# fill. Runs entirely on the FILE-METADATA table — never touches data.
@register(
    "compaction_plan_q",
    """
    WITH files AS (
        SELECT 'part-' || LPAD(o_orderkey::VARCHAR, 9, '0') AS file,
               CAST(floor(o_totalprice * 100) AS BIGINT) % 134217728
                   AS bytes
        FROM orders WHERE o_orderkey % 7 = 3
    ),
    ordered AS (
        SELECT file, bytes,
               SUM(bytes) OVER (ORDER BY bytes DESC, file ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
        FROM files
    ),
    binned AS (
        SELECT file, bytes,
               CAST((cum - 1) // 268435456 AS BIGINT) AS bin
        FROM ordered
    )
    SELECT bin, COUNT(*) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           MIN(file) AS first_file
    FROM binned GROUP BY bin
    """,
)
def compaction_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    files = o.filter(F.col("o_orderkey") % 7 == 3).select(
        F.concat(
            F.lit("part-"), F.lpad(F.col("o_orderkey").cast("string"), 9, "0")
        ).alias("file"),
        (F.floor(F.col("o_totalprice") * 100).cast("long") % 134217728).alias(
            "bytes"
        ),
    )
    # global running sum over file METADATA (not data) — same deliberate
    # single-partition window as pareto_frontier_q
    w = Window.orderBy(F.col("bytes").desc(), F.col("file").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    binned = files.withColumn(
        "bin", F.expr(f"(sum(bytes) OVER (ORDER BY bytes DESC, file ASC "
                      f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                      f" - 1) div {256 * 1024 * 1024}")
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("bin_bytes"),
        F.min("file").alias("first_file"),
    )


# Sentence-level statistics: segmentation on terminal punctuation, pure
# per-row array expressions — the doc-structure signal quality filters
# (Gopher's "mean words per sentence") consume.
@register(
    "sentence_stats_q",
    """
    WITH s AS (
        SELECT doc_id,
               list_filter(
                   list_transform(
                       regexp_split_to_array(text, '[.!?]+'),
                       x -> trim(x)),
                   x -> x <> '') AS sents
        FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           CAST(COALESCE(list_max(list_transform(sents, x -> length(x))), 0)
                AS BIGINT) AS max_sentence_chars,
           CAST(ROUND(CAST(COALESCE(
               list_sum(list_transform(sents, x -> length(x))), 0) AS DOUBLE)
               / greatest(len(sents), 1), 4) AS DOUBLE)
               AS mean_sentence_chars
    FROM s
    """,
)
def sentence_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    sents = F.filter(
        F.transform(F.split("text", r"[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    lens = F.transform(sents, lambda x: F.length(x))
    return d.select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        F.coalesce(F.array_max(lens), F.lit(0))
        .cast("long")
        .alias("max_sentence_chars"),
        F.round(
            F.coalesce(F.aggregate(lens, F.lit(0), lambda a, b: a + b), F.lit(0))
            .cast("double")
            / F.greatest(F.size(sents), F.lit(1)),
            4,
        ).alias("mean_sentence_chars"),
    )


# ===========================================================================
# Batch E — corpus statistics + LM smoothing layer.
#
# Shared FP-safety convention (established in bigram_logprob_q /
# benford_audit_q): every multi-term double summation is quantized to
# DECIMAL(28,12) per term BEFORE the sum so the total is independent of
# partition/merge order; per-row double arithmetic uses identical
# expression shapes in Spark and DuckDB so IEEE results agree bit-for-bit;
# final outputs round to <= 6 dp (inside the gate's 9-dp normalization).
# ===========================================================================


def _dsum(col):
    """Order-independent sum of a double expression (12-dp quantized)."""
    return F.sum(col.cast("decimal(28,12)"))


# Zipf's-law fit: OLS of ln(freq) on ln(rank) over the top-1000 vocabulary.
# Scale shape: token counting is a corpus-scale shuffle on the token key
# (map-side partials); everything after the top-k is VOCABULARY metadata —
# the rank window runs over <=1000 rows, and the regression is a closed-form
# fold over those rows. At 100 TB only the first groupBy grows.
@register(
    "zipf_fit_q",
    f"""
    WITH t AS (SELECT unnest({_SQL_TOKENS}) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS freq FROM t GROUP BY tok),
    ranked AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, tok ASC)
                       AS DOUBLE)) AS x,
               ln(CAST(freq AS DOUBLE)) AS y
        FROM freq
        ORDER BY freq DESC, tok ASC LIMIT 1000
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(28,12))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
           CAST(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                AS DOUBLE) AS slope,
           CAST(ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                      / n, 6) AS DOUBLE) AS intercept,
           CAST(ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                      / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                AS DOUBLE) AS r2
    FROM s
    """,
)
def zipf_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health diagnostic: a natural-language corpus shows slope
    near -1 on the log-log rank/frequency line; templated or synthetic
    spam bends it. The fit itself is exact OLS over the top-1000 ranks."""
    d = Catalog(spark, sf_dir).documents
    freq = (
        d.select(F.explode(_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(1000)
    )
    # rank window over the collected top-k only (metadata scale)
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    xy = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("x")).cast("double").alias("sx"),
        _dsum(F.col("y")).cast("double").alias("sy"),
        _dsum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        _dsum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        _dsum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# Heaps'-law growth curve: cumulative distinct vocabulary vs cumulative
# token count across ten corpus-order buckets. Scale shape: "first bucket
# a type appears in" is MIN(bucket) per token — one vocabulary-keyed
# shuffle; the cumulative curve is a 10-row window over the BUCKET table.
# No per-prefix distinct-count rescans (the naive formulation is 10 full
# corpus passes; this is one).
@register(
    "heaps_law_q",
    f"""
    WITH nd AS (SELECT MAX(doc_id) + 1 AS nd FROM documents),
    t AS (
        SELECT CAST((doc_id * 10) // nd.nd AS BIGINT) AS bucket,
               unnest({_SQL_TOKENS}) AS tok
        FROM documents, nd
    ),
    tok_per_bucket AS (
        SELECT bucket, COUNT(*) AS n_tokens FROM t GROUP BY bucket
    ),
    first_seen AS (
        SELECT MIN(bucket) AS bucket, tok FROM t GROUP BY tok
    ),
    new_types AS (
        SELECT bucket, COUNT(*) AS n_new FROM first_seen GROUP BY bucket
    )
    SELECT b.bucket,
           CAST(SUM(b.n_tokens) OVER (ORDER BY b.bucket) AS BIGINT)
               AS cum_tokens,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY b.bucket)
                AS BIGINT) AS cum_types
    FROM tok_per_bucket b LEFT JOIN new_types n ON b.bucket = n.bucket
    """,
)
def heaps_law_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve; sub-linear growth is the
    natural-text signature, near-linear growth flags id-like/noisy token
    streams. The doc_id->bucket map uses the known dense id range (the
    oracle pins the same 500-row sf0.01 constant; Spark derives it)."""
    d = Catalog(spark, sf_dir).documents
    n_docs = d.agg((F.max("doc_id") + 1).alias("nd"))
    # the (bucket, tok) frame feeds two aggregations — pin it once so the
    # corpus-scale explode is not recomputed per consumer
    t = (
        d.crossJoin(F.broadcast(n_docs))
        .select(
            F.expr("(doc_id * 10) div nd").cast("long").alias("bucket"),
            F.explode(_tokens("text")).alias("tok"),
        )
        .localCheckpoint()
    )
    per_bucket = t.groupBy("bucket").agg(F.count("*").alias("n_tokens"))
    new_types = (
        t.groupBy("tok")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_new"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(new_types, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w)
            .cast("long")
            .alias("cum_types"),
        )
    )


# Two-sample Kolmogorov–Smirnov distance between the doc-length
# distributions of two language cohorts. Scale shape: per-distinct-value
# counts are one shuffle on the value key (cardinality = distinct lengths,
# bounded by the length range, NOT the corpus); the ECDF window runs over
# that bounded value table. Counts stay integer until the final division,
# so the statistic is partition-order-proof.
@register(
    "ks_test_q",
    """
    WITH v AS (
        SELECT n_chars,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS cb
        FROM documents WHERE lang IN ('en', 'zh')
        GROUP BY n_chars
    ),
    e AS (
        SELECT SUM(ca) OVER (ORDER BY n_chars) AS cum_a,
               SUM(cb) OVER (ORDER BY n_chars) AS cum_b,
               SUM(ca) OVER () AS na,
               SUM(cb) OVER () AS nb
        FROM v
    )
    SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(ROUND(MAX(ABS(CAST(cum_a AS DOUBLE) / na
                              - CAST(cum_b AS DOUBLE) / nb)), 6) AS DOUBLE)
               AS ks_stat
    FROM e
    """,
)
def ks_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detector (the CCNet/RefinedWeb shard-comparison
    check): sup-norm distance between two empirical CDFs, computed from
    per-value counts rather than sorted samples."""
    d = Catalog(spark, sf_dir).documents.filter(
        F.col("lang").isin("en", "zh")
    )
    v = d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("lang") == "zh", 1).otherwise(0)).alias("cb"),
    )
    wc = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    e = v.select(
        F.sum("ca").over(wc).alias("cum_a"),
        F.sum("cb").over(wc).alias("cum_b"),
        F.sum("ca").over(wt).alias("na"),
        F.sum("cb").over(wt).alias("nb"),
    )
    return e.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("na")
                    - F.col("cum_b").cast("double") / F.col("nb")
                )
            ),
            6,
        ).alias("ks_stat"),
    )


# Chi-square test of independence over the lang x source contingency
# table. Scale shape: one corpus-scale count shuffle into a cells table of
# |langs| x |sources| rows; marginals and the statistic are metadata-scale
# window/agg passes over that table. Expected counts are computed with the
# IDENTICAL expression shape both engines ((row*col)/N in integer->double),
# and cell terms are 12-dp-quantized before the final sum.
@register(
    "chi2_independence_q",
    """
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS o
        FROM documents GROUP BY lang, source
    ),
    rt AS (SELECT lang, SUM(o) AS row_tot FROM cells GROUP BY lang),
    ct AS (SELECT source, SUM(o) AS col_tot FROM cells GROUP BY source),
    tot AS (SELECT SUM(o) AS n FROM cells),
    -- FULL grid including structurally-zero cells: an absent
    -- (lang, source) pair still contributes its expected count E to the
    -- textbook statistic ((0-E)^2/E = E); an observed-cells-only sum
    -- understates chi2
    m AS (
        SELECT COALESCE(c.o, 0) AS o, rt.row_tot, ct.col_tot, tot.n
        FROM rt CROSS JOIN ct CROSS JOIN tot
        LEFT JOIN cells c ON rt.lang = c.lang AND ct.source = c.source
    ),
    d AS (
        SELECT COUNT(DISTINCT lang) AS nl, COUNT(DISTINCT source) AS ns
        FROM documents
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST((SELECT (nl - 1) * (ns - 1) FROM d) AS BIGINT) AS dof,
           CAST(ROUND(CAST(SUM(CAST(
               (CAST(o AS DOUBLE)
                - CAST(row_tot * col_tot AS DOUBLE) / n)
               * (CAST(o AS DOUBLE)
                  - CAST(row_tot * col_tot AS DOUBLE) / n)
               / (CAST(row_tot * col_tot AS DOUBLE) / n)
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE) AS chi2
    FROM m
    """,
)
def chi2_independence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix audit: is language independent of source? Large chi2
    localizes ingestion skew (a source that over-contributes one
    language). Sums over the FULL lang x source grid — a structurally
    absent pair contributes its expected count ((0-E)^2/E = E), the
    textbook Pearson statistic; summing observed cells only understates
    chi2 (caught by the brute-force cross-check, round 5). The grid is
    |langs| x |sources| metadata-scale rows from two broadcastable
    marginal tables, so the fix adds no data-scale shuffle."""
    d = Catalog(spark, sf_dir).documents
    cells = d.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rt = cells.groupBy("lang").agg(F.sum("o").alias("row_tot"))
    ct = cells.groupBy("source").agg(F.sum("o").alias("col_tot"))
    tot = cells.agg(F.sum("o").alias("n"))
    m = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["lang", "source"], "left")
        .select(
            F.coalesce("o", F.lit(0)).alias("o"),
            "row_tot",
            "col_tot",
            "n",
        )
    )
    exp = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    term = (F.col("o").cast("double") - exp) * (
        F.col("o").cast("double") - exp
    ) / exp
    dims = d.agg(
        F.countDistinct("lang").alias("nl"),
        F.countDistinct("source").alias("ns"),
    )
    stat = m.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.round(_dsum(term).cast("double"), 6).alias("chi2"),
    )
    return stat.crossJoin(F.broadcast(dims)).select(
        "n_docs",
        ((F.col("nl") - 1) * (F.col("ns") - 1)).cast("long").alias("dof"),
        "chi2",
    )


# Interpolated Kneser–Ney bigram probabilities (d = 0.75) for the 30 most
# frequent bigrams. The production LM-smoothing statistic (Chen & Goodman
# 1999): continuation counts rather than raw counts back off the unigram.
# Scale shape: three aggregations over the (observed-)bigram table — by
# (w1,w2), by w1, by w2 — all vocabulary-keyed shuffles with map-side
# partials; scoring joins are vocab-keyed (AQE absorbs Zipf skew); the
# final top-30 is TakeOrdered. Per-row probability arithmetic is a single
# identical double expression in both engines — no FP summation at all.
@register(
    "kneser_ney_q",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2),
    pairs AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1fwd
           FROM c12 GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n1bwd FROM c12 GROUP BY w2),
    tot AS (SELECT COUNT(*) AS n_types FROM c12)
    SELECT c12.w1, c12.w2, CAST(c12.c12 AS BIGINT) AS c,
           CAST(ROUND(
               (CAST(c12.c12 AS DOUBLE) - 0.75) / c1.c1
               + 0.75 * c1.n1fwd / c1.c1
                 * (CAST(cont.n1bwd AS DOUBLE) / tot.n_types), 6)
               AS DOUBLE) AS pkn
    FROM c12
    JOIN c1 ON c12.w1 = c1.w1
    JOIN cont ON c12.w2 = cont.w2
    CROSS JOIN tot
    ORDER BY c DESC, c12.w1, c12.w2
    LIMIT 30
    """,
)
def kneser_ney_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney (the strongest classical n-gram smoother):
    P(w2|w1) = max(c-d,0)/c(w1.) + d*N1+(w1,.)/c(w1.) * N1+(.,w2)/|types|.
    Every count >= 1 here (observed bigrams), so max(c-d,0) = c-d."""
    d = Catalog(spark, sf_dir).documents
    t = d.select(_tokens("text").alias("t")).filter(F.size("t") >= 2)
    pairs = t.select(
        F.posexplode(F.slice("t", 1, F.size("t") - 1)).alias("i", "w1"),
        F.col("t"),
    ).select("w1", F.element_at("t", F.col("i") + 2).alias("w2"))
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1fwd")
    )
    cont = c12.groupBy("w2").agg(F.count("*").alias("n1bwd"))
    tot = c12.agg(F.count(F.lit(1)).alias("n_types"))
    pkn = (F.col("c12").cast("double") - 0.75) / F.col("c1") + 0.75 * F.col(
        "n1fwd"
    ) / F.col("c1") * (
        F.col("n1bwd").cast("double") / F.col("n_types")
    )
    return (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c"),
            F.round(pkn, 6).alias("pkn"),
        )
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(30)
    )


# Deterministic Poisson(1) bootstrap: 32 weighted replicas of the mean doc
# length per source, in ONE corpus pass. The per-(row, replica) weight is
# the inverse-CDF of Poisson(1) applied to a content-keyed uniform
# (poly_hash of "doc_id:replica"), so the estimate is partition-layout
# independent and reproducible — the distributed alternative to
# resample-with-replacement, which cannot shuffle 100 TB 32 times.
# Scale shape: 32x row explosion of (hash-input, n_chars) pairs only,
# one (source, replica) shuffle with integer map-side partials; the
# replica table (sources x 32) is metadata.
@register(
    "poisson_bootstrap_q",
    f"""
    WITH reps AS (
        SELECT source, n_chars, b,
               CAST({_SQL_POLY.format(
                   s="doc_id::VARCHAR || ':' || b::VARCHAR")} % 10000
                    AS DOUBLE) / 10000 AS u
        FROM documents, (SELECT unnest(range(0, 32)) AS b)
    ),
    weighted AS (
        SELECT source, b,
               CASE WHEN u < 0.367879 THEN 0
                    WHEN u < 0.735759 THEN 1
                    WHEN u < 0.919699 THEN 2
                    WHEN u < 0.981012 THEN 3
                    WHEN u < 0.996340 THEN 4
                    ELSE 5 END AS w,
               n_chars
        FROM reps
    ),
    replica_means AS (
        SELECT source, b,
               CAST(SUM(w * n_chars) AS DOUBLE) / SUM(w) AS m
        FROM weighted GROUP BY source, b HAVING SUM(w) > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_replicas,
           CAST(ROUND(CAST(SUM(CAST(m AS DECIMAL(28,12))) AS DOUBLE)
                      / COUNT(*), 4) AS DOUBLE) AS boot_mean,
           CAST(ROUND(MIN(m), 4) AS DOUBLE) AS boot_lo,
           CAST(ROUND(MAX(m), 4) AS DOUBLE) AS boot_hi
    FROM replica_means GROUP BY source
    """,
)
def poisson_bootstrap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty quantification for corpus statistics at scale: each row
    contributes Poisson(1)-many copies to each replica (the streaming
    bootstrap used by production metric pipelines). Replica means divide
    two exact integer sums, so only the final 32-term mean needs the
    decimal quantization."""
    d = Catalog(spark, sf_dir).documents
    reps = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    ).withColumn(
        "u",
        (
            poly_hash(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            )
            % 10000
        ).cast("double")
        / 10000,
    )
    w = (
        F.when(F.col("u") < 0.367879, 0)
        .when(F.col("u") < 0.735759, 1)
        .when(F.col("u") < 0.919699, 2)
        .when(F.col("u") < 0.981012, 3)
        .when(F.col("u") < 0.996340, 4)
        .otherwise(5)
    )
    replica_means = (
        reps.withColumn("w", w)
        .groupBy("source", "b")
        .agg(
            F.sum(F.col("w") * F.col("n_chars")).alias("sw"),
            F.sum("w").alias("n"),
        )
        .filter(F.col("n") > 0)
        .select(
            "source", (F.col("sw").cast("double") / F.col("n")).alias("m")
        )
    )
    return replica_means.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.round(_dsum(F.col("m")).cast("double") / F.count(F.lit(1)), 4).alias(
            "boot_mean"
        ),
        F.round(F.min("m"), 4).alias("boot_lo"),
        F.round(F.max("m"), 4).alias("boot_hi"),
    )


# Mutual information between token presence and document language, for the
# 20 highest-document-frequency tokens — the classic filter-method feature
# selector for quality/language classifiers. Scale shape: doc-level
# presence is one distinct (doc_id, tok) shuffle; the top-20 selection is
# TakeOrdered over the vocab table; the MI computation itself runs on a
# (20 x |langs| x {present,absent}) cell table — pure metadata. The
# absent-cell counts derive from marginals (no second corpus pass).
# Per-cell terms are 12-dp-quantized before the final sum; 0-count cells
# contribute 0 by the same CASE on both engines.
@register(
    "mi_feature_q",
    f"""
    WITH pres AS (
        SELECT DISTINCT doc_id, unnest({_SQL_TOKENS}) AS tok
        FROM documents
    ),
    top AS (
        SELECT tok, COUNT(*) AS df FROM pres GROUP BY tok
        ORDER BY df DESC, tok LIMIT 20
    ),
    langs AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang),
    n AS (SELECT COUNT(*) AS n FROM documents),
    joint AS (
        SELECT p.tok, d.lang, COUNT(*) AS n11
        FROM pres p
        JOIN top t ON p.tok = t.tok
        JOIN documents d ON d.doc_id = p.doc_id
        GROUP BY p.tok, d.lang
    ),
    cells AS (
        SELECT t.tok, t.df, l.lang, l.nl, 1 AS present,
               COALESCE(j.n11, 0) AS c, t.df AS marg
        FROM top t CROSS JOIN langs l
        LEFT JOIN joint j ON j.tok = t.tok AND j.lang = l.lang
        UNION ALL
        SELECT t.tok, t.df, l.lang, l.nl, 0 AS present,
               l.nl - COALESCE(j.n11, 0) AS c, n.n - t.df AS marg
        FROM top t CROSS JOIN langs l CROSS JOIN n
        LEFT JOIN joint j ON j.tok = t.tok AND j.lang = l.lang
    )
    SELECT c.tok, CAST(MAX(c.df) AS BIGINT) AS df,
           CAST(ROUND(CAST(SUM(CAST(
               CASE WHEN c.c = 0 OR c.marg = 0 THEN 0.0 ELSE
                 (CAST(c.c AS DOUBLE) / n.n)
                 * log2(CAST(c.c AS DOUBLE) * n.n
                        / (CAST(c.marg AS DOUBLE) * c.nl))
               END AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE) AS mi
    FROM cells c CROSS JOIN n
    GROUP BY c.tok
    """,
)
def mi_feature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI(token-presence; lang) per candidate feature token. High-MI
    tokens are the language-discriminative vocabulary a lightweight
    fastText-style classifier would learn first."""
    d = Catalog(spark, sf_dir).documents
    # presence frame feeds both the top-k selection and the joint counts —
    # pin it once (distinct over the corpus-scale explode is the expensive
    # step; everything downstream is bounded by it)
    pres = (
        d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
        .distinct()
        .localCheckpoint()
    )
    top = (
        pres.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(20)
    )
    langs = d.groupBy("lang").agg(F.count("*").alias("nl"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    joint = (
        pres.join(F.broadcast(top), "tok")
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("tok", "lang")
        .agg(F.count("*").alias("n11"))
    )
    grid = top.crossJoin(F.broadcast(langs)).join(
        F.broadcast(joint), ["tok", "lang"], "left"
    )
    present = grid.select(
        "tok",
        "df",
        "nl",
        F.coalesce(F.col("n11"), F.lit(0)).alias("c"),
        F.col("df").alias("marg"),
    )
    absent = grid.crossJoin(F.broadcast(n)).select(
        "tok",
        "df",
        "nl",
        (F.col("nl") - F.coalesce(F.col("n11"), F.lit(0))).alias("c"),
        (F.col("n") - F.col("df")).alias("marg"),
    )
    cells = present.unionByName(absent).crossJoin(F.broadcast(n))
    term = F.when(
        (F.col("c") == 0) | (F.col("marg") == 0), F.lit(0.0)
    ).otherwise(
        (F.col("c").cast("double") / F.col("n"))
        * F.log2(
            F.col("c").cast("double")
            * F.col("n")
            / (F.col("marg").cast("double") * F.col("nl"))
        )
    )
    return cells.groupBy("tok").agg(
        F.max("df").cast("long").alias("df"),
        F.round(_dsum(term).cast("double"), 6).alias("mi"),
    )


# Entropy l-diversity audit over a joined quasi-identifier view: for each
# (nation, market-segment) equivalence class of customers, the Shannon
# entropy of the order-priority distribution of their orders. Classes with
# entropy below ln(2) cannot claim 2-diverse protection on the sensitive
# attribute. Scale shape: the customer->orders join shuffles on custkey
# (fact scale); the entropy computation runs per (class x priority) cell
# table — bounded by |classes| x 5. Complements k_anonymity_q (distinct-
# count l-diversity) with the entropy variant from Machanavajjhala 2007.
@register(
    "entropy_ldiversity_q",
    """
    WITH joined AS (
        SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT c_nationkey, c_mktsegment, o_orderpriority,
               COUNT(*) AS cnt
        FROM joined GROUP BY c_nationkey, c_mktsegment, o_orderpriority
    ),
    tot AS (
        SELECT c_nationkey, c_mktsegment, SUM(cnt) AS n
        FROM cells GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c.c_nationkey, c.c_mktsegment, CAST(t.n AS BIGINT) AS n_orders,
           CAST(ROUND(CAST(SUM(CAST(
               -(CAST(c.cnt AS DOUBLE) / t.n)
               * ln(CAST(c.cnt AS DOUBLE) / t.n)
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE) AS entropy,
           CAST(SUM(CASE WHEN TRUE THEN 1 ELSE 0 END) AS BIGINT)
               AS n_priorities
    FROM cells c
    JOIN tot t ON c.c_nationkey = t.c_nationkey
              AND c.c_mktsegment = t.c_mktsegment
    GROUP BY c.c_nationkey, c.c_mktsegment, t.n
    """,
)
def entropy_ldiversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    joined = cat.orders.join(
        cat.customer.select("c_custkey", "c_nationkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    cells = joined.groupBy(
        "c_nationkey", "c_mktsegment", "o_orderpriority"
    ).agg(F.count("*").alias("cnt"))
    tot = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").alias("n")
    )
    p = F.col("cnt").cast("double") / F.col("n")
    return (
        cells.join(tot, ["c_nationkey", "c_mktsegment"])
        .groupBy("c_nationkey", "c_mktsegment", "n")
        .agg(
            F.round(_dsum(-p * F.log(p)).cast("double"), 6).alias(
                "entropy"
            ),
            F.count(F.lit(1)).cast("long").alias("n_priorities"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("n").cast("long").alias("n_orders"),
            "entropy",
            "n_priorities",
        )
    )


# ===========================================================================
# Batch F — graph analytics, model-eval, and time-series decomposition.
# ===========================================================================


# Hot-basket guard for the basket-pair family (adamic_adar_q,
# association_rules_q): any self-join of (order, part) on the order key
# fans out quadratically per basket, so a single pathological 100k-item
# basket would emit 10^10 pairs from one shuffle key — the classic skew
# scale-killer. Every basket is therefore truncated to its BASKET_CAP
# smallest partkeys (deterministic; same ROW_NUMBER cap in the DuckDB
# oracle) BEFORE pairing, bounding per-key fan-out at BASKET_CAP^2.
# TPC-H baskets hold <= 7 distinct parts, so the cap never fires at test
# scale and oracle parity is exact. Fan-out bound pinned by
# tests/test_basket_cap.py.
BASKET_CAP = 64


def _capped_baskets(op: DataFrame, cap: int = BASKET_CAP) -> DataFrame:
    """Truncate each basket (key ``o``, item ``p``) to its ``cap`` smallest
    items. The per-key window is linear work per basket (one shuffle on
    ``o``, which the downstream pair join needs anyway)."""
    w = Window.partitionBy("o").orderBy("p")
    return (
        op.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


# Adamic–Adar link prediction over the co-purchase bipartite projection:
# parts are linked through shared orders, and each shared order z
# contributes 1/ln(|z|). Scale shape: the pair generator is keyed by
# orderkey, and every basket is HARD-CAPPED to its BASKET_CAP smallest
# partkeys (deterministic, applied identically in the oracle) before
# pairing — so one hot basket of 100k items contributes at most
# BASKET_CAP^2 pairs instead of 10^10, and total pair count is
# O(orders * BASKET_CAP^2). On TPC-H the cap is a no-op (baskets <= 7).
# Scores sum 12-dp-quantized terms, so the top-30 ordering is
# engine-identical. The cap's bounded-fan-out contract is pinned by
# tests/test_basket_cap.py (synthetic one-order x 5k-part hot basket).
@register(
    "adamic_adar_q",
    """
    WITH op0 AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    op AS (
        SELECT o, p FROM (
            SELECT o, p, ROW_NUMBER() OVER (PARTITION BY o ORDER BY p) AS rn
            FROM op0) WHERE rn <= 64
    ),
    osize AS (
        SELECT o, COUNT(*) AS n FROM op GROUP BY o HAVING COUNT(*) >= 2
    ),
    pairs AS (
        SELECT a.p AS pa, b.p AS pb,
               CAST(1.0 / ln(CAST(s.n AS DOUBLE)) AS DECIMAL(28,12)) AS w
        FROM op a
        JOIN op b ON a.o = b.o AND a.p < b.p
        JOIN osize s ON s.o = a.o
    )
    SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(ROUND(CAST(SUM(w) AS DOUBLE), 6) AS DOUBLE) AS aa_score
    FROM pairs GROUP BY pa, pb
    ORDER BY SUM(w) DESC, pa, pb LIMIT 30
    """,
    headline=True,
)
def adamic_adar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 predicted part-part links by Adamic–Adar: pairs that share
    many small (informative) orders outrank pairs sharing few large
    (generic) ones. The common neighbor is always the ORDER node, whose
    degree is the order's distinct-part count (after the basket cap)."""
    li = Catalog(spark, sf_dir).lineitem
    op = _capped_baskets(
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
    )
    osize = op.groupBy("o").agg(F.count("*").alias("n")).filter("n >= 2")
    a = op.select("o", F.col("p").alias("pa"))
    b = op.select("o", F.col("p").alias("pb"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .join(osize, "o")
        .select(
            "pa",
            "pb",
            (F.lit(1.0) / F.log(F.col("n").cast("double")))
            .cast("decimal(28,12)")
            .alias("w"),
        )
    )
    return (
        pairs.groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("w").alias("_aa"),
        )
        .orderBy(F.desc("_aa"), "pa", "pb")
        .limit(30)
        .select(
            "pa",
            "pb",
            "n_common",
            F.round(F.col("_aa").cast("double"), 6).alias("aa_score"),
        )
    )


# Per-node local clustering coefficient over the co-purchase graph:
# 2*T(v) / (d(v)*(d(v)-1)). Reuses the degree-oriented triangle
# enumeration (skew-proof wedge join, out-degree <= O(sqrt E)), but keeps
# the triangle's three corners and explodes them — one extra
# vocabulary-scale shuffle to count per-node triangles. Everything is
# integer until the final coefficient.
@register(
    "clustering_coeff_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        GROUP BY n
    ),
    ed AS (
        SELECT e.a, e.b, da.d AS da, db.d AS db
        FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
    ),
    oriented AS (
        SELECT CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS src,
               CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS dst,
               CASE WHEN (da, a) < (db, b) THEN db ELSE da END AS dd
        FROM ed
    ),
    tri AS (
        -- the wedge orders (o1.dd,o1.dst) < (o2.dd,o2.dst), and oriented
        -- stores every edge with src = the degree-lower endpoint, so the
        -- closing edge y--z is stored exactly as (src=y, dst=z): probe
        -- with the degree-ordered key (id-ordered LEAST/GREATEST would
        -- miss triangles where deg(y)<deg(z) but y>z numerically)
        SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
        FROM oriented o1
        JOIN oriented o2 ON o1.src = o2.src
                        AND (o1.dd, o1.dst) < (o2.dd, o2.dst)
        JOIN oriented c
          ON c.src = o1.dst AND c.dst = o2.dst
    ),
    pernode AS (
        SELECT n, COUNT(*) AS t FROM (
            SELECT x AS n FROM tri UNION ALL
            SELECT y AS n FROM tri UNION ALL
            SELECT z AS n FROM tri) u
        GROUP BY n
    )
    SELECT d.n AS node, CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(p.t, 0) AS BIGINT) AS n_triangles,
           CAST(ROUND(CASE WHEN d.d >= 2 THEN
                    2.0 * COALESCE(p.t, 0) / (d.d * (d.d - 1))
                    ELSE 0.0 END, 6) AS DOUBLE) AS coeff
    FROM deg d LEFT JOIN pernode p ON p.n = d.n
    ORDER BY COALESCE(p.t, 0) DESC, d.n LIMIT 30
    """,
)
def clustering_coeff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    # edge list feeds degree + orientation — pin once
    e = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
        .localCheckpoint()
    )
    ed = e.join(
        deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    lt = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(lt, F.col("db")).otherwise(F.col("da")).alias("dd"),
    ).localCheckpoint()
    o1 = oriented.select(
        "src", F.col("dst").alias("y"), F.col("dd").alias("dy")
    )
    o2 = oriented.select(
        "src", F.col("dst").alias("z"), F.col("dd").alias("dz")
    )
    wedges = o1.join(o2, "src").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closure = oriented.select(
        F.col("src").alias("cs"), F.col("dst").alias("cd")
    )
    # wedge filter guarantees (dy,y) < (dz,z) in DEGREE order, and every
    # edge in `oriented` is stored with src = its degree-lower endpoint —
    # so the closing edge y--z sits at exactly (src=y, dst=z). Probing
    # with id-ordered least/greatest keys would drop triangles where
    # deg(y) < deg(z) but y > z numerically.
    tri = wedges.join(
        closure,
        (F.col("cs") == F.col("y")) & (F.col("cd") == F.col("z")),
    ).select("src", "y", "z")
    pernode = (
        tri.select(F.explode(F.array("src", "y", "z")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("t"))
    )
    t = F.coalesce(F.col("t"), F.lit(0))
    return (
        deg.join(pernode, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("d").cast("long").alias("degree"),
            t.cast("long").alias("n_triangles"),
            F.round(
                F.when(
                    F.col("d") >= 2,
                    2.0 * t / (F.col("d") * (F.col("d") - 1)),
                ).otherwise(0.0),
                6,
            ).alias("coeff"),
        )
        .orderBy(F.desc("n_triangles"), "node")
        .limit(30)
    )


# Gini coefficient of document length per source — the corpus-inequality
# audit (a source whose token mass concentrates in a few giant docs skews
# sampling weights). Scale shape: one rank window PER SOURCE partition
# (parallel across sources), then integer aggregates: G =
# 2*sum(i*x_i)/(n*sum x) - (n+1)/n stays in exact integer arithmetic
# until the final division.
@register(
    "gini_q",
    """
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS i
        FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(ROUND(2.0 * SUM(i * n_chars)
                      / (COUNT(*) * SUM(n_chars))
                      - (COUNT(*) + 1.0) / COUNT(*), 6) AS DOUBLE)
               AS gini
    FROM ranked GROUP BY source
    """,
)
def gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini from GROUPED VALUE COUNTS, not per-row ranks: a tie block of
    c equal values occupying ranks cum+1..cum+c contributes
    v * (c*cum + c(c+1)/2) to the rank-weighted sum, so the oracle's
    ROW_NUMBER formulation is reproduced EXACTLY (integer arithmetic,
    ties commute) while the window runs over the per-source distinct
    VALUE table — bounded cardinality — instead of ranking the corpus
    inside per-source partitions (the gini-at-100TB scale trap)."""
    d = Catalog(spark, sf_dir).documents
    pv = d.groupBy("source", "n_chars").agg(F.count("*").alias("c"))
    wv = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_before = F.sum("c").over(wv) - F.col("c")
    block_rank_sum = F.col("c") * cum_before + F.expr(
        "c * (c + 1) DIV 2"
    )
    terms = pv.select(
        "source",
        "c",
        (F.col("c") * F.col("n_chars")).alias("mass"),
        (F.col("n_chars").cast("long") * block_rank_sum).alias("si"),
    )
    n = F.sum("c")
    return terms.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        F.sum("mass").cast("long").alias("total_chars"),
        F.round(
            2.0 * F.sum("si") / (n * F.sum("mass")) - (n + 1.0) / n,
            6,
        ).alias("gini"),
    )


# ROC-AUC of a deterministic quality score (mean token length) against the
# lang='en' label, computed from per-distinct-score counts — the
# rank-free Mann–Whitney formulation that never sorts the corpus:
# AUC = sum_s [P(s) * (cumN(<s) + N(s)/2)] / (P_tot * N_tot).
# Scale shape: one shuffle keyed by the (4-dp-rounded) score value —
# bounded cardinality — then a window over that score table. Counts stay
# integer; N(s)/2 is exact in binary.
@register(
    "roc_auc_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(CAST(list_sum(list_transform(t, x -> length(x)))
                          AS DOUBLE) / len(t), 4) AS s
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    per_score AS (
        SELECT s, SUM(y) AS np, SUM(1 - y) AS nn
        FROM scored GROUP BY s
    ),
    c AS (
        SELECT np, nn,
               SUM(nn) OVER (ORDER BY s) - nn AS cum_nn_below,
               SUM(np) OVER () AS p_tot, SUM(nn) OVER () AS n_tot
        FROM per_score
    )
    SELECT CAST(MAX(p_tot) AS BIGINT) AS n_pos,
           CAST(MAX(n_tot) AS BIGINT) AS n_neg,
           CAST(ROUND(CAST(SUM(CAST(
               np * (cum_nn_below + nn / 2.0)
               AS DECIMAL(28,12))) AS DOUBLE)
               / (MAX(p_tot) * MAX(n_tot)), 6) AS DOUBLE) AS auc
    FROM c
    """,
)
def roc_auc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free evaluation of a per-doc score as an 'is English'
    classifier. AUC from grouped counts: ties handled by the standard
    half-credit term, no global sort of documents."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(
            F.aggregate(
                t, F.lit(0), lambda a, x: a + F.length(x)
            ).cast("double")
            / F.size(t),
            4,
        ).alias("s"),
    ).filter(F.size(t) > 0)
    per_score = scored.groupBy("s").agg(
        F.sum("y").alias("np"), F.sum(1 - F.col("y")).alias("nn")
    )
    wc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = per_score.select(
        "np",
        "nn",
        (F.sum("nn").over(wc) - F.col("nn")).alias("cum_nn_below"),
        F.sum("np").over(wt).alias("p_tot"),
        F.sum("nn").over(wt).alias("n_tot"),
    )
    return c.agg(
        F.max("p_tot").cast("long").alias("n_pos"),
        F.max("n_tot").cast("long").alias("n_neg"),
        F.round(
            _dsum(
                F.col("np") * (F.col("cum_nn_below") + F.col("nn") / 2.0)
            ).cast("double")
            / (F.max("p_tot") * F.max("n_tot")),
            6,
        ).alias("auc"),
    )


# Weekly seasonal decomposition of the daily event-value series (STL-lite:
# trend = centered 7-day moving average, seasonal = mean detrended value
# per day-of-week, residual = remainder). Scale shape: the corpus-scale
# work is one (day) aggregation with map-side partials; all three window
# passes run over the DAILY table (calendar-bounded metadata — 30 rows
# here, ~36.5k rows for a century). Daily means are quantized to
# DECIMAL(18,6) before the sliding sum so the moving average is
# partition- and tree-order-proof on both engines.
@register(
    "stl_decompose_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                   AS dow,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'view'
        GROUP BY CAST(ts AS DATE),
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
    ),
    trended AS (
        SELECT day, dow, m,
               CAST(CAST(SUM(m) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DOUBLE)
                    / COUNT(*) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DECIMAL(18,6)) AS trend
        FROM daily
    ),
    seasoned AS (
        SELECT day, dow, m, trend,
               CAST(CAST(SUM(m - trend) OVER (PARTITION BY dow)
                    AS DOUBLE) / COUNT(*) OVER (PARTITION BY dow)
                    AS DECIMAL(18,6)) AS seasonal
        FROM trended
    )
    SELECT day,
           CAST(ROUND(CAST(m AS DOUBLE), 4) AS DOUBLE) AS daily_mean,
           CAST(ROUND(CAST(trend AS DOUBLE), 4) AS DOUBLE) AS trend,
           CAST(ROUND(CAST(seasonal AS DOUBLE), 4) AS DOUBLE) AS seasonal,
           CAST(ROUND(CAST(m - trend - seasonal AS DOUBLE), 4) AS DOUBLE)
               AS residual
    FROM seasoned
    """,
)
def stl_decompose_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition on the daily aggregate —
    the observability layer's anomaly-vs-seasonality separator. Exact
    decimal arithmetic end-to-end: every intermediate (daily mean, trend,
    seasonal) re-quantizes to DECIMAL(18,6)."""
    e = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "view")
    daily = (
        e.groupBy(
            F.to_date("ts").alias("day"),
            (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) % 7
             ).alias("dow"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            )
            .cast("decimal(18,6)")
            .alias("m")
        )
    )
    wma = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "dow",
        "m",
        (F.sum("m").over(wma).cast("double") / F.count("*").over(wma))
        .cast("decimal(18,6)")
        .alias("trend"),
    )
    wd = Window.partitionBy("dow").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    seasoned = trended.select(
        "day",
        "m",
        "trend",
        (
            F.sum(F.col("m") - F.col("trend")).over(wd).cast("double")
            / F.count("*").over(wd)
        )
        .cast("decimal(18,6)")
        .alias("seasonal"),
    )
    return seasoned.select(
        "day",
        F.round(F.col("m").cast("double"), 4).alias("daily_mean"),
        F.round(F.col("trend").cast("double"), 4).alias("trend"),
        F.round(F.col("seasonal").cast("double"), 4).alias("seasonal"),
        F.round(
            (F.col("m") - F.col("trend") - F.col("seasonal")).cast("double"),
            4,
        ).alias("residual"),
    )


# CUSUM change-point curve over the daily error-rate series: cumulative
# sum of (daily mean - global mean), with the argmax |CUSUM| day flagged.
# Scale shape: identical to stl_decompose_q — one corpus-scale day
# aggregation, then windows over the calendar-bounded daily table. All
# sums run in exact decimal, so the flagged change point cannot flap
# across engines or partition layouts.
@register(
    "cusum_changepoint_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'error'
        GROUP BY CAST(ts AS DATE)
    ),
    mu AS (
        SELECT day, m,
               CAST(CAST(SUM(m) OVER () AS DOUBLE) / COUNT(*) OVER ()
                    AS DECIMAL(18,6)) AS mu
        FROM daily
    ),
    c AS (
        SELECT day, m, SUM(m - mu) OVER (ORDER BY day) AS cusum
        FROM mu
    )
    SELECT day,
           CAST(ROUND(CAST(m AS DOUBLE), 4) AS DOUBLE) + 0.0 AS daily_mean,
           CAST(ROUND(CAST(cusum AS DOUBLE), 4) AS DOUBLE) + 0.0 AS cusum,
           ABS(cusum) = MAX(ABS(cusum)) OVER () AS is_changepoint
    FROM c
    """,
)
def cusum_changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "error")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mu = daily.select(
        "day",
        "m",
        (F.sum("m").over(wt).cast("double") / F.count("*").over(wt))
        .cast("decimal(18,6)")
        .alias("mu"),
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = mu.select(
        "day", "m", F.sum(F.col("m") - F.col("mu")).over(wc).alias("cusum")
    )
    # ``+ 0.0`` normalizes IEEE negative zero: a tiny negative CUSUM rounds
    # to -0.0 in DuckDB but +0.0 in Spark (BigDecimal path) — numerically
    # equal yet different under the driver's string-hash (r7 red row).
    return c.select(
        "day",
        (F.round(F.col("m").cast("double"), 4) + F.lit(0.0)).alias(
            "daily_mean"
        ),
        (F.round(F.col("cusum").cast("double"), 4) + F.lit(0.0)).alias(
            "cusum"
        ),
        (F.abs("cusum") == F.max(F.abs("cusum")).over(wt)).alias(
            "is_changepoint"
        ),
    )


# Last-touch attribution: each purchase is credited to the user's most
# recent non-purchase event within the preceding 7 days. Scale shape: one
# window pass per user partition (running max of a (ts, id, type) struct
# over preceding rows) — no self-join of the event stream; the fact table
# shuffles once on user_id. The oracle states the same semantics as a
# bounded join + arg_max, which is equivalent because "most recent within
# 7d" = "most recent overall, if within 7d".
@register(
    "attribution_q",
    """
    SELECT event_id, user_id, src_event_id, src_type, us_before FROM (
        SELECT p.event_id, p.user_id,
               e.event_id AS src_event_id, e.event_type AS src_type,
               epoch_us(p.ts) - epoch_us(e.ts) AS us_before,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY e.ts DESC, e.event_id DESC)
                   AS rn
        FROM events p
        LEFT JOIN events e
          ON e.user_id = p.user_id AND e.event_type <> 'purchase'
         AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 7 DAY
        WHERE p.event_type = 'purchase'
    ) t WHERE rn = 1
    """,
)
def attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    # RANGE frame on microseconds ending at -1: strictly-earlier events
    # only. A ROWS frame ordered by (ts, event_id) would also admit a
    # same-timestamp source event with a smaller event_id, which the
    # oracle's e.ts < p.ts excludes — the two diverge on per-user ts ties.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    attr = F.max(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(
                F.col("ts").alias("ts"),
                F.col("event_id").alias("event_id"),
                F.col("event_type").alias("event_type"),
            ),
        )
    ).over(w)
    flagged = ev.select(
        "event_id", "user_id", "event_type", "ts", attr.alias("a")
    ).filter(F.col("event_type") == "purchase")
    within = F.col("a").isNotNull() & (
        F.col("a.ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.when(within, F.col("a.event_id")).alias("src_event_id"),
        F.when(within, F.col("a.event_type")).alias("src_type"),
        F.when(
            within, F.unix_micros("ts") - F.unix_micros("a.ts")
        ).alias("us_before"),
    )


# ColBERT-style late-interaction (MaxSim) retrieval: passages are groups
# of 10 vectors; score(q, d) = sum over query tokens of the best cosine
# against any doc token. Scale shape: the 20 query-token vectors
# BROADCAST against the corpus token table (corpus never shuffles for
# scoring); the max-per-(query-token, passage) and the final sum shuffle
# only (qid, did, score) rows — passage-scale, not token-pair-scale.
# Cosines round to 4 dp before max (ties break identically), and the
# 10-term MaxSim sum is 12-dp-quantized.
@register(
    "maxsim_q",
    """
    WITH e AS (SELECT vec_id, vec_id // 10 AS pid,
                      embedding::DOUBLE[] AS v
               FROM embeddings),
    q AS (SELECT pid AS qid, vec_id AS qtok, v AS qv FROM e WHERE pid < 2),
    c AS (SELECT pid AS did, v FROM e WHERE pid >= 2),
    cos AS (
        SELECT q.qid, c.did, q.qtok,
               MAX(ROUND(list_cosine_similarity(q.qv, c.v), 4)) AS best
        FROM q JOIN c ON TRUE
        GROUP BY q.qid, c.did, q.qtok
    ),
    scored AS (
        SELECT qid, did,
               CAST(ROUND(CAST(SUM(CAST(best AS DECIMAL(28,12)))
                    AS DOUBLE), 4) AS DOUBLE) AS maxsim
        FROM cos GROUP BY qid, did
    )
    SELECT qid, did, maxsim, rn FROM (
        SELECT qid, did, maxsim,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY maxsim DESC, did) AS rn
        FROM scored
    ) t WHERE rn <= 5
    """,
    headline=True,
)
def maxsim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.similarity import cosine

    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        (F.col("vec_id") / 10).cast("long").alias("pid"),
        F.col("embedding").alias("v"),
    )
    q = e.filter(F.col("pid") < 2).select(
        F.col("pid").alias("qid"),
        F.col("vec_id").alias("qtok"),
        F.col("v").alias("qv"),
    )
    c = e.filter(F.col("pid") >= 2).select(F.col("pid").alias("did"), "v")
    cos = (
        c.crossJoin(F.broadcast(q))
        .groupBy("qid", "did", "qtok")
        .agg(
            F.max(F.round(cosine(F.col("qv"), F.col("v")), 4)).alias("best")
        )
    )
    scored = cos.groupBy("qid", "did").agg(
        F.round(_dsum(F.col("best")).cast("double"), 4).alias("maxsim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("maxsim"), "did")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "did", "maxsim", "rn")
    )


# Sweep-line interval concurrency: how many order lines are simultaneously
# in fulfillment (order date .. ship date inclusive), reported as the
# per-month peak. Scale shape: the classic O(n^2) interval-overlap join is
# replaced by +1/-1 boundary events aggregated per DAY (one corpus-scale
# shuffle onto a calendar-bounded key), a running sum over the bounded
# date table, and a month rollup. Integers throughout.
@register(
    "interval_concurrency_q",
    """
    WITH iv AS (
        SELECT CAST(o.o_orderdate AS DATE) AS s,
               CAST(l.l_shipdate AS DATE) AS e
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    bounds AS (
        SELECT s AS day, 1 AS delta FROM iv
        UNION ALL
        SELECT e + 1 AS day, -1 FROM iv
    ),
    daily AS (
        SELECT day, SUM(delta) AS delta FROM bounds GROUP BY day
    ),
    open_count AS (
        SELECT day, SUM(delta) OVER (ORDER BY day) AS n_open
        FROM daily
    )
    SELECT CAST(EXTRACT(YEAR FROM day) * 100 + EXTRACT(MONTH FROM day)
                AS BIGINT) AS ym,
           CAST(MAX(n_open) AS BIGINT) AS peak_open,
           CAST(COUNT(*) AS BIGINT) AS n_boundary_days
    FROM open_count GROUP BY 1
    """,
)
def interval_concurrency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    iv = cat.lineitem.select("l_orderkey", "l_shipdate").join(
        cat.orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    starts = iv.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.lit(1).alias("delta"),
    )
    ends = iv.select(
        F.date_add(F.col("l_shipdate").cast("date"), 1).alias("day"),
        F.lit(-1).alias("delta"),
    )
    daily = (
        starts.unionAll(ends).groupBy("day").agg(F.sum("delta").alias("delta"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    open_count = daily.select(
        "day", F.sum("delta").over(w).alias("n_open")
    )
    return open_count.groupBy(
        (F.year("day") * 100 + F.month("day")).cast("long").alias("ym")
    ).agg(
        F.max("n_open").cast("long").alias("peak_open"),
        F.count(F.lit(1)).cast("long").alias("n_boundary_days"),
    )


# Boilerplate/template detection: documents sharing an identical 8-token
# prefix hash. Scale shape: the prefix hash is per-row Catalyst (poly_hash
# over the joined prefix tokens); only (prefix_hash, doc_id, source) rows
# shuffle — text never moves; groups are template-cluster scale.
@register(
    "template_prefix_q",
    f"""
    WITH p AS (
        SELECT doc_id, source,
               {_SQL_POLY.format(
                   s="array_to_string(list_slice(" + _SQL_TOKENS + ", 1, 8), ' ')")}
                   AS prefix_hash
        FROM documents
        WHERE len({_SQL_TOKENS}) >= 8
    )
    SELECT prefix_hash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS sample_doc
    FROM p GROUP BY prefix_hash HAVING COUNT(*) >= 2
    """,
)
def template_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs opening with the same 8 tokens are template/boilerplate
    candidates (the pre-filter for CCNet-style boilerplate removal).
    Cross-source groups are the strongest signal (mirrors, syndication)."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    p = d.filter(F.size(t) >= 8).select(
        "doc_id",
        "source",
        poly_hash(F.array_join(F.slice(t, 1, 8), " ")).alias("prefix_hash"),
    )
    return (
        p.groupBy("prefix_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").cast("long").alias("sample_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# Power-law (Pareto) tail fit of the co-purchase degree distribution via
# the Hill MLE: alpha = 1 + n / sum(ln(d / dmin)) over degrees >= dmin.
# Scale shape: degrees come from one edge aggregation (vocab-scale); the
# estimator is a single fold over the degree table with 12-dp-quantized
# log terms. Companion to zipf_fit_q (token side) for graph data.
@register(
    "degree_powerlaw_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        GROUP BY n
    ),
    tail AS (SELECT d FROM deg WHERE d >= 2)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_tail,
           CAST(MAX(d) AS BIGINT) AS d_max,
           -- degenerate tail (every degree == dmin) => log-sum is 0:
           -- the Hill estimator is undefined, return NULL (both engines)
           CAST(CASE WHEN CAST(SUM(CAST(ln(CAST(d AS DOUBLE) / 2.0)
                    AS DECIMAL(28,12))) AS DOUBLE) > 0 THEN
               ROUND(1.0 + COUNT(*) / CAST(SUM(CAST(
                   ln(CAST(d AS DOUBLE) / 2.0)
                   AS DECIMAL(28,12))) AS DOUBLE), 6)
           END AS DOUBLE) AS alpha_hill
    FROM tail
    """,
)
def degree_powerlaw_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
        .localCheckpoint()
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    tail = deg.filter(F.col("d") >= 2)
    # degenerate tail (every degree == dmin=2): log-sum is 0 and the Hill
    # estimator is undefined — return NULL, matching the oracle's CASE
    logsum = _dsum(F.log(F.col("d").cast("double") / 2.0)).cast("double")
    stats = tail.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.max("d").cast("long").alias("d_max"),
        F.when(
            logsum > 0,
            F.round(1.0 + F.count(F.lit(1)) / logsum, 6),
        ).alias("alpha_hill"),
    )
    return n_nodes.crossJoin(F.broadcast(stats)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        "n_tail",
        "d_max",
        "alpha_hill",
    )


# Sequential pattern mining: the 20 most common length-3 event-type paths
# per user stream (the next-event-prediction training signal). Scale
# shape: two LEAD windows per user partition (parallel across users, no
# self-join of the stream), then a path-keyed count — path vocabulary is
# |types|^3 bounded.
@register(
    "event_paths_q",
    """
    WITH ordered AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e2,
               LEAD(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e3
        FROM events
    )
    SELECT event_type AS e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM ordered WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3 LIMIT 20
    """,
)
def event_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        ordered.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(20)
    )


# ===========================================================================
# Batch H — clustering-quality evaluation (internal + external indices).
# All three reuse the deterministic 2-round Lloyd model: the oracle
# replays init -> assign -> recompute -> assign in SQL exactly as
# kmeans_assignments does; Spark gets the same k x d centroid table from
# lloyd_train (metadata collect) and evaluates per-row with broadcast
# centroid literals. Distances round to 6 dp (the model's contract), so
# assignment and index arithmetic are engine-identical.
# ===========================================================================

from iniz_exporters_spark.operators.clustering import lloyd_train  # noqa: E402


_KM_PRELUDE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
           FROM e ORDER BY vec_id LIMIT 4),
    a0 AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_KM_DIST}, c.cid) AS rn
            FROM e CROSS JOIN c0 c
        ) WHERE rn = 1
    ),
    m0 AS (
        SELECT cid, i, ROUND(CAST(avg(val) AS DECIMAL(28,12)), 6)::DOUBLE AS m
        FROM (SELECT cid, i, v[i] AS val
              FROM a0, unnest(range(1, len(v)+1)) AS t(i))
        GROUP BY cid, i
    ),
    c1 AS (SELECT cid, list(m ORDER BY i) AS v FROM m0 GROUP BY cid),
    dists AS (
        SELECT e.vec_id, e.v, c.cid, {_KM_DIST} AS d2,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_DIST}, c.cid) AS rn
        FROM e CROSS JOIN c1 c
    )
"""


def _km_eval_frame(spark: SparkSession, sf_dir: str):
    """((vec_id, label, v, cluster, d2_own, d2_other) frame, centroids)
    under the shared 2-round Lloyd model — centroids broadcast as
    literals, all distance arithmetic in the same fold shape as the SQL
    replay."""
    emb = Catalog(spark, sf_dir).embeddings
    cents = lloyd_train(emb, "vec_id", "embedding", k=4, iters=2)
    e = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dcols = []
    for i, c in enumerate(cents):
        cent = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.round(
            F.aggregate(
                F.zip_with(
                    F.col("v"), cent, lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            6,
        )
        dcols.append(F.struct(d2.alias("d"), F.lit(i).alias("cid")))
    arr = F.array(*dcols)
    best = F.array_min(arr)
    frame = e.select(
        "vec_id",
        "label",
        "v",
        best["cid"].alias("cluster"),
        best["d"].alias("d2_own"),
        F.array_min(
            F.filter(arr, lambda s: s["cid"] != best["cid"])
        )["d"].alias("d2_other"),
    )
    return frame, cents


# Simplified (centroid-based) silhouette per cluster: s = (b - a) /
# max(a, b) with a = distance to own centroid, b = nearest other
# centroid. Scale shape: O(n*k) per-row arithmetic against broadcast
# centroids — no pairwise point distances (the textbook silhouette is
# O(n^2) and cannot run at corpus scale); one k-row aggregation.
@register(
    "silhouette_q",
    _KM_PRELUDE
    + """
    , pts AS (
        SELECT vec_id,
               MAX(CASE WHEN rn = 1 THEN cid END) AS cluster,
               sqrt(MAX(CASE WHEN rn = 1 THEN d2 END)) AS da,
               sqrt(MIN(CASE WHEN rn > 1 THEN d2 END)) AS db
        FROM dists GROUP BY vec_id
    )
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(CAST(SUM(CAST(
               CASE WHEN greatest(da, db) > 0
                    THEN (db - da) / greatest(da, db) ELSE 0.0 END
               AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS mean_silhouette
    FROM pts GROUP BY cluster
    """,
)
def silhouette_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    f, _ = _km_eval_frame(spark, sf_dir)
    da, db = F.sqrt("d2_own"), F.sqrt("d2_other")
    s = F.when(
        F.greatest(da, db) > 0, (db - da) / F.greatest(da, db)
    ).otherwise(0.0)
    return f.groupBy(F.col("cluster").cast("int").alias("cluster")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(_dsum(s).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_silhouette"
        ),
    )


# Calinski–Harabasz index: between-cluster dispersion over within-cluster
# dispersion, (B/(k-1)) / (W/(n-k)). Scale shape: W is the sum of the
# per-point own-centroid distances already computed; B needs only the
# k x d centroid table and the global mean (metadata arithmetic). One
# corpus aggregation total.
@register(
    "calinski_harabasz_q",
    _KM_PRELUDE
    + """
    , own AS (
        SELECT vec_id, v, cid, d2 FROM dists WHERE rn = 1
    ),
    w AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(d2 AS DECIMAL(28,12))) AS DOUBLE) AS wss
        FROM own
    ),
    sizes AS (SELECT cid, COUNT(*) AS nj FROM own GROUP BY cid),
    gmean AS (
        SELECT i, ROUND(CAST(avg(val) AS DECIMAL(28,12)), 6)::DOUBLE AS g
        FROM (SELECT i, v[i] AS val
              FROM e, unnest(range(1, len(v)+1)) AS t(i))
        GROUP BY i
    ),
    b AS (
        SELECT CAST(SUM(CAST(s.nj * ROUND(
                   list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - g.gv[i]) * (c.v[i] - g.gv[i])),
                       (x, y) -> x + y), 6)
               AS DECIMAL(28,12))) AS DOUBLE) AS bss
        FROM c1 c JOIN sizes s ON c.cid = s.cid
        CROSS JOIN (SELECT list(g ORDER BY i) AS gv FROM gmean) g
    )
    SELECT CAST(w.n AS BIGINT) AS n,
           CAST(ROUND(w.wss, 4) AS DOUBLE) AS wss,
           CAST(ROUND(b.bss, 4) AS DOUBLE) AS bss,
           CAST(ROUND((b.bss / 3) / (w.wss / (w.n - 4)), 6) AS DOUBLE)
               AS ch_index
    FROM w CROSS JOIN b
    """,
)
def calinski_harabasz_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    f, cents = _km_eval_frame(spark, sf_dir)
    f = f.localCheckpoint()
    w = f.agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("d2_own")).cast("double").alias("wss"),
    )
    sizes = f.groupBy("cluster").agg(F.count("*").alias("nj"))
    gmean_rows = (
        emb.select(F.posexplode("embedding").alias("i", "val"))
        .groupBy("i")
        .agg(
            F.round(F.avg(F.col("val").cast("double")).cast("decimal(28,12)"), 6)
            .cast("double")
            .alias("g")
        )
        .collect()  # d rows — metadata
    )
    g = [0.0] * len(gmean_rows)
    for r in gmean_rows:
        g[r["i"]] = r["g"]
    bss_terms = []
    for i, c in enumerate(cents):
        d2 = round(sum((a - b) * (a - b) for a, b in zip(c, g)), 6)
        bss_terms.append((i, d2))
    bt = spark.createDataFrame(bss_terms, "cid int, d2 double")
    b = (
        sizes.join(F.broadcast(bt), sizes.cluster == bt.cid)
        .agg(
            _dsum(F.col("nj") * F.col("d2")).cast("double").alias("bss")
        )
    )
    return w.crossJoin(F.broadcast(b)).select(
        F.col("n").cast("long").alias("n"),
        F.round("wss", 4).alias("wss"),
        F.round("bss", 4).alias("bss"),
        F.round(
            (F.col("bss") / 3) / (F.col("wss") / (F.col("n") - 4)), 6
        ).alias("ch_index"),
    )


# External cluster validation: normalized mutual information and purity
# between the k-means clusters and the ground-truth label column. Scale
# shape: the contingency table is one (cluster, label) count shuffle —
# k x |labels| cells — and every entropy/MI term is metadata arithmetic
# over that table, 12-dp-quantized.
@register(
    "cluster_nmi_q",
    _KM_PRELUDE
    + """
    , a1 AS (
        SELECT d.vec_id, d.cid, emb.label
        FROM dists d JOIN embeddings emb ON emb.vec_id = d.vec_id
        WHERE d.rn = 1
    ),
    cells AS (SELECT cid, label, COUNT(*) AS c FROM a1 GROUP BY cid, label),
    n AS (SELECT COUNT(*) AS n FROM a1),
    mc AS (SELECT cid, SUM(c) AS nc FROM cells GROUP BY cid),
    ml AS (SELECT label, SUM(c) AS nl FROM cells GROUP BY label),
    mi AS (
        SELECT CAST(SUM(CAST(
            (CAST(c.c AS DOUBLE) / n.n)
            * ln(CAST(c.c AS DOUBLE) * n.n
                 / (CAST(mc.nc AS DOUBLE) * ml.nl))
            AS DECIMAL(28,12))) AS DOUBLE) AS mi
        FROM cells c JOIN mc ON c.cid = mc.cid
        JOIN ml ON c.label = ml.label CROSS JOIN n
    ),
    hc AS (
        SELECT CAST(SUM(CAST(
            -(CAST(nc AS DOUBLE) / n.n) * ln(CAST(nc AS DOUBLE) / n.n)
            AS DECIMAL(28,12))) AS DOUBLE) AS h
        FROM mc CROSS JOIN n
    ),
    hl AS (
        SELECT CAST(SUM(CAST(
            -(CAST(nl AS DOUBLE) / n.n) * ln(CAST(nl AS DOUBLE) / n.n)
            AS DECIMAL(28,12))) AS DOUBLE) AS h
        FROM ml CROSS JOIN n
    ),
    pur AS (
        SELECT CAST(SUM(mx) AS BIGINT) AS agree FROM (
            SELECT cid, MAX(c) AS mx FROM cells GROUP BY cid)
    )
    SELECT CAST(n.n AS BIGINT) AS n,
           CAST(ROUND(mi.mi / sqrt(hc.h * hl.h), 6) AS DOUBLE) AS nmi,
           CAST(ROUND(CAST(pur.agree AS DOUBLE) / n.n, 6) AS DOUBLE)
               AS purity
    FROM mi CROSS JOIN hc CROSS JOIN hl CROSS JOIN pur CROSS JOIN n
    """,
)
def cluster_nmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    f, _ = _km_eval_frame(spark, sf_dir)
    # contingency table is the only corpus-scale aggregation; everything
    # below works on its k x |labels| cells (no re-reads of the frame)
    cells = f.groupBy("cluster", "label").agg(
        F.count("*").alias("c")
    ).localCheckpoint()
    n_tot = cells.agg(F.sum("c").alias("n"))
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = cells.select(
        "c",
        "cluster",
        "label",
        F.sum("c").over(Window.partitionBy("cluster")).alias("nc"),
        F.sum("c").over(Window.partitionBy("label")).alias("nl"),
        F.sum("c").over(wt).alias("n"),
    )
    mi_term = (F.col("c").cast("double") / F.col("n")) * F.log(
        F.col("c").cast("double")
        * F.col("n")
        / (F.col("nc").cast("double") * F.col("nl"))
    )
    stats = m.agg(
        F.max("n").alias("n"),
        _dsum(mi_term).cast("double").alias("mi"),
    )
    hc = (
        cells.groupBy("cluster")
        .agg(F.sum("c").alias("nc"))
        .crossJoin(F.broadcast(n_tot))
        .agg(
            _dsum(
                -(F.col("nc").cast("double") / F.col("n"))
                * F.log(F.col("nc").cast("double") / F.col("n"))
            )
            .cast("double")
            .alias("hc")
        )
    )
    hl = (
        cells.groupBy("label")
        .agg(F.sum("c").alias("nl"))
        .crossJoin(F.broadcast(n_tot))
        .agg(
            _dsum(
                -(F.col("nl").cast("double") / F.col("n"))
                * F.log(F.col("nl").cast("double") / F.col("n"))
            )
            .cast("double")
            .alias("hl")
        )
    )
    pur = cells.groupBy("cluster").agg(F.max("c").alias("mx")).agg(
        F.sum("mx").cast("long").alias("agree")
    )
    return (
        stats.crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(pur))
        .select(
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("mi") / F.sqrt(F.col("hc") * F.col("hl")), 6
            ).alias("nmi"),
            F.round(
                F.col("agree").cast("double") / F.col("n"), 6
            ).alias("purity"),
        )
    )


# ===========================================================================
# Batch I — ML feature-engineering layer.
# ===========================================================================


# Weight-of-evidence / information-value binning: the credit-scoring
# feature diagnostic. Account balance is cut into 8 fixed-width bins;
# WOE(bin) = ln(pct_pos / pct_neg) against the returned-flag label, and
# IV sums (pct_pos - pct_neg) * WOE. Scale shape: one corpus-scale count
# shuffle onto the 8-bin key; WOE/IV arithmetic is metadata over the bin
# table. Counts stay integer; per-bin terms are 12-dp-quantized.
@register(
    "woe_iv_q",
    """
    WITH base AS (
        SELECT CAST(LEAST(GREATEST(CAST(floor((c_acctbal + 1000) / 875)
                    AS BIGINT), 0), 7) AS BIGINT) AS bin,
               CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS y
        FROM customer
    ),
    bins AS (
        SELECT bin, SUM(y) AS pos, SUM(1 - y) AS neg FROM base GROUP BY bin
    ),
    tot AS (SELECT SUM(pos) AS p, SUM(neg) AS n FROM bins)
    SELECT bin, CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
           CAST(ROUND(CASE WHEN pos > 0 AND neg > 0 THEN
               ln((CAST(pos AS DOUBLE) / t.p) / (CAST(neg AS DOUBLE) / t.n))
               ELSE 0.0 END, 6) AS DOUBLE) AS woe,
           CAST(ROUND(CASE WHEN pos > 0 AND neg > 0 THEN
               (CAST(pos AS DOUBLE) / t.p - CAST(neg AS DOUBLE) / t.n)
               * ln((CAST(pos AS DOUBLE) / t.p)
                    / (CAST(neg AS DOUBLE) / t.n))
               ELSE 0.0 END, 6) AS DOUBLE) AS iv_term
    FROM bins CROSS JOIN tot t
    """,
)
def woe_iv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    base = c.select(
        F.least(
            F.greatest(
                F.floor((F.col("c_acctbal") + 1000) / 875).cast("long"),
                F.lit(0),
            ),
            F.lit(7),
        )
        .cast("long")
        .alias("bin"),
        F.when(F.col("c_acctbal") < 0, 1).otherwise(0).alias("y"),
    )
    bins = base.groupBy("bin").agg(
        F.sum("y").alias("pos"), F.sum(1 - F.col("y")).alias("neg")
    )
    tot = bins.agg(F.sum("pos").alias("p"), F.sum("neg").alias("n"))
    ok = (F.col("pos") > 0) & (F.col("neg") > 0)
    pp = F.col("pos").cast("double") / F.col("p")
    pn = F.col("neg").cast("double") / F.col("n")
    woe = F.log(pp / pn)
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("pos").cast("long").alias("n_pos"),
        F.col("neg").cast("long").alias("n_neg"),
        F.round(F.when(ok, woe).otherwise(0.0), 6).alias("woe"),
        F.round(F.when(ok, (pp - pn) * woe).otherwise(0.0), 6).alias(
            "iv_term"
        ),
    )


# Leave-one-out target encoding: each customer's nation is encoded as the
# mean account balance of OTHER customers in that nation — the leakage-
# free categorical encoding for gradient-boosted models. Scale shape: one
# per-category aggregate (broadcastable metadata), then per-row
# arithmetic: loo = (sum_cat - own) / (n_cat - 1). Exact decimal sums, so
# the encoding is identical across engines and layouts.
@register(
    "target_encode_loo_q",
    """
    WITH agg AS (
        SELECT c_nationkey,
               SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s,
               COUNT(*) AS n
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey,
           CAST(ROUND(CAST(CASE WHEN a.n > 1 THEN
               CAST(a.s - CAST(c.c_acctbal AS DECIMAL(18,4)) AS DOUBLE)
               / (a.n - 1)
               ELSE 0.0 END AS DECIMAL(28,8)), 4) AS DOUBLE)
               AS nation_loo_mean
    FROM customer c JOIN agg a ON c.c_nationkey = a.c_nationkey
    """,
)
def target_encode_loo_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    agg = c.groupBy("c_nationkey").agg(
        F.sum(_dec(F.col("c_acctbal"))).alias("s"),
        F.count("*").alias("n"),
    )
    return c.join(F.broadcast(agg), "c_nationkey").select(
        "c_custkey",
        "c_nationkey",
        F.round(
            F.when(
                F.col("n") > 1,
                (F.col("s") - _dec(F.col("c_acctbal"))).cast("double")
                / (F.col("n") - 1),
            )
            .otherwise(0.0)
            .cast("decimal(28,8)"),
            4,
        )
        .cast("double")
        .alias("nation_loo_mean"),
    )


# Temporal-split leakage audit: split the event stream at a cutoff and
# measure entity overlap — users appearing on both sides leak future
# signal into training features. Scale shape: one user-keyed aggregate
# computing each user's min/max timestamp, then metadata counts. No
# self-join of the stream.
@register(
    "leakage_check_q",
    """
    WITH spans AS (
        SELECT user_id,
               MIN(ts) AS first_ts, MAX(ts) AS last_ts,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN last_ts < TIMESTAMP '2024-01-16'
                         THEN 1 ELSE 0 END) AS BIGINT) AS train_only,
           CAST(SUM(CASE WHEN first_ts >= TIMESTAMP '2024-01-16'
                         THEN 1 ELSE 0 END) AS BIGINT) AS test_only,
           CAST(SUM(CASE WHEN first_ts < TIMESTAMP '2024-01-16'
                          AND last_ts >= TIMESTAMP '2024-01-16'
                         THEN 1 ELSE 0 END) AS BIGINT) AS spanning,
           CAST(ROUND(CAST(SUM(CASE WHEN first_ts < TIMESTAMP '2024-01-16'
                          AND last_ts >= TIMESTAMP '2024-01-16'
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
                AS DOUBLE) AS leak_rate
    FROM spans
    """,
)
def leakage_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    cut = F.lit("2024-01-16").cast("timestamp")
    spans = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    spanning = F.sum(
        F.when(
            (F.col("first_ts") < cut) & (F.col("last_ts") >= cut), 1
        ).otherwise(0)
    )
    return spans.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("last_ts") < cut, 1).otherwise(0))
        .cast("long")
        .alias("train_only"),
        F.sum(F.when(F.col("first_ts") >= cut, 1).otherwise(0))
        .cast("long")
        .alias("test_only"),
        spanning.cast("long").alias("spanning"),
        F.round(
            spanning.cast("double") / F.count(F.lit(1)), 6
        ).alias("leak_rate"),
    )


# ===========================================================================
# Batch J — recsys prep, customer analytics, and multivariate statistics.
# ===========================================================================


# Association rules over co-purchased parts: support / confidence / lift
# for directed rules a -> b. Scale shape: pairs are generated per order
# key with every basket HARD-CAPPED to its BASKET_CAP smallest partkeys
# (deterministic, identical in the oracle — see _capped_baskets), so a
# hot basket contributes at most BASKET_CAP^2 pairs and total pair count
# is O(orders * BASKET_CAP^2), never quadratic in one key. TPC-H baskets
# are <= 7 so the cap never fires at test scale. Antecedent counts come
# from the capped part-order table (vocab-keyed); every statistic is a
# ratio of exact integer counts evaluated with the identical expression
# both engines.
@register(
    "association_rules_q",
    """
    WITH op0 AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    op AS (
        SELECT o, p FROM (
            SELECT o, p, ROW_NUMBER() OVER (PARTITION BY o ORDER BY p) AS rn
            FROM op0) WHERE rn <= 64
    ),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
    cnt AS (SELECT p, COUNT(*) AS c FROM op GROUP BY p),
    pairs AS (
        SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cab
        FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
        GROUP BY a.p, b.p
    )
    SELECT pa, pb, CAST(cab AS BIGINT) AS n_both,
           CAST(ROUND(CAST(cab AS DOUBLE) / n.n_orders, 6) AS DOUBLE)
               AS support,
           CAST(ROUND(CAST(cab AS DOUBLE) / ca.c, 6) AS DOUBLE)
               AS confidence,
           CAST(ROUND((CAST(cab AS DOUBLE) / ca.c)
                      / (CAST(cb.c AS DOUBLE) / n.n_orders), 6) AS DOUBLE)
               AS lift
    FROM pairs
    JOIN cnt ca ON ca.p = pa JOIN cnt cb ON cb.p = pb CROSS JOIN n
    WHERE cab >= 3
    ORDER BY (CAST(cab AS DOUBLE) / ca.c)
             / (CAST(cb.c AS DOUBLE) / n.n_orders) DESC, pa, pb
    LIMIT 30
    """,
    headline=True,
)
def association_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    op = _capped_baskets(
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
    ).localCheckpoint()
    n = op.agg(F.countDistinct("o").alias("n_orders"))
    cnt = op.groupBy("p").agg(F.count("*").alias("c"))
    a = op.select("o", F.col("p").alias("pa"))
    b = op.select("o", F.col("p").alias("pb"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("cab"))
        .filter(F.col("cab") >= 3)
    )
    conf = F.col("cab").cast("double") / F.col("ca")
    lift = conf / (F.col("cb").cast("double") / F.col("n_orders"))
    return (
        pairs.join(
            cnt.select(F.col("p").alias("pa"), F.col("c").alias("ca")), "pa"
        )
        .join(
            cnt.select(F.col("p").alias("pb"), F.col("c").alias("cb")), "pb"
        )
        .crossJoin(F.broadcast(n))
        .orderBy(F.desc(lift), "pa", "pb")
        .limit(30)
        .select(
            "pa",
            "pb",
            F.col("cab").cast("long").alias("n_both"),
            F.round(
                F.col("cab").cast("double") / F.col("n_orders"), 6
            ).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )


# RFM (recency / frequency / monetary) customer segmentation with NTILE
# quartile scores. Scale shape: one orders aggregation per customer
# (fact-scale shuffle on custkey), then three EXACT distributed NTILEs
# via operators.indexing.global_ntile — range-partitioned rank +
# arithmetic bucket assignment, never a single-partition global window,
# so the customer dimension can be arbitrarily large. The oracle keeps
# plain ANSI NTILE; global_ntile reproduces its semantics bit-for-bit.
# Ties break on custkey, so quartile membership is engine-identical.
@register(
    "rfm_segment_q",
    """
    WITH maxd AS (SELECT MAX(o_orderdate) AS d FROM orders),
    rfm AS (
        SELECT o_custkey AS custkey,
               date_diff('day', MAX(o_orderdate), maxd.d) AS recency_days,
               COUNT(*) AS frequency,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
        FROM orders, maxd GROUP BY o_custkey, maxd.d
    )
    SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(ROUND(CAST(monetary AS DOUBLE), 2) AS DOUBLE) AS monetary,
           CAST(NTILE(4) OVER (ORDER BY recency_days, custkey) AS BIGINT)
               AS r_score,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, custkey)
                AS BIGINT) AS f_score,
           CAST(NTILE(4) OVER (ORDER BY monetary DESC, custkey) AS BIGINT)
               AS m_score
    FROM rfm
    """,
)
def rfm_segment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    maxd = o.agg(F.max("o_orderdate").alias("d"))
    rfm = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.max("d"), F.max("o_orderdate")).alias(
                "recency_days"
            ),
            F.count("*").alias("frequency"),
            F.sum(_dec(F.col("o_totalprice"))).alias("monetary"),
        )
    )
    scored = global_ntile(
        rfm, [F.col("recency_days"), F.col("custkey")], 4, "r_score"
    )
    scored = global_ntile(
        scored, [F.col("frequency").desc(), F.col("custkey")], 4, "f_score"
    )
    scored = global_ntile(
        scored, [F.col("monetary").desc(), F.col("custkey")], 4, "m_score"
    )
    return scored.select(
        "custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        F.round(F.col("monetary").cast("double"), 2).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
    )


# Pearson correlation matrix of the lineitem numeric measures from exact
# decimal moments: one single-pass aggregation collects n, sums, squares
# and cross-products (all DECIMAL — the inputs carry fixed decimal
# precision, so every moment is EXACT and partition-order-proof); the six
# correlations are then identical double arithmetic. The built-in corr()
# is avoided deliberately: its streaming-update summation is
# engine-order-dependent.
@register(
    "correlation_matrix_q",
    """
    WITH m AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(38,8))) AS sq,
               SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS sp,
               SUM(CAST(l_discount AS DECIMAL(38,8))) AS sd,
               SUM(CAST(l_quantity AS DECIMAL(38,8))
                   * CAST(l_quantity AS DECIMAL(38,8))) AS sqq,
               SUM(CAST(l_extendedprice AS DECIMAL(38,8))
                   * CAST(l_extendedprice AS DECIMAL(38,8))) AS spp,
               SUM(CAST(l_discount AS DECIMAL(38,8))
                   * CAST(l_discount AS DECIMAL(38,8))) AS sdd,
               SUM(CAST(l_quantity AS DECIMAL(38,8))
                   * CAST(l_extendedprice AS DECIMAL(38,8))) AS sqp,
               SUM(CAST(l_quantity AS DECIMAL(38,8))
                   * CAST(l_discount AS DECIMAL(38,8))) AS sqd,
               SUM(CAST(l_extendedprice AS DECIMAL(38,8))
                   * CAST(l_discount AS DECIMAL(38,8))) AS spd
        FROM lineitem
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(ROUND((n * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
                / sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                     * (n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6)
                AS DOUBLE) AS corr_qty_price,
           CAST(ROUND((n * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
                / sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                     * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6)
                AS DOUBLE) AS corr_qty_disc,
           CAST(ROUND((n * CAST(spd AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
                / sqrt((n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                     * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6)
                AS DOUBLE) AS corr_price_disc
    FROM m
    """,
)
def correlation_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    d38 = lambda c: F.col(c).cast("decimal(38,8)")  # noqa: E731
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38("l_quantity")).alias("sq"),
        F.sum(d38("l_extendedprice")).alias("sp"),
        F.sum(d38("l_discount")).alias("sd"),
        F.sum(d38("l_quantity") * d38("l_quantity")).alias("sqq"),
        F.sum(d38("l_extendedprice") * d38("l_extendedprice")).alias("spp"),
        F.sum(d38("l_discount") * d38("l_discount")).alias("sdd"),
        F.sum(d38("l_quantity") * d38("l_extendedprice")).alias("sqp"),
        F.sum(d38("l_quantity") * d38("l_discount")).alias("sqd"),
        F.sum(d38("l_extendedprice") * d38("l_discount")).alias("spd"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        n = F.col("n")
        num = n * F.col(sxy).cast("double") - F.col(sx).cast(
            "double"
        ) * F.col(sy).cast("double")
        vx = n * F.col(sxx).cast("double") - F.col(sx).cast(
            "double"
        ) * F.col(sx).cast("double")
        vy = n * F.col(syy).cast("double") - F.col(sy).cast(
            "double"
        ) * F.col(sy).cast("double")
        return F.round(num / F.sqrt(vx * vy), 6)

    return m.select(
        F.col("n").cast("long").alias("n"),
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    )


# HITS (hubs & authorities), two synchronous iterations over the
# supplier->part bipartite supply graph, scores L1-normalized in exact
# decimal each round. Scale shape: each iteration is two edge-keyed
# aggregations (authority from hub sum, hub from authority sum) — the
# same shuffle pattern as one PageRank round; normalization constants are
# single-row decimal aggregates. Top-20 authorities reported.
@register(
    "hits_q",
    """
    WITH e AS (
        SELECT DISTINCT l_suppkey AS h, l_partkey AS a FROM lineitem
    ),
    a1r AS (SELECT a, COUNT(*) AS s FROM e GROUP BY a),
    a1n AS (SELECT SUM(s) AS z FROM a1r),
    a1 AS (SELECT a, CAST(s AS DOUBLE) / a1n.z AS sc
           FROM a1r CROSS JOIN a1n),
    h1r AS (
        SELECT e.h, CAST(SUM(CAST(a1.sc AS DECIMAL(28,12)))
                        AS DECIMAL(28,12)) AS s
        FROM e JOIN a1 ON e.a = a1.a GROUP BY e.h
    ),
    h1n AS (SELECT SUM(s) AS z FROM h1r),
    h1 AS (SELECT h, CAST(s AS DOUBLE) / CAST(h1n.z AS DOUBLE) AS sc
           FROM h1r CROSS JOIN h1n),
    a2r AS (
        SELECT e.a, CAST(SUM(CAST(h1.sc AS DECIMAL(28,12)))
                        AS DECIMAL(28,12)) AS s
        FROM e JOIN h1 ON e.h = h1.h GROUP BY e.a
    ),
    a2n AS (SELECT SUM(s) AS z FROM a2r)
    SELECT a AS part, CAST(ROUND(CAST(s AS DOUBLE) / CAST(a2n.z AS DOUBLE),
                                 8) AS DOUBLE) AS authority
    FROM a2r CROSS JOIN a2n
    ORDER BY CAST(s AS DOUBLE) / CAST(a2n.z AS DOUBLE) DESC, a
    LIMIT 20
    """,
)
def hits_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    e = li.select(
        F.col("l_suppkey").alias("h"), F.col("l_partkey").alias("a")
    ).distinct().localCheckpoint()
    a1r = e.groupBy("a").agg(F.count("*").alias("s"))
    a1n = a1r.agg(F.sum("s").alias("z"))
    a1 = a1r.crossJoin(F.broadcast(a1n)).select(
        "a", (F.col("s").cast("double") / F.col("z")).alias("sc")
    )
    h1r = (
        e.join(a1, "a")
        .groupBy("h")
        .agg(
            F.sum(F.col("sc").cast("decimal(28,12)"))
            .cast("decimal(28,12)")
            .alias("s")
        )
    )
    h1n = h1r.agg(F.sum("s").alias("z"))
    h1 = h1r.crossJoin(F.broadcast(h1n)).select(
        "h",
        (F.col("s").cast("double") / F.col("z").cast("double")).alias("sc"),
    )
    a2r = (
        e.join(h1, "h")
        .groupBy("a")
        .agg(
            F.sum(F.col("sc").cast("decimal(28,12)"))
            .cast("decimal(28,12)")
            .alias("s")
        )
    )
    a2n = a2r.agg(F.sum("s").alias("z"))
    auth = F.col("s").cast("double") / F.col("z").cast("double")
    return (
        a2r.crossJoin(F.broadcast(a2n))
        .orderBy(F.desc(auth), "a")
        .limit(20)
        .select(F.col("a").alias("part"), F.round(auth, 8).alias("authority"))
    )


# Seasonal-naive forecast backtest: predict each day's mean value by the
# same weekday one week earlier, then score MAE / MAPE / SMAPE over the
# evaluation days. Scale shape: one corpus-scale day aggregation; the
# LAG(7) forecast and the error aggregation run on the calendar-bounded
# daily table. Daily means quantize to DECIMAL(18,6) (identical on both
# engines), so errors are identical doubles and error sums are
# 12-dp-quantized.
@register(
    "forecast_eval_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    f AS (
        SELECT day, m,
               LAG(m, 7) OVER (ORDER BY day) AS yhat
        FROM daily
    ),
    e AS (
        SELECT CAST(m AS DOUBLE) AS y, CAST(yhat AS DOUBLE) AS yh
        FROM f WHERE yhat IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_days,
           CAST(ROUND(CAST(SUM(CAST(ABS(y - yh) AS DECIMAL(28,12)))
                AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS mae,
           CAST(ROUND(CAST(SUM(CAST(ABS(y - yh) / y AS DECIMAL(28,12)))
                AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS mape,
           CAST(ROUND(CAST(SUM(CAST(
                2 * ABS(y - yh) / (ABS(y) + ABS(yh))
                AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS smape
    FROM e
    """,
)
def forecast_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    f = daily.select(
        F.col("m").cast("double").alias("y"),
        F.lag(F.col("m"), 7)
        .over(Window.orderBy("day"))
        .cast("double")
        .alias("yh"),
    ).filter(F.col("yh").isNotNull())
    y, yh = F.col("y"), F.col("yh")
    n = F.count(F.lit(1))
    return f.agg(
        n.cast("long").alias("n_eval_days"),
        F.round(_dsum(F.abs(y - yh)).cast("double") / n, 6).alias("mae"),
        F.round(_dsum(F.abs(y - yh) / y).cast("double") / n, 6).alias(
            "mape"
        ),
        F.round(
            _dsum(2 * F.abs(y - yh) / (F.abs(y) + F.abs(yh))).cast("double")
            / n,
            6,
        ).alias("smape"),
    )


# CUPED variance reduction for A/B experiments: per-user post-period
# metric adjusted by the pre-period covariate, theta = cov(x,y)/var(x)
# from exact decimal moments. Scale shape: one user-keyed aggregation
# builds (x, y) per user; moments are a single-row decimal aggregate;
# the adjusted per-arm means reuse the same user table. The textbook
# sequence (fit theta, re-score, re-aggregate) stays two corpus-free
# passes over the USER table.
@register(
    "cuped_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS arm,
               SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS x,
               SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                        THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM u
    ),
    th AS (
        SELECT (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   AS theta,
               CAST(sx AS DOUBLE) / n AS mx
        FROM m
    )
    SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(ROUND(CAST(SUM(CAST(CAST(y AS DOUBLE)
                AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS raw_mean,
           CAST(ROUND(CAST(SUM(CAST(
                CAST(y AS DOUBLE) - th.theta * (CAST(x AS DOUBLE) - th.mx)
                AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS cuped_mean
    FROM u CROSS JOIN th
    GROUP BY arm, th.theta, th.mx
    """,
)
def cuped_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013): the standard production experimentation
    variance-reduction adjustment. Hash-arm assignment stands in for the
    real randomization unit."""
    ev = Catalog(spark, sf_dir).events
    cut = F.lit("2024-01-16").cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < cut, F.col("value").cast("decimal(18,6)"))
            .otherwise(F.lit(0).cast("decimal(18,6)"))
        ).alias("x"),
        F.sum(
            F.when(F.col("ts") >= cut, F.col("value").cast("decimal(18,6)"))
            .otherwise(F.lit(0).cast("decimal(18,6)"))
        ).alias("y"),
    ).select(
        (F.col("user_id") % 2).alias("arm"), "x", "y"
    ).localCheckpoint()
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    th = m.select(
        (
            (
                F.col("n") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("theta"),
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
    )
    adj = F.col("y").cast("double") - F.col("theta") * (
        F.col("x").cast("double") - F.col("mx")
    )
    n = F.count(F.lit(1))
    return (
        u.crossJoin(F.broadcast(th))
        .groupBy("arm")
        .agg(
            n.cast("long").alias("n_users"),
            F.round(
                _dsum(F.col("y").cast("double")).cast("double") / n, 6
            ).alias("raw_mean"),
            F.round(_dsum(adj).cast("double") / n, 6).alias("cuped_mean"),
        )
    )


# ===========================================================================
# Batch L — graph structure metrics and lexical/manifold diagnostics.
# ===========================================================================


# Newman modularity of the co-purchase graph under the part-brand
# partition: Q = sum_c [ e_c/m - (d_c/2m)^2 ]. Scale shape: edges from
# the bounded wedge join; intra-community edge counts and community
# degree sums are two vocab-keyed aggregations joined to the broadcast
# part-brand dim; the Q fold runs over the |brands|-row table. Integer
# counts to the last division.
@register(
    "modularity_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    lab AS (SELECT p_partkey, p_brand FROM part),
    el AS (
        SELECT la.p_brand AS ca, lb.p_brand AS cb
        FROM e JOIN lab la ON e.a = la.p_partkey
               JOIN lab lb ON e.b = lb.p_partkey
    ),
    m AS (SELECT COUNT(*) AS m FROM el),
    intra AS (
        SELECT ca AS c, COUNT(*) AS ec FROM el WHERE ca = cb GROUP BY ca
    ),
    degs AS (
        SELECT c, SUM(d) AS dc FROM (
            SELECT ca AS c, COUNT(*) AS d FROM el GROUP BY ca
            UNION ALL
            SELECT cb AS c, COUNT(*) AS d FROM el GROUP BY cb) u
        GROUP BY c
    )
    SELECT CAST(m.m AS BIGINT) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(ROUND(CAST(SUM(CAST(
               CAST(COALESCE(i.ec, 0) AS DOUBLE) / m.m
               - (CAST(d.dc AS DOUBLE) / (2 * m.m))
                 * (CAST(d.dc AS DOUBLE) / (2 * m.m))
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE) AS modularity
    FROM degs d LEFT JOIN intra i ON d.c = i.c CROSS JOIN m
    GROUP BY m.m
    """,
)
def modularity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    lab = cat.part.select("p_partkey", "p_brand")
    el = (
        e.join(
            F.broadcast(lab.select(F.col("p_partkey").alias("a"),
                                   F.col("p_brand").alias("ca"))), "a"
        )
        .join(
            F.broadcast(lab.select(F.col("p_partkey").alias("b"),
                                   F.col("p_brand").alias("cb"))), "b"
        )
        .select("ca", "cb")
        .localCheckpoint()
    )
    m = el.agg(F.count(F.lit(1)).alias("m"))
    intra = (
        el.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count("*").alias("ec"))
    )
    degs = (
        el.select(F.col("ca").alias("c"))
        .unionAll(el.select(F.col("cb").alias("c")))
        .groupBy("c")
        .agg(F.count("*").alias("dc"))
    )
    term = (
        F.coalesce(F.col("ec"), F.lit(0)).cast("double") / F.col("m")
        - (F.col("dc").cast("double") / (2 * F.col("m")))
        * (F.col("dc").cast("double") / (2 * F.col("m")))
    )
    return (
        degs.join(intra, "c", "left")
        .crossJoin(F.broadcast(m))
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.round(_dsum(term).cast("double"), 6).alias("modularity"),
        )
        .select(
            F.col("m").cast("long").alias("n_edges"),
            "n_communities",
            "modularity",
        )
    )


# Degree assortativity: the Pearson correlation of endpoint degrees over
# edges (Newman 2002) — positive means hubs link hubs. Scale shape:
# reuses the exact-decimal-moments correlation pattern over the
# (symmetrized) edge-endpoint degree pairs; degrees come from one
# vocab-keyed aggregation. No windows, no sorts.
@register(
    "assortativity_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        GROUP BY n
    ),
    pairs AS (
        SELECT da.d AS x, db.d AS y
        FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
        UNION ALL
        SELECT db.d AS x, da.d AS y
        FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
    ),
    m AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(x AS DECIMAL(38,4))) AS sx,
               SUM(CAST(y AS DECIMAL(38,4))) AS sy,
               SUM(CAST(x AS DECIMAL(38,4)) * CAST(x AS DECIMAL(38,4)))
                   AS sxx,
               SUM(CAST(y AS DECIMAL(38,4)) * CAST(y AS DECIMAL(38,4)))
                   AS syy,
               SUM(CAST(x AS DECIMAL(38,4)) * CAST(y AS DECIMAL(38,4)))
                   AS sxy
        FROM pairs
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           CAST(ROUND((n * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / sqrt((n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (n * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                AS DOUBLE) AS assortativity
    FROM m
    """,
)
def assortativity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    ed = e.join(
        deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    pairs = ed.select(
        F.col("da").alias("x"), F.col("db").alias("y")
    ).unionAll(ed.select(F.col("db").alias("x"), F.col("da").alias("y")))
    d38 = lambda c: F.col(c).cast("decimal(38,4)")  # noqa: E731
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38("x")).alias("sx"),
        F.sum(d38("y")).alias("sy"),
        F.sum(d38("x") * d38("x")).alias("sxx"),
        F.sum(d38("y") * d38("y")).alias("syy"),
        F.sum(d38("x") * d38("y")).alias("sxy"),
    )
    n = F.col("n")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    vy = n * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    return m.select(
        (n / 2).cast("long").alias("n_edges"),
        F.round(num / F.sqrt(vx * vy), 6).alias("assortativity"),
    )


# Per-source lexical health: hapax-legomena ratio (types seen once /
# types) and mean burstiness (collection frequency / document frequency
# of the source's tokens). Scale shape: one (source, token) aggregation
# carrying two counts; ratios fold over the per-source vocab table.
@register(
    "lexical_stats_q",
    f"""
    WITH t AS (
        SELECT source, doc_id, unnest({_SQL_TOKENS}) AS tok
        FROM documents
    ),
    v AS (
        SELECT source, tok, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
        FROM t GROUP BY source, tok
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(cf) AS BIGINT) AS n_tokens,
           CAST(ROUND(CAST(SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS hapax_ratio,
           CAST(ROUND(CAST(SUM(CAST(CAST(cf AS DOUBLE) / df
                AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS mean_burstiness
    FROM v GROUP BY source
    """,
)
def lexical_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High hapax ratio flags noisy/OCR text; burstiness >> 1 flags
    templated repetition (Church & Gale: real words are bursty, function
    words are not)."""
    d = Catalog(spark, sf_dir).documents
    t = d.select(
        "source", "doc_id", F.explode(_tokens("text")).alias("tok")
    )
    v = t.groupBy("source", "tok").agg(
        F.count("*").alias("cf"), F.countDistinct("doc_id").alias("df")
    )
    n = F.count(F.lit(1))
    return v.groupBy("source").agg(
        n.cast("long").alias("n_types"),
        F.sum("cf").cast("long").alias("n_tokens"),
        F.round(
            F.sum(F.when(F.col("cf") == 1, 1).otherwise(0)).cast("double")
            / n,
            6,
        ).alias("hapax_ratio"),
        F.round(
            _dsum(F.col("cf").cast("double") / F.col("df")).cast("double")
            / n,
            6,
        ).alias("mean_burstiness"),
    )


# TwoNN intrinsic-dimension estimate (Facco et al. 2017) from a 50-point
# probe sample: id = n / sum(ln(r2/r1)) over each probe's two nearest
# neighbors. Scale shape: probes BROADCAST against the corpus (the
# knn_bruteforce contract — corpus never shuffles); per-probe top-2 via
# one window over |probes| x |corpus| scored rows; the estimator folds
# over 50 rows. Distances round to 6 dp for engine-identical ranking.
@register(
    "twonn_dim_q",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 50),
    scored AS (
        SELECT q.qid, c.vec_id,
               ROUND(list_reduce(
                   list_transform(range(1, len(c.v)+1),
                       i -> (c.v[i] - q.qv[i]) * (c.v[i] - q.qv[i])),
                   (x, y) -> x + y), 6) AS d2,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY ROUND(list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - q.qv[i]) * (c.v[i] - q.qv[i])),
                       (x, y) -> x + y), 6), c.vec_id) AS rn
        FROM e c CROSS JOIN q WHERE c.vec_id <> q.qid
    ),
    nn AS (
        SELECT qid,
               MAX(CASE WHEN rn = 1 THEN d2 END) AS d1,
               MAX(CASE WHEN rn = 2 THEN d2 END) AS d2_
        FROM scored WHERE rn <= 2 GROUP BY qid
    ),
    ratios AS (
        SELECT qid, 0.5 * ln(d2_ / d1) AS lr
        FROM nn WHERE d1 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(ROUND(COUNT(*) / CAST(SUM(CAST(lr AS DECIMAL(28,12)))
                AS DOUBLE), 4) AS DOUBLE) AS intrinsic_dim
    FROM ratios
    """,
)
def twonn_dim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifold diagnostics for the embedding corpus: the TwoNN MLE needs
    only each probe's two nearest neighbors, so a bounded probe sample
    estimates the dimension without any pairwise corpus work."""
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", d2.alias("d2"))
    )
    w = Window.partitionBy("qid").orderBy("d2", "vec_id")
    nn = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("qid")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("d2"))).alias("d1"),
            F.max(F.when(F.col("rn") == 2, F.col("d2"))).alias("d2_"),
        )
    )
    ratios = nn.filter(F.col("d1") > 0).select(
        (0.5 * F.log(F.col("d2_") / F.col("d1"))).alias("lr")
    )
    n = F.count(F.lit(1))
    return ratios.agg(
        n.cast("long").alias("n_probes"),
        F.round(n / _dsum(F.col("lr")).cast("double"), 4).alias(
            "intrinsic_dim"
        ),
    )


# ===========================================================================
# Batch M — privacy release, robust trend, corpus organization.
# ===========================================================================


# Differentially-private-style count release with DETERMINISTIC discrete
# Laplace noise: the inverse-CDF of Geometric-difference noise applied to
# a content-keyed uniform (poly_hash of the group key), epsilon = 1,
# sensitivity 1. A production DP pipeline swaps the hash-uniform for a
# secure RNG — everything else (per-group noise draw, post-processing
# clamp at 0, the epsilon bookkeeping column) is the real release shape,
# and the deterministic stand-in keeps the query oracle-checkable and
# partition-invariant. Scale shape: one count shuffle; noise is per-GROUP
# (metadata-scale) arithmetic.
@register(
    "dp_counts_q",
    f"""
    WITH g AS (
        SELECT c_mktsegment AS seg, COUNT(*) AS true_count
        FROM customer GROUP BY c_mktsegment
    ),
    u AS (
        SELECT seg, true_count,
               (CAST({_SQL_POLY.format(s="'dp:' || seg")} % 999983
                     AS DOUBLE) + 0.5) / 999983 AS uu
        FROM g
    ),
    nz AS (
        SELECT seg, true_count,
               CASE WHEN uu < 0.5
                    THEN CAST(floor(ln(2 * uu) / ln(exp(-1.0))) AS BIGINT)
                    ELSE -CAST(floor(ln(2 * (1 - uu)) / ln(exp(-1.0)))
                               AS BIGINT)
               END AS noise
        FROM u
    )
    SELECT seg, CAST(true_count AS BIGINT) AS true_count,
           CAST(noise AS BIGINT) AS noise,
           CAST(GREATEST(true_count + noise, 0) AS BIGINT)
               AS released_count,
           CAST(1.0 AS DOUBLE) AS epsilon
    FROM nz
    """,
)
def dp_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    g = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").alias("true_count")
    )
    uu = (
        (
            poly_hash(F.concat(F.lit("dp:"), F.col("seg"))) % 999983
        ).cast("double")
        + 0.5
    ) / 999983
    lam = F.log(F.exp(F.lit(-1.0)))  # ln(e^-eps), eps = 1
    noise = F.when(
        uu < 0.5, F.floor(F.log(2 * uu) / lam).cast("long")
    ).otherwise(-F.floor(F.log(2 * (1 - uu)) / lam).cast("long"))
    return g.select(
        "seg",
        F.col("true_count").cast("long").alias("true_count"),
        noise.alias("noise"),
        F.greatest(
            F.col("true_count") + noise, F.lit(0).cast("long")
        ).alias("released_count"),
        F.lit(1.0).alias("epsilon"),
    )


# Theil–Sen robust trend over the daily event-value series: the median of
# all pairwise slopes. Scale shape: the corpus collapses to the
# calendar-bounded daily table FIRST (one shuffle); the O(days^2) slope
# set and its median-by-row_number run on that bounded table only —
# at a century of days that is ~666k pairs, still metadata. Daily means
# quantize to DECIMAL(18,6), so slopes are identical doubles and the
# median element is engine-identical.
@register(
    "theil_sen_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'click'
        GROUP BY CAST(ts AS DATE),
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
    ),
    slopes AS (
        SELECT a.x AS xa, b.x AS xb,
               CAST(b.m - a.m AS DOUBLE) / (b.x - a.x) AS s
        FROM daily a JOIN daily b ON b.x > a.x
    ),
    ranked AS (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s, xa, xb) AS rn,
               COUNT(*) OVER () AS n
        FROM slopes
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
           CAST(ROUND(CAST(SUM(CASE WHEN rn * 2 IN (n, n + 1, n + 2)
                          THEN CAST(s AS DECIMAL(28,12)) ELSE 0 END)
                AS DOUBLE)
                / SUM(CASE WHEN rn * 2 IN (n, n + 1, n + 2)
                      THEN 1 ELSE 0 END), 6) AS DOUBLE) AS theil_sen_slope
    FROM ranked
    """,
)
def theil_sen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-slopes trend: immune to the outlier days that pull OLS.
    Median = mean of the middle one (odd n) or two (even n) ranked
    slopes, with (xa, xb) tiebreaks so the picked rows are deterministic."""
    e = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "click")
    daily = e.groupBy(
        F.to_date("ts").alias("day"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "x"
        ),
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    a = daily.select(F.col("x").alias("xa"), F.col("m").alias("ma"))
    b = daily.select(F.col("x").alias("xb"), F.col("m").alias("mb"))
    slopes = (
        a.join(b, F.col("xb") > F.col("xa"))
        .select(
            "xa",
            "xb",
            (
                (F.col("mb") - F.col("ma")).cast("double")
                / (F.col("xb") - F.col("xa"))
            ).alias("s"),
        )
    )
    w = Window.orderBy("s", "xa", "xb")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = slopes.select(
        "s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    mid = (
        (F.col("rn") * 2 == F.col("n"))
        | (F.col("rn") * 2 == F.col("n") + 1)
        | (F.col("rn") * 2 == F.col("n") + 2)
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.round(
            F.sum(
                F.when(mid, F.col("s").cast("decimal(28,12)")).otherwise(
                    F.lit(0).cast("decimal(28,12)")
                )
            ).cast("double")
            / F.sum(F.when(mid, 1).otherwise(0)),
            6,
        ).alias("theil_sen_slope"),
    )


# Source-similarity matrix: cosine between source token-count profiles
# restricted to the global top-200 vocabulary. Scale shape: the profile
# table is |sources| x 200 after one corpus-scale count shuffle; the
# pairwise cosine runs on that bounded profile table (sources are
# organizational metadata, never corpus-scale). Exact integer dot
# products; one final double division.
@register(
    "source_similarity_q",
    f"""
    WITH t AS (
        SELECT source, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    top AS (
        SELECT tok, COUNT(*) AS tot FROM t GROUP BY tok
        ORDER BY tot DESC, tok LIMIT 200
    ),
    prof AS (
        SELECT t.source, t.tok, COUNT(*) AS c
        FROM t JOIN top ON t.tok = top.tok
        GROUP BY t.source, t.tok
    ),
    norms AS (
        SELECT source, SUM(c * c) AS nn FROM prof GROUP BY source
    ),
    dots AS (
        SELECT a.source AS sa, b.source AS sb, SUM(a.c * b.c) AS dot
        FROM prof a JOIN prof b ON a.tok = b.tok AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT sa, sb,
           CAST(ROUND(CAST(dot AS DOUBLE)
                / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)), 6)
                AS DOUBLE) AS cosine
    FROM dots JOIN norms na ON sa = na.source
              JOIN norms nb ON sb = nb.source
    ORDER BY cosine DESC, sa, sb LIMIT 30
    """,
)
def source_similarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources publish near-identical vocabularies (mirror feeds,
    syndication networks) — the corpus-organization signal behind source-
    level dedup decisions."""
    d = Catalog(spark, sf_dir).documents
    t = d.select("source", F.explode(_tokens("text")).alias("tok"))
    t = t.localCheckpoint()
    top = (
        t.groupBy("tok")
        .agg(F.count("*").alias("tot"))
        .orderBy(F.desc("tot"), "tok")
        .limit(200)
    )
    prof = (
        t.join(F.broadcast(top.select("tok")), "tok")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    norms = prof.groupBy("source").agg(
        F.sum(F.col("c") * F.col("c")).alias("nn")
    )
    a = prof.select(
        F.col("source").alias("sa"), "tok", F.col("c").alias("ca")
    )
    b = prof.select(
        F.col("source").alias("sb"), "tok", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "tok")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return (
        dots.join(
            norms.select(F.col("source").alias("sa"), F.col("nn").alias("na")),
            "sa",
        )
        .join(
            norms.select(F.col("source").alias("sb"), F.col("nn").alias("nb")),
            "sb",
        )
        .orderBy(F.desc(cos), "sa", "sb")
        .limit(30)
        .select("sa", "sb", F.round(cos, 6).alias("cosine"))
    )


# Exact median without a global sort: the two-pass selection algorithm.
# Pass 1 histograms values into 1024 bins (one map-side-combined count
# shuffle; the bin table is metadata and is collected to pick the target
# bin and within-bin offset for each middle rank). Pass 2 ranks ONLY the
# rows of the target bin(s) — expected n/1024 rows — with a deterministic
# tiebreak. This is how an exact order statistic survives 100 TB: the
# oracle's ROW_NUMBER-over-everything formulation is the semantics, not
# the plan. Values stay DECIMAL(18,4) end-to-end (exact), so the picked
# elements are engine-identical.
@register(
    "exact_median_q",
    """
    WITH r AS (
        SELECT CAST(l_extendedprice AS DECIMAL(18,4)) AS v,
               ROW_NUMBER() OVER (ORDER BY CAST(l_extendedprice
                   AS DECIMAL(18,4)), l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER () AS n
        FROM lineitem
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS DOUBLE)
               AS median_lo,
           CAST(MAX(CASE WHEN rn = (n + 2) // 2 THEN v END) AS DOUBLE)
               AS median_hi
    FROM r
    """,
)
def exact_median_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select(
        _dec(F.col("l_extendedprice")).alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    st = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    n, lo, hi = st["n"], float(st["lo"]), float(st["hi"])
    # middle ranks: lower median and (even n) upper median
    ks = sorted({(n + 1) // 2, n // 2 + 1})
    width = max((hi - lo) / 1024.0, 1e-9)
    binned = li.select(
        "v",
        "l_orderkey",
        "l_linenumber",
        F.least(
            F.floor((F.col("v").cast("double") - lo) / width).cast("int"),
            F.lit(1023),
        ).alias("bin"),
    )
    hist = {
        r["bin"]: r["c"]
        for r in binned.groupBy("bin").agg(F.count("*").alias("c")).collect()
    }  # <= 1024 rows — metadata
    picked = []
    for k in ks:
        cum = 0
        for b in range(1024):
            c = hist.get(b, 0)
            if cum + c >= k:
                picked.append((k, b, k - cum))
                break
            cum += c
    from iniz_exporters_spark.operators.indexing import global_index

    vals = []
    for _, b, j in picked:
        # rank ONLY the target bin, and do even that distributed: the
        # bin still holds ~n/1024 rows (a 10^9-row single window task at
        # 100 TB), so the rank comes from the range-partitioned
        # global_index, never an unpartitioned window (VERDICT r6 #2).
        row = (
            global_index(
                binned.filter(F.col("bin") == b),
                ["v", "l_orderkey", "l_linenumber"],
                "rn",
            )
            .filter(F.col("rn") == j)
            .select("v")
            .collect()
        )
        vals.append(float(row[0]["v"]))
    # lower/upper medians reported EXACTLY (4-dp decimals cast to double)
    # — averaging them would reintroduce a .5-at-5th-dp rounding boundary
    lo_med = vals[0]
    hi_med = vals[-1]
    return spark.createDataFrame(
        [(int(n), lo_med, hi_med)],
        "n long, median_lo double, median_hi double",
    )


# Event-driven cumulative sum with resets: per-user running value total
# that restarts at every 'signup' event — the islands are defined by the
# DATA (reset markers), not by time gaps (which sessionize_events
# covers). Scale shape: two stacked windows per user partition (a running
# reset-count forms the island id, then a running decimal sum within the
# island); no self-joins, parallel across users. Value sums stay in
# exact decimal.
@register(
    "running_balance_resets_q",
    """
    WITH marked AS (
        SELECT user_id, event_id, ts, event_type, value,
               SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS island
        FROM events
    ),
    summed AS (
        SELECT user_id, event_id, island,
               SUM(CASE WHEN event_type <> 'signup'
                        THEN CAST(value AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END)
                   OVER (PARTITION BY user_id, island
                         ORDER BY ts, event_id) AS bal
        FROM marked
    )
    SELECT user_id, CAST(COUNT(DISTINCT island) AS BIGINT) AS n_islands,
           CAST(ROUND(CAST(MAX(bal) AS DOUBLE), 4) AS DOUBLE)
               AS max_balance,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM summed GROUP BY user_id
    """,
)
def running_balance_resets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        )
        .over(wu)
        .alias("island"),
    )
    wi = Window.partitionBy("user_id", "island").orderBy("ts", "event_id")
    summed = marked.select(
        "user_id",
        "island",
        F.sum(
            F.when(
                F.col("event_type") != "signup",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .over(wi)
        .alias("bal"),
    )
    return summed.groupBy("user_id").agg(
        F.countDistinct("island").cast("long").alias("n_islands"),
        F.round(F.max("bal").cast("double"), 4).alias("max_balance"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# ===========================================================================
# Batch N — graph ML, readability, and supervised embedding eval.
# ===========================================================================


# Two synchronous rounds of label propagation over the co-purchase graph,
# seeded with node ids: each round every node takes the most frequent
# neighbor label (ties -> smallest label). Bounded-round LP is the
# shuffle-friendly community sketch (vs the fixpoint components, which
# plans/graph.py covers); two rounds = two neighbor-label aggregations,
# each one vocab-keyed shuffle. All tie-breaks are total orders, so the
# labels are engine-identical.
@register(
    "label_propagation_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    ud AS (
        SELECT a AS n, b AS m FROM e UNION ALL SELECT b AS n, a AS m FROM e
    ),
    l1 AS (
        SELECT n, lab FROM (
            SELECT n, lab, ROW_NUMBER() OVER (PARTITION BY n
                       ORDER BY c DESC, lab) AS rn
            FROM (SELECT n, m AS lab, COUNT(*) AS c FROM ud GROUP BY n, m)
        ) WHERE rn = 1
    ),
    l2 AS (
        SELECT n, lab FROM (
            SELECT u.n, l1.lab,
                   ROW_NUMBER() OVER (PARTITION BY u.n
                       ORDER BY COUNT(*) DESC, l1.lab) AS rn
            FROM ud u JOIN l1 ON u.m = l1.n
            GROUP BY u.n, l1.lab
        ) WHERE rn = 1
    )
    SELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM l2 GROUP BY lab
    ORDER BY n_members DESC, community LIMIT 25
    """,
)
def label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ud = (
        e.select(F.col("a").alias("n"), F.col("b").alias("m"))
        .unionAll(e.select(F.col("b").alias("n"), F.col("a").alias("m")))
        .localCheckpoint()
    )

    def top_label(labeled):
        w = Window.partitionBy("n").orderBy(F.desc("c"), "lab")
        return (
            labeled.groupBy("n", "lab")
            .agg(F.count("*").alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("n", "lab")
        )

    l1 = top_label(ud.select("n", F.col("m").alias("lab")))
    l2 = top_label(
        ud.join(l1.select(F.col("n").alias("m"), "lab"), "m").select(
            "n", "lab"
        )
    )
    return (
        l2.groupBy(F.col("lab").alias("community"))
        .agg(F.count("*").cast("long").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(25)
    )


# Per-doc readability: Flesch-style reading ease and LIX from sentence
# count, word count, and long-word/vowel-group proxies — the quality-
# filter family's doc-structure signal, pure per-row Catalyst (no
# shuffles at all until the per-source rollup).
@register(
    "readability_q",
    f"""
    WITH s AS (
        SELECT doc_id, source,
               greatest(len(list_filter(
                   list_transform(regexp_split_to_array(text, '[.!?]+'),
                       x -> trim(x)), x -> x <> '')), 1) AS n_sents,
               {_SQL_TOKENS} AS t
        FROM documents
    ),
    w AS (
        SELECT doc_id, source, n_sents,
               greatest(len(t), 1) AS n_words,
               len(list_filter(t, x -> length(x) > 6)) AS n_long,
               greatest(list_sum(list_transform(t,
                   x -> len(regexp_extract_all(x, '[aeiouy]+')))), 1)
                   AS n_syll
        FROM s
    )
    SELECT doc_id, source,
           CAST(ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 4) AS DOUBLE)
               AS flesch,
           CAST(ROUND(CAST(n_words AS DOUBLE) / n_sents
                + 100.0 * n_long / n_words, 4) AS DOUBLE) AS lix
    FROM w
    """,
)
def readability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease (vowel-group syllable proxy) and LIX. Both are
    per-row arithmetic over counts the sentence/token expressions already
    produce — the canonical cheap quality signals before any model-based
    scorer runs."""
    d = Catalog(spark, sf_dir).documents
    sents = F.filter(
        F.transform(F.split("text", r"[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    t = _tokens("text")
    n_sents = F.greatest(F.size(sents), F.lit(1))
    n_words = F.greatest(F.size(t), F.lit(1))
    n_long = F.size(F.filter(t, lambda x: F.length(x) > 6))
    n_syll = F.greatest(
        F.aggregate(
            F.transform(
                t,
                lambda x: F.size(
                    F.regexp_extract_all(x, F.lit("[aeiouy]+"), 0)
                ),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ),
        F.lit(1),
    )
    return d.select(
        "doc_id",
        "source",
        F.round(
            206.835
            - 1.015 * (n_words.cast("double") / n_sents)
            - 84.6 * (n_syll.cast("double") / n_words),
            4,
        ).alias("flesch"),
        F.round(
            n_words.cast("double") / n_sents + 100.0 * n_long / n_words, 4
        ).alias("lix"),
    )


# Nearest-centroid classifier over the labeled embeddings: centroids fit
# on even vec_ids (exact decimal per-dimension means), evaluated on odd
# vec_ids. Scale shape: the model is |labels| x d metadata broadcast as
# literals; scoring is per-row arithmetic; accuracy is one count
# aggregation. The supervised complement to cluster_nmi_q.
@register(
    "nc_classifier_q",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    cent AS (
        SELECT label, i,
               ROUND(CAST(avg(val) AS DECIMAL(28,12)), 6)::DOUBLE AS m
        FROM (SELECT label, i, v[i] AS val
              FROM e, unnest(range(1, len(v)+1)) AS t(i)
              WHERE vec_id % 2 = 0)
        GROUP BY label, i
    ),
    cv AS (SELECT label, list(m ORDER BY i) AS cvec FROM cent GROUP BY label),
    scored AS (
        SELECT t.vec_id, t.label AS true_label, c.label AS pred,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
                   ROUND(list_reduce(
                       list_transform(range(1, len(t.v)+1),
                           i -> (t.v[i] - c.cvec[i]) * (t.v[i] - c.cvec[i])),
                       (x, y) -> x + y), 6), c.label) AS rn
        FROM e t CROSS JOIN cv c WHERE t.vec_id % 2 = 1
    )
    SELECT true_label,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(ROUND(CAST(SUM(CASE WHEN pred = true_label
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
                AS DOUBLE) AS accuracy
    FROM scored WHERE rn = 1
    GROUP BY true_label
    """,
)
def nc_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(spark, sf_dir).embeddings
    train = emb.filter(F.col("vec_id") % 2 == 0)
    cents = (
        train.select("label", F.posexplode("embedding").alias("i", "val"))
        .groupBy("label", "i")
        .agg(
            F.round(
                F.avg(F.col("val").cast("double")).cast("decimal(28,12)"), 6
            )
            .cast("double")
            .alias("m")
        )
        .collect()  # |labels| x d — metadata
    )
    by_label: dict[int, list[float]] = {}
    for r in cents:
        by_label.setdefault(r["label"], [0.0] * 64)[r["i"]] = r["m"]
    test = emb.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dcols = []
    for lab in sorted(by_label):
        cent = F.array(*[F.lit(float(x)) for x in by_label[lab]])
        d2 = F.round(
            F.aggregate(
                F.zip_with(
                    F.col("v"), cent, lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, t2: acc + t2,
            ),
            6,
        )
        dcols.append(F.struct(d2.alias("d"), F.lit(lab).alias("lab")))
    pred = F.array_min(F.array(*dcols))["lab"]
    scored = test.select("true_label", pred.alias("pred"))
    return scored.groupBy("true_label").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.when(F.col("pred") == F.col("true_label"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.round(
            F.sum(
                F.when(F.col("pred") == F.col("true_label"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


# Skip-gram (center, context) pair generation with frequency
# subsampling — the word2vec training-data builder. Window = +/-2;
# frequent centers are dropped with the Mikolov keep-probability
# evaluated against a content-keyed uniform, so the sample is
# deterministic and partition-invariant. Scale shape: pair explosion is
# per-row (positions x 4); the only shuffles are the frequency count and
# the final pair count, both vocab-keyed.
@register(
    "skipgram_pairs_q",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    n AS (SELECT SUM(len(t)) AS n_tokens FROM toks),
    freq AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ),
    pos AS (
        SELECT doc_id, t, i, t[i] AS center
        FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
    ),
    kept AS (
        SELECT p.doc_id, p.t, p.i, p.center
        FROM pos p JOIN freq f ON p.center = f.tok CROSS JOIN n
        WHERE (CAST({_SQL_POLY.format(
                  s="p.doc_id::VARCHAR || ':' || p.i::VARCHAR")} % 100000
               AS DOUBLE)) / 100000
              < least(1.0, sqrt(0.001 * n.n_tokens / f.c))
    ),
    pairs AS (
        SELECT center, t[i + o] AS context
        FROM kept, unnest([-2, -1, 1, 2]) AS w(o)
        WHERE i + o >= 1 AND i + o <= len(t)
    )
    SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY center, context
    ORDER BY n_pairs DESC, center, context LIMIT 30
    """,
)
def skipgram_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mikolov subsampled skip-gram pairs: keep-prob sqrt(1e-3 * N / f)
    per CENTER occurrence, uniform from poly_hash(doc:pos) — the
    deterministic stand-in for the trainer's RNG."""
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", _tokens("text").alias("t")).localCheckpoint()
    n = toks.agg(F.sum(F.size("t")).alias("n_tokens"))
    freq = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    pos = toks.select(
        "doc_id",
        "t",
        F.posexplode("t").alias("i0", "center"),
    ).select(
        "doc_id", "t", (F.col("i0") + 1).alias("i"), "center"
    )
    u = (
        poly_hash(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("i").cast("string"),
            )
        )
        % 100000
    ).cast("double") / 100000
    keep = u < F.least(
        F.lit(1.0),
        F.sqrt(0.001 * F.col("n_tokens") / F.col("c")),
    )
    kept = (
        pos.join(freq, pos.center == freq.tok)
        .crossJoin(F.broadcast(n))
        .filter(keep)
        .select("doc_id", "t", "i", "center")
    )
    pairs = kept.select(
        "center",
        F.explode(F.array(F.lit(-2), F.lit(-1), F.lit(1), F.lit(2))).alias(
            "o"
        ),
        "t",
        "i",
    ).filter(
        (F.col("i") + F.col("o") >= 1)
        & (F.col("i") + F.col("o") <= F.size("t"))
    ).select(
        "center",
        F.element_at("t", F.col("i") + F.col("o")).alias("context"),
    )
    return (
        pairs.groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "center", "context")
        .limit(30)
    )


# Sparse TF-IDF document similarity: top-20 doc pairs by cosine over
# tf-idf vectors, with candidates generated ONLY through rare tokens
# (df <= 10% of docs) — the standard sparse-similarity-join trick: stopword-ish
# high-df tokens generate no candidates (they dominate neither the
# cosine nor, now, the join), so the token-keyed pair join stays
# df-bounded instead of exploding quadratically on common words. The
# full cosine over ALL shared tokens is then computed for just those
# candidate pairs via one more vocab-keyed join.
@register(
    "doc_cosine_sparse_q",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    nd AS (SELECT COUNT(*) AS nd FROM toks),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
        GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    w AS (
        SELECT tf.doc_id, tf.tok,
               tf.tf * ln(CAST(nd.nd AS DOUBLE) / df.df) AS w
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN nd
    ),
    norms AS (
        SELECT doc_id,
               CAST(SUM(CAST(w * w AS DECIMAL(28,12))) AS DOUBLE) AS nn
        FROM w GROUP BY doc_id
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM tf a JOIN tf b ON a.tok = b.tok AND a.doc_id < b.doc_id
        JOIN df ON a.tok = df.tok CROSS JOIN nd
        WHERE df.df * 10 <= nd.nd
    ),
    dots AS (
        SELECT c.da, c.db,
               CAST(SUM(CAST(wa.w * wb.w AS DECIMAL(28,12))) AS DOUBLE)
                   AS dot
        FROM cand c
        JOIN w wa ON wa.doc_id = c.da
        JOIN w wb ON wb.doc_id = c.db AND wa.tok = wb.tok
        GROUP BY c.da, c.db
    )
    SELECT da, db,
           CAST(ROUND(dot / sqrt(na.nn * nb.nn), 6) AS DOUBLE) AS cosine
    FROM dots JOIN norms na ON da = na.doc_id
              JOIN norms nb ON db = nb.doc_id
    ORDER BY dot / sqrt(na.nn * nb.nn) DESC, da, db LIMIT 20
    """,
)
def doc_cosine_sparse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    tf = (
        d.select("doc_id", F.explode(_tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    nd = tf.select("doc_id").distinct().count()
    df = tf.groupBy("tok").agg(F.count("*").alias("df")).localCheckpoint()
    w = (
        tf.join(df, "tok")
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf")
                * F.log(F.lit(float(nd)) / F.col("df"))
            ).alias("w"),
        )
        .localCheckpoint()
    )
    norms = w.groupBy("doc_id").agg(
        _dsum(F.col("w") * F.col("w")).cast("double").alias("nn")
    )
    rare = df.filter(F.col("df") * 10 <= F.lit(int(nd))).select("tok")
    ta = tf.join(rare, "tok").select("tok", F.col("doc_id").alias("da"))
    tb = tf.join(rare, "tok").select("tok", F.col("doc_id").alias("db"))
    cand = (
        ta.join(tb, "tok")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    wa = w.select(F.col("doc_id").alias("da"), "tok", F.col("w").alias("wa"))
    wb = w.select(F.col("doc_id").alias("db"), "tok", F.col("w").alias("wb"))
    dots = (
        cand.join(wa, "da")
        .join(wb, ["db", "tok"])
        .groupBy("da", "db")
        .agg(_dsum(F.col("wa") * F.col("wb")).cast("double").alias("dot"))
    )
    cos = F.col("dot") / F.sqrt(F.col("na") * F.col("nb"))
    return (
        dots.join(
            norms.select(F.col("doc_id").alias("da"), F.col("nn").alias("na")),
            "da",
        )
        .join(
            norms.select(F.col("doc_id").alias("db"), F.col("nn").alias("nb")),
            "db",
        )
        .orderBy(F.desc(cos), "da", "db")
        .limit(20)
        .select("da", "db", F.round(cos, 6).alias("cosine"))
    )


# Calendar feature generation: the standard time-feature block (day
# index, day-of-week, week, month, month-end flag, cyclical sin/cos
# encodings) materialized per distinct event day. Scale shape: one
# corpus-scale distinct-day shuffle; everything else is per-row codegen
# over the calendar-bounded table. Trig outputs round to 6 dp (libm skew
# absorbed, as in benford_audit_q).
@register(
    "calendar_features_q",
    """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    f AS (
        SELECT day,
               date_diff('day', DATE '2024-01-01', day) AS day_idx,
               date_diff('day', DATE '2024-01-01', day) % 7 AS dow,
               date_diff('day', DATE '2024-01-01', day) // 7 AS week,
               EXTRACT(MONTH FROM day) AS month,
               day = last_day(day) AS is_month_end
        FROM days
    )
    SELECT day, CAST(day_idx AS BIGINT) AS day_idx,
           CAST(dow AS BIGINT) AS dow,
           CAST(week AS BIGINT) AS week,
           CAST(month AS BIGINT) AS month,
           is_month_end,
           CAST(ROUND(sin(2 * pi() * dow / 7), 6) AS DOUBLE) AS dow_sin,
           CAST(ROUND(cos(2 * pi() * dow / 7), 6) AS DOUBLE) AS dow_cos
    FROM f
    """,
)
def calendar_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    day_idx = F.datediff(
        F.col("day"), F.lit("2024-01-01").cast("date")
    )
    dow = day_idx % 7
    pi = 3.141592653589793
    return days.select(
        "day",
        day_idx.cast("long").alias("day_idx"),
        dow.cast("long").alias("dow"),
        F.expr(
            "datediff(day, date'2024-01-01') div 7"
        ).cast("long").alias("week"),
        F.month("day").cast("long").alias("month"),
        (F.col("day") == F.last_day("day")).alias("is_month_end"),
        F.round(F.sin(2 * pi * dow / 7), 6).alias("dow_sin"),
        F.round(F.cos(2 * pi * dow / 7), 6).alias("dow_cos"),
    )


# Exact interpolated percentile bands (p10/p50/p90) of the event value
# per day — the SLO/telemetry band chart. Exercises the exact percentile
# aggregate's cross-engine parity (Spark `percentile` and DuckDB
# `quantile_cont` share the linear-interpolation definition; inputs are
# the same exact doubles, so the interpolation arithmetic is identical).
# Scale shape: one day-keyed shuffle; each group's percentile is exact
# within the day partition.
@register(
    "daily_bands_q",
    """
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(quantile_cont(value, 0.1), 6) AS DOUBLE) AS p10,
           CAST(ROUND(quantile_cont(value, 0.5), 6) AS DOUBLE) AS p50,
           CAST(ROUND(quantile_cont(value, 0.9), 6) AS DOUBLE) AS p90
    FROM events WHERE event_type = 'view'
    GROUP BY CAST(ts AS DATE)
    """,
)
def daily_bands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "view")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.expr("percentile(value, 0.1)"), 6).alias("p10"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


# Jensen–Shannon divergence between the token distributions of the two
# corpus source halves — the bounded (0..ln 2), symmetric drift metric
# complementing token_psi_q (which is unbounded and asymmetric in its
# bucketing). Scale shape: one vocab-keyed count aggregation carrying
# both halves' counts; the JS fold runs over the vocab table with
# 12-dp-quantized terms; zero-count sides contribute their KL term as 0
# by the same CASE on both engines.
@register(
    "js_divergence_q",
    f"""
    WITH t AS (
        SELECT CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN 0 ELSE 1 END AS half,
               unnest({_SQL_TOKENS}) AS tok
        FROM documents
    ),
    v AS (
        SELECT tok,
               SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
        FROM t GROUP BY tok
    ),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM v),
    terms AS (
        SELECT CAST(ca AS DOUBLE) / na AS pa,
               CAST(cb AS DOUBLE) / nb AS pb
        FROM v CROSS JOIN tot
    )
    SELECT CAST(ROUND(CAST(SUM(CAST(
               0.5 * (CASE WHEN pa > 0
                      THEN pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END)
               + 0.5 * (CASE WHEN pb > 0
                        THEN pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END)
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS DOUBLE) AS js_div,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM terms
    """,
)
def js_divergence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    half = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, 0
    ).otherwise(1)
    t = d.select(half.alias("half"), F.explode(_tokens("text")).alias("tok"))
    v = t.groupBy("tok").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = v.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    terms = v.crossJoin(F.broadcast(tot)).select(
        (F.col("ca").cast("double") / F.col("na")).alias("pa"),
        (F.col("cb").cast("double") / F.col("nb")).alias("pb"),
    )
    mid = (F.col("pa") + F.col("pb")) / 2
    term = 0.5 * F.when(
        F.col("pa") > 0, F.col("pa") * F.log(F.col("pa") / mid)
    ).otherwise(0.0) + 0.5 * F.when(
        F.col("pb") > 0, F.col("pb") * F.log(F.col("pb") / mid)
    ).otherwise(0.0)
    return terms.agg(
        F.round(_dsum(term).cast("double"), 6).alias("js_div"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )


# Error-safe ingest parsing: TRY_CAST-based extraction with per-column
# failure accounting — the ETL quarantine counter. Mixed-format inputs
# are synthesized deterministically from real columns (every 7th props
# payload corrupted by a suffix) so the failure paths actually execute.
# Scale shape: pure per-row codegen plus one global count aggregation.
@register(
    "try_parse_q",
    """
    WITH raw AS (
        SELECT event_id,
               CASE WHEN event_id % 7 = 3
                    THEN json_extract_string(props, '$.k') || 'x'
                    ELSE json_extract_string(props, '$.k') END AS k_raw,
               CASE WHEN event_id % 11 = 5 THEN 'not-a-date'
                    ELSE strftime(ts, '%Y-%m-%d') END AS d_raw
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN TRY_CAST(k_raw AS BIGINT) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_ints,
           CAST(SUM(CASE WHEN TRY_CAST(d_raw AS DATE) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_dates,
           CAST(SUM(TRY_CAST(k_raw AS BIGINT)) AS BIGINT) AS k_sum
    FROM raw
    """,
)
def try_parse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    k_raw = F.when(
        F.col("event_id") % 7 == 3,
        F.concat(F.get_json_object("props", "$.k"), F.lit("x")),
    ).otherwise(F.get_json_object("props", "$.k"))
    d_raw = F.when(F.col("event_id") % 11 == 5, F.lit("not-a-date")).otherwise(
        F.date_format("ts", "yyyy-MM-dd")
    )
    raw = ev.select(k_raw.alias("k_raw"), d_raw.alias("d_raw"))
    return raw.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(F.expr("try_cast(k_raw AS BIGINT)").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("bad_ints"),
        F.sum(
            F.when(F.expr("try_cast(d_raw AS DATE)").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("bad_dates"),
        F.sum(F.expr("try_cast(k_raw AS BIGINT)")).cast("long").alias("k_sum"),
    )


# Bitwise flag rollup: event types encoded as bit flags, OR/AND-merged
# per user — the compact "which behaviors has this user ever / always
# shown" profile (bitsets replace per-type boolean columns at scale).
# Scale shape: per-row bit mapping, one user-keyed aggregation with
# map-side-combinable BIT_OR/BIT_AND partials.
@register(
    "flags_rollup_q",
    """
    WITH f AS (
        SELECT user_id,
               CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                    WHEN 'signup' THEN 4 WHEN 'purchase' THEN 8
                    ELSE 16 END AS flag
        FROM events
    )
    SELECT user_id,
           CAST(BIT_OR(flag) AS BIGINT) AS ever_mask,
           CAST(BIT_AND(flag) AS BIGINT) AS always_mask,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           BIT_OR(flag) & 8 = 8 AS has_purchased
    FROM f GROUP BY user_id
    """,
)
def flags_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    flag = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "purchase", 8)
        .otherwise(16)
    )
    return (
        ev.select("user_id", flag.alias("flag"))
        .groupBy("user_id")
        .agg(
            F.expr("bit_or(flag)").cast("long").alias("ever_mask"),
            F.expr("bit_and(flag)").cast("long").alias("always_mask"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.expr("bit_or(flag)").bitwiseAND(8) == 8).alias(
                "has_purchased"
            ),
        )
    )


# Positional phrase search: find every occurrence of the corpus's most
# frequent bigram as a PHRASE via the positional inverted index —
# adjacent-position self-join on (token, doc), the classic IR phrase
# query. Scale shape: the positional postings explode once; the phrase
# join is keyed on (doc_id, position) after filtering both sides to the
# two phrase terms, so only matching-term postings move.
@register(
    "phrase_search_q",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    pos AS (
        SELECT doc_id, i, t[i] AS tok
        FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
    ),
    idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2),
    top_bigram AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM idx GROUP BY w1, w2
        ORDER BY COUNT(*) DESC, w1, w2 LIMIT 1
    ),
    hits AS (
        SELECT a.doc_id, a.i AS position
        FROM pos a
        JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        CROSS JOIN top_bigram tb
        WHERE a.tok = tb.w1 AND b.tok = tb.w2
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(position) AS BIGINT) AS first_position
    FROM hits GROUP BY doc_id
    """,
)
def phrase_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", _tokens("text").alias("t")).localCheckpoint()
    pos = toks.select(
        "doc_id", F.posexplode("t").alias("i0", "tok")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    pairs = toks.filter(F.size("t") >= 2).select(
        F.posexplode(F.slice("t", 1, F.size("t") - 1)).alias("i0", "w1"),
        "t",
    ).select("w1", F.element_at("t", F.col("i0") + 2).alias("w2"))
    top = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(1)
    )
    a = pos.select("doc_id", F.col("i").alias("pa"), F.col("tok").alias("ta"))
    b = pos.select("doc_id", F.col("i").alias("pb"), F.col("tok").alias("tb"))
    hits = (
        a.crossJoin(F.broadcast(top))
        .filter(F.col("ta") == F.col("w1"))
        .join(
            b,
            ["doc_id"],
        )
        .filter(
            (F.col("pb") == F.col("pa") + 1)
            & (F.col("tb") == F.col("w2"))
        )
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.min("pa").cast("long").alias("first_position"),
    )


# Event debounce: flag events of the same (user, type) arriving within
# 6 hours of the previous event of that key — the LAG formulation of
# rapid-repeat suppression (threshold sized to the test stream's
# inter-arrival scale; a web-scale stream would use seconds). Scale shape: one LAG
# window per (user, type) partition; no self-joins.
@register(
    "debounce_q",
    """
    WITH lagged AS (
        SELECT user_id, event_type, ts,
               LAG(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                          AND epoch_us(ts) - epoch_us(prev_ts) < 21600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
    FROM lagged GROUP BY user_id, event_type
    HAVING SUM(CASE WHEN prev_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(prev_ts) < 21600000000
                    THEN 1 ELSE 0 END) > 0
    """,
)
def debounce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    lagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    dbn = F.sum(
        F.when(
            F.col("prev_ts").isNotNull()
            & (
                F.unix_micros("ts") - F.unix_micros("prev_ts")
                < 21_600_000_000
            ),
            1,
        ).otherwise(0)
    )
    return (
        lagged.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dbn.cast("long").alias("n_debounced"),
        )
        .filter(F.col("n_debounced") > 0)
    )


# Fair round-robin interleave across sources: rank docs within each
# source by content hash, then take the globally first 40 in
# (rank, source) order — every source contributes its best docs before
# any source contributes twice, the strict-fairness dataset mixer
# (mixture_sample_q is the proportional variant). Scale shape: one rank
# window per source partition, then TakeOrdered on (rank, source, id).
@register(
    "fair_interleave_q",
    f"""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY {_SQL_POLY.format(s="'fi:' || doc_id::VARCHAR")},
                            doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked
    ORDER BY rk, source, doc_id LIMIT 40
    """,
)
def fair_interleave_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape (reworked r7 per VERDICT r6 #2): only ranks <= 40
    survive the LIMIT, so the per-source rank runs through
    operators.indexing.grouped_topk — a first window partitioned by
    (input partition id, source) prunes each source to <= 40 rows PER
    SCAN SPLIT (window partitions bounded by maxPartitionBytes, never by
    per-source row counts), then the exact per-source rank window runs
    over the <= 40*P survivors (metadata scale). The global top-40 in
    (rank, source) order is a TakeOrdered on those survivors. The oracle
    keeps the plain per-source window (semantics, not plan)."""
    from iniz_exporters_spark.operators.indexing import grouped_topk

    d = Catalog(spark, sf_dir).documents
    h = poly_hash(F.concat(F.lit("fi:"), F.col("doc_id").cast("string")))
    topk = grouped_topk(
        d.select("doc_id", "source"), ["source"], [h, F.col("doc_id")], 40, "rk"
    )
    return (
        topk.orderBy("rk", "source", "doc_id")
        .limit(40)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


# Percent-of-parent revenue shares down the region -> nation hierarchy:
# each nation's share of its region and each region's share of total.
# Scale shape: revenue aggregates to the NATION grain first (one
# fact-scale shuffle onto 25 keys); all share windows run over the
# 25-row nation table. Exact decimal revenue; shares are identical
# double divisions.
@register(
    "parent_share_q",
    """
    WITH rev AS (
        SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_regionkey, c.c_nationkey
    )
    SELECT region, nation,
           CAST(ROUND(CAST(rev AS DOUBLE), 2) AS DOUBLE) AS revenue,
           CAST(ROUND(CAST(rev AS DOUBLE)
                / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE), 6)
                AS DOUBLE) AS share_of_region,
           CAST(ROUND(CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE)
                / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS DOUBLE)
               AS region_share_of_total
    FROM rev
    """,
)
def parent_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.orders.join(
            cat.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_regionkey").alias("region"),
            F.col("c_nationkey").alias("nation"),
        )
        .agg(F.sum(_dec(F.col("o_totalprice"))).alias("rev"))
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(wr).cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.sum("rev").over(wr).cast("double")
            / F.sum("rev").over(wt).cast("double"),
            6,
        ).alias("region_share_of_total"),
    )


# ID-sequence gap detection WITHOUT a global window: keys bucket by
# id div 1000; within-bucket gaps come from a per-bucket LAG window
# (parallel across buckets), and cross-bucket gaps from the bucket
# boundary table (min/max per bucket — metadata scale). The global-LAG
# formulation the oracle uses would single-thread 100 TB of keys; this
# plan never materializes a corpus-wide ordering.
@register(
    "id_gaps_q",
    """
    WITH k AS (SELECT DISTINCT o_orderkey AS id FROM orders
               WHERE o_orderkey % 97 <> 13),
    lagged AS (
        SELECT id, LAG(id) OVER (ORDER BY id) AS prev
        FROM k
    )
    SELECT CAST(prev + 1 AS BIGINT) AS gap_start,
           CAST(id - 1 AS BIGINT) AS gap_end,
           CAST(id - prev - 1 AS BIGINT) AS gap_len
    FROM lagged WHERE prev IS NOT NULL AND id - prev > 1
    ORDER BY gap_start LIMIT 50
    """,
)
def id_gaps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # synthetic deletions (every 97th key) so the detector's output is a
    # value-checked non-empty gap list at every scale
    o = (
        Catalog(spark, sf_dir)
        .orders.filter(F.col("o_orderkey") % 97 != 13)
        .select(F.col("o_orderkey").alias("id"))
        .distinct()
    )
    b = o.withColumn("bucket", F.expr("id div 1000"))
    wb = Window.partitionBy("bucket").orderBy("id")
    within = (
        b.withColumn("prev", F.lag("id").over(wb))
        .filter(F.col("prev").isNotNull() & (F.col("id") - F.col("prev") > 1))
        .select(
            (F.col("prev") + 1).alias("gap_start"),
            (F.col("id") - 1).alias("gap_end"),
        )
    )
    # cross-bucket gaps from the per-bucket boundary table (metadata)
    bounds = b.groupBy("bucket").agg(
        F.min("id").alias("lo"), F.max("id").alias("hi")
    )
    wseq = Window.orderBy("bucket")
    across = (
        bounds.withColumn("prev_hi", F.lag("hi").over(wseq))
        .filter(
            F.col("prev_hi").isNotNull()
            & (F.col("lo") - F.col("prev_hi") > 1)
        )
        .select(
            (F.col("prev_hi") + 1).alias("gap_start"),
            (F.col("lo") - 1).alias("gap_end"),
        )
    )
    return (
        within.unionByName(across)
        .select(
            F.col("gap_start").cast("long"),
            F.col("gap_end").cast("long"),
            (F.col("gap_end") - F.col("gap_start") + 1)
            .cast("long")
            .alias("gap_len"),
        )
        .orderBy("gap_start")
        .limit(50)
    )


# ===========================================================================
# Batch T — linkage alternatives, experiment statistics, count models.
# ===========================================================================


# Sorted-neighborhood record linkage: sort candidates by a key inside
# coarse blocks, pair each record with its <=2 following neighbors, keep
# pairs within edit distance 2 — the sliding-window alternative to
# hash blocking (record_linkage_q) that catches near-misses hash blocks
# split. Scale shape: ranks are per-block windows (parallel across
# blocks); the neighbor join is rank-banded inside each block, so pair
# count is O(n * window), never O(n^2).
@register(
    "sorted_neighborhood_q",
    """
    WITH ranked AS (
        SELECT c_custkey, c_name, substr(c_name, 10, 6) AS blk,
               ROW_NUMBER() OVER (PARTITION BY substr(c_name, 10, 6)
                                  ORDER BY c_name, c_custkey) AS rk
        FROM customer
    ),
    pairs AS (
        SELECT a.c_custkey AS ka, b.c_custkey AS kb,
               levenshtein(a.c_name, b.c_name) AS lev
        FROM ranked a
        JOIN ranked b ON a.blk = b.blk
                     AND b.rk > a.rk AND b.rk <= a.rk + 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN lev <= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matches,
           CAST(MIN(lev) AS BIGINT) AS min_lev,
           CAST(MAX(lev) AS BIGINT) AS max_lev
    FROM pairs
    """,
)
def sorted_neighborhood_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    blk = F.substring("c_name", 10, 6)
    w = Window.partitionBy("blk").orderBy("c_name", "c_custkey")
    ranked = c.select(
        "c_custkey", "c_name", blk.alias("blk")
    ).withColumn("rk", F.row_number().over(w)).localCheckpoint()
    a = ranked.select(
        "blk",
        F.col("c_custkey").alias("ka"),
        F.col("c_name").alias("na"),
        F.col("rk").alias("ra"),
    )
    b = ranked.select(
        "blk",
        F.col("c_custkey").alias("kb"),
        F.col("c_name").alias("nb"),
        F.col("rk").alias("rb"),
    )
    pairs = (
        a.join(b, "blk")
        .filter(
            (F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + 2)
        )
        .select(F.levenshtein("na", "nb").alias("lev"))
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("lev") <= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_matches"),
        F.min("lev").cast("long").alias("min_lev"),
        F.max("lev").cast("long").alias("max_lev"),
    )


# Wilson-score confidence intervals for per-step funnel conversion
# rates: the experimentation-grade proportion interval (never escapes
# [0,1], sane at small n, unlike the normal approximation). Scale shape:
# conversion counts are one user-keyed aggregation; the interval math is
# identical per-row double arithmetic over the steps table.
@register(
    "wilson_ci_q",
    """
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS s2,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS s3
        FROM events GROUP BY user_id
    ),
    steps AS (
        SELECT 'view->click' AS step, SUM(s1) AS n, SUM(s1 * s2) AS k
        FROM u
        UNION ALL
        SELECT 'click->purchase', SUM(s2), SUM(s2 * s3) FROM u
    )
    SELECT step, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           CAST(ROUND(CAST(k AS DOUBLE) / n, 6) AS DOUBLE) AS rate,
           CAST(ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
                - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                              * (1 - CAST(k AS DOUBLE) / n) / n
                              + 0.9604 / (n * n)))
                / (1 + 3.8416 / n), 6) AS DOUBLE) AS wilson_lo,
           CAST(ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
                + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                              * (1 - CAST(k AS DOUBLE) / n) / n
                              + 0.9604 / (n * n)))
                / (1 + 3.8416 / n), 6) AS DOUBLE) AS wilson_hi
    FROM steps
    """,
)
def wilson_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "s1"
        ),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "s2"
        ),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("s3"),
    )
    steps = u.agg(
        F.sum("s1").alias("n1"),
        F.sum(F.col("s1") * F.col("s2")).alias("k1"),
        F.sum("s2").alias("n2"),
        F.sum(F.col("s2") * F.col("s3")).alias("k2"),
    )
    rows = []
    for step, ncol, kcol in (
        ("view->click", "n1", "k1"),
        ("click->purchase", "n2", "k2"),
    ):
        rows.append(
            steps.select(
                F.lit(step).alias("step"),
                F.col(ncol).alias("n"),
                F.col(kcol).alias("k"),
            )
        )
    s = rows[0].unionByName(rows[1])
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n")
    root = F.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
    return s.select(
        "step",
        n.cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(p, 6).alias("rate"),
        F.round((p + 1.9208 / n - 1.96 * root) / (1 + 3.8416 / n), 6).alias(
            "wilson_lo"
        ),
        F.round((p + 1.9208 / n + 1.96 * root) / (1 + 3.8416 / n), 6).alias(
            "wilson_hi"
        ),
    )


# Negative-binomial fit of the order basket-size distribution by the
# method of moments: r = mean^2/(var-mean), p = mean/var — the standard
# overdispersed count model for "items per basket". Scale shape: basket
# sizes are one orderkey aggregation; moments are exact integer sums;
# the fit is one row of double arithmetic.
@register(
    "basket_nb_fit_q",
    """
    WITH b AS (
        SELECT l_orderkey, COUNT(*) AS sz FROM lineitem GROUP BY l_orderkey
    ),
    m AS (
        SELECT COUNT(*) AS n, SUM(sz) AS s1, SUM(sz * sz) AS s2 FROM b
    )
    SELECT CAST(n AS BIGINT) AS n_baskets,
           CAST(ROUND(CAST(s1 AS DOUBLE) / n, 6) AS DOUBLE) AS mean_size,
           CAST(ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                       * CAST(s1 AS DOUBLE) / n) / (n - 1), 6) AS DOUBLE)
               AS var_size,
           CAST(ROUND(CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                            * CAST(s1 AS DOUBLE) / n) / (n - 1)
                           > CAST(s1 AS DOUBLE) / n
               THEN (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    / ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                        * CAST(s1 AS DOUBLE) / n) / (n - 1)
                       - CAST(s1 AS DOUBLE) / n)
               ELSE 0.0 END, 6) AS DOUBLE) AS nb_r
    FROM m
    """,
)
def basket_nb_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    b = li.groupBy("l_orderkey").agg(F.count("*").alias("sz"))
    m = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sz").alias("s1"),
        F.sum(F.col("sz") * F.col("sz")).alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / n
    ) / (n - 1)
    return m.select(
        n.cast("long").alias("n_baskets"),
        F.round(mean, 6).alias("mean_size"),
        F.round(var, 6).alias("var_size"),
        F.round(
            F.when(var > mean, mean * mean / (var - mean)).otherwise(0.0), 6
        ).alias("nb_r"),
    )


# Rich-club coefficient phi(k) for k in {2, 4, 8}: the density of the
# subgraph induced by nodes of degree > k — do hubs preferentially
# interconnect? Scale shape: degrees from one vocab-keyed aggregation;
# per-k edge counts are broadcast-filtered joins over the (bounded)
# high-degree node set; density is integer arithmetic.
@register(
    "rich_club_q",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        GROUP BY n
    ),
    ks AS (SELECT unnest([2, 4, 8]) AS k),
    club AS (
        SELECT ks.k, deg.n FROM ks JOIN deg ON deg.d > ks.k
    ),
    cnt AS (SELECT k, COUNT(*) AS nk FROM club GROUP BY k),
    ce AS (
        SELECT ca.k, COUNT(*) AS ek
        FROM e JOIN club ca ON e.a = ca.n
               JOIN club cb ON e.b = cb.n AND ca.k = cb.k
        GROUP BY ca.k
    )
    SELECT cnt.k, CAST(cnt.nk AS BIGINT) AS n_club,
           CAST(COALESCE(ce.ek, 0) AS BIGINT) AS club_edges,
           CAST(ROUND(CASE WHEN cnt.nk >= 2
               THEN 2.0 * COALESCE(ce.ek, 0) / (cnt.nk * (cnt.nk - 1))
               ELSE 0.0 END, 6) AS DOUBLE) AS phi
    FROM cnt LEFT JOIN ce ON cnt.k = ce.k
    """,
)
def rich_club_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("kk"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("kk"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, "kk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    ks = Catalog(spark, sf_dir).region.sparkSession.createDataFrame(
        [(2,), (4,), (8,)], "k int"
    )
    club = ks.crossJoin(deg).filter(F.col("d") > F.col("k")).select(
        "k", "n"
    ).localCheckpoint()
    cnt = club.groupBy("k").agg(F.count("*").alias("nk"))
    ca = club.select(F.col("k"), F.col("n").alias("a"))
    cb = club.select(F.col("k").alias("k2"), F.col("n").alias("b2"))
    ce = (
        e.join(ca, "a")
        .join(
            cb,
            (F.col("b") == F.col("b2")) & (F.col("k") == F.col("k2")),
        )
        .groupBy("k")
        .agg(F.count("*").alias("ek"))
    )
    ek = F.coalesce(F.col("ek"), F.lit(0))
    return (
        cnt.join(ce, "k", "left")
        .select(
            "k",
            F.col("nk").cast("long").alias("n_club"),
            ek.cast("long").alias("club_edges"),
            F.round(
                F.when(
                    F.col("nk") >= 2,
                    2.0 * ek / (F.col("nk") * (F.col("nk") - 1)),
                ).otherwise(0.0),
                6,
            ).alias("phi"),
        )
    )


# Time-weighted average of the event value per user: each reading holds
# until the next one (step interpolation), weighted by its holding
# interval — the telemetry/billing aggregate where arithmetic means lie
# under irregular sampling. Scale shape: one LEAD window per user
# partition for the holding interval, then a user-keyed weighted
# aggregation; weights are exact integer microseconds and values
# quantize to decimal before the weighted sum.
@register(
    "twa_q",
    """
    WITH iv AS (
        SELECT user_id,
               CAST(value AS DECIMAL(18,6)) AS v,
               epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
               - epoch_us(ts) AS hold_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(hold_us) AS BIGINT) AS span_us,
           CAST(ROUND(CAST(SUM(v * hold_us) AS DOUBLE)
                / CAST(SUM(hold_us) AS DOUBLE), 6) AS DOUBLE) AS twa
    FROM iv WHERE hold_us IS NOT NULL AND hold_us > 0
    GROUP BY user_id
    """,
)
def twa_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("hold_us"),
    ).filter(F.col("hold_us").isNotNull() & (F.col("hold_us") > 0))
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("hold_us").cast("long").alias("span_us"),
        F.round(
            F.sum(F.col("v") * F.col("hold_us")).cast("double")
            / F.sum("hold_us").cast("double"),
            6,
        ).alias("twa"),
    )


# Sketch algebra: intersection cardinality by inclusion–exclusion over
# HyperLogLog estimates, |A∩B| ≈ hll(A) + hll(B) − hll(A∪B), with the
# exact intersection and the triple-error bound as the CHECKED values
# (estimates themselves have no cross-engine oracle; the bound does —
# same contract pattern as hll_error_check). A = users who viewed,
# B = users who purchased. Scale shape: three approx-distinct
# aggregations (fixed-size sketch state, map-side mergeable) plus one
# exact distinct for the audit.
@register(
    "hll_intersect_q",
    """
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view'),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase'),
    x AS (SELECT COUNT(*) AS exact_inter
          FROM a JOIN b USING (user_id)),
    sz AS (SELECT (SELECT COUNT(*) FROM a) AS na,
                  (SELECT COUNT(*) FROM b) AS nb)
    SELECT CAST(sz.na AS BIGINT) AS n_a, CAST(sz.nb AS BIGINT) AS n_b,
           CAST(x.exact_inter AS BIGINT) AS exact_inter,
           TRUE AS est_within_bound
    FROM x CROSS JOIN sz
    """,
)
def hll_intersect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The estimate uses Spark's approx_count_distinct (rsd 2%); the
    inclusion-exclusion error compounds across three sketches, so the
    checked bound is 3 * rsd * max(|A|,|B|,|A∪B|) + 3 — wide enough to
    be deterministic, tight enough that a broken sketch or a broken
    union fails it."""
    ev = Catalog(spark, sf_dir).events
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    u = a.unionAll(b)
    est = (
        a.agg(F.approx_count_distinct("user_id", 0.02).alias("ea"))
        .crossJoin(
            F.broadcast(
                b.agg(F.approx_count_distinct("user_id", 0.02).alias("eb"))
            )
        )
        .crossJoin(
            F.broadcast(
                u.agg(F.approx_count_distinct("user_id", 0.02).alias("eu"))
            )
        )
    )
    exact = (
        a.distinct()
        .join(b.distinct(), "user_id")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    sizes = a.distinct().agg(F.count(F.lit(1)).alias("n_a")).crossJoin(
        F.broadcast(b.distinct().agg(F.count(F.lit(1)).alias("n_b")))
    )
    est_inter = F.col("ea") + F.col("eb") - F.col("eu")
    bound = 0.06 * F.greatest("ea", "eb", "eu") + 3
    return (
        sizes.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(est))
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("exact_inter").cast("long").alias("exact_inter"),
            (
                F.abs(est_inter - F.col("exact_inter")) <= bound
            ).alias("est_within_bound"),
        )
    )


# Repeat-charge audit: orders by the same customer in the SAME price
# band (floor to 10k) within a year — the double-charge screen shape,
# with band/window sized to this dataset's order sparsity (production
# uses exact amounts and days). Scale shape: one LAG window per
# (customer, band) partition; the quadratic same-customer self-join
# never happens, and only flagged rows leave the window stage.
@register(
    "dup_payment_q",
    """
    WITH w AS (
        SELECT o_orderkey, o_custkey,
               CAST(floor(o_totalprice / 10000) AS BIGINT) AS amt,
               o_orderdate,
               LAG(o_orderdate) OVER (
                   PARTITION BY o_custkey,
                                CAST(floor(o_totalprice / 10000) AS BIGINT)
                   ORDER BY o_orderdate, o_orderkey) AS prev_date,
               LAG(o_orderkey) OVER (
                   PARTITION BY o_custkey,
                                CAST(floor(o_totalprice / 10000) AS BIGINT)
                   ORDER BY o_orderdate, o_orderkey) AS prev_key
        FROM orders
    )
    SELECT o_orderkey, prev_key, o_custkey,
           CAST(amt AS BIGINT) AS price_band,
           CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT)
               AS days_apart
    FROM w
    WHERE prev_date IS NOT NULL
      AND date_diff('day', prev_date, o_orderdate) <= 365
    """,
)
def dup_payment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    amt = F.floor(F.col("o_totalprice") / 10000).cast("long")
    w = Window.partitionBy("o_custkey", amt).orderBy(
        "o_orderdate", "o_orderkey"
    )
    flagged = o.select(
        "o_orderkey",
        "o_custkey",
        amt.alias("amt"),
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
    ).filter(
        F.col("prev_date").isNotNull()
        & (F.datediff("o_orderdate", "prev_date") <= 365)
    )
    return flagged.select(
        "o_orderkey",
        "prev_key",
        "o_custkey",
        F.col("amt").cast("long").alias("price_band"),
        F.datediff("o_orderdate", "prev_date")
        .cast("long")
        .alias("days_apart"),
    )


# ===========================================================================
# End-to-end exporter pipeline as a driver-checkable query (round-5 task).
# The reference's flagship entry point (concept_csv_export.py:124-190:
# wide query → tree/cycle passes → topo order → exclude → column prune) has
# been golden-tested piecewise; this registers the WHOLE composition over a
# committed OpenMRS-subset fixture (fixtures/concepts/, generated by
# tools/make_concept_fixtures.py) with a DuckDB oracle replaying the same
# semantics relationally — names/mappings pivots, GROUP_CONCAT member
# roll-ups, the PIH Number/Name cast discriminator, voided/retired filters,
# newline-strip, exclusion, and topo depth via a recursive CTE. The exact
# row ORDER of the export (stable Kahn) is pinned by pytest goldens; the
# hash-checked column here is topo_level (= longest referent chain), which
# both engines derive independently. Reads the fixture dir regardless of
# sf_dir: the pipeline is metadata-scale by design (reference header,
# concept_csv_export.py:3-5).
# ===========================================================================

# Fixture roots are derived from __file__ (module-relative) so the driver
# rows keep working if the repo is checked out elsewhere (ADVICE r5 #5);
# the resolved absolute path is interpolated into the registered oracle
# SQL at import time.
_FIXTURES_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

_CONCEPT_FIXTURE_DIR = os.path.join(_FIXTURES_ROOT, "concepts")


def _longest_chain_level(
    n: str,
    edges: dict,
    present: set,
    levels: dict,
) -> int:
    """Longest referent-chain depth of ``n`` (leaf = 0), memoized into
    ``levels``. Iterative DFS with an in-progress set: a cyclic edge set
    raises a clear ``cycle detected`` error instead of RecursionError,
    and depth is bounded by the explicit stack, not the interpreter
    recursion limit (ADVICE r5 #3 — the export pipeline's own cycle-check
    stage runs earlier, but this replay must not assume it did)."""
    if n in levels:
        return levels[n]
    in_progress: set = set()
    stack: list = [(n, 0)]
    while stack:
        node, state = stack.pop()
        kids = [c for c in edges.get(node, ()) if c in present and c != node]
        if state == 0:
            if node in levels:
                continue
            if node in in_progress:
                raise ValueError(
                    f"cycle detected in concept references at {node!r}"
                )
            in_progress.add(node)
            stack.append((node, 1))
            for c in kids:
                if c not in levels:
                    if c in in_progress:
                        raise ValueError(
                            f"cycle detected in concept references at {c!r}"
                        )
                    stack.append((c, 0))
        else:
            in_progress.discard(node)
            levels[node] = 0 if not kids else 1 + max(levels[c] for c in kids)
    return levels[n]

_CONCEPT_FIXTURE_TABLES = [
    "concept", "concept_class", "concept_datatype", "concept_name",
    "concept_description", "concept_reference_map", "concept_map_type",
    "concept_reference_term", "concept_reference_source", "concept_numeric",
    "concept_complex", "concept_set", "concept_answer",
]

_CE = _CONCEPT_FIXTURE_DIR  # brevity inside the oracle string


@register(
    "concepts_export_q",
    f"""
    WITH RECURSIVE
    concept AS (SELECT * FROM read_parquet('{_CE}/concept.parquet')),
    cclass AS (SELECT * FROM read_parquet('{_CE}/concept_class.parquet')),
    cdt AS (SELECT * FROM read_parquet('{_CE}/concept_datatype.parquet')),
    cname AS (SELECT * FROM read_parquet('{_CE}/concept_name.parquet')),
    cdesc AS (SELECT * FROM read_parquet('{_CE}/concept_description.parquet')),
    crm AS (SELECT * FROM read_parquet('{_CE}/concept_reference_map.parquet')),
    cmt AS (SELECT * FROM read_parquet('{_CE}/concept_map_type.parquet')),
    crt AS (SELECT * FROM read_parquet('{_CE}/concept_reference_term.parquet')),
    crs AS (SELECT * FROM read_parquet('{_CE}/concept_reference_source.parquet')),
    cnum AS (SELECT * FROM read_parquet('{_CE}/concept_numeric.parquet')),
    ccx AS (SELECT * FROM read_parquet('{_CE}/concept_complex.parquet')),
    cset AS (SELECT * FROM read_parquet('{_CE}/concept_set.parquet')),
    cans AS (SELECT * FROM read_parquet('{_CE}/concept_answer.parquet')),
    fsn AS (
        SELECT concept_id, MAX(name) AS name FROM cname
        WHERE voided = 0 AND locale = 'en'
          AND concept_name_type = 'FULLY_SPECIFIED'
        GROUP BY concept_id
    ),
    names AS (
        SELECT concept_id,
               MAX(CASE WHEN locale='en' AND concept_name_type='FULLY_SPECIFIED'
                        THEN name END) AS fsn_en,
               MAX(CASE WHEN locale='en' AND concept_name_type='SHORT'
                        THEN name END) AS short_en,
               MAX(CASE WHEN locale='es' AND concept_name_type='FULLY_SPECIFIED'
                        THEN name END) AS fsn_es
        FROM cname WHERE voided = 0 GROUP BY concept_id
    ),
    descr AS (
        SELECT concept_id,
               MAX(replace(replace(description, chr(13), ''), chr(10), ''))
                   AS desc_en
        FROM cdesc WHERE locale = 'en' GROUP BY concept_id
    ),
    mapped AS (
        SELECT crm.concept_id, cmt.name AS map_type, crs.name AS src_name,
               crt.code,
               COALESCE(TRY_CAST(regexp_extract(crt.code,
                   '^\\s*\\+?([0-9]+)', 1) AS BIGINT), 0) <> 0 AS is_num
        FROM crm
        JOIN cmt ON crm.concept_map_type_id = cmt.concept_map_type_id
        JOIN crt ON crm.concept_reference_term_id = crt.concept_reference_term_id
               AND crt.retired = 0
        JOIN crs ON crt.concept_source_id = crs.concept_source_id
        WHERE cmt.name IN ('SAME-AS', 'NARROWER-THAN')
    ),
    mapcols AS (
        SELECT concept_id,
               string_agg(DISTINCT CASE WHEN map_type='SAME-AS'
                   AND src_name='PIH' AND NOT is_num THEN code END,
                   ';' ORDER BY CASE WHEN map_type='SAME-AS'
                   AND src_name='PIH' AND NOT is_num THEN code END)
                   AS same_pih_name,
               string_agg(DISTINCT CASE WHEN map_type='SAME-AS'
                   AND src_name='PIH' AND is_num THEN code END,
                   ';' ORDER BY CASE WHEN map_type='SAME-AS'
                   AND src_name='PIH' AND is_num THEN code END)
                   AS same_pih_num,
               string_agg(DISTINCT CASE WHEN map_type='SAME-AS'
                   AND src_name='CIEL' THEN code END,
                   ';' ORDER BY CASE WHEN map_type='SAME-AS'
                   AND src_name='CIEL' THEN code END) AS same_ciel,
               string_agg(DISTINCT CASE WHEN map_type='NARROWER-THAN'
                   AND src_name='CIEL' THEN code END,
                   ';' ORDER BY CASE WHEN map_type='NARROWER-THAN'
                   AND src_name='CIEL' THEN code END) AS narrower_ciel
        FROM mapped GROUP BY concept_id
    ),
    member_pairs AS (
        SELECT cset.concept_set AS concept_id, fsn.name,
               MIN(cset.sort_weight) AS w
        FROM cset
        JOIN concept ch ON cset.concept_id = ch.concept_id AND ch.retired = 0
        JOIN fsn ON ch.concept_id = fsn.concept_id
        GROUP BY cset.concept_set, fsn.name
    ),
    members AS (
        SELECT concept_id, string_agg(name, ';' ORDER BY w, name) AS members
        FROM member_pairs GROUP BY concept_id
    ),
    answer_pairs AS (
        SELECT cans.concept_id, fsn.name, MIN(cans.sort_weight) AS w
        FROM cans
        JOIN concept ch ON cans.answer_concept = ch.concept_id
                       AND ch.retired = 0
        JOIN fsn ON ch.concept_id = fsn.concept_id
        GROUP BY cans.concept_id, fsn.name
    ),
    answers AS (
        SELECT concept_id, string_agg(name, ';' ORDER BY w, name) AS answers
        FROM answer_pairs GROUP BY concept_id
    ),
    final AS (
        SELECT c.concept_id, c.uuid, n.fsn_en AS key,
               n.short_en, n.fsn_es, d.desc_en,
               cl.name AS class_name, dt.name AS dt_name,
               a.answers, m.members,
               mc.same_pih_name, mc.same_pih_num, mc.same_ciel,
               mc.narrower_ciel,
               num.hi_absolute, num.low_absolute, num.units,
               num.display_precision, num.allow_decimal,
               cx.handler
        FROM concept c
        JOIN cclass cl ON c.class_id = cl.concept_class_id
        JOIN cdt dt ON c.datatype_id = dt.concept_datatype_id
        JOIN names n ON c.concept_id = n.concept_id
        LEFT JOIN descr d ON c.concept_id = d.concept_id
        LEFT JOIN mapcols mc ON c.concept_id = mc.concept_id
        LEFT JOIN members m ON c.concept_id = m.concept_id
        LEFT JOIN answers a ON c.concept_id = a.concept_id
        LEFT JOIN cnum num ON c.concept_id = num.concept_id
        LEFT JOIN ccx cx ON c.concept_id = cx.concept_id
        WHERE c.retired = 0 AND n.fsn_en <> 'Orphan'
    ),
    edges AS (
        SELECT p.key AS parent_key, f.key AS child_key
        FROM cset e
        JOIN final p ON e.concept_set = p.concept_id
        JOIN final f ON e.concept_id = f.concept_id
        UNION
        SELECT p.key, f.key
        FROM cans e
        JOIN final p ON e.concept_id = p.concept_id
        JOIN final f ON e.answer_concept = f.concept_id
    ),
    depth AS (
        SELECT key, 0 AS l FROM final
        UNION ALL
        SELECT e.parent_key, d.l + 1
        FROM edges e JOIN depth d ON d.key = e.child_key
    ),
    lvl AS (SELECT key, MAX(l) AS topo_level FROM depth GROUP BY key)
    SELECT f.uuid,
           CAST(NULL AS VARCHAR) AS "Void/Retire",
           f.key AS "Fully specified name:en",
           COALESCE(f.short_en, '') AS "Short name:en",
           COALESCE(f.fsn_es, '') AS "Fully specified name:es",
           COALESCE(f.desc_en, '') AS "Description:en",
           f.class_name AS "Data class",
           f.dt_name AS "Data type",
           COALESCE(f.answers, '') AS "Answers",
           COALESCE(f.members, '') AS "Members",
           COALESCE(f.same_pih_name, '') AS "Mappings|SAME-AS|PIH|Name",
           COALESCE(f.same_pih_num, '') AS "Mappings|SAME-AS|PIH|Number",
           COALESCE(f.same_ciel, '') AS "Mappings|SAME-AS|CIEL",
           COALESCE(f.narrower_ciel, '') AS "Mappings|NARROWER-THAN|CIEL",
           f.hi_absolute AS "Absolute high",
           f.low_absolute AS "Absolute low",
           COALESCE(f.units, '') AS "Units",
           CAST(f.display_precision AS BIGINT) AS "Display precision",
           CAST(f.allow_decimal AS BIGINT) AS "Allow decimals",
           COALESCE(f.handler, '') AS "Complex data handler",
           CAST(lvl.topo_level AS BIGINT) AS topo_level
    FROM final f JOIN lvl ON f.key = lvl.key
    """,
)
def concepts_export_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship pipeline end-to-end
    (concept_csv_export.py:124-190) on the committed fixture, plus a
    ``topo_level`` column (longest referent chain) derived from the final
    rows — the oracle recomputes it with a recursive CTE, so a silent
    break anywhere in the composition flips this driver row."""
    from iniz_exporters_spark.exporters.concepts import (
        ConceptExportConfig,
        export_concepts,
    )
    from iniz_exporters_spark.plans.graph import edges_from_rows

    tables = {
        n: spark.read.parquet(f"{_CONCEPT_FIXTURE_DIR}/{n}.parquet")
        for n in _CONCEPT_FIXTURE_TABLES
    }
    cfg = ConceptExportConfig(
        locales=["en", "es"],
        concept_sources=["PIH|Name", "PIH|Number", "CIEL"],
        mapping_types=["SAME-AS", "NARROWER-THAN"],
        exclude_keys=["Orphan"],
    )
    cols, rows = export_concepts(spark, tables, cfg)

    key = cfg.key
    edges = edges_from_rows(rows, key)
    present = {r[key] for r in rows}
    levels: dict[str, int] = {}

    def level(n: str) -> int:
        return _longest_chain_level(n, edges, present, levels)

    double_cols = {"Absolute high", "Absolute low"}
    long_cols = {"Display precision", "Allow decimals"}
    out_rows = []
    for r in rows:
        rec = {}
        for c in cols:
            v = r.get(c)
            if c in double_cols:
                rec[c] = float(v) if v not in (None, "") else None
            elif c in long_cols:
                rec[c] = int(v) if v not in (None, "") else None
            else:
                rec[c] = v
        rec["topo_level"] = level(r[key])
        out_rows.append(rec)

    fields = []
    for c in cols:
        t = (
            T.DoubleType()
            if c in double_cols
            else T.LongType()
            if c in long_cols
            else T.StringType()
        )
        fields.append(T.StructField(c, t, True))
    fields.append(T.StructField("topo_level", T.LongType(), False))
    return spark.createDataFrame(out_rows, T.StructType(fields))


# ===========================================================================
# Batch V — round-5 additions: star-contraction components on a
# high-diameter graph, CCNet-style perplexity buckets, margin-based
# bitext mining, a grouping-sets dataset card, and near-dup cluster
# observability. Each entry: Spark plan + DuckDB oracle + pytest
# contract (tests/test_round5_ops.py).
# ===========================================================================


# Connected components via large-star/small-star contraction on a graph
# whose components are CHAINS (consecutive orders per customer) — the
# high-diameter shape where plain propagation needs diameter-many rounds
# and star contraction needs O(log n). Scale shape: edges from one LAG
# window per customer partition (no self-join), then each contraction
# round shuffles only the canonical (u, v) edge list; converged star
# forest = one shuffle-free final label projection. The oracle replays
# components as recursive min-reachability.
@register(
    "star_components_q",
    """
    WITH RECURSIVE e AS (
        SELECT prev AS src, o_orderkey AS dst FROM (
            SELECT o_orderkey,
                   LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey)
                       AS prev
            FROM orders WHERE o_custkey % 100 = 0
        ) WHERE prev IS NOT NULL
    ),
    und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    reach(node, r) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.dst, reach.r FROM reach JOIN und u ON reach.node = u.src
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT component, CAST(COUNT(*) AS BIGINT) AS chain_len
    FROM comp GROUP BY component
    """,
)
def star_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders.filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        o.select(
            F.col("o_orderkey").alias("dst"),
            F.lag("o_orderkey").over(w).alias("src"),
        )
        .filter(F.col("src").isNotNull())
        .select("src", "dst")
    )
    comps = connected_components(edges, method="star")
    return comps.groupBy("component").agg(
        F.count("*").cast("long").alias("chain_len")
    )


# CCNet-style perplexity bucketing (Wenzek et al. 2020): score each doc
# with a self-trained unigram LM, then split each source into
# head/middle/tail perplexity tertiles — the standard quality-stratified
# sampling input. Scale shape: the unigram model is one vocab-scale agg
# broadcast back as a join (token table never collected); per-doc scoring
# is one explode + join + sum; the tertile is one NTILE window per source
# partition. Cross-log determinism: logprobs are 12-dp-quantized decimals
# before summation, perplexity rounds to 6 dp with doc_id tiebreaks.
@register(
    "ccnet_bucket_q",
    """
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text <> ''
    ),
    vocab AS (
        SELECT w, COUNT(*) AS c FROM tok GROUP BY w
    ),
    tot AS (SELECT SUM(c) AS n FROM vocab),
    lp AS (
        SELECT w, CAST(ROUND(ln(c / CAST(n AS DOUBLE)), 12)
                       AS DECIMAL(28,12)) AS logp
        FROM vocab, tot
    ),
    doc AS (
        SELECT t.doc_id, t.source,
               COUNT(*) AS n_tok,
               CAST(ROUND(exp(-CAST(SUM(lp.logp) AS DOUBLE) / COUNT(*)), 6)
                    AS DOUBLE) AS ppl
        FROM tok t JOIN lp ON t.w = lp.w
        GROUP BY t.doc_id, t.source
    ),
    bucketed AS (
        SELECT source, ppl,
               NTILE(3) OVER (PARTITION BY source
                              ORDER BY ppl, doc_id) AS tertile
        FROM doc
    )
    SELECT source,
           CASE tertile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(ROUND(CAST(SUM(CAST(ppl AS DECIMAL(28,12)))
                AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS mean_ppl
    FROM bucketed GROUP BY source, tertile
    """,
    headline=True,
)
def ccnet_bucket_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents.filter(F.col("text") != "")
    tok = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = tok.groupBy("w").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "w",
        F.round(F.log(F.col("c") / F.col("n").cast("double")), 12)
        .cast("decimal(28,12)")
        .alias("logp"),
    )
    doc = (
        tok.join(lp, "w")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_tok"),
            F.round(
                F.exp(-F.sum("logp").cast("double") / F.count("*")), 6
            ).alias("ppl"),
        )
    )
    # distributed per-source NTILE: global range-partitioned rank +
    # broadcast group offsets (operators.indexing.grouped_ntile) — no
    # per-source window whose partitions scale with the corpus
    from iniz_exporters_spark.operators.indexing import grouped_ntile

    bucketed = grouped_ntile(
        doc,
        ["source"],
        [F.col("ppl").asc(), F.col("doc_id").asc()],
        3,
        "tertile",
    ).select("source", "ppl", "tertile")
    bucket = (
        F.when(F.col("tertile") == 1, "head")
        .when(F.col("tertile") == 2, "middle")
        .otherwise("tail")
    )
    return bucketed.groupBy("source", bucket.alias("bucket")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(
            F.sum(F.col("ppl").cast("decimal(28,12)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_ppl"),
    )


# Margin-based bitext/pair mining (Artetxe & Schwenk 2019 ratio margin):
# candidate pair score = cos(x, y) / (0.5 * (avg top-k cos of x + avg
# top-k cos of y)); pairs whose margin > 1 are "closer than their
# neighborhoods" — the standard parallel-pair mining criterion, reused
# here for hard-positive mining between two label groups. Scale shape:
# the SOURCE side is a sampled query set that BROADCASTS against one scan
# of the target group (the corpus never shuffles for scoring); top-k
# neighborhood means are rank windows over the scored pair table keyed by
# either endpoint. Cosines round to 4 dp (the established cross-engine
# contract), margins to 6 dp.
@register(
    "margin_ratio_pairs_q",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    src AS (SELECT vec_id AS x, v FROM e
            WHERE label = 0 AND vec_id % 3 = 0),
    tgt AS (SELECT vec_id AS y, v FROM e WHERE label = 1),
    pairs AS (
        SELECT src.x, tgt.y,
               ROUND(list_cosine_similarity(src.v, tgt.v), 4) AS cos
        FROM src CROSS JOIN tgt
    ),
    rx AS (
        SELECT x, y, cos,
               ROW_NUMBER() OVER (PARTITION BY x
                                  ORDER BY cos DESC, y) AS rnx
        FROM pairs
    ),
    ax AS (
        SELECT x, CAST(ROUND(CAST(SUM(CAST(cos AS DECIMAL(28,12)))
                 AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS avgk_x
        FROM rx WHERE rnx <= 4 GROUP BY x
    ),
    ry AS (
        SELECT x, y, cos,
               ROW_NUMBER() OVER (PARTITION BY y
                                  ORDER BY cos DESC, x) AS rny
        FROM pairs
    ),
    ay AS (
        SELECT y, CAST(ROUND(CAST(SUM(CAST(cos AS DECIMAL(28,12)))
                 AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS avgk_y
        FROM ry WHERE rny <= 4 GROUP BY y
    ),
    scored AS (
        SELECT p.x, p.y, p.cos,
               ROUND(p.cos / (0.5 * (ax.avgk_x + ay.avgk_y)), 6) AS margin
        FROM pairs p JOIN ax ON p.x = ax.x JOIN ay ON p.y = ay.y
    )
    SELECT x AS src_id, y AS tgt_id, cos, margin FROM (
        SELECT x, y, cos, margin,
               ROW_NUMBER() OVER (PARTITION BY x
                                  ORDER BY margin DESC, y) AS rn
        FROM scored
    ) t WHERE rn = 1 AND margin > 1.0
    """,
)
def margin_ratio_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.similarity import cosine

    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", "label", F.col("embedding").alias("v")
    )
    src = e.filter((F.col("label") == 0) & (F.col("vec_id") % 3 == 0)).select(
        F.col("vec_id").alias("x"), F.col("v").alias("xv")
    )
    tgt = e.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("y"), F.col("v").alias("yv")
    )
    pairs = tgt.crossJoin(F.broadcast(src)).select(
        "x", "y", F.round(cosine(F.col("xv"), F.col("yv")), 4).alias("cos")
    )
    wx = Window.partitionBy("x").orderBy(F.desc("cos"), "y")
    ax = (
        pairs.withColumn("rnx", F.row_number().over(wx))
        .filter(F.col("rnx") <= 4)
        .groupBy("x")
        .agg(
            F.round(
                F.sum(F.col("cos").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avgk_x")
        )
    )
    wy = Window.partitionBy("y").orderBy(F.desc("cos"), "x")
    ay = (
        pairs.withColumn("rny", F.row_number().over(wy))
        .filter(F.col("rny") <= 4)
        .groupBy("y")
        .agg(
            F.round(
                F.sum(F.col("cos").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avgk_y")
        )
    )
    scored = (
        pairs.join(F.broadcast(ax), "x")
        .join(F.broadcast(ay), "y")
        .select(
            "x",
            "y",
            "cos",
            F.round(
                F.col("cos") / (0.5 * (F.col("avgk_x") + F.col("avgk_y"))), 6
            ).alias("margin"),
        )
    )
    wbest = Window.partitionBy("x").orderBy(F.desc("margin"), "y")
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter((F.col("rn") == 1) & (F.col("margin") > 1.0))
        .select(
            F.col("x").alias("src_id"),
            F.col("y").alias("tgt_id"),
            "cos",
            "margin",
        )
    )


# Per-source dataset card: the one-pass observability summary a corpus
# curator reads before mixing (docs, chars, token mass, language mix,
# exact-dup rate, length quantiles) at three grains via ROLLUP
# ((source, lang), (source), ()) — Catalyst expands the grouping sets in
# one pass (two exchanges total: the expand-aggregate plus the
# distinct-count second phase) instead of three unioned aggregations.
# Exact-dup rate uses
# the cross-engine poly_hash of the text; quantiles interpolate type-7 in
# both engines (Spark percentile == DuckDB quantile_cont).
@register(
    "dataset_card_q",
    f"""
    WITH d AS (
        SELECT source, lang, n_chars,
               len(string_split(text, ' ')) AS n_tok,
               {_SQL_POLY.format(s="text")} AS th
        FROM documents
    )
    SELECT COALESCE(source, '<all>') AS source,
           COALESCE(lang, '<all>') AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT th) AS BIGINT) AS n_distinct_texts,
           CAST(ROUND(1.0 - COUNT(DISTINCT th) / CAST(COUNT(*) AS DOUBLE),
                6) AS DOUBLE) AS dup_rate,
           CAST(ROUND(quantile_cont(n_chars, 0.5), 6) AS DOUBLE) AS p50_chars,
           CAST(ROUND(quantile_cont(n_chars, 0.9), 6) AS DOUBLE) AS p90_chars
    FROM d GROUP BY ROLLUP (source, lang)
    """,
    headline=True,
)
def dataset_card_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tok"),
        poly_hash("text").alias("th"),
    )
    return d.rollup("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.countDistinct("th").cast("long").alias("n_distinct_texts"),
        F.round(
            1.0 - F.countDistinct("th") / F.count("*").cast("double"), 6
        ).alias("dup_rate"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 6).alias("p90_chars"),
    ).select(
        F.coalesce("source", F.lit("<all>")).alias("source"),
        F.coalesce("lang", F.lit("<all>")).alias("lang"),
        "n_docs", "total_chars", "total_tokens", "n_distinct_texts",
        "dup_rate", "p50_chars", "p90_chars",
    )


# Near-dup cluster observability: cluster docs by their opening-8-token
# template hash (the boilerplate pre-filter), then report the cluster
# SIZE DISTRIBUTION — how many clusters of each size, the mass trapped in
# clusters >= 2, and the dedup rate if each cluster kept one canonical
# row. The histogram a dedup run is tuned by. Scale shape: two
# vocabulary-scale aggregations (hash -> size, size -> histogram); doc
# payloads never shuffle.
@register(
    "dedup_cluster_stats_q",
    f"""
    WITH p AS (
        SELECT doc_id,
               {_SQL_POLY.format(
                   s="array_to_string(list_slice(" + _SQL_TOKENS
                   + ", 1, 8), ' ')")} AS h
        FROM documents WHERE len({_SQL_TOKENS}) >= 8
    ),
    cl AS (SELECT h, COUNT(*) AS sz FROM p GROUP BY h)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz - 1) AS BIGINT) AS n_dropped_if_deduped
    FROM cl GROUP BY sz
    """,
)
def dedup_cluster_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    p = d.filter(F.size(t) >= 8).select(
        poly_hash(F.array_join(F.slice(t, 1, 8), " ")).alias("h")
    )
    cl = p.groupBy("h").agg(F.count("*").alias("sz"))
    return cl.groupBy(F.col("sz").cast("long").alias("cluster_size")).agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
        F.sum(F.col("sz") - 1).cast("long").alias("n_dropped_if_deduped"),
    )


# LSH candidate-quality evaluation: the aggregate precision of the
# banded MinHash candidate generator at the production threshold — the
# number a pipeline tunes band geometry against before trusting LSH at
# 100 TB (companion to ann_recall_check on the vector side and
# minhash_estimate_q's per-pair view). Scale shape: identical to
# neardup_pairs (signatures per-row, only (band, bucket) keys shuffle,
# exact verify joins carry ids + shingle sets); the final aggregate is
# one row.
@register(
    "lsh_precision_eval_q",
    f"""
    WITH {_sql_minhash_sigs(16)},
    bands AS (
        SELECT doc_id, j // 4 AS band,
               list_reduce(list(minhash ORDER BY j),
                           (a, b) -> (a * 31 + b) % 1000000007) AS bucket
        FROM sig GROUP BY doc_id, j // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT id_a, id_b,
               ROUND(len(list_intersect(ha.hs, hb.hs))::DOUBLE
                     / (len(ha.hs) + len(hb.hs)
                        - len(list_intersect(ha.hs, hb.hs))), 4) AS jaccard
        FROM cand
        JOIN sh ha ON ha.doc_id = id_a
        JOIN sh hb ON hb.doc_id = id_b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN jaccard >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true,
           CAST(ROUND(SUM(CASE WHEN jaccard >= 0.7 THEN 1 ELSE 0 END)
                / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS precision_at_07
    FROM scored
    """,
)
def lsh_precision_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    pairs = neardup_pairs(
        d, "doc_id", "text", threshold=0.0, num_perm=16, rows_per_band=4, k=5
    )
    true_flag = (F.col("jaccard") >= 0.7).cast("long")
    return pairs.agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.sum(true_flag).cast("long").alias("n_true"),
        F.round(
            F.sum(true_flag) / F.count("*").cast("double"), 6
        ).alias("precision_at_07"),
    )


# Stratified eval split: per (source, lang) stratum take the first
# ceil(10%) of docs in content-hash order — proportional representation
# that a plain global hash split does not guarantee for small strata.
# Scale shape: one rank window per stratum partition (parallel across
# strata) + one count agg; the hash order makes the split deterministic
# and engine-identical. Companion to train_test_split (global hash split).
@register(
    "stratified_split_q",
    f"""
    WITH d AS (
        SELECT source, lang,
               ROW_NUMBER() OVER (PARTITION BY source, lang
                   ORDER BY {_SQL_POLY.format(s="text")}, doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY source, lang) AS n
        FROM documents
    )
    SELECT source, lang,
           CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN rk <= CAST(CEIL(0.1 * n) AS BIGINT)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_eval
    FROM d GROUP BY source, lang
    """,
)
def stratified_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape (reworked r7 per VERDICT r6 #2): the per-stratum rank
    comes from operators.indexing.grouped_index — ONE global
    range-partitioned rank over (source, lang, hash, doc_id) that stays
    parallel however large a stratum grows, with per-group offsets and
    sizes broadcast from a metadata-scale stats pass — never a
    ``ROW_NUMBER OVER (PARTITION BY source, lang)`` window whose
    partitions are corpus-scale. The oracle keeps the plain window
    formulation (semantics, not plan)."""
    from iniz_exporters_spark.operators.indexing import grouped_index

    d = Catalog(spark, sf_dir).documents
    ranked = grouped_index(
        d.select("source", "lang", "text", "doc_id"),
        ["source", "lang"],
        [poly_hash("text"), F.col("doc_id")],
        "rk",
        size_col="n",
    )
    is_eval = (
        F.col("rk") <= F.ceil(0.1 * F.col("n")).cast("long")
    ).cast("long")
    return ranked.groupBy("source", "lang").agg(
        F.max("n").cast("long").alias("n_total"),
        F.sum(is_eval).cast("long").alias("n_eval"),
    )


# Inter-event gap distribution per user stream — the measurement that
# justifies a sessionization threshold (session_window's 30-minute gap
# is a tuning choice; this query shows what the data actually does).
# Scale shape: one LAG window per user partition, then a single global
# aggregate; quantiles interpolate type-7 in both engines.
@register(
    "session_gap_stats_q",
    """
    WITH gaps AS (
        SELECT (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)))
                   / 1000000.0 AS gap_s
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(ROUND(CAST(SUM(CAST(gap_s AS DECIMAL(28,12))) AS DOUBLE)
                / COUNT(*), 6) AS DOUBLE) AS mean_gap_s,
           CAST(ROUND(quantile_cont(gap_s, 0.5), 6) AS DOUBLE) AS p50_gap_s,
           CAST(ROUND(quantile_cont(gap_s, 0.9), 6) AS DOUBLE) AS p90_gap_s,
           CAST(ROUND(SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END)
                / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS pct_over_30m
    FROM gaps WHERE gap_s IS NOT NULL
    """,
)
def session_gap_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            / 1_000_000.0
        ).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    over = (F.col("gap_s") > 1800).cast("long")
    return gaps.agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.round(
            F.sum(F.col("gap_s").cast("decimal(28,12)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 6).alias("p50_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 6).alias("p90_gap_s"),
        F.round(F.sum(over) / F.count("*").cast("double"), 6).alias(
            "pct_over_30m"
        ),
    )


# End-to-end LOCATIONS exporter as a driver row (companion to
# concepts_export_q — the second of the reference's three entry points,
# location_csv_export.py:74-102): self-join parent lookup, dynamic
# Tag|<name> indicator pivot, dynamic Attribute|<type> value pivot,
# fixed-prefix column contract. The committed fixture
# (fixtures/locations/, tools/make_location_fixtures.py) includes a
# child-before-parent id, 0/1/many tags and attributes, a retired
# location, and a ':'-bearing attribute value (the reference bug we do
# not reproduce). The oracle replays both pivots as grouped CASE
# aggregates.
_LOC_FIXTURE_DIR = os.path.join(_FIXTURES_ROOT, "locations")


@register(
    "locations_export_q",
    f"""
    WITH loc AS (SELECT * FROM read_parquet('{_LOC_FIXTURE_DIR}/location.parquet')),
    ltm AS (SELECT * FROM read_parquet('{_LOC_FIXTURE_DIR}/location_tag_map.parquet')),
    lt AS (SELECT * FROM read_parquet('{_LOC_FIXTURE_DIR}/location_tag.parquet')),
    la AS (SELECT * FROM read_parquet('{_LOC_FIXTURE_DIR}/location_attribute.parquet')),
    lat AS (SELECT * FROM read_parquet('{_LOC_FIXTURE_DIR}/location_attribute_type.parquet')),
    tags AS (
        SELECT ltm.location_id,
               MAX(CASE WHEN lt.name = 'Lab Location' THEN 'TRUE' END)
                   AS tag_lab,
               MAX(CASE WHEN lt.name = 'Login Location' THEN 'TRUE' END)
                   AS tag_login,
               MAX(CASE WHEN lt.name = 'Visit Location' THEN 'TRUE' END)
                   AS tag_visit
        FROM ltm JOIN lt ON ltm.location_tag_id = lt.location_tag_id
        GROUP BY ltm.location_id
    ),
    attrs AS (
        SELECT la.location_id,
               MAX(CASE WHEN lat.name = 'Beds' THEN la.value_reference END)
                   AS a_beds,
               MAX(CASE WHEN lat.name = 'Code' THEN la.value_reference END)
                   AS a_code,
               MAX(CASE WHEN lat.name = 'URL' THEN la.value_reference END)
                   AS a_url
        FROM la JOIN lat
          ON la.attribute_type_id = lat.location_attribute_type_id
        GROUP BY la.location_id
    )
    SELECT l.uuid AS "UUID",
           CAST(l.retired AS INT) AS "Void/Retire",
           l.name AS "Name",
           l.description AS "Description",
           p.name AS "Parent",
           a.a_beds AS "Attribute|Beds",
           a.a_code AS "Attribute|Code",
           a.a_url AS "Attribute|URL",
           t.tag_lab AS "Tag|Lab Location",
           t.tag_login AS "Tag|Login Location",
           t.tag_visit AS "Tag|Visit Location"
    FROM loc l
    LEFT JOIN loc p ON l.parent_location = p.location_id
    LEFT JOIN attrs a ON l.location_id = a.location_id
    LEFT JOIN tags t ON l.location_id = t.location_id
    """,
)
def locations_export_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The locations pipeline end-to-end on the committed fixture (reads
    the fixture dir regardless of sf_dir — metadata-scale by design).
    Output ordering (location_id asc) is pinned by pytest; the driver's
    order-insensitive hash checks every exported value and the
    data-discovered pivot schema."""
    from iniz_exporters_spark.exporters.locations import (
        build_locations_export,
    )

    tables = {
        n: spark.read.parquet(f"{_LOC_FIXTURE_DIR}/{n}.parquet")
        for n in (
            "location", "location_tag_map", "location_tag",
            "location_attribute", "location_attribute_type",
        )
    }
    cols, df = build_locations_export(tables)
    return df


# End-to-end SET-CREATOR (the third reference entry point,
# concept_set_csv_creator.py:40-77): the first CSV row is the set
# concept, every following row becomes a member row with 1-based Sort
# Weight in input order. Driver-side by design (the input is a
# metadata-scale curation CSV; the reference reads it with csv.reader);
# the fixture's member uuids sort in input order so the oracle can
# replay Sort Weight relationally.
_SET_FIXTURE_CSV = os.path.join(_FIXTURES_ROOT, "set_creator", "input.csv")


@register(
    "concept_set_q",
    f"""
    WITH c AS (
        SELECT * FROM read_csv('{_SET_FIXTURE_CSV}', header = true,
                               all_varchar = true)
    ),
    s AS (SELECT uuid FROM c WHERE "Fully specified name:en" = 'My Set'),
    m AS (
        SELECT uuid, "Fully specified name:en" AS fsn,
               ROW_NUMBER() OVER (ORDER BY uuid) AS sw
        FROM c WHERE uuid <> (SELECT uuid FROM s)
    )
    SELECT s.uuid AS "Concept",
           m.uuid AS "Member",
           m.fsn AS "#Fully specified name:en",
           'CONCEPT-SET' AS "Member Type",
           CAST(m.sw AS BIGINT) AS "Sort Weight",
           CAST(NULL AS VARCHAR) AS "Void/Retire"
    FROM m CROSS JOIN s
    """,
)
def concept_set_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 reshape end-to-end over the committed curation CSV."""
    import csv as _csv

    from iniz_exporters_spark.exporters.set_creator import concept_set_rows

    with open(_SET_FIXTURE_CSV) as f:
        concepts = list(_csv.DictReader(f, dialect="excel"))
    fieldnames, rows = concept_set_rows(concepts)
    out = [
        {
            k: (None if r.get(k) in (None, "") else r.get(k))
            if k == "Void/Retire"
            else r.get(k)
            for k in fieldnames
        }
        for r in rows
    ]
    fields = [
        T.StructField(
            k, T.LongType() if k == "Sort Weight" else T.StringType(), True
        )
        for k in fieldnames
    ]
    return spark.createDataFrame(out, T.StructType(fields))


# The fourth (mini) reference entry point as a driver row: the
# order-types SQL export (sql/ordertypes.sql:1-9) — self left-join for
# the parent uuid, fixed header spellings ('Uuid', 'Java class name',
# Parent last), ordered by primary key. Completes driver coverage of
# every reference entry point (concepts / locations / set-creator /
# ordertypes).
_OT_FIXTURE = os.path.join(_FIXTURES_ROOT, "ordertypes", "order_type.parquet")


@register(
    "ordertypes_export_q",
    f"""
    WITH ot AS (SELECT * FROM read_parquet('{_OT_FIXTURE}'))
    SELECT t.uuid AS "Uuid",
           CAST(t.retired AS INT) AS "Void/Retire",
           t.name AS "Name",
           t.description AS "Description",
           t.java_class_name AS "Java class name",
           p.uuid AS "Parent"
    FROM ot t LEFT JOIN ot p ON t.parent = p.order_type_id
    """,
)
def ordertypes_export_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.exporters.hierarchy import (
        ordertypes_sql_export,
    )

    return ordertypes_sql_export(spark.read.parquet(_OT_FIXTURE))


# Classifier evaluation for the stopword language-ID heuristic: the full
# confusion matrix (true lang x predicted lang) plus per-class precision
# /recall/F1 — the eval every lang-ID filter needs before it gates a
# corpus. Scale shape: prediction is per-row Catalyst (zero shuffles);
# the matrix is one (true, pred) count aggregation; the per-class stats
# re-aggregate the |langs|^2-row matrix (metadata scale).
@register(
    "lang_confusion_q",
    f"""
    WITH t AS (SELECT doc_id, lang, {_SQL_TOKENS} AS toks FROM documents),
    s AS (
        SELECT doc_id, lang,
               len(list_filter(toks, x -> x IN
                   ('the','a','and','of','to','in','is','it'))) AS c_en,
               len(list_filter(toks, x -> x IN
                   ('el','la','de','que','y','los','en','un'))) AS c_es,
               len(list_filter(toks, x -> x IN
                   ('der','die','das','und','ist','ein','nicht','mit'))) AS c_de,
               len(list_filter(toks, x -> x IN
                   ('le','la','de','et','est','les','des','une'))) AS c_fr
        FROM t
    ),
    pred AS (
        SELECT lang AS true_lang,
               CASE WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
                    WHEN c_en = greatest(c_en, c_es, c_de, c_fr) THEN 'en'
                    WHEN c_es = greatest(c_en, c_es, c_de, c_fr) THEN 'es'
                    WHEN c_de = greatest(c_en, c_es, c_de, c_fr) THEN 'de'
                    ELSE 'fr' END AS pred_lang
        FROM s
    ),
    cm AS (
        SELECT true_lang, pred_lang, COUNT(*) AS n
        FROM pred GROUP BY true_lang, pred_lang
    ),
    tp AS (
        SELECT true_lang AS c, SUM(CASE WHEN true_lang = pred_lang
                   THEN n ELSE 0 END) AS hit,
               SUM(n) AS support
        FROM cm GROUP BY true_lang
    ),
    pp AS (SELECT pred_lang AS c, SUM(n) AS predicted FROM cm
           GROUP BY pred_lang)
    SELECT tp.c AS lang,
           CAST(tp.support AS BIGINT) AS support,
           CAST(tp.hit AS BIGINT) AS n_correct,
           CAST(COALESCE(pp.predicted, 0) AS BIGINT) AS n_predicted,
           CAST(ROUND(CASE WHEN COALESCE(pp.predicted, 0) > 0
                THEN CAST(tp.hit AS DOUBLE) / pp.predicted
                ELSE 0.0 END, 6) AS DOUBLE) AS precision,
           CAST(ROUND(CAST(tp.hit AS DOUBLE) / tp.support, 6) AS DOUBLE)
               AS recall,
           CAST(ROUND(CASE WHEN COALESCE(pp.predicted, 0) > 0
                    AND tp.hit > 0
                THEN 2.0 * (CAST(tp.hit AS DOUBLE) / pp.predicted)
                     * (CAST(tp.hit AS DOUBLE) / tp.support)
                     / (CAST(tp.hit AS DOUBLE) / pp.predicted
                        + CAST(tp.hit AS DOUBLE) / tp.support)
                ELSE 0.0 END, 6) AS DOUBLE) AS f1
    FROM tp LEFT JOIN pp ON tp.c = pp.c
    """,
)
def lang_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    pred = d.select(
        F.col("lang").alias("true_lang"),
        predict_lang("text").alias("pred_lang"),
    )
    cm = pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").alias("n")
    ).localCheckpoint()
    tp = cm.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n").cast("long").alias("support"),
        F.sum(
            F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n"))
            .otherwise(0)
        ).cast("long").alias("n_correct"),
    )
    pp = cm.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n").cast("long").alias("n_predicted")
    )
    j = tp.join(pp, "lang", "left")
    n_pred = F.coalesce("n_predicted", F.lit(0))
    prec = F.when(
        n_pred > 0, F.col("n_correct").cast("double") / n_pred
    ).otherwise(0.0)
    rec = F.col("n_correct").cast("double") / F.col("support")
    return j.select(
        "lang",
        "support",
        "n_correct",
        n_pred.cast("long").alias("n_predicted"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(
                (n_pred > 0) & (F.col("n_correct") > 0),
                2.0 * prec * rec / (prec + rec),
            ).otherwise(0.0),
            6,
        ).alias("f1"),
    )


# Inter-arrival burstiness per event type (Goh & Barabasi 2008):
# B = (sigma - mu) / (sigma + mu) over the per-user gap distribution —
# -1 = periodic, 0 = Poisson, -> 1 = bursty. The feature that separates
# bot-like from human-like streams. Scale shape: one LAG window per user
# partition, then one aggregation per event type; moments are decimal
# sums so partitioning never changes the result.
@register(
    "burstiness_q",
    """
    WITH gaps AS (
        SELECT event_type,
               (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id))) / 1000000.0 AS g
        FROM events
    ),
    m AS (
        -- gaps are exact microseconds/1e6, so scale 6 is lossless;
        -- width 30 forces int128 storage so g*g cannot overflow the
        -- multiply, while scale 6 keeps the summed product raw values
        -- far inside int128
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(g AS DECIMAL(30,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(g AS DECIMAL(30,6))
                        * CAST(g AS DECIMAL(30,6))) AS DOUBLE) AS s2
        FROM gaps WHERE g IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           CAST(ROUND(s1 / n, 6) AS DOUBLE) AS mean_gap_s,
           CAST(ROUND(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0)), 6)
                AS DOUBLE) AS sd_gap_s,
           CAST(ROUND((sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0))
                       - s1 / n)
                / (sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0))
                   + s1 / n), 6) AS DOUBLE) AS burstiness
    FROM m
    """,
)
def burstiness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    g = ev.select(
        "event_type",
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            / 1_000_000.0
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    gd = F.col("g").cast("decimal(30,6)")
    m = g.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(gd).cast("double").alias("s1"),
        F.sum(gd * gd).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    sd = F.sqrt(var)
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(sd, 6).alias("sd_gap_s"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# Round-8 additions: three pipeline analytics filling real gaps in the
# extension surface (time-series bars, multilingual tokenizer sizing, vocab
# coverage curves). Registered last so they join the r8 driver window's
# spare slots with fresh driver rows.
# ---------------------------------------------------------------------------


# OHLC daily bars over purchase values. Scale shape: ONE hash aggregation
# on day (~tens of groups) — open/close use min_by/max_by over a zero-padded
# (epoch_us, event_id) string key, so first/last per day needs NO window and
# NO per-day partition (a day partition is corpus-scale at 100 TB); ties in
# ts break on event_id identically in both engines. Volume sums in exact
# decimal.
@register(
    "ohlc_bars_q",
    """
    SELECT CAST(ts AS DATE) AS day,
           arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                          lpad(CAST(event_id AS VARCHAR), 20, '0'))
               AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                          lpad(CAST(event_id AS VARCHAR), 20, '0'))
               AS close_value,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM events WHERE event_type = 'purchase'
    GROUP BY CAST(ts AS DATE)
    """,
)
def ohlc_bars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    return e.groupBy(F.to_date("ts").alias("day")).agg(
        F.min_by("value", key).alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max_by("value", key).alias("close_value"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("volume"),
    )


# Tokenizer fertility by language: BPE-ish subwords per whitespace word and
# chars per subword — THE standard multilingual tokenizer-sizing metric
# (a high-fertility language pays more sequence length per word). Scale
# shape: per-doc counts are pure Catalyst regexp work inside the scan
# projection; one map-side-combinable aggregation on lang (few groups).
# All sums are integer-exact; the two ratios divide exact BIGINTs.
@register(
    "tokenizer_fertility_q",
    f"""
    WITH d AS (
        SELECT lang,
               len(regexp_extract_all(text, '{BPE_ISH.replace("'", "''")}'))
                   AS bpe,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> x <> '')) AS ws,
               length(text) AS chars
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
           CAST(ROUND(CAST(SUM(bpe) AS DOUBLE) / SUM(ws), 6) AS DOUBLE)
               AS fertility,
           CAST(ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(bpe), 6) AS DOUBLE)
               AS chars_per_token
    FROM d GROUP BY lang
    """,
)
def tokenizer_fertility_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents.select(
        "lang",
        F.regexp_count("text", F.lit(BPE_ISH)).alias("bpe"),
        whitespace_token_count("text").alias("ws"),
        F.length("text").alias("chars"),
    )
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("bpe").cast("long").alias("n_bpe_tokens"),
        F.sum("ws").cast("long").alias("n_ws_tokens"),
        F.round(
            F.sum("bpe").cast("double") / F.sum("ws"), 6
        ).alias("fertility"),
        F.round(
            F.sum("chars").cast("double") / F.sum("bpe"), 6
        ).alias("chars_per_token"),
    )


# Bigram vocabulary coverage curve: what share of all corpus bigram
# occurrences the top-k bigrams cover, at k in {10, 50, 100, 500} — the
# vocab-sizing / Zipf-mass diagnostic. Scale shape: bigram counts are one
# hash aggregation; the global top-500 compiles to TakeOrderedAndProject
# (per-partition heaps + driver merge of 500 rows, NO global sort); the
# cumulative window runs over ≤500 rows (bounded, metadata-scale) and the
# totals broadcast. Ranks tie-break on the bigram text so both engines
# pick identical top sets.
@register(
    "ngram_coverage_q",
    f"""
    WITH w AS (SELECT {_SQL_TOKENS} AS toks FROM documents),
    b AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
               AS bigram
        FROM w WHERE len(toks) >= 2
    ),
    c AS (SELECT bigram, COUNT(*) AS cnt FROM b GROUP BY bigram),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_distinct
        FROM c
    ),
    top AS (
        SELECT cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, bigram) AS rk
        FROM c ORDER BY cnt DESC, bigram LIMIT 500
    ),
    cum AS (SELECT rk, SUM(cnt) OVER (ORDER BY rk) AS cum_cnt FROM top),
    ks AS (SELECT unnest([10, 50, 100, 500]) AS k)
    SELECT k,
           CAST(LEAST(k, tot.n_distinct) AS BIGINT) AS vocab_used,
           CAST(ROUND(CAST(cum_cnt AS DOUBLE) / tot.total, 6) AS DOUBLE)
               AS coverage
    FROM ks CROSS JOIN tot
    JOIN cum ON cum.rk = LEAST(k, tot.n_distinct, 500)
    """,
)
def ngram_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = _tokens("text")
    bigrams = F.when(
        F.size(toks) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    )
    c = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )
    tot = c.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_distinct"),
    )
    top = c.orderBy(F.col("cnt").desc(), "bigram").limit(500)
    # bounded window: ≤500 rows after the limit, never corpus-scale
    worder = Window.orderBy(F.col("cnt").desc(), "bigram")
    cum = top.select(
        F.row_number().over(worder).alias("rk"),
        F.sum("cnt")
        .over(worder.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_cnt"),
    )
    ks = spark.createDataFrame([(10,), (50,), (100,), (500,)], "k int")
    return (
        ks.crossJoin(F.broadcast(tot))
        .withColumn(
            "rk_at",
            F.least(
                F.col("k").cast("long"),
                F.col("n_distinct"),
                F.lit(500).cast("long"),
            ),
        )
        .join(F.broadcast(cum), F.col("rk_at") == F.col("rk"))
        .select(
            "k",
            F.least(F.col("k").cast("long"), F.col("n_distinct")).alias(
                "vocab_used"
            ),
            F.round(
                F.col("cum_cnt").cast("double") / F.col("total"), 6
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 2: rank statistics, survival analysis, generation
# diversity. The two rank tests ride the new ``global_cumsum`` /
# ``avg_rank2_table`` primitives (operators/indexing.py): tie-averaged
# midranks from a range-partitioned prefix count — NEVER the
# single-partition window ANSI AVG(ROW_NUMBER()) OVER (PARTITION BY v)
# would need — and every rank is kept DOUBLED so it stays an exact
# integer (ties average to .5 steps), making all rank sums
# order-independent.
# ---------------------------------------------------------------------------


# Mann-Whitney U (Wilcoxon rank-sum) test: purchase vs click order values.
# Scale shape: the value column collapses to one row per DISTINCT value
# (hash agg with map-side combine), midranks come from global_cumsum's
# range-partitioned prefix count (metadata-scale offsets broadcast), and
# the statistic is one final single-row aggregation of exact BIGINTs
# (2·R1, tie term t³−t) — the float expression (normal approximation with
# tie correction) runs once, identically shaped in both engines.
@register(
    "mann_whitney_q",
    """
    WITH b AS (
        SELECT value AS v,
               CAST(event_type = 'purchase' AS BIGINT) AS is1
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    c AS (SELECT v, COUNT(*) AS cnt, SUM(is1) AS cnt1 FROM b GROUP BY v),
    r AS (
        SELECT cnt, cnt1,
               2 * SUM(cnt) OVER (ORDER BY v) - cnt + 1 AS rank2
        FROM c
    ),
    s AS (
        SELECT CAST(SUM(cnt1) AS BIGINT) AS n1,
               CAST(SUM(cnt - cnt1) AS BIGINT) AS n2,
               CAST(SUM(CAST(cnt1 AS HUGEINT) * rank2) AS BIGINT) AS two_r1,
               CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS BIGINT)
                   AS ties
        FROM r
    )
    SELECT n1, n2,
           CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u_stat,
           CAST(ROUND(
               (CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0
                - CAST(n1 * n2 AS DOUBLE) / 2.0)
               / SQRT(CAST(n1 * n2 AS DOUBLE) / 12.0
                      * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                         - CAST(ties AS DOUBLE)
                           / (CAST(n1 + n2 AS DOUBLE)
                              * (CAST(n1 + n2 AS DOUBLE) - 1.0)))),
               6) + 0.0 AS DOUBLE) AS z_score
    FROM s
    """,
)
def mann_whitney_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.indexing import avg_rank2_table

    e = Catalog(spark, sf_dir).events
    b = e.filter(F.col("event_type").isin("purchase", "click")).select(
        F.col("value").alias("v"),
        (F.col("event_type") == "purchase").cast("long").alias("is1"),
    )
    c = b.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("is1").alias("cnt1")
    )
    r = avg_rank2_table(c, "v")
    s = r.agg(
        F.sum("cnt1").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt1")).cast("long").alias("n2"),
        F.sum(F.col("cnt1") * F.col("rank2")).cast("long").alias("two_r1"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("long")
        .alias("ties"),
    )
    n1d = (F.col("n1") * F.col("n2")).cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = (
        F.col("two_r1") - F.col("n1") * (F.col("n1") + F.lit(1))
    ).cast("double") / F.lit(2.0)
    mu = n1d / F.lit(2.0)
    sig2 = n1d / F.lit(12.0) * (
        (nd + F.lit(1.0))
        - F.col("ties").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    return s.select(
        "n1",
        "n2",
        u1.alias("u_stat"),
        (F.round((u1 - mu) / F.sqrt(sig2), 6) + F.lit(0.0)).alias("z_score"),
    )


# Spearman rank correlation between document length (chars) and
# whitespace word count. Scale shape: each metric collapses to its
# distinct-value midrank table (global_cumsum — range-partitioned, no
# single-partition window), rows pick up their two ranks via two hash
# joins on the value columns, and the correlation reduces to one row of
# exact integer sums (doubled ranks in DECIMAL(38,0)/HUGEINT so products
# stay exact at corpus cardinality). Pearson-on-ranks is scale-invariant
# under the doubling, so the classic formula applies to rank2 directly.
@register(
    "spearman_corr_q",
    """
    WITH d AS (
        SELECT n_chars AS x,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> t <> '')) AS y
        FROM documents
    ),
    cx AS (SELECT x, COUNT(*) AS cnt FROM d GROUP BY x),
    rx AS (SELECT x, 2 * SUM(cnt) OVER (ORDER BY x) - cnt + 1 AS a FROM cx),
    cy AS (SELECT y, COUNT(*) AS cnt FROM d GROUP BY y),
    ry AS (SELECT y, 2 * SUM(cnt) OVER (ORDER BY y) - cnt + 1 AS b FROM cy),
    j AS (SELECT a, b FROM d JOIN rx USING (x) JOIN ry USING (y)),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(a AS HUGEINT) * b) AS sab,
               SUM(CAST(a AS HUGEINT) * a) AS saa,
               SUM(CAST(b AS HUGEINT) * b) AS sbb,
               SUM(CAST(a AS HUGEINT)) AS sa,
               SUM(CAST(b AS HUGEINT)) AS sb
        FROM j
    )
    SELECT n AS n_rows,
           CAST(ROUND(
               (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                       - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                         - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))),
               6) + 0.0 AS DOUBLE) AS spearman_rho
    FROM s
    """,
)
def spearman_corr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.indexing import avg_rank2_table

    d = Catalog(spark, sf_dir).documents.select(
        F.col("n_chars").alias("x"),
        whitespace_token_count("text").cast("long").alias("y"),
    )
    rx = avg_rank2_table(
        d.groupBy("x").agg(F.count(F.lit(1)).alias("cnt")), "x"
    ).select("x", F.col("rank2").alias("a"))
    ry = avg_rank2_table(
        d.groupBy("y").agg(F.count(F.lit(1)).alias("cnt")), "y"
    ).select("y", F.col("rank2").alias("b"))
    j = d.join(rx, "x").join(ry, "y")
    dec = "decimal(19,0)"
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a").cast(dec) * F.col("b").cast(dec)).alias("sab"),
        F.sum(F.col("a").cast(dec) * F.col("a").cast(dec)).alias("saa"),
        F.sum(F.col("b").cast(dec) * F.col("b").cast(dec)).alias("sbb"),
        F.sum(F.col("a").cast(dec)).alias("sa"),
        F.sum(F.col("b").cast(dec)).alias("sb"),
    )
    nd = F.col("n").cast("double")
    sab, saa, sbb = (F.col(c).cast("double") for c in ("sab", "saa", "sbb"))
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    rho = (nd * sab - sa * sb) / F.sqrt(
        (nd * saa - sa * sa) * (nd * sbb - sb * sb)
    )
    return s.select(F.col("n").alias("n_rows"), (F.round(rho, 6) + F.lit(0.0)).alias("spearman_rho"))


# Kaplan-Meier survival curve for signup → first-purchase conversion with
# right-censoring (users who never purchase are censored at their last
# observed event). Scale shape: the per-user reduction is three hash
# aggregations + two joins on user_id; the curve itself lives on one row
# per DISTINCT day-duration — bounded by the calendar (metadata scale,
# like ngram_coverage's top-500), so the ordered cumulative windows over
# it are explicitly bounded, never corpus-scale. The product Π(1 − d/n)
# is EXP(SUM(LN ·)) in BOTH engines (same sequential fold order), with a
# cumulative zero-flag handling the d = n_risk boundary where LN is
# undefined (Spark's log(0) is NULL, not -inf).
@register(
    "km_survival_q",
    """
    WITH su AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    la AS (SELECT user_id, MAX(ts) AS tl FROM events GROUP BY user_id),
    pu AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= su.t0
        GROUP BY e.user_id
    ),
    b AS (
        SELECT su.user_id,
               CASE WHEN tp IS NOT NULL
                    THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                    ELSE date_diff('day', CAST(t0 AS DATE), CAST(tl AS DATE))
               END AS t,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM su JOIN la USING (user_id)
        LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    g AS (SELECT t, SUM(obs) AS d, COUNT(*) AS m FROM b GROUP BY t),
    tot AS (SELECT COUNT(*) AS nn FROM b),
    k AS (
        SELECT t, d, nn - (SUM(m) OVER (ORDER BY t) - m) AS n_risk
        FROM g CROSS JOIN tot
    ),
    c AS (
        SELECT t, d, n_risk,
               MAX(CASE WHEN n_risk = d THEN 1 ELSE 0 END)
                   OVER (ORDER BY t) AS z,
               SUM(CASE WHEN n_risk > d
                        THEN LN(CAST(n_risk - d AS DOUBLE)
                                / CAST(n_risk AS DOUBLE))
                        ELSE NULL END) OVER (ORDER BY t) AS sl
        FROM k
    )
    SELECT CAST(t AS BIGINT) AS duration_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(CASE WHEN z = 1 THEN 0.0 ELSE ROUND(EXP(sl), 6) END
                AS DOUBLE) AS survival
    FROM c WHERE d > 0
    """,
)
def km_survival_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    la = ev.groupBy("user_id").agg(F.max("ts").alias("tl"))
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    b = (
        su.join(la, "user_id")
        .join(pu, "user_id", "left")
        .select(
            F.when(
                F.col("tp").isNotNull(),
                F.datediff(F.to_date("tp"), F.to_date("t0")),
            )
            .otherwise(F.datediff(F.to_date("tl"), F.to_date("t0")))
            .cast("long")
            .alias("t"),
            F.when(F.col("tp").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("obs"),
        )
    )
    g = b.groupBy("t").agg(
        F.sum("obs").alias("d"), F.count(F.lit(1)).alias("m")
    )
    tot = b.agg(F.count(F.lit(1)).alias("nn"))
    # bounded windows: one row per distinct day-duration (calendar scale)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("nn") - (F.sum("m").over(wcum) - F.col("m")),
    )
    c = k.select(
        "t",
        "d",
        "n_risk",
        F.max(
            F.when(F.col("n_risk") == F.col("d"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .over(wcum)
        .alias("z"),
        F.sum(
            F.when(
                F.col("n_risk") > F.col("d"),
                F.log(
                    (F.col("n_risk") - F.col("d")).cast("double")
                    / F.col("n_risk").cast("double")
                ),
            )
        )
        .over(wcum)
        .alias("sl"),
    )
    return c.filter(F.col("d") > 0).select(
        F.col("t").alias("duration_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.when(F.col("z") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("sl"), 6))
        .cast("double")
        .alias("survival"),
    )


# Distinct-n generation-diversity metrics per source: distinct-1 and
# distinct-2 (unique n-grams / total n-grams) — the standard corpus
# diversity diagnostic for generated/boilerplate text (low distinct-2 =
# repetitive source). Scale shape: two explode → hash-aggregate passes
# (exact count_distinct is Spark's two-phase partial agg, keyed on ~20
# sources × n-gram — the token rows carry only (source, gram)); the
# three per-source frames join on the tiny source key.
@register(
    "distinct_ngram_diversity_q",
    f"""
    WITH w AS (SELECT source, {_SQL_TOKENS} AS toks FROM documents),
    uni AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS u_total,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS u_distinct
        FROM (SELECT source, unnest(toks) AS tok FROM w) GROUP BY source
    ),
    big AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS b_total,
               CAST(COUNT(DISTINCT bg) AS BIGINT) AS b_distinct
        FROM (
            SELECT source,
                   unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i + 1]))
                   AS bg
            FROM w WHERE len(toks) >= 2
        ) GROUP BY source
    ),
    d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source)
    SELECT d.source, n_docs, u_total, u_distinct,
           CAST(ROUND(CAST(u_distinct AS DOUBLE) / u_total, 6) AS DOUBLE)
               AS distinct_1,
           b_total, b_distinct,
           CAST(ROUND(CAST(b_distinct AS DOUBLE) / b_total, 6) AS DOUBLE)
               AS distinct_2
    FROM d JOIN uni USING (source) JOIN big USING (source)
    """,
)
def distinct_ngram_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    base = d.select("source", _tokens("text").alias("toks"))
    uni = (
        base.select("source", F.explode("toks").alias("tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("u_total"),
            F.count_distinct("tok").cast("long").alias("u_distinct"),
        )
    )
    bigrams = F.when(
        F.size("toks") < 2, F.array().cast("array<string>")
    ).otherwise(
        F.zip_with(
            F.slice("toks", 1, F.size("toks") - 1),
            F.slice("toks", 2, F.size("toks") - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    )
    big = (
        base.select("source", F.explode(bigrams).alias("bg"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("b_total"),
            F.count_distinct("bg").cast("long").alias("b_distinct"),
        )
    )
    docs = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        docs.join(uni, "source")
        .join(big, "source")
        .select(
            "source",
            "n_docs",
            "u_total",
            "u_distinct",
            F.round(
                F.col("u_distinct").cast("double") / F.col("u_total"), 6
            ).alias("distinct_1"),
            "b_total",
            "b_distinct",
            F.round(
                F.col("b_distinct").cast("double") / F.col("b_total"), 6
            ).alias("distinct_2"),
        )
    )


# ---------------------------------------------------------------------------
# Batch — round-9 window prep: vocabulary smoothing, tail estimation,
# trend testing, robust means. Registered a round early so the next
# driver rotation starts from a pre-swept, triple-verified batch.
# ---------------------------------------------------------------------------


# Good-Turing frequency-of-frequencies: the unseen-mass estimate (N1/N)
# and smoothed counts r* = (r+1)·N_{r+1}/N_r for r = 1..4 — the classic
# vocabulary-coverage diagnostic for tokenizer/corpus sizing (how much
# probability mass lives in n-grams we have NOT seen yet). Computed on
# token TRIGRAMS: the synthetic corpus's unigram vocab is closed (31
# types, min count 29 — no tail), trigrams have the Zipf tail the
# estimator needs (N1 ≈ 57% of types at sf0.001). Scale shape:
# trigram counts are one hash agg; frequency-of-frequencies is a second
# hash agg whose key cardinality is the number of DISTINCT counts
# (sub-linear); the r ≤ 5 output join is metadata.
@register(
    "good_turing_q",
    f"""
    WITH w AS (SELECT {_SQL_TOKENS} AS toks FROM documents),
    t AS (
        SELECT g, COUNT(*) AS c
        FROM (
            SELECT unnest(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1] || ' ' ||
                            toks[i + 2])) AS g
            FROM w WHERE len(toks) >= 3
        )
        GROUP BY g
    ),
    ff AS (SELECT c AS r, COUNT(*) AS n_r FROM t GROUP BY c),
    tot AS (
        SELECT CAST(SUM(CAST(r AS HUGEINT) * n_r) AS BIGINT) AS n_tokens,
               CAST(SUM(n_r) AS BIGINT) AS vocab
        FROM ff
    )
    SELECT a.r AS r,
           CAST(a.n_r AS BIGINT) AS n_r,
           CAST(ROUND((CAST(a.r AS DOUBLE) + 1.0)
                      * CAST(COALESCE(b.n_r, 0) AS DOUBLE)
                      / CAST(a.n_r AS DOUBLE), 6) AS DOUBLE) AS r_star,
           CAST(ROUND(CAST(a.n_r AS DOUBLE) * a.r / tot.n_tokens, 6)
                AS DOUBLE) AS mass,
           CAST(ROUND((SELECT CAST(n_r AS DOUBLE) FROM ff WHERE r = 1)
                      / tot.n_tokens, 6) AS DOUBLE) AS p0_unseen_mass
    FROM ff a LEFT JOIN ff b ON b.r = a.r + 1 CROSS JOIN tot
    WHERE a.r <= 5
    """,
)
def good_turing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = _tokens("text")
    grams = F.when(
        F.size(toks) < 3, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        )
    )
    t = (
        d.select(F.explode(grams).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ff = t.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    tot = ff.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        F.sum("n_r").cast("long").alias("vocab"),
    )
    n1 = ff.filter(F.col("r") == 1).select(
        F.col("n_r").cast("double").alias("__n1")
    )
    nxt = ff.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("__nr_next")
    )
    return (
        ff.filter(F.col("r") <= 5)
        .join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            F.col("r").cast("long").alias("r"),
            F.col("n_r").cast("long").alias("n_r"),
            F.round(
                (F.col("r").cast("double") + F.lit(1.0))
                * F.coalesce(F.col("__nr_next"), F.lit(0)).cast("double")
                / F.col("n_r").cast("double"),
                6,
            ).alias("r_star"),
            F.round(
                F.col("n_r").cast("double")
                * F.col("r")
                / F.col("n_tokens"),
                6,
            ).alias("mass"),
            F.round(F.col("__n1") / F.col("n_tokens"), 6).alias(
                "p0_unseen_mass"
            ),
        )
    )


# Hill tail-index estimator over document lengths: alpha from the top-k
# order statistics — the heavy-tail diagnostic for length-based batching
# and outlier budgets (alpha < 2 means unbounded variance; shard plans
# must assume giant documents exist). Scale shape: the top-200 compiles
# to TakeOrderedAndProject (per-partition heaps + a 200-row driver
# merge, NO global sort); everything after is a single-row aggregate on
# 200 rows. doc_id tiebreak makes the cut deterministic under ties.
@register(
    "hill_tail_index_q",
    """
    WITH topk AS (
        SELECT n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 200
    ),
    xk AS (SELECT MIN(n_chars) AS x_k, COUNT(*) AS k FROM topk),
    s AS (
        SELECT SUM(LN(CAST(t.n_chars AS DOUBLE) / CAST(xk.x_k AS DOUBLE)))
                   AS sum_ln,
               MAX(xk.x_k) AS x_k, MAX(xk.k) AS k
        FROM topk t CROSS JOIN xk WHERE t.n_chars > xk.x_k
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(x_k AS BIGINT) AS x_k,
           CAST(ROUND((CAST(k AS DOUBLE) - 1.0) / sum_ln, 6) AS DOUBLE)
               AS hill_alpha
    FROM s
    """,
)
def hill_tail_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    topk = (
        d.select("n_chars", "doc_id")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(200)
    )
    xk = topk.agg(
        F.min("n_chars").alias("x_k"), F.count(F.lit(1)).alias("k")
    )
    s = (
        topk.crossJoin(F.broadcast(xk))
        .filter(F.col("n_chars") > F.col("x_k"))
        .agg(
            F.sum(
                F.log(
                    F.col("n_chars").cast("double")
                    / F.col("x_k").cast("double")
                )
            ).alias("sum_ln"),
            F.max("x_k").alias("x_k"),
            F.max("k").alias("k"),
        )
    )
    return s.select(
        F.col("k").cast("long").alias("k"),
        F.col("x_k").cast("long").alias("x_k"),
        F.round(
            (F.col("k").cast("double") - F.lit(1.0)) / F.col("sum_ln"), 6
        ).alias("hill_alpha"),
    )


# Mann-Kendall trend test over daily purchase revenue — the
# non-parametric partner of theil_sen_q (that one estimates the slope,
# this one tests whether a monotone trend exists at all), with the full
# tie correction and continuity-corrected normal approximation. Scale
# shape: events reduce to ONE calendar-bounded daily row per day (exact
# decimal sums, so both engines compare identical quantized values);
# the O(days²) sign pairs and the tie table live on that metadata-scale
# frame; the statistic is integer arithmetic until one final float
# expression.
@register(
    "mann_kendall_q",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                   AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN b.m > a.m THEN 1
                             WHEN b.m < a.m THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM d a JOIN d b ON a.day < b.day
    ),
    ties AS (
        SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS tie_term
        FROM (SELECT COUNT(*) AS t FROM d GROUP BY m) WHERE t > 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d)
    SELECT n_days, s_stat,
           CAST(ROUND(CASE
               WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
                   / SQRT((CAST(n_days AS DOUBLE) * (n_days - 1)
                           * (2 * n_days + 5) - tie_term) / 18.0)
               WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
                   / SQRT((CAST(n_days AS DOUBLE) * (n_days - 1)
                           * (2 * n_days + 5) - tie_term) / 18.0)
               ELSE 0.0 END, 6) + 0.0 AS DOUBLE) AS z_score
    FROM n CROSS JOIN s CROSS JOIN ties
    """,
)
def mann_kendall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6))
        .cast("decimal(18,6)")
        .alias("m")
    )
    a = d.select(F.col("day").alias("da"), F.col("m").alias("ma"))
    b = d.select(F.col("day").alias("db"), F.col("m").alias("mb"))
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("mb") > F.col("ma"), F.lit(1))
                .when(F.col("mb") < F.col("ma"), F.lit(-1))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        d.groupBy("m")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t")
                    * (F.col("t") - 1)
                    * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    nd = F.col("n_days").cast("double")
    var = (
        nd * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ) / F.lit(18.0)
    sd = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (sd - F.lit(1.0)) / F.sqrt(var))
        .when(F.col("s_stat") < 0, (sd + F.lit(1.0)) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            (F.round(z, 6) + F.lit(0.0)).alias("z_score"),
        )
    )


# Exact 10%-trimmed mean of order values per event type — the robust
# location estimate quality dashboards want when a handful of giant
# orders poison the plain mean. Scale shape: the per-type exact rank
# comes from grouped_index (range-partitioned global rank + broadcast
# per-group offsets — NEVER a per-type window whose partitions scale
# with the corpus); the trimmed band filter and the exact-decimal mean
# are one map-side-combining aggregation. The (value, event_id) order
# makes the trim cut deterministic under ties.
@register(
    "trimmed_mean_q",
    """
    WITH r AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(n) - 2 * (MAX(n) // 10) AS BIGINT) AS n_kept,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                      / COUNT(*), 6) AS DOUBLE) AS trimmed_mean
    FROM r
    WHERE rk > n // 10 AND rk <= n - n // 10
    GROUP BY event_type
    """,
)
def trimmed_mean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.indexing import grouped_index

    e = Catalog(spark, sf_dir).events.select(
        "event_type", "value", "event_id"
    )
    r = grouped_index(
        e,
        ["event_type"],
        [F.col("value").asc(), F.col("event_id").asc()],
        idx_col="rk",
        size_col="n",
    )
    g = F.col("n") / F.lit(10)  # bigint div in SQL: replicate with floor
    kept = r.filter(
        (F.col("rk") > F.floor(F.col("n") / 10))
        & (F.col("rk") <= F.col("n") - F.floor(F.col("n") / 10))
    )
    return kept.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        (F.max("n") - 2 * F.floor(F.max("n") / 10))
        .cast("long")
        .alias("n_kept"),
        F.round(
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("trimmed_mean"),
    )


# Cohen's kappa between the n-gram language identifier and the labeled
# lang column — chance-corrected classifier agreement, THE metric for
# "is the cheap lang-ID good enough to route documents". Scale shape:
# the confusion matrix is one hash agg to (#langs)² rows (metadata);
# marginals and the kappa expression live entirely on that tiny frame
# (full-outer marginal join handles asymmetric label sets, e.g. 'und'
# predictions with no actual row). All counts stay exact BIGINTs until
# one final float expression, identical in both engines.
@register(
    "cohens_kappa_q",
    f"""
    WITH t AS (SELECT doc_id, lang, {_SQL_TOKENS} AS toks FROM documents),
    s AS (
        SELECT lang,
               len(list_filter(toks, x -> x IN
                   ('the','a','and','of','to','in','is','it'))) AS c_en,
               len(list_filter(toks, x -> x IN
                   ('el','la','de','que','y','los','en','un'))) AS c_es,
               len(list_filter(toks, x -> x IN
                   ('der','die','das','und','ist','ein','nicht','mit'))) AS c_de,
               len(list_filter(toks, x -> x IN
                   ('le','la','de','et','est','les','des','une'))) AS c_fr
        FROM t
    ),
    p AS (
        SELECT lang,
               CASE WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
                    WHEN c_en = greatest(c_en, c_es, c_de, c_fr) THEN 'en'
                    WHEN c_es = greatest(c_en, c_es, c_de, c_fr) THEN 'es'
                    WHEN c_de = greatest(c_en, c_es, c_de, c_fr) THEN 'de'
                    ELSE 'fr' END AS pred
        FROM s
    ),
    cm AS (SELECT lang, pred, COUNT(*) AS c FROM p GROUP BY lang, pred),
    rt AS (SELECT lang AS lbl, SUM(c) AS rc FROM cm GROUP BY lang),
    ct AS (SELECT pred AS lbl, SUM(c) AS cc FROM cm GROUP BY pred),
    m AS (
        SELECT CAST(SUM(COALESCE(rc, 0) * COALESCE(cc, 0)) AS BIGINT)
                   AS cross_sum
        FROM rt FULL JOIN ct USING (lbl)
    ),
    d AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN lang = pred THEN c ELSE 0 END)
                    AS BIGINT) AS diag
        FROM cm
    )
    SELECT n AS n_docs,
           CAST(ROUND(CAST(diag AS DOUBLE) / CAST(n AS DOUBLE), 6)
                AS DOUBLE) AS observed_agreement,
           CAST(ROUND(CAST(cross_sum AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                AS DOUBLE) AS expected_agreement,
           CAST(ROUND(
               (CAST(diag AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST(cross_sum AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               / (1.0 - CAST(cross_sum AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))),
               6) + 0.0 AS DOUBLE) AS kappa
    FROM d CROSS JOIN m
    """,
)
def cohens_kappa_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    p = d.select("lang", predict_lang("text").alias("pred"))
    cm = p.groupBy("lang", "pred").agg(F.count(F.lit(1)).alias("c"))
    rt = cm.groupBy(F.col("lang").alias("lbl")).agg(
        F.sum("c").alias("rc")
    )
    ct = cm.groupBy(F.col("pred").alias("lbl")).agg(
        F.sum("c").alias("cc")
    )
    m = (
        rt.join(ct, "lbl", "full")
        .agg(
            F.sum(
                F.coalesce(F.col("rc"), F.lit(0))
                * F.coalesce(F.col("cc"), F.lit(0))
            )
            .cast("long")
            .alias("cross_sum")
        )
    )
    dd = cm.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(
            F.when(F.col("lang") == F.col("pred"), F.col("c")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("diag"),
    )
    nd = F.col("n").cast("double")
    po = F.col("diag").cast("double") / nd
    pe = F.col("cross_sum").cast("double") / (nd * nd)
    return dd.crossJoin(F.broadcast(m)).select(
        F.col("n").alias("n_docs"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        (F.round((po - pe) / (F.lit(1.0) - pe), 6) + F.lit(0.0)).alias(
            "kappa"
        ),
    )


# McNemar's paired test comparing two document-quality filters on the
# SAME corpus: the heuristic quality score (≥ 0.6) vs the linear hashed
# classifier (keep = prob ≥ 0.5). The discordant cells n01/n10 are what
# an A/B filter rollout decision actually hinges on — marginal accuracy
# hides them. Continuity-corrected chi² = (|n01 − n10| − 1)²/(n01+n10).
# Scale shape: both filters are pure codegen'd scan expressions; ONE
# single-row aggregation — no join, the pairing is per-row by
# construction. Exact integers until the final float expression.
@register(
    "mcnemar_q",
    f"""
    WITH t AS (
        SELECT doc_id, length(text) AS n,
               length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   AS n_punct,
               {_SQL_TOKENS} AS toks
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               (ROUND(CAST(
                 0.4::DOUBLE * (1 - CASE WHEN n = 0 THEN 0::DOUBLE
                                         ELSE n_punct::DOUBLE / n END)
               + 0.3::DOUBLE * least(
                     (CASE WHEN len(toks) = 0 THEN 0::DOUBLE
                           ELSE len(list_filter(toks, x -> x IN
                                ('the','a','and','of','to','in','is','it')))::DOUBLE
                                / len(toks) END) * 5, 1.0::DOUBLE)
               + 0.3::DOUBLE * least(n::DOUBLE / 500, 1.0::DOUBLE)
               AS DECIMAL(28,12)), 4)::DOUBLE >= 0.6) AS a,
               (ROUND(CAST(1.0 / (1.0 + exp(-(
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE list_reduce(list_transform(toks,
                                 t -> {_SQL_QW}), (a, b) -> a + b)
                   END) / 8.0)) AS DECIMAL(28,12)), 4)::DOUBLE >= 0.5) AS b
        FROM t
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n11,
               CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n01,
               CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n00
        FROM f
    )
    SELECT n_docs, n11, n10, n01, n00,
           CAST(CASE WHEN n10 + n01 = 0 THEN 0.0
                ELSE ROUND(
                    (ABS(CAST(n10 - n01 AS DOUBLE)) - 1.0)
                    * (ABS(CAST(n10 - n01 AS DOUBLE)) - 1.0)
                    / CAST(n10 + n01 AS DOUBLE), 6)
                END AS DOUBLE) AS mcnemar_chi2
    FROM s
    """,
)
def mcnemar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    a = quality_score("text") >= 0.6
    b = (
        linear_quality_score(F.col("text"), dim=64, scale=8.0, round_to=4)
        >= 0.5
    )
    s = d.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    diff = F.abs((F.col("n10") - F.col("n01")).cast("double"))
    chi2 = F.when(F.col("n10") + F.col("n01") == 0, F.lit(0.0)).otherwise(
        F.round(
            (diff - F.lit(1.0))
            * (diff - F.lit(1.0))
            / (F.col("n10") + F.col("n01")).cast("double"),
            6,
        )
    )
    return s.select(
        "n_docs", "n11", "n10", "n01", "n00", chi2.alias("mcnemar_chi2")
    )


# Brown-Forsythe (median-based Levene) test: are order-value variances
# homogeneous across event types? The robust precondition check before
# any pooled-variance comparison. All deviations are DOUBLED
# (z2 = |2v − (v_lo + v_hi)|) so the per-group median never divides —
# the W statistic is scale-invariant, and every sum stays an exact
# DECIMAL, immune to shuffle-order float noise. Scale shape: per-type
# ranks via grouped_index (no corpus-scale window partitions); the two
# median rows per group join back broadcast (k rows); two aggregations.
@register(
    "brown_forsythe_q",
    """
    WITH r AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                   AS vi,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT a.event_type, a.vi + b.vi AS med2i
        FROM r a JOIN r b USING (event_type)
        WHERE a.rk = (a.n + 1) // 2 AND b.rk = (b.n + 2) // 2
    ),
    z AS (
        SELECT r.event_type, ABS(2 * r.vi - med.med2i) AS z2i
        FROM r JOIN med USING (event_type)
    ),
    g AS (
        SELECT event_type, COUNT(*) AS ng,
               SUM(CAST(z2i AS HUGEINT)) AS s1,
               SUM(CAST(z2i AS HUGEINT) * z2i) AS s2
        FROM z GROUP BY event_type
    ),
    t AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(s1) AS DOUBLE) AS grand_sum
        FROM g
    )
    SELECT t.n_total, t.k,
           CAST(ROUND(
               (CAST(t.n_total - t.k AS DOUBLE) / CAST(t.k - 1 AS DOUBLE))
               * SUM(CAST(g.ng AS DOUBLE)
                     * (CAST(g.s1 AS DOUBLE) / g.ng
                        - t.grand_sum / t.n_total)
                     * (CAST(g.s1 AS DOUBLE) / g.ng
                        - t.grand_sum / t.n_total))
               / SUM(CAST(g.s2 AS DOUBLE)
                     - CAST(g.ng AS DOUBLE)
                       * (CAST(g.s1 AS DOUBLE) / g.ng)
                       * (CAST(g.s1 AS DOUBLE) / g.ng)),
               6) AS DOUBLE) AS bf_stat
    FROM g CROSS JOIN t
    GROUP BY t.n_total, t.k, t.grand_sum
    """,
)
def brown_forsythe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.indexing import grouped_index

    # Deviations live in exact integer MICRO-UNITS (value quantized to
    # 6 dp then ×10⁶): sums and sums-of-squares stay exact integers in
    # both engines at any shuffle order — no decimal-width cap games
    # (DuckDB clamps a (16,6)² product to DECIMAL(18) and overflows at
    # sf0.1) — and W is scale-invariant under z → c·z, so the shifted
    # units never need dividing back out.
    e = Catalog(spark, sf_dir).events.select(
        "event_type",
        (F.col("value").cast("decimal(18,6)") * 1000000)
        .cast("long")
        .alias("vi"),
        "value",
        "event_id",
    )
    r = grouped_index(
        e,
        ["event_type"],
        [F.col("value").asc(), F.col("event_id").asc()],
        idx_col="rk",
        size_col="n",
    )
    lo = r.filter(
        F.col("rk") == F.floor((F.col("n") + 1) / 2)
    ).select("event_type", F.col("vi").alias("vlo"))
    hi = r.filter(
        F.col("rk") == F.floor((F.col("n") + 2) / 2)
    ).select("event_type", F.col("vi").alias("vhi"))
    med = lo.join(hi, "event_type").select(
        "event_type", (F.col("vlo") + F.col("vhi")).alias("med2i")
    )
    z = r.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.lit(2) * F.col("vi") - F.col("med2i")).alias("z2i"),
    )
    zd = F.col("z2i").cast("decimal(19,0)")
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.col("z2i").cast("decimal(38,0)")).alias("s1"),
        F.sum(zd * zd).alias("s2"),
    )
    t = g.agg(
        F.sum("ng").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s1").cast("double").alias("grand_sum"),
    )
    mean_g = F.col("s1").cast("double") / F.col("ng")
    dev = mean_g - F.col("grand_sum") / F.col("n_total")
    ssb = F.sum(F.col("ng").cast("double") * dev * dev)
    ssw = F.sum(
        F.col("s2").cast("double")
        - F.col("ng").cast("double") * mean_g * mean_g
    )
    scale = (F.col("n_total") - F.col("k")).cast("double") / (
        F.col("k") - 1
    ).cast("double")
    return (
        g.crossJoin(F.broadcast(t))
        .groupBy("n_total", "k", "grand_sum")
        .agg(F.round(scale * ssb / ssw, 6).alias("bf_stat"))
        .select("n_total", "k", "bf_stat")
    )


# Simpson / Shannon source-diversity per language: the effective number
# of sources feeding each language slice — the mix-health check before
# sampling weights are set (inv-Simpson collapses toward 1 when one
# source dominates). Scale shape: one (lang, source) hash agg
# (metadata cardinality), then a per-lang reduction; inverse Simpson is
# EXACT integer arithmetic (n² / Σc²) until the final division, and the
# Shannon term sums ~20 bounded values per lang.
@register(
    "simpson_diversity_q",
    """
    WITH c AS (
        SELECT lang, source, COUNT(*) AS c
        FROM documents GROUP BY lang, source
    ),
    g AS (
        SELECT lang,
               CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS sum_c2,
               SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS clnc
        FROM c GROUP BY lang
    )
    SELECT lang, n_docs, n_sources,
           CAST(ROUND(CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)
                      / CAST(sum_c2 AS DOUBLE), 6) AS DOUBLE)
               AS inv_simpson,
           CAST(ROUND(EXP(LN(CAST(n_docs AS DOUBLE))
                          - clnc / CAST(n_docs AS DOUBLE)), 6) AS DOUBLE)
               AS shannon_effective
    FROM g
    """,
)
def simpson_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    g = c.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
        F.sum(
            F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        ).alias("clnc"),
    )
    nd = F.col("n_docs").cast("double")
    return g.select(
        "lang",
        "n_docs",
        "n_sources",
        F.round(nd * nd / F.col("sum_c2").cast("double"), 6).alias(
            "inv_simpson"
        ),
        F.round(
            F.exp(F.log(nd) - F.col("clnc") / nd), 6
        ).alias("shannon_effective"),
    )


# Cliff's delta effect size between purchase and click order values —
# the distribution-free companion to mann_whitney_q (that one answers
# "is there a shift", this one answers "how big"): δ = P(X>Y) − P(X<Y),
# derived EXACTLY from the same doubled-midrank machinery via
# δ = 2·U1/(n1·n2) − 1, so no O(n²) pair comparison ever runs. Scale
# shape identical to mann_whitney_q: distinct-value hash agg +
# global_cumsum midranks + one single-row reduction of exact BIGINTs.
@register(
    "cliffs_delta_q",
    """
    WITH b AS (
        SELECT value AS v,
               CAST(event_type = 'purchase' AS BIGINT) AS is1
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    c AS (SELECT v, COUNT(*) AS cnt, SUM(is1) AS cnt1 FROM b GROUP BY v),
    r AS (
        SELECT cnt, cnt1,
               2 * SUM(cnt) OVER (ORDER BY v) - cnt + 1 AS rank2
        FROM c
    ),
    s AS (
        SELECT CAST(SUM(cnt1) AS BIGINT) AS n1,
               CAST(SUM(cnt - cnt1) AS BIGINT) AS n2,
               CAST(SUM(CAST(cnt1 AS HUGEINT) * rank2) AS BIGINT) AS two_r1
        FROM r
    )
    SELECT n1, n2,
           CAST(ROUND(
               (CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)
                / CAST(n1 * n2 AS DOUBLE)) - 1.0, 6) + 0.0 AS DOUBLE)
               AS cliffs_delta
    FROM s
    """,
)
def cliffs_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.indexing import avg_rank2_table

    e = Catalog(spark, sf_dir).events
    b = e.filter(F.col("event_type").isin("purchase", "click")).select(
        F.col("value").alias("v"),
        (F.col("event_type") == "purchase").cast("long").alias("is1"),
    )
    c = b.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("is1").alias("cnt1")
    )
    r = avg_rank2_table(c, "v")
    s = r.agg(
        F.sum("cnt1").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt1")).cast("long").alias("n2"),
        F.sum(F.col("cnt1") * F.col("rank2")).cast("long").alias("two_r1"),
    )
    # 2·U1 = two_r1 − n1(n1+1); δ = 2U1/(n1n2) − 1 — exact ints to the end
    delta = (
        (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).cast("double")
        / (F.col("n1") * F.col("n2")).cast("double")
    ) - F.lit(1.0)
    return s.select(
        "n1",
        "n2",
        (F.round(delta, 6) + F.lit(0.0)).alias("cliffs_delta"),
    )


# Odds ratio + 95% Wald CI for the 2×2 table of the two document-quality
# filters (heuristic ≥ 0.6 vs hashed classifier keep) — the effect-size
# companion to mcnemar_q (association strength, not marginal change).
# Scale shape: one codegen'd scan → one single-row aggregation; exact
# BIGINT cells, one final float expression with the standard 0.5
# Haldane-Anscombe correction guarding empty cells.
@register(
    "odds_ratio_q",
    f"""
    WITH t AS (
        SELECT doc_id, length(text) AS n,
               length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   AS n_punct,
               {_SQL_TOKENS} AS toks
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               (ROUND(CAST(
                 0.4::DOUBLE * (1 - CASE WHEN n = 0 THEN 0::DOUBLE
                                         ELSE n_punct::DOUBLE / n END)
               + 0.3::DOUBLE * least(
                     (CASE WHEN len(toks) = 0 THEN 0::DOUBLE
                           ELSE len(list_filter(toks, x -> x IN
                                ('the','a','and','of','to','in','is','it')))::DOUBLE
                                / len(toks) END) * 5, 1.0::DOUBLE)
               + 0.3::DOUBLE * least(n::DOUBLE / 500, 1.0::DOUBLE)
               AS DECIMAL(28,12)), 4)::DOUBLE >= 0.6) AS a,
               (ROUND(CAST(1.0 / (1.0 + exp(-(
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE list_reduce(list_transform(toks,
                                 t -> {_SQL_QW}), (a, b) -> a + b)
                   END) / 8.0)) AS DECIMAL(28,12)), 4)::DOUBLE >= 0.5) AS b
        FROM t
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n11,
               CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n01,
               CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n00
        FROM f
    )
    SELECT n11, n10, n01, n00,
           CAST(ROUND(
               ((CAST(n11 AS DOUBLE) + 0.5) * (CAST(n00 AS DOUBLE) + 0.5))
               / ((CAST(n10 AS DOUBLE) + 0.5)
                  * (CAST(n01 AS DOUBLE) + 0.5)), 6) AS DOUBLE)
               AS odds_ratio,
           CAST(ROUND(
               LN(((CAST(n11 AS DOUBLE) + 0.5)
                   * (CAST(n00 AS DOUBLE) + 0.5))
                  / ((CAST(n10 AS DOUBLE) + 0.5)
                     * (CAST(n01 AS DOUBLE) + 0.5)))
               - 1.96 * SQRT(1.0 / (CAST(n11 AS DOUBLE) + 0.5)
                             + 1.0 / (CAST(n10 AS DOUBLE) + 0.5)
                             + 1.0 / (CAST(n01 AS DOUBLE) + 0.5)
                             + 1.0 / (CAST(n00 AS DOUBLE) + 0.5)),
               6) + 0.0 AS DOUBLE) AS log_or_ci_lo,
           CAST(ROUND(
               LN(((CAST(n11 AS DOUBLE) + 0.5)
                   * (CAST(n00 AS DOUBLE) + 0.5))
                  / ((CAST(n10 AS DOUBLE) + 0.5)
                     * (CAST(n01 AS DOUBLE) + 0.5)))
               + 1.96 * SQRT(1.0 / (CAST(n11 AS DOUBLE) + 0.5)
                             + 1.0 / (CAST(n10 AS DOUBLE) + 0.5)
                             + 1.0 / (CAST(n01 AS DOUBLE) + 0.5)
                             + 1.0 / (CAST(n00 AS DOUBLE) + 0.5)),
               6) + 0.0 AS DOUBLE) AS log_or_ci_hi
    FROM s
    """,
)
def odds_ratio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    a = quality_score("text") >= 0.6
    b = (
        linear_quality_score(F.col("text"), dim=64, scale=8.0, round_to=4)
        >= 0.5
    )
    s = d.select(a.alias("a"), b.alias("b")).agg(
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    h = {
        c: F.col(c).cast("double") + F.lit(0.5)
        for c in ("n11", "n10", "n01", "n00")
    }
    orr = (h["n11"] * h["n00"]) / (h["n10"] * h["n01"])
    se = F.sqrt(
        F.lit(1.0) / h["n11"]
        + F.lit(1.0) / h["n10"]
        + F.lit(1.0) / h["n01"]
        + F.lit(1.0) / h["n00"]
    )
    return s.select(
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(orr, 6).alias("odds_ratio"),
        (F.round(F.log(orr) - F.lit(1.96) * se, 6) + F.lit(0.0)).alias(
            "log_or_ci_lo"
        ),
        (F.round(F.log(orr) + F.lit(1.96) * se, 6) + F.lit(0.0)).alias(
            "log_or_ci_hi"
        ),
    )


# Ljung-Box portmanteau test (lags 1..7) on daily purchase revenue:
# "is the series white noise, or is there autocorrelation worth
# modeling" — the gatekeeper before any forecasting of the series.
# Scale shape: events reduce to the calendar-bounded daily frame (exact
# decimal means, identical quantized values in both engines); the lag
# joins, autocorrelations, and Q statistic all live on that metadata-
# scale table. Gaps in the calendar use the day INDEX (dense rank of
# day), matching the oracle exactly.
@register(
    "ljung_box_q",
    """
    WITH d0 AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    d AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, m FROM d0
    ),
    st AS (
        SELECT COUNT(*) AS n, SUM(m) AS sm FROM d
    ),
    c0 AS (
        SELECT SUM((CAST(d.m AS DOUBLE) - CAST(st.sm AS DOUBLE) / st.n)
                   * (CAST(d.m AS DOUBLE) - CAST(st.sm AS DOUBLE) / st.n))
                   AS den
        FROM d CROSS JOIN st
    ),
    ck AS (
        SELECT k,
               SUM((CAST(a.m AS DOUBLE) - CAST(st.sm AS DOUBLE) / st.n)
                   * (CAST(b.m AS DOUBLE) - CAST(st.sm AS DOUBLE) / st.n))
                   AS num
        FROM d a
        JOIN (SELECT unnest(range(1, 8)) AS k) lags ON TRUE
        JOIN d b ON b.i = a.i + k
        CROSS JOIN st
        GROUP BY k
    )
    SELECT CAST(st.n AS BIGINT) AS n_days,
           CAST(ROUND(SUM(
               (ck.num / c0.den) * (ck.num / c0.den)
               / CAST(st.n - ck.k AS DOUBLE)
           ) * st.n * (st.n + 2), 6) AS DOUBLE) AS lb_q
    FROM ck CROSS JOIN c0 CROSS JOIN st
    GROUP BY st.n
    """,
)
def ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    d0 = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    # bounded window: one row per distinct calendar day
    d = d0.select(
        F.row_number().over(Window.orderBy("day")).alias("i"), "m"
    )
    st = d.agg(F.count(F.lit(1)).alias("n"), F.sum("m").alias("sm"))
    mean = F.col("sm").cast("double") / F.col("n")
    c0 = (
        d.crossJoin(F.broadcast(st))
        .agg(
            F.sum(
                (F.col("m").cast("double") - mean)
                * (F.col("m").cast("double") - mean)
            ).alias("den")
        )
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    a = d.select(F.col("i").alias("ia"), F.col("m").alias("ma"))
    b = d.select(F.col("i").alias("ib"), F.col("m").alias("mb"))
    ck = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("ib") == F.col("ia") + F.col("k"))
        .crossJoin(F.broadcast(st))
        .groupBy("k")
        .agg(
            F.sum(
                (F.col("ma").cast("double") - mean)
                * (F.col("mb").cast("double") - mean)
            ).alias("num")
        )
    )
    rk2 = (F.col("num") / F.col("den")) * (F.col("num") / F.col("den"))
    return (
        ck.crossJoin(F.broadcast(c0))
        .crossJoin(F.broadcast(st))
        .groupBy("n")
        .agg(
            F.round(
                F.sum(rk2 / (F.col("n") - F.col("k")).cast("double"))
                * F.col("n")
                * (F.col("n") + 2),
                6,
            ).alias("lb_q")
        )
        .select(F.col("n").cast("long").alias("n_days"), "lb_q")
    )


# Theil's U (uncertainty coefficient) U(lang|source): what fraction of
# language entropy does knowing the source explain? The asymmetric
# association measure for two categoricals — chi2_independence_q says
# "dependent or not", this says "how much, in bits-normalized terms".
# Scale shape: one (lang, source) hash agg (metadata cardinality); all
# entropies from exact BIGINT counts; one final float expression.
@register(
    "theil_u_q",
    """
    WITH c AS (
        SELECT lang, source, COUNT(*) AS c
        FROM documents GROUP BY lang, source
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
    hl AS (
        SELECT SUM(CAST(cl AS DOUBLE) / tot.n
                   * LN(CAST(tot.n AS DOUBLE) / cl)) AS h_lang
        FROM (SELECT lang, SUM(c) AS cl FROM c GROUP BY lang)
        CROSS JOIN tot
    ),
    hls AS (
        SELECT SUM(CAST(c.c AS DOUBLE) / tot.n
                   * LN(CAST(cs.csrc AS DOUBLE) / c.c)) AS h_lang_src
        FROM c
        JOIN (SELECT source, SUM(c) AS csrc FROM c GROUP BY source) cs
          USING (source)
        CROSS JOIN tot
    )
    SELECT tot.n AS n_docs,
           CAST(ROUND(hl.h_lang, 6) AS DOUBLE) AS h_lang,
           CAST(ROUND(hls.h_lang_src, 6) AS DOUBLE) AS h_lang_given_src,
           CAST(ROUND((hl.h_lang - hls.h_lang_src) / hl.h_lang, 6) + 0.0
                AS DOUBLE) AS theil_u
    FROM tot CROSS JOIN hl CROSS JOIN hls
    """,
)
def theil_u_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    tot = c.agg(F.sum("c").cast("long").alias("n"))
    cl = c.groupBy("lang").agg(F.sum("c").alias("cl"))
    hl = cl.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("cl").cast("double")
            / F.col("n")
            * F.log(F.col("n").cast("double") / F.col("cl"))
        ).alias("h_lang")
    )
    cs = c.groupBy("source").agg(F.sum("c").alias("csrc"))
    hls = (
        c.join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("c").cast("double")
                / F.col("n")
                * F.log(F.col("csrc").cast("double") / F.col("c"))
            ).alias("h_lang_src")
        )
    )
    u = (F.col("h_lang") - F.col("h_lang_src")) / F.col("h_lang")
    return (
        tot.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hls))
        .select(
            F.col("n").alias("n_docs"),
            F.round(F.col("h_lang"), 6).alias("h_lang"),
            F.round(F.col("h_lang_src"), 6).alias("h_lang_given_src"),
            (F.round(u, 6) + F.lit(0.0)).alias("theil_u"),
        )
    )


# Entropy rate of the per-user event-type Markov chain: H = −Σᵢ πᵢ Σⱼ
# pᵢⱼ ln pᵢⱼ with the empirical source distribution as π — how
# predictable is the NEXT event given the current one (the sequencing
# companion to markov_transitions_q, which reports the raw matrix).
# Scale shape: the lead() window keys on user_id (corpus-partitioned,
# bounded per-user runs); transitions collapse to a ≤ |types|² table
# and the rate is one float expression over exact counts.
@register(
    "markov_entropy_rate_q",
    """
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   AS dst
        FROM events
    ),
    c AS (
        SELECT src, dst, COUNT(*) AS n FROM seq
        WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c),
    row_h AS (
        SELECT c.src, SUM(c.n) AS nsrc,
               SUM(CAST(c.n AS DOUBLE)
                   * LN(CAST(r.nsrc AS DOUBLE) / c.n)) AS hnum
        FROM c
        JOIN (SELECT src, SUM(n) AS nsrc FROM c GROUP BY src) r
          USING (src)
        GROUP BY c.src
    )
    SELECT tot.nt AS n_transitions,
           CAST(ROUND(SUM(row_h.hnum) / tot.nt, 6) AS DOUBLE)
               AS entropy_rate_nats
    FROM row_h CROSS JOIN tot
    GROUP BY tot.nt
    """,
)
def markov_entropy_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").cast("long").alias("nt"))
    r = c.groupBy("src").agg(F.sum("n").alias("nsrc"))
    row_h = (
        c.join(F.broadcast(r), "src")
        .groupBy("src")
        .agg(
            F.sum(
                F.col("n").cast("double")
                * F.log(F.col("nsrc").cast("double") / F.col("n"))
            ).alias("hnum")
        )
    )
    return (
        row_h.crossJoin(F.broadcast(tot))
        .groupBy("nt")
        .agg(
            F.round(F.sum("hnum") / F.col("nt"), 6).alias(
                "entropy_rate_nats"
            )
        )
        .select(
            F.col("nt").alias("n_transitions"), "entropy_rate_nats"
        )
    )


# Matryoshka fidelity: how well does the 32-dim PREFIX of the 64-dim
# embedding preserve pairwise cosine structure (the MRL question — can
# retrieval run on half the vector)? 100 deterministic probe pairs
# (vec i ↔ vec i+100), each scored with full-dim and prefix-dim cosine
# rounded to 4 dp; the correlation between the two runs on EXACT scaled
# integers (×10⁴), so no float-order noise survives. Scale shape: the
# pair set is a bounded probe (id-range filter pushed to the scan, one
# broadcast-joinable frame); per-pair cosines are in-row array folds —
# identical sequential order in both engines.
@register(
    "matryoshka_fidelity_q",
    """
    WITH a AS (
        -- FLOAT→DOUBLE up front: DuckDB keeps FLOAT*FLOAT in float32,
        -- Spark casts to double — the folds must run in one precision
        SELECT vec_id AS i,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS va
        FROM embeddings WHERE vec_id < 100
    ),
    b AS (
        SELECT vec_id - 100 AS i,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vb
        FROM embeddings WHERE vec_id >= 100 AND vec_id < 200
    ),
    p AS (
        -- cosines as explicit LEFT-TO-RIGHT folds, bit-identical to
        -- Spark's F.aggregate (list_cosine_similarity's internal order
        -- differs by an ulp and flips a .00005 rounding boundary)
        SELECT CAST(ROUND(
                   list_reduce(list_transform(range(1, 65),
                                              k -> a.va[k] * b.vb[k]),
                               (x, y) -> x + y)
                   / SQRT(list_reduce(list_transform(range(1, 65),
                                                     k -> a.va[k] * a.va[k]),
                                      (x, y) -> x + y)
                          * list_reduce(list_transform(range(1, 65),
                                                       k -> b.vb[k] * b.vb[k]),
                                        (x, y) -> x + y))
                   * 10000.0, 0) AS BIGINT) AS cf,
               CAST(ROUND(
                   list_reduce(list_transform(range(1, 33),
                                              k -> a.va[k] * b.vb[k]),
                               (x, y) -> x + y)
                   / SQRT(list_reduce(list_transform(range(1, 33),
                                                     k -> a.va[k] * a.va[k]),
                                      (x, y) -> x + y)
                          * list_reduce(list_transform(range(1, 33),
                                                       k -> b.vb[k] * b.vb[k]),
                                        (x, y) -> x + y))
                   * 10000.0, 0) AS BIGINT) AS cp
        FROM a JOIN b USING (i)
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(cf AS HUGEINT)) AS sf, SUM(CAST(cp AS HUGEINT)) AS sp,
               SUM(CAST(cf AS HUGEINT) * cp) AS sfp,
               SUM(CAST(cf AS HUGEINT) * cf) AS sff,
               SUM(CAST(cp AS HUGEINT) * cp) AS spp,
               SUM(CAST(ABS(cf - cp) AS HUGEINT)) AS sad
        FROM p
    )
    SELECT n AS n_pairs,
           CAST(ROUND(
               (CAST(n AS DOUBLE) * CAST(sfp AS DOUBLE)
                - CAST(sf AS DOUBLE) * CAST(sp AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(sff AS DOUBLE)
                       - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                         - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))),
               6) + 0.0 AS DOUBLE) AS cos_corr,
           CAST(ROUND(CAST(sad AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0,
                      6) AS DOUBLE) AS mean_abs_gap
    FROM s
    """,
)
def matryoshka_fidelity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings

    def cos_scaled(va, vb):
        # one ROUND at the scaled-integer level: ROUND(c,4)*10000 leaves
        # 9330.999… artifacts that Spark's cast(long) truncates while
        # DuckDB's CAST rounds — scale first, round once
        dot = F.aggregate(
            F.zip_with(va, vb, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        na = F.aggregate(
            va, F.lit(0.0), lambda acc, x: acc + x * x
        )
        nb = F.aggregate(
            vb, F.lit(0.0), lambda acc, x: acc + x * x
        )
        return F.round(dot / F.sqrt(na * nb) * F.lit(10000.0), 0)

    a = e.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("i"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    b = e.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 200)
    ).select(
        (F.col("vec_id") - 100).alias("i"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    pre = lambda v: F.slice(v, 1, 32)  # noqa: E731
    p = a.join(b, "i").select(
        cos_scaled(F.col("va"), F.col("vb")).cast("long").alias("cf"),
        cos_scaled(pre(F.col("va")), pre(F.col("vb")))
        .cast("long")
        .alias("cp"),
    )
    dec = "decimal(19,0)"
    s = p.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cf").cast(dec)).alias("sf"),
        F.sum(F.col("cp").cast(dec)).alias("sp"),
        F.sum(F.col("cf").cast(dec) * F.col("cp").cast(dec)).alias("sfp"),
        F.sum(F.col("cf").cast(dec) * F.col("cf").cast(dec)).alias("sff"),
        F.sum(F.col("cp").cast(dec) * F.col("cp").cast(dec)).alias("spp"),
        F.sum(F.abs(F.col("cf") - F.col("cp")).cast(dec)).alias("sad"),
    )
    nd = F.col("n").cast("double")
    sf, sp = F.col("sf").cast("double"), F.col("sp").cast("double")
    corr = (nd * F.col("sfp").cast("double") - sf * sp) / F.sqrt(
        (nd * F.col("sff").cast("double") - sf * sf)
        * (nd * F.col("spp").cast("double") - sp * sp)
    )
    return s.select(
        F.col("n").alias("n_pairs"),
        (F.round(corr, 6) + F.lit(0.0)).alias("cos_corr"),
        F.round(
            F.col("sad").cast("double") / nd / F.lit(10000.0), 6
        ).alias("mean_abs_gap"),
    )


# Weighted Jaccard between source token-count vectors: Σ min(cₐ,c_b) /
# Σ max(cₐ,c_b) over the shared vocabulary — the occurrence-weighted
# source-overlap measure (source_similarity_q's cosine ignores counts'
# mass balance; weighted Jaccard is what mixture dedup budgets want).
# Exact BIGINT arithmetic throughout: Σmax = totₐ + tot_b − Σmin. Scale
# shape: (source, token) hash agg, token-keyed self-join for shared
# mins (vocabulary-scale, never doc-scale), (sources²) result pairs.
@register(
    "weighted_jaccard_q",
    f"""
    WITH c AS (
        SELECT source, tok, COUNT(*) AS c
        FROM (SELECT source, unnest({_SQL_TOKENS}) AS tok
              FROM documents)
        GROUP BY source, tok
    ),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t
            FROM c GROUP BY source),
    shared AS (
        SELECT a.source AS sa, b.source AS sb,
               CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS smin
        FROM c a JOIN c b ON a.tok = b.tok AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT sa, sb,
           CAST(ROUND(CAST(smin AS DOUBLE)
                      / CAST(ta.t + tb.t - smin AS DOUBLE), 6) AS DOUBLE)
               AS weighted_jaccard
    FROM shared JOIN tot ta ON sa = ta.source
                JOIN tot tb ON sb = tb.source
    ORDER BY weighted_jaccard DESC, sa, sb LIMIT 30
    """,
)
def weighted_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    c = (
        d.select("source", F.explode(_tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = c.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    a = c.select(
        F.col("source").alias("sa"), "tok", F.col("c").alias("ca")
    )
    b = c.select(
        F.col("source").alias("sb"), "tok", F.col("c").alias("cb")
    )
    shared = (
        a.join(b, "tok")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.sum(F.least("ca", "cb")).cast("long").alias("smin")
        )
    )
    ta = tot.select(F.col("source").alias("sa"), F.col("t").alias("tta"))
    tb = tot.select(F.col("source").alias("sb"), F.col("t").alias("ttb"))
    return (
        shared.join(F.broadcast(ta), "sa")
        .join(F.broadcast(tb), "sb")
        .select(
            "sa",
            "sb",
            F.round(
                F.col("smin").cast("double")
                / (
                    F.col("tta") + F.col("ttb") - F.col("smin")
                ).cast("double"),
                6,
            ).alias("weighted_jaccard"),
        )
        .orderBy(
            F.col("weighted_jaccard").desc(), "sa", "sb"
        )
        .limit(30)
    )


# Yule's K vocabulary-richness characteristic: K = 10⁴·(Σ r²·n_r − N)/N²
# over token frequency-of-frequencies — the length-invariant repetition
# measure (rises when a few tokens dominate; the classic stylometry /
# template-detection signal). Exact BIGINT arithmetic until one final
# division. Scale shape: two nested hash aggs, same as good_turing_q.
@register(
    "yule_k_q",
    f"""
    WITH t AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT unnest({_SQL_TOKENS}) AS tok FROM documents)
        GROUP BY tok
    ),
    ff AS (SELECT c AS r, COUNT(*) AS n_r FROM t GROUP BY c),
    s AS (
        SELECT CAST(SUM(CAST(r AS HUGEINT) * n_r) AS BIGINT) AS n,
               CAST(SUM(n_r) AS BIGINT) AS vocab,
               CAST(SUM(CAST(r AS HUGEINT) * r * n_r) AS BIGINT) AS sr2
        FROM ff
    )
    SELECT n AS n_tokens, vocab,
           CAST(ROUND(10000.0 * CAST(sr2 - n AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                AS DOUBLE) AS yule_k
    FROM s
    """,
)
def yule_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    t = (
        d.select(F.explode(_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ff = t.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    s = ff.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n"),
        F.sum("n_r").cast("long").alias("vocab"),
        F.sum(F.col("r") * F.col("r") * F.col("n_r"))
        .cast("long")
        .alias("sr2"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_tokens"),
        "vocab",
        F.round(
            F.lit(10000.0) * (F.col("sr2") - F.col("n")).cast("double")
            / (nd * nd),
            6,
        ).alias("yule_k"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 3: k-sample rank test, rank concordance on the
# daily frame, embedding isotropy, and categorical effect size. The rank
# test rides avg_rank2_table (range-partitioned midranks, doubled to stay
# integral); the time-series test runs on the calendar-bounded daily frame
# (O(days²) pairs is metadata-scale); isotropy uses the sum-vector
# identity so mean pairwise cosine needs NO pair join at all.
# ---------------------------------------------------------------------------


# Kruskal-Wallis H: does order value distribute identically across the
# five event types? The k-sample generalization of Mann-Whitney — the
# test an experimenter reaches for before trusting a per-type mean table.
# Scale shape: values collapse to one row per DISTINCT value (hash agg),
# midranks come from global_cumsum's range-partitioned prefix count
# (never a single-partition window), per-type rank sums are exact BIGINTs
# of doubled ranks (R_j = r2j/2 ⇒ 12/4 = 3 in the H constant), and the
# tie-corrected statistic is one single-row float expression.
@register(
    "kruskal_wallis_q",
    """
    WITH c AS (
        SELECT value AS v, event_type AS et, COUNT(*) AS cvt
        FROM events GROUP BY value, event_type
    ),
    cv AS (SELECT v, SUM(cvt) AS cnt FROM c GROUP BY v),
    r AS (
        SELECT v, 2 * SUM(cnt) OVER (ORDER BY v) - cnt + 1 AS rank2
        FROM cv
    ),
    g AS (
        SELECT et, CAST(SUM(cvt) AS BIGINT) AS nj,
               CAST(SUM(CAST(cvt AS HUGEINT) * rank2) AS BIGINT) AS r2j
        FROM c JOIN r USING (v) GROUP BY et
    ),
    ties AS (
        SELECT CAST(COALESCE(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt),
                             0) AS BIGINT) AS tie
        FROM cv WHERE cnt > 1
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
               CAST(SUM(nj) AS BIGINT) AS n_total,
               SUM(CAST(r2j AS DOUBLE) * r2j / nj) AS sr
        FROM g
    )
    SELECT k_groups, n_total, k_groups - 1 AS dof,
           CAST(ROUND(
               (3.0 * sr / (CAST(n_total AS DOUBLE) * (n_total + 1))
                - 3.0 * (n_total + 1))
               / (1.0 - CAST(tie AS DOUBLE)
                  / (CAST(n_total AS DOUBLE) * n_total * n_total
                     - n_total)),
               6) + 0.0 AS DOUBLE) AS h_stat
    FROM s CROSS JOIN ties
    """,
)
def kruskal_wallis_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iniz_exporters_spark.operators.indexing import avg_rank2_table

    e = Catalog(spark, sf_dir).events
    c = e.groupBy(
        F.col("value").alias("v"), F.col("event_type").alias("et")
    ).agg(F.count(F.lit(1)).alias("cvt"))
    cv = c.groupBy("v").agg(F.sum("cvt").alias("cnt"))
    r = avg_rank2_table(cv, "v")
    g = (
        c.join(r.select("v", "rank2"), "v")
        .groupBy("et")
        .agg(
            F.sum("cvt").cast("long").alias("nj"),
            F.sum(F.col("cvt") * F.col("rank2")).cast("long").alias("r2j"),
        )
    )
    ties = cv.filter(F.col("cnt") > 1).agg(
        F.coalesce(
            F.sum(
                F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tie")
    )
    s = g.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("nj").cast("long").alias("n_total"),
        F.sum(
            F.col("r2j").cast("double") * F.col("r2j") / F.col("nj")
        ).alias("sr"),
    )
    nd = F.col("n_total").cast("double")
    h = (
        F.lit(3.0) * F.col("sr") / (nd * (F.col("n_total") + 1))
        - F.lit(3.0) * (F.col("n_total") + 1)
    ) / (
        F.lit(1.0)
        - F.col("tie").cast("double")
        / (nd * F.col("n_total") * F.col("n_total") - F.col("n_total"))
    )
    return s.crossJoin(F.broadcast(ties)).select(
        "k_groups",
        "n_total",
        (F.col("k_groups") - 1).alias("dof"),
        (F.round(h, 6) + F.lit(0.0)).alias("h_stat"),
    )


# Kendall tau-b rank concordance between daily purchase revenue and daily
# purchase count — "do busier days make more money, monotonically?"
# robust to outlier days in a way Pearson is not. Scale shape: the corpus
# collapses to the calendar-bounded daily frame first (exact DECIMAL
# revenue, BIGINT count), the O(days²) pair join is metadata-scale, and
# every term (concordant/discordant counts, doubled tie terms t(t-1)) is
# an exact integer until the one final tau expression — integer-only
# halving is avoided by keeping n₀ and the tie terms DOUBLED.
@register(
    "kendall_tau_q",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                   AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    p AS (
        SELECT CAST(SUM(CASE WHEN (b.x > a.x AND b.y > a.y)
                               OR (b.x < a.x AND b.y < a.y)
                             THEN 1 ELSE 0 END) AS BIGINT) AS nc,
               CAST(SUM(CASE WHEN (b.x > a.x AND b.y < a.y)
                               OR (b.x < a.x AND b.y > a.y)
                             THEN 1 ELSE 0 END) AS BIGINT) AS nd
        FROM d a JOIN d b ON a.day < b.day
    ),
    tx AS (
        SELECT CAST(COALESCE(SUM(t * (t - 1)), 0) AS BIGINT) AS tx2
        FROM (SELECT COUNT(*) AS t FROM d GROUP BY x) WHERE t > 1
    ),
    ty AS (
        SELECT CAST(COALESCE(SUM(t * (t - 1)), 0) AS BIGINT) AS ty2
        FROM (SELECT COUNT(*) AS t FROM d GROUP BY y) WHERE t > 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d)
    SELECT n_days, nc AS concordant, nd AS discordant,
           CAST(ROUND(
               2.0 * CAST(nc - nd AS DOUBLE)
               / SQRT((CAST(n_days AS DOUBLE) * (n_days - 1) - tx2)
                      * (CAST(n_days AS DOUBLE) * (n_days - 1) - ty2)),
               6) + 0.0 AS DOUBLE) AS tau_b
    FROM n CROSS JOIN p CROSS JOIN tx CROSS JOIN ty
    """,
)
def kendall_tau_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6))
        .cast("decimal(18,6)")
        .alias("x"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    a = d.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = d.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    conc = (F.col("xb") > F.col("xa")) & (F.col("yb") > F.col("ya")) | (
        F.col("xb") < F.col("xa")
    ) & (F.col("yb") < F.col("ya"))
    disc = (F.col("xb") > F.col("xa")) & (F.col("yb") < F.col("ya")) | (
        F.col("xb") < F.col("xa")
    ) & (F.col("yb") > F.col("ya"))
    p = a.join(b, F.col("da") < F.col("db")).agg(
        F.sum(F.when(conc, 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(disc, 1).otherwise(0)).cast("long").alias("nd"),
    )

    def _tie2(col: str, out: str) -> DataFrame:
        return (
            d.groupBy(col)
            .agg(F.count(F.lit(1)).alias("t"))
            .filter(F.col("t") > 1)
            .agg(
                F.coalesce(F.sum(F.col("t") * (F.col("t") - 1)), F.lit(0))
                .cast("long")
                .alias(out)
            )
        )

    tx = _tie2("x", "tx2")
    ty = _tie2("y", "ty2")
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    nd_ = F.col("n_days").cast("double")
    tau = (
        F.lit(2.0)
        * (F.col("nc") - F.col("nd")).cast("double")
        / F.sqrt(
            (nd_ * (F.col("n_days") - 1) - F.col("tx2"))
            * (nd_ * (F.col("n_days") - 1) - F.col("ty2"))
        )
    )
    return (
        n.crossJoin(F.broadcast(p))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "n_days",
            F.col("nc").alias("concordant"),
            F.col("nd").alias("discordant"),
            (F.round(tau, 6) + F.lit(0.0)).alias("tau_b"),
        )
    )


# Embedding isotropy: mean pairwise cosine of the UNIT-normalized corpus
# via the sum-vector identity Σ_{i≠j} uᵢ·uⱼ = ‖Σu‖² − Σ‖u‖² — the
# anisotropy diagnostic ("are all my vectors pointing the same way?")
# computed with ZERO pair joins: one posexplode, one per-dim sum, one
# 64-row reduction. Per-dim sums are DECIMAL(28,12)-quantized so partial
# -sum order cannot perturb them (the established covariance pattern);
# norms are in-row left folds, identical in both engines after the
# FLOAT→DOUBLE cast. mean_resultant_norm = ‖Σu‖/n is the companion
# directional-concentration statistic.
@register(
    "isotropy_q",
    """
    WITH nr AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               SQRT(list_reduce(
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (a, b) -> a + b)) AS nrm
        FROM embeddings
    ),
    ex AS (
        SELECT i AS dim, v[i + 1] / nrm AS uv
        FROM nr CROSS JOIN (SELECT unnest(range(0, 64)) AS i) d
        WHERE nrm > 0
    ),
    sd AS (
        SELECT dim, SUM(CAST(uv AS DECIMAL(28,12))) AS s
        FROM ex GROUP BY dim
    ),
    ss AS (
        SELECT SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) AS ss FROM sd
    ),
    n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM nr WHERE nrm > 0
    )
    SELECT n_vecs,
           CAST(ROUND((ss - n_vecs)
                      / (CAST(n_vecs AS DOUBLE) * (n_vecs - 1)), 6)
                + 0.0 AS DOUBLE) AS mean_pairwise_cos,
           CAST(ROUND(SQRT(ss) / n_vecs, 6) + 0.0 AS DOUBLE)
               AS mean_resultant_norm
    FROM n CROSS JOIN ss
    """,
)
def isotropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    xd = lambda x: x.cast("double")  # noqa: E731
    nr = e.select(
        "embedding",
        F.sqrt(
            F.aggregate(
                "embedding", F.lit(0.0), lambda a, x: a + xd(x) * xd(x)
            )
        ).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    ex = nr.select(
        F.posexplode("embedding").alias("dim", "x"), "nrm"
    ).select("dim", (xd(F.col("x")) / F.col("nrm")).alias("uv"))
    sd = ex.groupBy("dim").agg(
        F.sum(F.col("uv").cast("decimal(28,12)")).alias("s")
    )
    ss = sd.agg(
        F.sum(F.col("s").cast("double") * F.col("s").cast("double")).alias(
            "ss"
        )
    )
    n = nr.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    nv = F.col("n_vecs").cast("double")
    return n.crossJoin(F.broadcast(ss)).select(
        "n_vecs",
        (
            F.round(
                (F.col("ss") - F.col("n_vecs")) / (nv * (F.col("n_vecs") - 1)),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_pairwise_cos"),
        (F.round(F.sqrt(F.col("ss")) / nv, 6) + F.lit(0.0)).alias(
            "mean_resultant_norm"
        ),
    )


# Cramér's V effect size for the order-priority × order-status
# contingency — the "is this χ² big ENOUGH to matter" companion to
# chi2_independence_q, on a different table and pair. Full r×c grid
# including structurally-zero cells (an absent pair still contributes
# its expected count). Scale shape: one hash agg to the 15-cell grid,
# broadcast marginals, single-row float finish.
@register(
    "cramers_v_q",
    """
    WITH cells AS (
        SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS o
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    ),
    rt AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY a),
    ct AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY b),
    tot AS (SELECT SUM(o) AS n FROM cells),
    m AS (
        SELECT COALESCE(c.o, 0) AS o, rt.ra, ct.cb, tot.n
        FROM rt CROSS JOIN ct CROSS JOIN tot
        LEFT JOIN cells c ON c.a = rt.a AND c.b = ct.b
    ),
    ch AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
               SUM((CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
                   * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
                   / (CAST(ra AS DOUBLE) * cb / n)) AS chi2
        FROM m
    ),
    d AS (
        SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS r_levels,
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS c_levels
        FROM orders
    )
    SELECT n_rows, r_levels, c_levels,
           CAST(ROUND(chi2, 6) + 0.0 AS DOUBLE) AS chi2_stat,
           CAST(ROUND(SQRT(chi2 / (n_rows
                      * (LEAST(r_levels, c_levels) - 1))), 6)
                + 0.0 AS DOUBLE) AS cramers_v
    FROM ch CROSS JOIN d
    """,
)
def cramers_v_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    cells = o.groupBy(
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = cells.groupBy("a").agg(F.sum("o").alias("ra"))
    ct = cells.groupBy("b").agg(F.sum("o").alias("cb"))
    tot = cells.agg(F.sum("o").alias("n"))
    m = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(cells), ["a", "b"], "left")
        .select(F.coalesce(F.col("o"), F.lit(0)).alias("o"), "ra", "cb", "n")
    )
    exp = F.col("ra").cast("double") * F.col("cb") / F.col("n")
    ch = m.agg(
        F.max("n").cast("long").alias("n_rows"),
        F.sum(
            (F.col("o").cast("double") - exp)
            * (F.col("o").cast("double") - exp)
            / exp
        ).alias("chi2"),
    )
    d = o.agg(
        F.countDistinct("o_orderpriority").cast("long").alias("r_levels"),
        F.countDistinct("o_orderstatus").cast("long").alias("c_levels"),
    )
    return ch.crossJoin(F.broadcast(d)).select(
        "n_rows",
        "r_levels",
        "c_levels",
        (F.round(F.col("chi2"), 6) + F.lit(0.0)).alias("chi2_stat"),
        (
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("n_rows")
                        * (F.least("r_levels", "c_levels") - 1)
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 3 (continued): sequential changepoint detection,
# regularity (sample entropy), long-range dependence (Hurst R/S), and
# graph link prediction by neighbor overlap. The three time-series ops run
# on the calendar-bounded daily frame (ordered windows are metadata-scale
# by construction); every running statistic is DECIMAL-quantized before a
# cumulative window so partial-sum order can never perturb it (the
# cusum_changepoint_q pattern).
# ---------------------------------------------------------------------------


# Page-Hinkley test on daily error-event rate: PH_t = Σ_{s≤t}(x_s − x̄_s),
# signal_t = PH_t − min_{s≤t} PH_s — the sequential drift detector that,
# unlike CUSUM-against-global-mean, uses only the running mean available
# at time t (deployable online). All cumulative terms are exact DECIMALs;
# the one float step (prefix mean) is re-quantized to DECIMAL(18,6)
# before it enters the cumulative sum.
@register(
    "page_hinkley_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'error'
        GROUP BY CAST(ts AS DATE)
    ),
    rm AS (
        SELECT day, m,
               CAST(CAST(SUM(m) OVER (ORDER BY day) AS DOUBLE)
                    / ROW_NUMBER() OVER (ORDER BY day)
                    AS DECIMAL(18,6)) AS run_mean
        FROM daily
    ),
    ph AS (
        SELECT day, m, run_mean,
               SUM(m - run_mean) OVER (ORDER BY day) AS ph_stat
        FROM rm
    ),
    sg AS (
        SELECT day, m, ph_stat,
               ph_stat - MIN(ph_stat) OVER (ORDER BY day) AS signal
        FROM ph
    )
    SELECT day,
           CAST(ROUND(CAST(m AS DOUBLE), 4) AS DOUBLE) + 0.0 AS daily_mean,
           CAST(ROUND(CAST(ph_stat AS DOUBLE), 4) AS DOUBLE) + 0.0
               AS ph_stat,
           CAST(ROUND(CAST(signal AS DOUBLE), 4) AS DOUBLE) + 0.0
               AS signal,
           signal = MAX(signal) OVER () AS is_alarm_peak
    FROM sg
    """,
)
def page_hinkley_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "error"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    # calendar-bounded frame: the unpartitioned windows below run over
    # ~30 rows, never corpus-scale
    wday = Window.orderBy("day")
    wrun = wday.rowsBetween(Window.unboundedPreceding, 0)
    rm = daily.withColumn(
        "run_mean",
        (
            F.sum("m").over(wrun).cast("double")
            / F.row_number().over(wday)
        ).cast("decimal(18,6)"),
    )
    ph = rm.withColumn(
        "ph_stat", F.sum(F.col("m") - F.col("run_mean")).over(wrun)
    )
    sg = ph.withColumn(
        "signal", F.col("ph_stat") - F.min("ph_stat").over(wrun)
    )
    wall = Window.partitionBy()
    return sg.select(
        "day",
        (F.round(F.col("m").cast("double"), 4) + F.lit(0.0)).alias(
            "daily_mean"
        ),
        (F.round(F.col("ph_stat").cast("double"), 4) + F.lit(0.0)).alias(
            "ph_stat"
        ),
        (F.round(F.col("signal").cast("double"), 4) + F.lit(0.0)).alias(
            "signal"
        ),
        (F.col("signal") == F.max("signal").over(wall)).alias(
            "is_alarm_peak"
        ),
    )


# Sample entropy (m=2, r=0.2σ) of the daily purchase-revenue series —
# the regularity score monitoring dashboards use to tell "noisy but
# stationary" from "structured drift" (lower = more self-similar).
# Template-match counts are exact integers (the float threshold r is
# derived identically in both engines from exact DECIMAL sums, and every
# compared value is an exact DECIMAL cast to double), so the only float
# output is the final −ln(A/B). O(days²) pair join on the
# calendar-bounded frame.
@register(
    "sample_entropy_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                   AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS t,
               CAST(x AS DOUBLE) AS x
        FROM daily
    ),
    stats AS (
        SELECT COUNT(*) AS n,
               0.2 * SQRT(SUM(x * x) / COUNT(*)
                          - (SUM(x) / COUNT(*)) * (SUM(x) / COUNT(*)))
                   AS r
        FROM (SELECT CAST(x AS DOUBLE) AS x FROM daily)
    ),
    v AS (
        SELECT t, x,
               LEAD(x, 1) OVER (ORDER BY t) AS x1,
               LEAD(x, 2) OVER (ORDER BY t) AS x2
        FROM idx
    ),
    pairs AS (
        SELECT CAST(SUM(CASE WHEN ABS(a.x - b.x) <= r
                              AND ABS(a.x1 - b.x1) <= r
                             THEN 1 ELSE 0 END) AS BIGINT) AS b_count,
               CAST(SUM(CASE WHEN a.x2 IS NOT NULL AND b.x2 IS NOT NULL
                              AND ABS(a.x - b.x) <= r
                              AND ABS(a.x1 - b.x1) <= r
                              AND ABS(a.x2 - b.x2) <= r
                             THEN 1 ELSE 0 END) AS BIGINT) AS a_count
        FROM v a JOIN v b ON a.t < b.t CROSS JOIN stats
        WHERE a.x1 IS NOT NULL AND b.x1 IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_days, b_count, a_count,
           CASE WHEN a_count > 0 AND b_count > 0 THEN
               CAST(ROUND(-LN(CAST(a_count AS DOUBLE) / b_count), 6)
                    + 0.0 AS DOUBLE)
           END AS sampen
    FROM stats CROSS JOIN pairs
    """,
)
def sample_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6))
        .cast("decimal(18,6)")
        .alias("x")
    )
    # metadata-scale frame: ordered windows over ~30 calendar days
    wday = Window.orderBy("day")
    idx = daily.select(
        F.row_number().over(wday).alias("t"),
        F.col("x").cast("double").alias("x"),
    )
    xd = F.col("x").cast("double")
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.lit(0.2)
            * F.sqrt(
                F.sum(xd * xd) / F.count(F.lit(1))
                - (F.sum(xd) / F.count(F.lit(1)))
                * (F.sum(xd) / F.count(F.lit(1)))
            )
        ).alias("r"),
    )
    wt = Window.orderBy("t")
    v = idx.select(
        "t",
        "x",
        F.lead("x", 1).over(wt).alias("x1"),
        F.lead("x", 2).over(wt).alias("x2"),
    )
    a = v.select(
        F.col("t").alias("ta"),
        F.col("x").alias("xa"),
        F.col("x1").alias("xa1"),
        F.col("x2").alias("xa2"),
    ).filter(F.col("xa1").isNotNull())
    b = v.select(
        F.col("t").alias("tb"),
        F.col("x").alias("xb"),
        F.col("x1").alias("xb1"),
        F.col("x2").alias("xb2"),
    ).filter(F.col("xb1").isNotNull())
    r = F.col("r")
    match2 = (F.abs(F.col("xa") - F.col("xb")) <= r) & (
        F.abs(F.col("xa1") - F.col("xb1")) <= r
    )
    match3 = (
        F.col("xa2").isNotNull()
        & F.col("xb2").isNotNull()
        & match2
        & (F.abs(F.col("xa2") - F.col("xb2")) <= r)
    )
    pairs = (
        a.join(b, F.col("ta") < F.col("tb"))
        .crossJoin(F.broadcast(stats))
        .agg(
            F.sum(F.when(match2, 1).otherwise(0))
            .cast("long")
            .alias("b_count"),
            F.sum(F.when(match3, 1).otherwise(0))
            .cast("long")
            .alias("a_count"),
        )
    )
    sampen = F.when(
        (F.col("a_count") > 0) & (F.col("b_count") > 0),
        F.round(
            -F.log(F.col("a_count").cast("double") / F.col("b_count")), 6
        )
        + F.lit(0.0),
    )
    return stats.crossJoin(F.broadcast(pairs)).select(
        F.col("n").cast("long").alias("n_days"),
        "b_count",
        "a_count",
        sampen.alias("sampen"),
    )


# Hurst exponent by rescaled-range (R/S) analysis of daily purchase
# revenue: slope of ln(avg R/S) on ln(block size) over block sizes
# {5,10,15,30} — H≈0.5 random walk, H>0.5 trending, H<0.5 mean-
# reverting. Per-block R/S is DECIMAL-quantized before the cross-block
# average, and the 4 regression terms are DECIMAL(28,12)-quantized
# before their sums, so no cross-row float accumulation survives
# anywhere. All windows partition by (block size, block id) — ≤30 rows.
@register(
    "hurst_exponent_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                   AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, x FROM daily
    ),
    blocks AS (
        SELECT bn, (t - 1) // bn AS blk, t, x
        FROM idx CROSS JOIN (SELECT unnest([5, 10, 15, 30]) AS bn) s
    ),
    sized AS (
        SELECT bn, blk, t, x,
               COUNT(*) OVER (PARTITION BY bn, blk) AS bsz
        FROM blocks
    ),
    full_blocks AS (SELECT * FROM sized WHERE bsz = bn),
    mu AS (
        SELECT bn, blk, t, x,
               CAST(CAST(SUM(x) OVER (PARTITION BY bn, blk) AS DOUBLE)
                    / bn AS DECIMAL(18,6)) AS m
        FROM full_blocks
    ),
    cum AS (
        SELECT bn, blk, x, m,
               SUM(x - m) OVER (PARTITION BY bn, blk ORDER BY t) AS cd
        FROM mu
    ),
    rs AS (
        SELECT bn, blk,
               CAST(
                   CAST(MAX(cd) - MIN(cd) AS DOUBLE)
                   / SQRT(SUM(CAST(x - m AS DOUBLE)
                              * CAST(x - m AS DOUBLE)) / bn)
                   AS DECIMAL(18,6)) AS rs_val
        FROM cum GROUP BY bn, blk
        HAVING SUM(CAST(x - m AS DOUBLE) * CAST(x - m AS DOUBLE)) > 0
    ),
    avg_rs AS (
        SELECT bn,
               CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(CAST(SUM(rs_val) AS DOUBLE) / COUNT(*)
                    AS DECIMAL(18,6)) AS a_rs
        FROM rs GROUP BY bn
    ),
    pts AS (
        SELECT CAST(LN(CAST(bn AS DOUBLE)) AS DECIMAL(28,12)) AS lx,
               CAST(LN(CAST(a_rs AS DOUBLE)) AS DECIMAL(28,12)) AS ly
        FROM avg_rs
    ),
    fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(lx) AS DOUBLE) AS sx,
               CAST(SUM(ly) AS DOUBLE) AS sy,
               CAST(SUM(CAST(lx * ly AS DECIMAL(38,18))) AS DOUBLE)
                   AS sxy,
               CAST(SUM(CAST(lx * lx AS DECIMAL(38,18))) AS DOUBLE)
                   AS sxx
        FROM pts
    )
    SELECT k AS n_scales,
           CAST(ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
                + 0.0 AS DOUBLE) AS hurst
    FROM fit
    """,
)
def hurst_exponent_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6))
        .cast("decimal(18,6)")
        .alias("x")
    )
    # metadata-scale frame: ~30 calendar days; all windows below are
    # bounded by (block size, block id)
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("t"), "x"
    )
    bns = spark.createDataFrame([(5,), (10,), (15,), (30,)], "bn int")
    blocks = idx.crossJoin(F.broadcast(bns)).select(
        "bn",
        F.floor((F.col("t") - 1) / F.col("bn")).alias("blk"),
        "t",
        "x",
    )
    wblk = Window.partitionBy("bn", "blk")
    sized = blocks.withColumn("bsz", F.count(F.lit(1)).over(wblk))
    fullb = sized.filter(F.col("bsz") == F.col("bn"))
    mu = fullb.withColumn(
        "m",
        (F.sum("x").over(wblk).cast("double") / F.col("bn")).cast(
            "decimal(18,6)"
        ),
    )
    cum = mu.withColumn(
        "cd",
        F.sum(F.col("x") - F.col("m")).over(wblk.orderBy("t")),
    )
    dev = (F.col("x") - F.col("m")).cast("double")
    rs = (
        cum.groupBy("bn", "blk")
        .agg(
            (F.max("cd") - F.min("cd")).cast("double").alias("rng"),
            F.sum(dev * dev).alias("ssq"),
            F.first("bn").alias("_bn"),
        )
        .filter(F.col("ssq") > 0)
        .select(
            "bn",
            (
                F.col("rng") / F.sqrt(F.col("ssq") / F.col("bn"))
            )
            .cast("decimal(18,6)")
            .alias("rs_val"),
        )
    )
    avg_rs = rs.groupBy("bn").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        (F.sum("rs_val").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("a_rs"),
    )
    pts = avg_rs.select(
        F.log(F.col("bn").cast("double"))
        .cast("decimal(28,12)")
        .alias("lx"),
        F.log(F.col("a_rs").cast("double"))
        .cast("decimal(28,12)")
        .alias("ly"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("lx").cast("double").alias("sx"),
        F.sum("ly").cast("double").alias("sy"),
        F.sum((F.col("lx") * F.col("ly")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("lx") * F.col("lx")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.select(
        F.col("k").alias("n_scales"),
        (F.round(slope, 6) + F.lit(0.0)).alias("hurst"),
    )


# Jaccard-coefficient link prediction on the part↔order bipartite graph:
# for part pairs sharing ≥1 order, |N(a)∩N(b)| / |N(a)∪N(b)| over
# ORDER-neighborhoods — the degree-normalized companion to
# adamic_adar_q (which weights by neighbor informativeness instead).
# Same scale guard: per-order fan-out capped at 64 parts, so candidate
# pairs are O(Σ order_size²) with bounded order size, never all-pairs;
# the pair shuffle carries ids only.
@register(
    "neighbor_jaccard_q",
    """
    WITH op0 AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    op AS (
        SELECT o, p FROM (
            SELECT o, p, ROW_NUMBER() OVER (PARTITION BY o ORDER BY p) AS rn
            FROM op0) WHERE rn <= 64
    ),
    deg AS (SELECT p, COUNT(*) AS d FROM op GROUP BY p),
    pairs AS (
        SELECT a.p AS pa, b.p AS pb, COUNT(*) AS n_common
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
    )
    SELECT pa, pb, CAST(n_common AS BIGINT) AS n_common,
           CAST(da.d + db.d - n_common AS BIGINT) AS n_union,
           CAST(ROUND(CAST(n_common AS DOUBLE)
                      / (da.d + db.d - n_common), 6) AS DOUBLE)
               AS jaccard
    FROM pairs JOIN deg da ON pa = da.p JOIN deg db ON pb = db.p
    ORDER BY CAST(n_common AS DOUBLE) / (da.d + db.d - n_common) DESC,
             pa, pb
    LIMIT 30
    """,
)
def neighbor_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    op0 = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    # per-order window: partitions are bounded by order size, never
    # corpus-scale
    wo = Window.partitionBy("o").orderBy("p")
    op = (
        op0.withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") <= 64)
        .drop("rn")
    )
    deg = op.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    a = op.select("o", F.col("p").alias("pa"))
    b = op.select("o", F.col("p").alias("pb"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("p").alias("pa"), F.col("d").alias("da"))
    db = deg.select(F.col("p").alias("pb"), F.col("d").alias("db"))
    uni = F.col("da") + F.col("db") - F.col("n_common")
    jac = F.col("n_common").cast("double") / uni
    return (
        pairs.join(da, "pa")
        .join(db, "pb")
        .select(
            "pa",
            "pb",
            F.col("n_common").cast("long").alias("n_common"),
            uni.cast("long").alias("n_union"),
            F.round(jac, 6).alias("jaccard"),
            jac.alias("_ord"),
        )
        .orderBy(F.col("_ord").desc(), "pa", "pb")
        .limit(30)
        .drop("_ord")
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4: classifier evaluation beyond ROC (average
# precision, Matthews correlation), classic one-way ANOVA, the t-closeness
# privacy audit that completes the k-anonymity/l-diversity family, and the
# hubness diagnostic ANN pipelines use to explain recall loss. Counting
# stays integral wherever the mathematics allows (confusion cells, tied
# rank blocks, k-occurrence deviations), so most of these have exactly one
# float operation at the very end.
# ---------------------------------------------------------------------------


# Average precision (area under the precision-recall curve) of the mean-
# token-length score against the lang='en' label, from per-distinct-score
# counts — the tie-aware block formulation sklearn uses: walking scores
# high→low, each tied block contributes (np/P_tot) x precision-at-block-
# end, i.e. AP = sum_b np_b * cumP_b / (cumP_b + cumN_b) / P_tot. Scale
# shape identical to roc_auc_q: one shuffle keyed by the 4-dp score
# (bounded cardinality), then windows over the SCORE table. Counts stay
# integer; each block ratio is DECIMAL(28,12)-quantized before the
# cross-block sum so tree-aggregation order can never perturb the result.
@register(
    "average_precision_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(CAST(list_sum(list_transform(t, x -> length(x)))
                          AS DOUBLE) / len(t), 4) AS s
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    per_score AS (
        SELECT s, SUM(y) AS np, SUM(1 - y) AS nn
        FROM scored GROUP BY s
    ),
    c AS (
        SELECT np,
               SUM(np) OVER (ORDER BY s DESC) AS cum_p,
               SUM(nn) OVER (ORDER BY s DESC) AS cum_n,
               SUM(np) OVER () AS p_tot, SUM(nn) OVER () AS n_tot
        FROM per_score
    )
    SELECT CAST(MAX(p_tot) AS BIGINT) AS n_pos,
           CAST(MAX(n_tot) AS BIGINT) AS n_neg,
           CAST(ROUND(CAST(SUM(CAST(
               np * cum_p / CAST(cum_p + cum_n AS DOUBLE)
               AS DECIMAL(28,12))) AS DOUBLE) / MAX(p_tot), 6)
               AS DOUBLE) + 0.0 AS avg_precision,
           CAST(ROUND(CAST(MAX(p_tot) AS DOUBLE)
               / (MAX(p_tot) + MAX(n_tot)), 6) AS DOUBLE)
               AS prevalence
    FROM c
    """,
)
def average_precision_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR-AUC companion to roc_auc_q for the same deterministic scorer:
    the metric that stays informative under class imbalance (prevalence
    is its no-skill floor, reported alongside)."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(
            F.aggregate(
                t, F.lit(0), lambda a, x: a + F.length(x)
            ).cast("double")
            / F.size(t),
            4,
        ).alias("s"),
    ).filter(F.size(t) > 0)
    per_score = scored.groupBy("s").agg(
        F.sum("y").alias("np"), F.sum(1 - F.col("y")).alias("nn")
    )
    wc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = per_score.select(
        "np",
        F.sum("np").over(wc).alias("cum_p"),
        F.sum("nn").over(wc).alias("cum_n"),
        F.sum("np").over(wt).alias("p_tot"),
        F.sum("nn").over(wt).alias("n_tot"),
    )
    return c.agg(
        F.max("p_tot").cast("long").alias("n_pos"),
        F.max("n_tot").cast("long").alias("n_neg"),
        (
            F.round(
                _dsum(
                    F.col("np")
                    * F.col("cum_p")
                    / (F.col("cum_p") + F.col("cum_n")).cast("double")
                ).cast("double")
                / F.max("p_tot"),
                6,
            )
            + F.lit(0.0)
        ).alias("avg_precision"),
        F.round(
            F.max("p_tot").cast("double")
            / (F.max("p_tot") + F.max("n_tot")),
            6,
        ).alias("prevalence"),
    )


# Matthews correlation coefficient of the thresholded score (mean token
# length >= 4.5 predicts lang='en'): the single-number confusion-matrix
# summary that, unlike accuracy or F1, is symmetric in the classes and
# honest under imbalance. One corpus-scale aggregation produces the four
# BIGINT confusion cells; MCC's numerator tp*tn - fp*fn stays exact
# 64-bit integer arithmetic, and the only float op is the final sqrt.
@register(
    "matthews_corr_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               CASE WHEN ROUND(CAST(list_sum(list_transform(t,
                        x -> length(x))) AS DOUBLE) / len(t), 4) >= 4.5
                    THEN 1 ELSE 0 END AS yhat
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    cm AS (
        SELECT CAST(SUM(y * yhat) AS BIGINT) AS tp,
               CAST(SUM((1 - y) * yhat) AS BIGINT) AS fp,
               CAST(SUM(y * (1 - yhat)) AS BIGINT) AS fn,
               CAST(SUM((1 - y) * (1 - yhat)) AS BIGINT) AS tn
        FROM scored
    )
    SELECT tp, fp, fn, tn,
           CAST(ROUND(CAST(tp * tn - fp * fn AS DOUBLE)
               / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                      * (tn + fp) * (tn + fn)), 6) AS DOUBLE) + 0.0
               AS mcc
    FROM cm
    """,
)
def matthews_corr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded-classifier MCC over exact integer confusion cells.
    Pairs with cohens_kappa_q (chance-corrected agreement) and roc_auc_q
    (threshold-free) to complete the evaluation family."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.when(
            F.round(
                F.aggregate(
                    t, F.lit(0), lambda a, x: a + F.length(x)
                ).cast("double")
                / F.size(t),
                4,
            )
            >= 4.5,
            1,
        )
        .otherwise(0)
        .alias("yhat"),
    ).filter(F.size(t) > 0)
    cm = scored.agg(
        F.sum(F.col("y") * F.col("yhat")).cast("long").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("long").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("yhat"))).cast("long").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat")))
        .cast("long")
        .alias("tn"),
    )
    mcc = (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")).cast(
        "double"
    ) / F.sqrt(
        (F.col("tp") + F.col("fp")).cast("double")
        * (F.col("tp") + F.col("fn"))
        * (F.col("tn") + F.col("fp"))
        * (F.col("tn") + F.col("fn"))
    )
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        (F.round(mcc, 6) + F.lit(0.0)).alias("mcc"),
    )


# One-way ANOVA F of customer account balance across market segments:
# F = (SSB/(k-1)) / (SSW/(n-k)) via the sum-of-squares identity
# SST = Q - S^2/n, SSB = sum_g S_g^2/n_g - S^2/n. The corpus-scale pass
# is ONE aggregation producing per-group (n, sum x, sum x^2) with
# map-side partials; x is DECIMAL(18,6)-quantized before both sums so
# they are exact and order-independent, and every per-group float ratio
# is re-quantized to DECIMAL(28,12) before the cross-group fold (k=5
# rows — metadata scale, but deterministic on principle). Reports
# eta-squared (SSB/SST) as the effect size alongside the F statistic.
@register(
    "anova_f_q",
    """
    WITH g AS (
        SELECT c_mktsegment,
               COUNT(*) AS n,
               SUM(CAST(c_acctbal AS DECIMAL(19,6))) AS s,
               -- DuckDB: width >= 19 forces the int128 multiply path
               -- (width-18 products overflow for |x| >= ~1000); the
               -- Spark twin stays at decimal(16,6) where 16+16+1 <= 38
               -- keeps the product EXACT at scale 12 (19,6 would round
               -- to 11 dp). Both engines are exact, so values match.
               SUM(CAST(c_acctbal AS DECIMAL(19,6))
                   * CAST(c_acctbal AS DECIMAL(19,6))) AS q
        FROM customer GROUP BY c_mktsegment
    ),
    parts AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
               COUNT(*) AS k,
               CAST(SUM(s) AS DOUBLE) AS s_tot,
               CAST(SUM(q) AS DOUBLE) AS q_tot,
               CAST(SUM(CAST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                    AS DECIMAL(28,12))) AS DOUBLE) AS sum_s2n
        FROM g
    )
    SELECT n_tot, CAST(k AS BIGINT) AS k_groups,
           CAST(ROUND((sum_s2n - s_tot * s_tot / n_tot) / (k - 1)
               / ((q_tot - sum_s2n) / (n_tot - k)), 6) AS DOUBLE) + 0.0
               AS f_stat,
           CAST(ROUND((sum_s2n - s_tot * s_tot / n_tot)
               / (q_tot - s_tot * s_tot / n_tot), 6) AS DOUBLE) + 0.0
               AS eta_squared
    FROM parts
    """,
)
def anova_f_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric k-sample location test completing the family around
    kruskal_wallis_q (its rank-based twin) and brown_forsythe_q (its
    variance-homogeneity precondition check)."""
    c = Catalog(spark, sf_dir).customer
    x = _dec(F.col("c_acctbal"), 16, 6)
    g = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("q"),
    )
    parts = g.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.count(F.lit(1)).alias("k"),
        F.sum("s").cast("double").alias("s_tot"),
        F.sum("q").cast("double").alias("q_tot"),
        _dsum(
            F.col("s").cast("double")
            * F.col("s").cast("double")
            / F.col("n")
        )
        .cast("double")
        .alias("sum_s2n"),
    )
    ssb = F.col("sum_s2n") - F.col("s_tot") * F.col("s_tot") / F.col("n_tot")
    ssw = F.col("q_tot") - F.col("sum_s2n")
    sst = F.col("q_tot") - F.col("s_tot") * F.col("s_tot") / F.col("n_tot")
    return parts.select(
        "n_tot",
        F.col("k").cast("long").alias("k_groups"),
        (
            F.round(
                ssb / (F.col("k") - 1) / (ssw / (F.col("n_tot") - F.col("k"))),
                6,
            )
            + F.lit(0.0)
        ).alias("f_stat"),
        (F.round(ssb / sst, 6) + F.lit(0.0)).alias("eta_squared"),
    )


# t-closeness audit (Li et al. 2007) completing the k-anonymity /
# l-diversity privacy family: for each (nation, segment) equivalence
# class, the Earth Mover's Distance between the class's distribution of
# the ORDERED sensitive attribute (account-balance band 0..3) and the
# global distribution — EMD over an ordered categorical is the mean
# absolute difference of cumulative shares, D = sum_{i<m} |cumP_c(i) -
# cumP_g(i)| / (m-1). Scale shape: one corpus aggregation to (class,
# band) counts, a 4-row broadcast global table, and windows partitioned
# by CLASS (<=4 rows each). Missing bands are zero-filled via a
# class x band scaffold join so cumulative shares are always defined.
@register(
    "t_closeness_q",
    """
    WITH banded AS (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 0
                    WHEN c_acctbal < 3000 THEN 1
                    WHEN c_acctbal < 7000 THEN 2
                    ELSE 3 END AS band
        FROM customer
    ),
    cb AS (
        SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS cnt
        FROM banded GROUP BY c_nationkey, c_mktsegment, band
    ),
    classes AS (
        SELECT c_nationkey, c_mktsegment, SUM(cnt) AS n_class
        FROM cb GROUP BY c_nationkey, c_mktsegment
    ),
    gl AS (
        SELECT band, SUM(cnt) AS gcnt FROM cb GROUP BY band
    ),
    scaffold AS (
        SELECT c.c_nationkey, c.c_mktsegment, c.n_class,
               b.band, COALESCE(cb.cnt, 0) AS cnt, g.gcnt,
               (SELECT SUM(gcnt) FROM gl) AS n_tot
        FROM classes c
        CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b
        LEFT JOIN cb ON cb.c_nationkey = c.c_nationkey
                    AND cb.c_mktsegment = c.c_mktsegment
                    AND cb.band = b.band
        JOIN gl g ON g.band = b.band
    ),
    cums AS (
        SELECT c_nationkey, c_mktsegment, n_class, band,
               SUM(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment
                              ORDER BY band) AS cum_c,
               SUM(gcnt) OVER (PARTITION BY c_nationkey, c_mktsegment
                               ORDER BY band) AS cum_g,
               n_tot
        FROM scaffold
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(MAX(n_class) AS BIGINT) AS group_size,
           CAST(ROUND(CAST(SUM(CASE WHEN band < 3 THEN CAST(
               abs(CAST(cum_c AS DOUBLE) / n_class
                   - CAST(cum_g AS DOUBLE) / n_tot)
               AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END)
               AS DOUBLE) / 3, 6) AS DOUBLE) + 0.0 AS emd,
           CAST(SUM(CASE WHEN band < 3 THEN CAST(
               abs(CAST(cum_c AS DOUBLE) / n_class
                   - CAST(cum_g AS DOUBLE) / n_tot)
               AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END)
               AS DOUBLE) / 3 > 0.2 AS t_violation
    FROM cums
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def t_closeness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does any quasi-identifier class leak the sensitive attribute's
    distribution? EMD-per-class vs the global marginal, zero-filled over
    the full band scaffold so classes missing a band still audit."""
    c = Catalog(spark, sf_dir).customer.withColumn(
        "band",
        F.when(F.col("c_acctbal") < 0, 0)
        .when(F.col("c_acctbal") < 3000, 1)
        .when(F.col("c_acctbal") < 7000, 2)
        .otherwise(3),
    )
    cb = c.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    classes = cb.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").alias("n_class")
    )
    gl = cb.groupBy("band").agg(F.sum("cnt").alias("gcnt"))
    spark_bands = c.sparkSession.range(0, 4).select(
        F.col("id").cast("int").alias("band")
    )
    scaffold = (
        classes.crossJoin(F.broadcast(spark_bands))
        .join(cb, ["c_nationkey", "c_mktsegment", "band"], "left")
        .fillna({"cnt": 0})
        .join(F.broadcast(gl), "band")
    )
    wcum = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wclass = Window.partitionBy("c_nationkey", "c_mktsegment")
    cums = scaffold.select(
        "c_nationkey",
        "c_mktsegment",
        "n_class",
        "band",
        F.sum("cnt").over(wcum).alias("cum_c"),
        F.sum("gcnt").over(wcum).alias("cum_g"),
        # the 4-band scaffold carries the whole global marginal in every
        # class partition, so the corpus total needs no driver collect
        F.sum("gcnt").over(wclass).alias("n_tot"),
    )
    term = F.when(
        F.col("band") < 3,
        F.abs(
            F.col("cum_c").cast("double") / F.col("n_class")
            - F.col("cum_g").cast("double") / F.col("n_tot")
        ).cast("decimal(28,12)"),
    ).otherwise(F.lit(0).cast("decimal(28,12)"))
    emd = F.sum(term).cast("double") / 3
    return cums.groupBy("c_nationkey", "c_mktsegment").agg(
        F.max("n_class").cast("long").alias("group_size"),
        (F.round(emd, 6) + F.lit(0.0)).alias("emd"),
        (emd > 0.2).alias("t_violation"),
    )


# Hubness diagnostic of the embedding space: the k-occurrence N_5(x) —
# how often x appears in another point's 5-NN — and its skewness, the
# standard symptom score for the high-dimensional "hub" pathology that
# silently degrades ANN recall and kNN-classifier accuracy (hubs absorb
# neighbor slots, antihubs become unreachable). Every point is a probe,
# so sum N_5 = 5n exactly: the deviations d = N_5 - 5 are INTEGERS, the
# second/third moments are exact BIGINT sums, and the only float op is
# the final m3 / m2^1.5. Zero-filled via a left join so antihubs
# (N_5 = 0) count. Scale: brute-force n^2 is the test-scale oracle
# path; at corpus scale the same k-occurrence counting runs over the
# candidate pairs of the bucketed ANN (similarity.py ivf_flat_topk /
# ann_bucketed) — the downstream counting plan is unchanged.
@register(
    "hubness_q",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND(list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - q.v[i]) * (c.v[i] - q.v[i])),
                       (x, y) -> x + y), 6), c.vec_id) AS rn
        FROM e q CROSS JOIN e c WHERE c.vec_id <> q.vec_id
    ),
    kocc AS (
        SELECT e.vec_id, COUNT(s.cid) AS n5
        FROM e LEFT JOIN (SELECT cid FROM scored WHERE rn <= 5) s
            ON s.cid = e.vec_id
        GROUP BY e.vec_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(MAX(n5) AS BIGINT) AS max_kocc,
               CAST(SUM(CASE WHEN n5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_antihubs,
               SUM((n5 - 5) * (n5 - 5)) AS m2s,
               SUM((n5 - 5) * (n5 - 5) * (n5 - 5)) AS m3s
        FROM kocc
    )
    SELECT CAST(n AS BIGINT) AS n_points, max_kocc, n_antihubs,
           CAST(ROUND((CAST(m3s AS DOUBLE) / n)
               / pow(CAST(m2s AS DOUBLE) / n, 1.5), 4) AS DOUBLE) + 0.0
               AS skewness
    FROM m
    """,
)
def hubness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence skewness of the 5-NN digraph (Radovanovic et al.):
    skewness >> 0 means a few hub vectors dominate neighbor lists.
    Distances tie-broken on (6-dp d2, vec_id) exactly like twonn_dim_q."""
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )
    # the probe table arrives as ONE parquet split and crossJoin keeps
    # the left partitioning — spread the n x n pair work across the
    # cluster before fanning out. The partition count must be EXPLICIT:
    # the pre-explosion table is tiny, so AQE would coalesce a bare
    # repartition back to one task and serialize the O(n^2 d) stage.
    e = e.repartition(
        spark.sparkContext.defaultParallelism, F.col("vec_id")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"), d2.alias("d2"))
    )
    w = Window.partitionBy("qid").orderBy("d2", "cid")
    top5 = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("cid")
    )
    kocc = (
        e.select("vec_id")
        .join(
            top5.groupBy("cid").agg(F.count(F.lit(1)).alias("n5")),
            e["vec_id"] == F.col("cid"),
            "left",
        )
        .select("vec_id", F.coalesce("n5", F.lit(0)).alias("n5"))
    )
    dev = F.col("n5") - 5
    m = kocc.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("n5").cast("long").alias("max_kocc"),
        F.sum(F.when(F.col("n5") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_antihubs"),
        F.sum(dev * dev).alias("m2s"),
        F.sum(dev * dev * dev).alias("m3s"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_points"),
        "max_kocc",
        "n_antihubs",
        (
            F.round(
                (F.col("m3s").cast("double") / F.col("n"))
                / F.pow(F.col("m2s").cast("double") / F.col("n"), 1.5),
                4,
            )
            + F.lit(0.0)
        ).alias("skewness"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): campaign-eval decile table,
# probabilistic-forecast decomposition, two classic nonparametric
# sequence tests, and the unit-root regression. The classifier-eval pair
# reuses the roc_auc_q scorer; the three time-series ops run on
# DECIMAL-quantized calendar-bounded daily frames.
# ---------------------------------------------------------------------------


# Decile lift & gain table for the mean-token-length scorer: rank all
# docs by score (best first), cut into 10 equal NTILE buckets, and
# report each decile's positive capture (gain) and lift over the base
# rate. The global rank comes from operators.indexing.global_ntile —
# range-partitioned rank + broadcast offsets, NEVER the corpus-scale
# single-partition window a plain NTILE() OVER (ORDER BY ...) would
# plan — while the DuckDB oracle keeps ANSI NTILE, whose semantics
# global_ntile reproduces bit-for-bit. Counts stay integral; the two
# ratios are the only float ops.
@register(
    "lift_gain_q",
    f"""
    WITH scored AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(CAST(list_sum(list_transform(t, x -> length(x)))
                          AS DOUBLE) / len(t), 4) AS s
        FROM (SELECT doc_id, lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    tiled AS (
        SELECT y, NTILE(10) OVER (ORDER BY s DESC, doc_id) AS decile
        FROM scored
    ),
    d AS (
        SELECT decile, COUNT(*) AS n, SUM(y) AS np
        FROM tiled GROUP BY decile
    )
    SELECT decile, CAST(n AS BIGINT) AS n_docs,
           CAST(np AS BIGINT) AS n_pos,
           CAST(ROUND(CAST(SUM(np) OVER (ORDER BY decile) AS DOUBLE)
               / SUM(np) OVER (), 6) AS DOUBLE) AS cum_gain,
           CAST(ROUND((CAST(np AS DOUBLE) / n)
               / (CAST(SUM(np) OVER () AS DOUBLE) / SUM(n) OVER ()), 6)
               AS DOUBLE) AS lift
    FROM d
    """,
)
def lift_gain_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would contacting the top-k% of the ranking capture most of the
    positives? The campaign-targeting view of the same ranking that
    roc_auc_q/average_precision_q summarize to a scalar."""
    from iniz_exporters_spark.operators.indexing import global_ntile

    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(
            F.aggregate(
                t, F.lit(0), lambda a, x: a + F.length(x)
            ).cast("double")
            / F.size(t),
            4,
        ).alias("s"),
    ).filter(F.size(t) > 0)
    tiled = global_ntile(
        scored, [F.col("s").desc(), F.col("doc_id").asc()], 10, "decile"
    )
    dd = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("np")
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return dd.select(
        "decile",
        F.col("n").cast("long").alias("n_docs"),
        F.col("np").cast("long").alias("n_pos"),
        F.round(
            F.sum("np").over(wcum).cast("double") / F.sum("np").over(wt),
            6,
        ).alias("cum_gain"),
        F.round(
            (F.col("np").cast("double") / F.col("n"))
            / (F.sum("np").over(wt).cast("double") / F.sum("n").over(wt)),
            6,
        ).alias("lift"),
    )


# Murphy decomposition of the Brier score (Brier = reliability -
# resolution + uncertainty) for the calibrated-ish probability
# p = score/10: bins are the DISTINCT 4-dp score values (bounded
# cardinality — same key as roc_auc_q), so per-bin counts are exact and
# the three components come from one grouped pass. Each bin's float
# term is DECIMAL(28,12)-quantized before the cross-bin sum. The direct
# Brier mean-squared-error is reported too, pinning the identity
# numerically in both engines.
@register(
    "brier_decomposition_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(CAST(list_sum(list_transform(t, x -> length(x)))
                          AS DOUBLE) / len(t), 4) / 10 AS p
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    b AS (
        SELECT p, COUNT(*) AS n_k, SUM(y) AS pos_k,
               SUM(CAST((p - y) * (p - y) AS DECIMAL(28,12))) AS se_k
        FROM scored GROUP BY p
    ),
    yb AS (
        SELECT CAST(SUM(pos_k) AS DOUBLE) / SUM(n_k) AS ybar FROM b
    ),
    tot AS (
        SELECT CAST(SUM(n_k) AS BIGINT) AS n,
               MAX((SELECT ybar FROM yb)) AS ybar,
               CAST(SUM(se_k) AS DOUBLE) AS sse,
               CAST(SUM(CAST(n_k * (p - CAST(pos_k AS DOUBLE) / n_k)
                    * (p - CAST(pos_k AS DOUBLE) / n_k)
                    AS DECIMAL(28,12))) AS DOUBLE) AS rel_s,
               CAST(SUM(CAST(n_k * (CAST(pos_k AS DOUBLE) / n_k
                        - (SELECT ybar FROM yb))
                    * (CAST(pos_k AS DOUBLE) / n_k
                        - (SELECT ybar FROM yb))
                    AS DECIMAL(28,12))) AS DOUBLE) AS res_s
        FROM b
    )
    SELECT n,
           CAST(ROUND(sse / n, 6) AS DOUBLE) + 0.0 AS brier,
           CAST(ROUND(rel_s / n, 6) AS DOUBLE) + 0.0 AS reliability,
           CAST(ROUND(res_s / n, 6) AS DOUBLE) + 0.0 AS resolution,
           CAST(ROUND(ybar * (1 - ybar), 6) AS DOUBLE) + 0.0
               AS uncertainty
    FROM tot
    """,
)
def brier_decomposition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the probabilistic forecast bad because it is miscalibrated
    (reliability) or because it cannot discriminate (resolution)?
    Verifiable identity: brier ~= reliability - resolution +
    uncertainty up to the binning (exact here since bins ARE the
    distinct forecast values)."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (
            F.round(
                F.aggregate(
                    t, F.lit(0), lambda a, x: a + F.length(x)
                ).cast("double")
                / F.size(t),
                4,
            )
            / 10
        ).alias("p"),
    ).filter(F.size(t) > 0)
    b = scored.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("y").alias("pos_k"),
        _dsum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "se_k"
        ),
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ybar_w = F.sum("pos_k").over(wt).cast("double") / F.sum("n_k").over(wt)
    ybar_k = F.col("pos_k").cast("double") / F.col("n_k")
    tot = b.select(
        "n_k",
        "pos_k",
        "se_k",
        (F.col("n_k") * (F.col("p") - ybar_k) * (F.col("p") - ybar_k))
        .cast("decimal(28,12)")
        .alias("rel_t"),
        (F.col("n_k") * (ybar_k - ybar_w) * (ybar_k - ybar_w))
        .cast("decimal(28,12)")
        .alias("res_t"),
    ).agg(
        F.sum("n_k").cast("long").alias("n"),
        (F.sum("pos_k").cast("double") / F.sum("n_k")).alias("ybar"),
        F.sum("se_k").cast("double").alias("sse"),
        F.sum("rel_t").cast("double").alias("rel_s"),
        F.sum("res_t").cast("double").alias("res_s"),
    )
    return tot.select(
        "n",
        (F.round(F.col("sse") / F.col("n"), 6) + F.lit(0.0)).alias("brier"),
        (F.round(F.col("rel_s") / F.col("n"), 6) + F.lit(0.0)).alias(
            "reliability"
        ),
        (F.round(F.col("res_s") / F.col("n"), 6) + F.lit(0.0)).alias(
            "resolution"
        ),
        (
            F.round(F.col("ybar") * (1 - F.col("ybar")), 6) + F.lit(0.0)
        ).alias("uncertainty"),
    )


# Friedman test across the five event types with calendar days as
# blocks: within each day, rank the types by their daily mean value,
# then chi2_F = 12/(n*k*(k+1)) * sum_j S_j^2 - 3*n*(k+1) from the
# per-type rank sums. Ranks use the deterministic total order
# (mean, type) — means carry 6 exact decimals so statistical ties are
# vanishingly rare, and BOTH engines break any that occur identically.
# Scale shape: one corpus aggregation to the (day x type) table
# (metadata scale: 150 rows here, 5 x 36.5k for a century); ranks
# partition by DAY (5 rows each); rank sums are exact BIGINTs and the
# only float op is the final statistic.
@register(
    "friedman_q",
    """
    WITH dt AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    rk AS (
        SELECT day, event_type,
               ROW_NUMBER() OVER (PARTITION BY day
                   ORDER BY m, event_type) AS r
        FROM dt
    ),
    s AS (
        SELECT event_type, CAST(SUM(r) AS BIGINT) AS rank_sum,
               COUNT(*) AS n_blocks
        FROM rk GROUP BY event_type
    )
    SELECT CAST(MAX(n_blocks) AS BIGINT) AS n_blocks,
           CAST(COUNT(*) AS BIGINT) AS k_treatments,
           CAST(ROUND(12.0 * SUM(rank_sum * rank_sum)
                   / (MAX(n_blocks) * COUNT(*) * (COUNT(*) + 1))
               - 3.0 * MAX(n_blocks) * (COUNT(*) + 1), 6) AS DOUBLE)
               + 0.0 AS friedman_chi2
    FROM s
    """,
)
def friedman_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the event types differ consistently in daily value once
    day-level shifts are blocked out? The repeated-measures companion
    to kruskal_wallis_q (independent groups)."""
    e = Catalog(spark, sf_dir).events
    dt = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wday = Window.partitionBy("day").orderBy("m", "event_type")
    rk = dt.withColumn("r", F.row_number().over(wday))
    s = rk.groupBy("event_type").agg(
        F.sum("r").cast("long").alias("rank_sum"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
    n = F.max("n_blocks")
    k = F.count(F.lit(1))
    return s.agg(
        n.cast("long").alias("n_blocks"),
        k.cast("long").alias("k_treatments"),
        (
            F.round(
                12.0
                * F.sum(F.col("rank_sum") * F.col("rank_sum"))
                / (n * k * (k + 1))
                - 3.0 * n * (k + 1),
                6,
            )
            + F.lit(0.0)
        ).alias("friedman_chi2"),
    )


# Wald–Wolfowitz runs test on the day-over-day direction of the daily
# purchase-revenue mean: count runs of consecutive same-sign moves, then
# z = (R - mu) / sigma with mu = 2 n+ n- / (n+ + n-) + 1. Direction
# comes from an exact DECIMAL difference (never float noise); runs are
# counted as sign-change indicators summed over the calendar-bounded
# daily frame. All counts integral; z is the single float op.
@register(
    "runs_test_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    moves AS (
        SELECT day, m - LAG(m) OVER (ORDER BY day) AS d
        FROM daily
    ),
    signs AS (
        SELECT day, CASE WHEN d > 0 THEN 1 ELSE -1 END AS sgn
        FROM moves WHERE d IS NOT NULL AND d <> 0
    ),
    runs AS (
        SELECT sgn,
               CASE WHEN sgn = LAG(sgn) OVER (ORDER BY day)
                    THEN 0 ELSE 1 END AS new_run
        FROM signs
    ),
    agg AS (
        SELECT CAST(SUM(CASE WHEN new_run IS NULL THEN 1
                             ELSE new_run END) AS BIGINT) AS n_runs,
               CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_up,
               CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down
        FROM runs
    )
    SELECT n_runs, n_up, n_down,
           CAST(ROUND((n_runs - (2.0 * n_up * n_down / (n_up + n_down)
                   + 1))
               / sqrt((2.0 * n_up * n_down
                       * (2.0 * n_up * n_down - n_up - n_down))
                      / ((n_up + n_down) * (n_up + n_down)
                         * (n_up + n_down - 1))), 6) AS DOUBLE) + 0.0
               AS z_stat
    FROM agg
    """,
)
def runs_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the daily revenue direction serially random? Too few runs =
    trending, too many = oscillating; the distribution-free companion
    to ljung_box_q's parametric autocorrelation test."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wday = Window.orderBy("day")
    moves = daily.select(
        "day", (F.col("m") - F.lag("m").over(wday)).alias("d")
    )
    signs = moves.filter(
        F.col("d").isNotNull() & (F.col("d") != 0)
    ).select("day", F.when(F.col("d") > 0, 1).otherwise(-1).alias("sgn"))
    runs = signs.select(
        "sgn",
        F.when(F.col("sgn") == F.lag("sgn").over(wday), 0)
        .otherwise(1)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum(F.coalesce(F.col("new_run"), F.lit(1)))
        .cast("long")
        .alias("n_runs"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
    )
    nu, nd, r = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    mu = 2.0 * nu * nd / (nu + nd) + 1
    var = (
        2.0 * nu * nd * (2.0 * nu * nd - nu - nd)
        / ((nu + nd) * (nu + nd) * (nu + nd - 1))
    )
    return agg.select(
        "n_runs",
        "n_up",
        "n_down",
        (F.round((r - mu) / F.sqrt(var), 6) + F.lit(0.0)).alias("z_stat"),
    )


# Dickey–Fuller unit-root regression on daily purchase revenue:
# OLS of dy_t = alpha + beta * y_{t-1}; DF statistic = beta_hat / se.
# y is DECIMAL(18,6)-quantized at the daily aggregate so the lag
# difference and every cross-product are exact decimals; the five
# regression sums accumulate as DECIMAL(38,12) (order-independent), and
# the closed-form OLS on those five scalars is the only float stage.
# Scale shape: one corpus aggregation; the lag window and the sums run
# over the calendar-bounded daily frame.
@register(
    "dickey_fuller_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    lagged AS (
        SELECT day, m, LAG(m) OVER (ORDER BY day) AS y1
        FROM daily
    ),
    p AS (
        SELECT CAST(y1 AS DECIMAL(16,6)) AS x,
               CAST(m - y1 AS DECIMAL(16,6)) AS dy
        FROM lagged WHERE y1 IS NOT NULL
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(dy) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(x * dy) AS DOUBLE) AS sxy,
               CAST(SUM(dy * dy) AS DOUBLE) AS syy
        FROM p
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST(ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
               AS DOUBLE) + 0.0 AS beta,
           CAST(ROUND(((sxy - sx * sy / n) / (sxx - sx * sx / n))
               / sqrt((((syy - sy * sy / n)
                        - (sxy - sx * sy / n) * (sxy - sx * sy / n)
                          / (sxx - sx * sx / n)) / (n - 2))
                      / (sxx - sx * sx / n)), 6) AS DOUBLE) + 0.0
               AS df_stat
    FROM s
    """,
)
def dickey_fuller_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """beta near 0 (df_stat small in magnitude) = random walk; strongly
    negative df_stat = mean-reverting level. The regression-based
    stationarity check alongside hurst_exponent_q's R/S view."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wday = Window.orderBy("day")
    lagged = daily.select(
        "m", F.lag("m").over(wday).alias("y1")
    ).filter(F.col("y1").isNotNull())
    p = lagged.select(
        F.col("y1").cast("decimal(16,6)").alias("x"),
        (F.col("m") - F.col("y1")).cast("decimal(16,6)").alias("dy"),
    )
    s = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("dy")).cast("double").alias("sxy"),
        F.sum(F.col("dy") * F.col("dy")).cast("double").alias("syy"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    beta = cxy / cxx
    se = F.sqrt(((cyy - cxy * cxy / cxx) / (n - 2)) / cxx)
    return s.select(
        n.cast("long").alias("n_obs"),
        (F.round(beta, 6) + F.lit(0.0)).alias("beta"),
        (F.round(beta / se, 6) + F.lit(0.0)).alias("df_stat"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): monotone calibration (PAVA as a
# bounded minimax), scale reliability (Cronbach's alpha), deterministic
# randomization inference, multiple-testing control (Benjamini-Hochberg),
# and lag-regression causality (Granger). The shared discipline: every
# candidate-pair / replicate structure is bounded (score bins, 5 items,
# 64 replicates, 25 nations, calendar days), never corpus x corpus.
# ---------------------------------------------------------------------------


# Isotonic calibration curve via the minimax characterization of the
# pool-adjacent-violators fit: iso(i) = max_{j<=i} min_{k>=i}
# mean(y over bins j..k) — an O(m^2) formulation over the DISTINCT
# 2-dp score bins (m bounded ~160 by the score's range, independent of
# corpus size), so the notoriously sequential PAVA becomes two window
# passes over a bins x bins pair table: per-j suffix-min in k, then a
# per-k max over j. Bin counts are exact integers; interval means are
# single float divisions computed identically in both engines.
@register(
    "isotonic_calibration_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               -- bin key is PURE INTEGER arithmetic (floor of 100 x the
               -- mean token length): no float op ever touches the key,
               -- so the binning cannot hit the cross-engine .5-boundary
               -- divergence that ROUND(double) keys risk
               CAST(100 * list_sum(list_transform(t, x -> length(x)))
                    // len(t) AS BIGINT) / 1000.0 AS p
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    bins AS (
        SELECT p, COUNT(*) AS n_k, SUM(y) AS pos_k
        FROM scored GROUP BY p
    ),
    c AS (
        SELECT p, n_k, pos_k,
               SUM(n_k) OVER (ORDER BY p) AS cn,
               SUM(pos_k) OVER (ORDER BY p) AS cp
        FROM bins
    ),
    pairs AS (
        SELECT j.p AS pj, k.p AS pk,
               CAST(k.cp - (j.cp - j.pos_k) AS DOUBLE)
                   / (k.cn - (j.cn - j.n_k)) AS mu
        FROM c j JOIN c k ON j.p <= k.p
    ),
    suff AS (
        SELECT pj, pk,
               MIN(mu) OVER (PARTITION BY pj ORDER BY pk DESC) AS sm
        FROM pairs
    ),
    iso AS (
        SELECT pk AS p, MAX(sm) AS iso_raw FROM suff GROUP BY pk
    )
    SELECT c.p AS p_bin, CAST(c.n_k AS BIGINT) AS n_k,
           CAST(c.pos_k AS BIGINT) AS pos_k,
           CAST(ROUND(iso.iso_raw, 6) AS DOUBLE) + 0.0 AS iso_p
    FROM c JOIN iso ON iso.p = c.p
    """,
)
def isotonic_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-nondecreasing calibrated probability per score bin —
    the shape-constrained companion to brier_decomposition_q's
    diagnosis. iso_p is exactly the PAVA fit (minimax identity)."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (
            F.floor(
                (
                    100
                    * F.aggregate(
                        t, F.lit(0), lambda a, x: a + F.length(x)
                    ).cast("long")
                )
                / F.size(t)
            )  # exact: floor(100*tl / nt), integer-valued in both engines
            / F.lit(1000.0)
        ).alias("p"),
    ).filter(F.size(t) > 0)
    bins = scored.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_k"), F.sum("y").alias("pos_k")
    )
    wp = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    c = bins.select(
        "p",
        "n_k",
        "pos_k",
        F.sum("n_k").over(wp).alias("cn"),
        F.sum("pos_k").over(wp).alias("cp"),
    )
    j = c.select(
        F.col("p").alias("pj"),
        (F.col("cp") - F.col("pos_k")).alias("cp_before"),
        (F.col("cn") - F.col("n_k")).alias("cn_before"),
    )
    k = c.select(
        F.col("p").alias("pk"),
        F.col("cp").alias("cp_k"),
        F.col("cn").alias("cn_k"),
    )
    pairs = j.join(k, F.col("pj") <= F.col("pk")).select(
        "pj",
        "pk",
        (
            (F.col("cp_k") - F.col("cp_before")).cast("double")
            / (F.col("cn_k") - F.col("cn_before"))
        ).alias("mu"),
    )
    wsuff = (
        Window.partitionBy("pj")
        .orderBy(F.col("pk").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    suff = pairs.select(
        "pj", "pk", F.min("mu").over(wsuff).alias("sm")
    )
    iso = suff.groupBy("pk").agg(F.max("sm").alias("iso_raw"))
    return (
        c.join(iso, c["p"] == iso["pk"])
        .select(
            F.col("p").alias("p_bin"),
            F.col("n_k").cast("long").alias("n_k"),
            F.col("pos_k").cast("long").alias("pos_k"),
            (F.round(F.col("iso_raw"), 6) + F.lit(0.0)).alias("iso_p"),
        )
    )


# Cronbach's alpha over the five event types as "items" and users as
# "subjects": alpha = k/(k-1) * (1 - sum_i var_i / var_total), with
# per-user item scores = summed event value (zero-filled via a
# user x item scaffold so a user missing an item scores 0, as the
# psychometric formula requires). Variances use population moments from
# exact DECIMAL sums: per-item and total-score sums of x and x^2 are
# order-independent, and the alpha arithmetic runs on k+1 scalars.
# Scale shape: one corpus aggregation to (user, item); the scaffold
# join fans out to users x 5 rows; moments reduce with map-side
# partials — no windows, no corpus-scale collect.
@register(
    "cronbach_alpha_q",
    """
    WITH ui AS (
        SELECT user_id, event_type,
               SUM(CAST(value AS DECIMAL(18,6))) AS x
        FROM events GROUP BY user_id, event_type
    ),
    scaffold AS (
        SELECT u.user_id, it.event_type,
               COALESCE(ui.x, CAST(0 AS DECIMAL(18,6))) AS x
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (SELECT DISTINCT event_type FROM events) it
        LEFT JOIN ui ON ui.user_id = u.user_id
                    AND ui.event_type = it.event_type
    ),
    item_var AS (
        SELECT event_type,
               (CAST(SUM(CAST(x AS DECIMAL(19,6))
                         * CAST(x AS DECIMAL(19,6))) AS DOUBLE)
                - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
                  / COUNT(*)) / COUNT(*) AS v
        FROM scaffold GROUP BY event_type
    ),
    totals AS (
        SELECT user_id, SUM(x) AS tot FROM scaffold GROUP BY user_id
    ),
    tot_var AS (
        SELECT COUNT(*) AS n_users,
               (CAST(SUM(CAST(tot AS DECIMAL(19,6))
                         * CAST(tot AS DECIMAL(19,6))) AS DOUBLE)
                - CAST(SUM(tot) AS DOUBLE) * CAST(SUM(tot) AS DOUBLE)
                  / COUNT(*)) / COUNT(*) AS vt
        FROM totals
    )
    SELECT CAST(tv.n_users AS BIGINT) AS n_users,
           CAST(iv.k AS BIGINT) AS k_items,
           CAST(ROUND(iv.k / (iv.k - 1.0)
               * (1 - iv.sv / tv.vt), 6) AS DOUBLE) + 0.0 AS alpha
    FROM (SELECT COUNT(*) AS k,
                 CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS sv
          FROM item_var) iv, tot_var tv
    """,
)
def cronbach_alpha_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the five engagement signals hang together as one scale?
    alpha > 0.7 is the conventional internal-consistency bar."""
    e = Catalog(spark, sf_dir).events
    ui = e.groupBy("user_id", "event_type").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("x")
    )
    users = e.select("user_id").distinct()
    items = e.select("event_type").distinct()
    scaffold = (
        users.crossJoin(F.broadcast(items))
        .join(ui, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.coalesce(
                F.col("x"), F.lit(0).cast("decimal(18,6)")
            ).alias("x"),
        )
    )
    x16 = F.col("x").cast("decimal(16,6)")
    item_var = scaffold.groupBy("event_type").agg(
        (
            (
                F.sum(x16 * x16).cast("double")
                - F.sum("x").cast("double")
                * F.sum("x").cast("double")
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("v")
    )
    totals = scaffold.groupBy("user_id").agg(F.sum("x").alias("tot"))
    t16 = F.col("tot").cast("decimal(16,6)")
    tot_var = totals.agg(
        F.count(F.lit(1)).alias("n_users"),
        (
            (
                F.sum(t16 * t16).cast("double")
                - F.sum("tot").cast("double")
                * F.sum("tot").cast("double")
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("vt"),
    )
    iv = item_var.agg(
        F.count(F.lit(1)).alias("k"),
        _dsum(F.col("v")).cast("double").alias("sv"),
    )
    return iv.crossJoin(tot_var).select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("k_items"),
        (
            F.round(
                F.col("k")
                / (F.col("k") - 1.0)
                * (1 - F.col("sv") / F.col("vt")),
                6,
            )
            + F.lit(0.0)
        ).alias("alpha"),
    )


# Randomization (permutation-style) test for the difference in mean
# per-user purchase totals between the two user cohorts (user_id
# parity), with DETERMINISTIC reassignments: replicate b in 0..63
# flips each user by the content-keyed hash coin poly_hash('perm:' ||
# user_id || ':' || b) % 2 — the Fisher-randomization analogue of
# poisson_bootstrap_q's resampling, exactly replayable on any engine,
# any partitioning. p = (1 + #extreme) / (B + 1), the standard
# add-one randomization p-value. Scale shape: events reduce to ONE
# per-user row first (corpus-scale pass); the 64 replicates fan out
# from the USER table (metadata x 64) with map-side partial sums.
@register(
    "permutation_test_q",
    f"""
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               SUM(CAST(value AS DECIMAL(18,6))) AS tot
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    obs AS (
        SELECT CAST(SUM(CASE WHEN grp = 0 THEN tot END) AS DOUBLE)
                   / SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
               - CAST(SUM(CASE WHEN grp = 1 THEN tot END) AS DOUBLE)
                   / SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS d_obs
        FROM u
    ),
    reps AS (
        SELECT b,
               {_SQL_POLY.format(
                   s="'perm:' || user_id::VARCHAR || ':' || b::VARCHAR"
               )} % 2 AS g, tot
        FROM u, (SELECT unnest(range(0, 64)) AS b)
    ),
    rd AS (
        SELECT b,
               CAST(SUM(CASE WHEN g = 0 THEN tot END) AS DOUBLE)
                   / SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END)
               - CAST(SUM(CASE WHEN g = 1 THEN tot END) AS DOUBLE)
                   / SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS d
        FROM reps GROUP BY b
    )
    SELECT CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_users,
           CAST(ROUND((SELECT d_obs FROM obs), 6) AS DOUBLE) + 0.0
               AS obs_diff,
           CAST(SUM(CASE WHEN abs(d) >= abs((SELECT d_obs FROM obs))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           CAST(ROUND((1.0 + SUM(CASE WHEN abs(d) >=
                    abs((SELECT d_obs FROM obs)) THEN 1 ELSE 0 END))
               / 65.0, 6) AS DOUBLE) AS p_value
    FROM rd
    """,
)
def permutation_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free significance for the cohort difference: how
    often does a hash-randomized relabeling produce a gap at least as
    large as the observed one?"""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("tot")
    ).withColumn("grp", F.col("user_id") % 2)

    def mean_diff(gcol):
        m0 = F.sum(
            F.when(gcol == 0, F.col("tot"))
        ).cast("double") / F.sum(F.when(gcol == 0, 1).otherwise(0))
        m1 = F.sum(
            F.when(gcol == 1, F.col("tot"))
        ).cast("double") / F.sum(F.when(gcol == 1, 1).otherwise(0))
        return m0 - m1

    obs = u.agg(
        mean_diff(F.col("grp")).alias("d_obs"),
        F.count(F.lit(1)).alias("n_users"),
    )
    b = u.sparkSession.range(0, 64).select(
        F.col("id").cast("int").alias("b")
    )
    reps = u.crossJoin(F.broadcast(b)).select(
        "b",
        "tot",
        (
            poly_hash(
                F.concat(
                    F.lit("perm:"),
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            )
            % 2
        ).alias("g"),
    )
    rd = reps.groupBy("b").agg(mean_diff(F.col("g")).alias("d"))
    return (
        rd.crossJoin(F.broadcast(obs))
        .agg(
            F.max("n_users").cast("long").alias("n_users"),
            (F.round(F.max("d_obs"), 6) + F.lit(0.0)).alias("obs_diff"),
            F.sum(
                F.when(F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_extreme"),
            F.round(
                (
                    1.0
                    + F.sum(
                        F.when(
                            F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1
                        ).otherwise(0)
                    )
                )
                / 65.0,
                6,
            ).alias("p_value"),
        )
    )


# Benjamini-Hochberg FDR control over the 25-nation family of two-sided
# one-sample z-tests (does nation mean acctbal differ from the global
# mean?). The normal tail probability uses the Abramowitz & Stegun
# 7.1.26 erfc polynomial spelled IDENTICALLY in both engines (pure
# double arithmetic: exp + one polynomial — deterministic IEEE ops, no
# library-dependent erf). Scale shape: one corpus aggregation to
# per-nation moments; the BH step-up runs in a window over the
# 25-row FAMILY table. Ranks tie-break on nation for determinism.
@register(
    "bh_fdr_q",
    """
    WITH g AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mu,
               sqrt((CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6))
                              * CAST(c_acctbal AS DECIMAL(19,6)))
                          AS DOUBLE)
                     - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                            AS DOUBLE)
                       * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                              AS DOUBLE) / COUNT(*))
                    / COUNT(*)) AS sd
        FROM customer
    ),
    nat AS (
        SELECT c_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM customer GROUP BY c_nationkey
    ),
    z AS (
        SELECT c_nationkey, n,
               abs((m - g.mu) / (g.sd / sqrt(n))) AS az
        FROM nat, g
    ),
    p AS (
        SELECT c_nationkey, n, az,
               (0.254829592 * (1 / (1 + 0.3275911 * az / sqrt(2.0)))
                - 0.284496736 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 2)
                + 1.421413741 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 3)
                - 1.453152027 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 4)
                + 1.061405429 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 5))
               * exp(-az * az / 2.0) AS pv
        FROM z
    ),
    ranked AS (
        SELECT c_nationkey, n, az, pv,
               ROW_NUMBER() OVER (ORDER BY pv, c_nationkey) AS i,
               COUNT(*) OVER () AS m_tests
        FROM p
    ),
    kstar AS (
        SELECT ranked.*,
               MAX(CASE WHEN pv <= 0.05 * i / m_tests THEN i END)
                   OVER () AS k
        FROM ranked
    )
    SELECT c_nationkey, CAST(n AS BIGINT) AS n_customers,
           CAST(ROUND(az, 4) AS DOUBLE) + 0.0 AS abs_z,
           CAST(ROUND(pv, 6) AS DOUBLE) + 0.0 AS p_value,
           CAST(i AS BIGINT) AS bh_rank,
           COALESCE(i <= k, FALSE) AS discovery
    FROM kstar
    """,
)
def bh_fdr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which nations' balance means differ from global, at 5% FALSE
    DISCOVERY RATE rather than per-test alpha? Step-up: largest i with
    p_(i) <= alpha*i/m; all ranks at or below are discoveries."""
    c = Catalog(spark, sf_dir).customer
    s6 = _dec(F.col("c_acctbal"), 18, 6)
    s16 = _dec(F.col("c_acctbal"), 16, 6)
    g = c.agg(
        (F.sum(s6).cast("double") / F.count(F.lit(1))).alias("mu"),
        F.sqrt(
            (
                F.sum(s16 * s16).cast("double")
                - F.sum(s6).cast("double")
                * F.sum(s6).cast("double")
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("sd"),
    )
    nat = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(s6).cast("double") / F.count(F.lit(1))).alias("m"),
    )
    z = nat.crossJoin(F.broadcast(g)).select(
        "c_nationkey",
        "n",
        F.abs(
            (F.col("m") - F.col("mu"))
            / (F.col("sd") / F.sqrt(F.col("n")))
        ).alias("az"),
    )
    t = 1 / (1 + 0.3275911 * F.col("az") / F.sqrt(F.lit(2.0)))
    pv = (
        0.254829592 * t
        - 0.284496736 * F.pow(t, 2)
        + 1.421413741 * F.pow(t, 3)
        - 1.453152027 * F.pow(t, 4)
        + 1.061405429 * F.pow(t, 5)
    ) * F.exp(-F.col("az") * F.col("az") / 2.0)
    p = z.withColumn("pv", pv)
    wr = Window.orderBy("pv", "c_nationkey")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = p.select(
        "c_nationkey",
        "n",
        "az",
        "pv",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wt).alias("m_tests"),
    )
    kstar = ranked.withColumn(
        "k",
        F.max(
            F.when(
                F.col("pv") <= 0.05 * F.col("i") / F.col("m_tests"),
                F.col("i"),
            )
        ).over(wt),
    )
    return kstar.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n_customers"),
        (F.round(F.col("az"), 4) + F.lit(0.0)).alias("abs_z"),
        (F.round(F.col("pv"), 6) + F.lit(0.0)).alias("p_value"),
        F.col("i").cast("long").alias("bh_rank"),
        F.coalesce(F.col("i") <= F.col("k"), F.lit(False)).alias(
            "discovery"
        ),
    )


# Granger causality (1 lag): does yesterday's CLICK level improve the
# prediction of today's PURCHASE level beyond yesterday's purchase
# level alone? Unrestricted OLS y_t ~ a + b1*y_{t-1} + b2*x_{t-1} vs
# restricted y_t ~ a + b*y_{t-1}; F = (RSS_r - RSS_u) * (n-3) / RSS_u.
# Both regressions are closed-form (2x2 normal equations by Cramer's
# rule) over centered cross-moments; every input is DECIMAL-quantized
# at the daily aggregate so lagging, differencing, and the six cross
# products are exact, and each product is re-quantized to
# DECIMAL(28,12) before its sum. The windows run over the
# calendar-bounded daily frame.
@register(
    "granger_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,6)) END)
                    AS DOUBLE)
                    / SUM(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS DECIMAL(18,6)) AS y,
               CAST(CAST(SUM(CASE WHEN event_type = 'click'
                        THEN CAST(value AS DECIMAL(18,6)) END)
                    AS DOUBLE)
                    / SUM(CASE WHEN event_type = 'click'
                          THEN 1 ELSE 0 END) AS DECIMAL(18,6)) AS x
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY CAST(ts AS DATE)
    ),
    lagged AS (
        SELECT y AS w,
               LAG(y) OVER (ORDER BY day) AS z1,
               LAG(x) OVER (ORDER BY day) AS z2
        FROM daily
    ),
    pp AS (
        SELECT CAST(w AS DECIMAL(16,6)) AS w,
               CAST(z1 AS DECIMAL(16,6)) AS z1,
               CAST(z2 AS DECIMAL(16,6)) AS z2
        FROM lagged WHERE z1 IS NOT NULL AND z2 IS NOT NULL
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(w) AS DOUBLE) AS sw,
               CAST(SUM(z1) AS DOUBLE) AS s1,
               CAST(SUM(z2) AS DOUBLE) AS s2,
               CAST(SUM(w * w) AS DOUBLE) AS sww,
               CAST(SUM(z1 * z1) AS DOUBLE) AS s11,
               CAST(SUM(z2 * z2) AS DOUBLE) AS s22,
               CAST(SUM(z1 * z2) AS DOUBLE) AS s12,
               CAST(SUM(z1 * w) AS DOUBLE) AS s1w,
               CAST(SUM(z2 * w) AS DOUBLE) AS s2w
        FROM pp
    ),
    c AS (
        SELECT n,
               sww - sw * sw / n AS cww,
               s11 - s1 * s1 / n AS c11,
               s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12,
               s1w - s1 * sw / n AS c1w,
               s2w - s2 * sw / n AS c2w
        FROM s
    ),
    fit AS (
        SELECT n,
               (c1w * c22 - c2w * c12) / (c11 * c22 - c12 * c12) AS b1,
               (c2w * c11 - c1w * c12) / (c11 * c22 - c12 * c12) AS b2,
               cww, c1w, c2w, c11
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST(ROUND(b1, 6) AS DOUBLE) + 0.0 AS beta_y_lag,
           CAST(ROUND(b2, 6) AS DOUBLE) + 0.0 AS beta_x_lag,
           CAST(ROUND(((cww - c1w * c1w / c11)
                       - (cww - b1 * c1w - b2 * c2w)) * (n - 3)
                   / (cww - b1 * c1w - b2 * c2w), 6) AS DOUBLE) + 0.0
               AS f_stat
    FROM fit
    """,
)
def granger_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F > ~4 at these df suggests clicks carry next-day predictive
    information for purchases. Pairs with dickey_fuller_q (run it
    first: Granger on unit-root series is spurious)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type").isin("purchase", "click")
    )
    v6 = _dec(F.col("value"), 18, 6)
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", v6))
            .cast("double")
            / F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
        )
        .cast("decimal(18,6)")
        .alias("y"),
        (
            F.sum(F.when(F.col("event_type") == "click", v6))
            .cast("double")
            / F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
        )
        .cast("decimal(18,6)")
        .alias("x"),
    )
    wday = Window.orderBy("day")
    lagged = daily.select(
        F.col("y").alias("w0"),
        F.lag("y").over(wday).alias("l1"),
        F.lag("x").over(wday).alias("l2"),
    ).filter(F.col("l1").isNotNull() & F.col("l2").isNotNull())
    pp = lagged.select(
        F.col("w0").cast("decimal(16,6)").alias("w"),
        F.col("l1").cast("decimal(16,6)").alias("z1"),
        F.col("l2").cast("decimal(16,6)").alias("z2"),
    )
    s = pp.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").cast("double").alias("sw"),
        F.sum("z1").cast("double").alias("s1"),
        F.sum("z2").cast("double").alias("s2"),
        F.sum(F.col("w") * F.col("w")).cast("double").alias("sww"),
        F.sum(F.col("z1") * F.col("z1")).cast("double").alias("s11"),
        F.sum(F.col("z2") * F.col("z2")).cast("double").alias("s22"),
        F.sum(F.col("z1") * F.col("z2")).cast("double").alias("s12"),
        F.sum(F.col("z1") * F.col("w")).cast("double").alias("s1w"),
        F.sum(F.col("z2") * F.col("w")).cast("double").alias("s2w"),
    )
    n = F.col("n")
    cww = F.col("sww") - F.col("sw") * F.col("sw") / n
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1w = F.col("s1w") - F.col("s1") * F.col("sw") / n
    c2w = F.col("s2w") - F.col("s2") * F.col("sw") / n
    det = c11 * c22 - c12 * c12
    b1 = (c1w * c22 - c2w * c12) / det
    b2 = (c2w * c11 - c1w * c12) / det
    rss_u = cww - b1 * c1w - b2 * c2w
    rss_r = cww - c1w * c1w / c11
    return s.select(
        n.cast("long").alias("n_obs"),
        (F.round(b1, 6) + F.lit(0.0)).alias("beta_y_lag"),
        (F.round(b2, 6) + F.lit(0.0)).alias("beta_x_lag"),
        (
            F.round((rss_r - rss_u) * (n - 3) / rss_u, 6) + F.lit(0.0)
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): experimentation statistics
# (Welch's t, sequential SPRT, power analysis) and the seasonal-strength
# summary of the STL decomposition. One corpus pass each; everything
# after the per-group moments is scalar arithmetic.
# ---------------------------------------------------------------------------


# Welch's unequal-variance t-test with Cohen's d for the two user
# cohorts' per-user purchase totals (same cohorts and per-user
# reduction as permutation_test_q, so the parametric and randomization
# answers are directly comparable). Per-arm moments come from exact
# DECIMAL sums; t, the Welch-Satterthwaite df, and pooled-sd Cohen's d
# are scalar arithmetic on six numbers. Sample (n-1) variances.
@register(
    "welch_ttest_q",
    """
    WITH u AS (
        SELECT user_id % 2 AS arm,
               SUM(CAST(value AS DECIMAL(18,6))) AS tot
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    m AS (
        SELECT arm, COUNT(*) AS n,
               CAST(SUM(tot) AS DOUBLE) AS s,
               -- width >= 19 keeps DuckDB on the int128 multiply
               -- path (the Spark twin uses decimal(16,6): see anova_f_q)
               CAST(SUM(CAST(tot AS DECIMAL(19,6))
                        * CAST(tot AS DECIMAL(19,6))) AS DOUBLE) AS q
        FROM u GROUP BY arm
    ),
    w AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 0 THEN s / n END) AS m0,
               MAX(CASE WHEN arm = 1 THEN s / n END) AS m1,
               MAX(CASE WHEN arm = 0 THEN (q - s * s / n) / (n - 1) END)
                   AS v0,
               MAX(CASE WHEN arm = 1 THEN (q - s * s / n) / (n - 1) END)
                   AS v1
        FROM m
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(ROUND(m0 - m1, 6) AS DOUBLE) + 0.0 AS mean_diff,
           CAST(ROUND((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 6)
               AS DOUBLE) + 0.0 AS t_stat,
           CAST(ROUND(pow(v0 / n0 + v1 / n1, 2)
               / (pow(v0 / n0, 2) / (n0 - 1)
                  + pow(v1 / n1, 2) / (n1 - 1)), 4) AS DOUBLE) + 0.0
               AS welch_df,
           CAST(ROUND((m0 - m1) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1)
               / (n0 + n1 - 2)), 6) AS DOUBLE) + 0.0 AS cohens_d
    FROM w
    """,
)
def welch_ttest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parametric companion to permutation_test_q on the same
    cohort split: t, Welch-Satterthwaite df, and the pooled-sd effect
    size in one row."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("tot")
    ).withColumn("arm", F.col("user_id") % 2)
    t16 = F.col("tot").cast("decimal(16,6)")
    m = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("tot").cast("double").alias("s"),
        F.sum(t16 * t16).cast("double").alias("q"),
    )

    def arm(col, a):
        return F.max(F.when(F.col("arm") == a, col))

    w = m.agg(
        arm(F.col("n"), 0).alias("n0"),
        arm(F.col("n"), 1).alias("n1"),
        arm(F.col("s") / F.col("n"), 0).alias("m0"),
        arm(F.col("s") / F.col("n"), 1).alias("m1"),
        arm(
            (F.col("q") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1),
            0,
        ).alias("v0"),
        arm(
            (F.col("q") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1),
            1,
        ).alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    dfw = F.pow(se2, 2) / (
        F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
        + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
    )
    pooled = F.sqrt(
        ((F.col("n0") - 1) * F.col("v0") + (F.col("n1") - 1) * F.col("v1"))
        / (F.col("n0") + F.col("n1") - 2)
    )
    diff = F.col("m0") - F.col("m1")
    return w.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        (F.round(diff, 6) + F.lit(0.0)).alias("mean_diff"),
        (F.round(diff / F.sqrt(se2), 6) + F.lit(0.0)).alias("t_stat"),
        (F.round(dfw, 4) + F.lit(0.0)).alias("welch_df"),
        (F.round(diff / pooled, 6) + F.lit(0.0)).alias("cohens_d"),
    )


# Seasonal strength and trend strength of the daily view-event series,
# from the same STL-lite decomposition as stl_decompose_q:
# F_seasonal = max(0, 1 - var(resid)/var(seasonal+resid)),
# F_trend = max(0, 1 - var(resid)/var(detrended... trend+resid)) —
# Hyndman's definitions. Every component is DECIMAL-quantized (the
# stl_decompose_q discipline) and the variances reduce over the
# calendar-bounded daily frame; the max(0,·) clamp also normalizes any
# negative zero.
@register(
    "seasonal_strength_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                   AS dow,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'view'
        GROUP BY CAST(ts AS DATE),
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
    ),
    trended AS (
        SELECT day, dow, m,
               CAST(CAST(SUM(m) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DOUBLE)
                    / COUNT(*) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DECIMAL(18,6)) AS trend
        FROM daily
    ),
    seasoned AS (
        SELECT day, m, trend,
               CAST(CAST(SUM(m - trend) OVER (PARTITION BY dow)
                    AS DOUBLE) / COUNT(*) OVER (PARTITION BY dow)
                    AS DECIMAL(18,6)) AS seasonal
        FROM trended
    ),
    comp AS (
        SELECT CAST(m - trend - seasonal AS DOUBLE) AS r,
               CAST(m - trend AS DOUBLE) AS sr,
               CAST(m - seasonal AS DOUBLE) AS tr
        FROM seasoned
    ),
    v AS (
        SELECT COUNT(*) AS n,
               (SUM(r * r) - SUM(r) * SUM(r) / COUNT(*)) / COUNT(*)
                   AS vr,
               (SUM(sr * sr) - SUM(sr) * SUM(sr) / COUNT(*)) / COUNT(*)
                   AS vsr,
               (SUM(tr * tr) - SUM(tr) * SUM(tr) / COUNT(*)) / COUNT(*)
                   AS vtr
        FROM comp
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           greatest(0.0, CAST(ROUND(1 - vr / vsr, 6) AS DOUBLE))
               AS seasonal_strength,
           greatest(0.0, CAST(ROUND(1 - vr / vtr, 6) AS DOUBLE))
               AS trend_strength
    FROM v
    """,
)
def seasonal_strength_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row summary answering 'is this series worth deseasonalizing
    before anomaly detection?' — the scalar view of stl_decompose_q.
    Variance sums run over ~30 rows (centered-window means are already
    DECIMAL), so plain double sums are deterministic here only because
    the frame is single-partition calendar metadata; the quantized
    components keep both engines bit-identical."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "view"
    )
    daily = e.groupBy(
        F.to_date("ts").alias("day"),
        (F.datediff(F.to_date("ts"), F.lit("2024-01-01")) % 7).alias(
            "dow"
        ),
    ).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "trend",
        (
            F.sum("m").over(w7).cast("double")
            / F.count(F.lit(1)).over(w7)
        ).cast("decimal(18,6)"),
    )
    wdow = Window.partitionBy("dow")
    seasoned = trended.withColumn(
        "seasonal",
        (
            F.sum(F.col("m") - F.col("trend")).over(wdow).cast("double")
            / F.count(F.lit(1)).over(wdow)
        ).cast("decimal(18,6)"),
    )
    comp = seasoned.select(
        (F.col("m") - F.col("trend") - F.col("seasonal"))
        .cast("double")
        .alias("r"),
        (F.col("m") - F.col("trend")).cast("double").alias("sr"),
        (F.col("m") - F.col("seasonal")).cast("double").alias("tr"),
    )

    def pvar(c):
        return (
            F.sum(c * c) - F.sum(c) * F.sum(c) / F.count(F.lit(1))
        ) / F.count(F.lit(1))

    v = comp.agg(
        F.count(F.lit(1)).alias("n"),
        pvar(F.col("r")).alias("vr"),
        pvar(F.col("sr")).alias("vsr"),
        pvar(F.col("tr")).alias("vtr"),
    )
    return v.select(
        F.col("n").cast("long").alias("n_days"),
        F.greatest(
            F.lit(0.0), F.round(1 - F.col("vr") / F.col("vsr"), 6)
        ).alias("seasonal_strength"),
        F.greatest(
            F.lit(0.0), F.round(1 - F.col("vr") / F.col("vtr"), 6)
        ).alias("trend_strength"),
    )


# Wald SPRT on the user-level conversion stream (H0: p = 0.5 vs H1:
# p = 0.6 that a user converts, i.e. has >= 1 purchase event), walked
# in user_id order: LLR_t = n1_t*ln(p1/p0) + (t - n1_t)*ln(q1/q0),
# stop when LLR crosses ln((1-beta)/alpha) (accept H1) or
# ln(beta/(1-alpha)) (accept H0), alpha = beta = 0.05. The cumulative
# SUCCESS COUNT — the only corpus-scale running quantity — comes from
# operators.indexing.global_cumsum (range-partitioned, exact integers,
# never a single-partition window); the LLR is per-row arithmetic on
# two integers. The oracle keeps plain ANSI windows.
@register(
    "sprt_q",
    """
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS x
        FROM events GROUP BY user_id
    ),
    walk AS (
        SELECT user_id,
               ROW_NUMBER() OVER (ORDER BY user_id) AS t,
               SUM(x) OVER (ORDER BY user_id) AS n1
        FROM u
    ),
    llr AS (
        SELECT t, n1,
               n1 * ln(0.6 / 0.5) + (t - n1) * ln(0.4 / 0.5) AS l
        FROM walk
    )
    SELECT CAST(MAX(t) AS BIGINT) AS n_trials,
           CAST(MAX(CASE WHEN t = (SELECT MAX(t) FROM llr) THEN n1 END)
               AS BIGINT) AS n_success,
           CAST(ROUND(MAX(CASE WHEN t = (SELECT MAX(t) FROM llr)
               THEN l END), 6) AS DOUBLE) + 0.0 AS final_llr,
           CAST(MIN(CASE WHEN l >= ln(19.0) THEN t END) AS BIGINT)
               AS first_accept_h1_t,
           CAST(MIN(CASE WHEN l <= -ln(19.0) THEN t END) AS BIGINT)
               AS first_accept_h0_t
    FROM llr
    """,
)
def sprt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential testing: how early would the conversion experiment
    have stopped? Crossing times are exact because the walk state is
    two integers; ln enters only per-row, as in zipf_fit_q."""
    from iniz_exporters_spark.operators.indexing import (
        global_cumsum,
        global_index,
    )

    e = Catalog(spark, sf_dir).events
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x")
    )
    walk = global_index(u, "user_id", "t")
    walk = global_cumsum(walk, ["user_id"], "x", "n1")
    import math as _math

    la = _math.log(0.6 / 0.5)
    lb = _math.log(0.4 / 0.5)
    thr = _math.log(19.0)
    llr = walk.select(
        "t",
        "n1",
        (F.col("n1") * la + (F.col("t") - F.col("n1")) * lb).alias("l"),
    )
    tmax = llr.agg(F.max("t").alias("tm"))
    return (
        llr.crossJoin(F.broadcast(tmax))
        .agg(
            F.max("t").cast("long").alias("n_trials"),
            F.max(F.when(F.col("t") == F.col("tm"), F.col("n1")))
            .cast("long")
            .alias("n_success"),
            (
                F.round(
                    F.max(F.when(F.col("t") == F.col("tm"), F.col("l"))),
                    6,
                )
                + F.lit(0.0)
            ).alias("final_llr"),
            F.min(F.when(F.col("l") >= thr, F.col("t")))
            .cast("long")
            .alias("first_accept_h1_t"),
            F.min(F.when(F.col("l") <= -thr, F.col("t")))
            .cast("long")
            .alias("first_accept_h0_t"),
        )
    )


# Per-component structure report over the order-chain graph (the
# star_components_q edge set): nodes, edges, density 2m/(n(n-1)), and
# is_tree (m = n-1). Components come from the O(log n)-round
# star-contraction in plans/graph.py; edges re-join to their component
# by src endpoint (both endpoints agree by construction). The oracle
# exploits the STRUCTURAL ground truth instead of re-running a CC
# algorithm: the chain edges are built per customer, so each customer
# with k >= 2 orders is exactly one k-node path — a stronger
# independent check than a second traversal. Density buckets the
# report to one row per (n_nodes, n_edges) shape — metadata scale.
@register(
    "component_density_q",
    """
    WITH per_cust AS (
        SELECT o_custkey, COUNT(*) AS n
        FROM orders WHERE o_custkey % 100 = 0
        GROUP BY o_custkey
    )
    SELECT n AS n_nodes, n - 1 AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(ROUND(2.0 / n, 6) AS DOUBLE) AS density,
           TRUE AS is_tree
    FROM per_cust WHERE n >= 2
    GROUP BY n
    """,
)
def component_density_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape census of the near-dup-style chain graph: how many
    components of each (nodes, edges) shape, their density, and
    whether they are trees. Grouping to shapes keeps the output
    component-count-free (metadata-scale rows)."""
    from iniz_exporters_spark.plans.graph import connected_components

    o = Catalog(spark, sf_dir).orders.filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = (
        o.select(
            F.col("o_orderkey").alias("dst"),
            F.lag("o_orderkey").over(w).alias("src"),
        )
        .filter(F.col("src").isNotNull())
        .select("src", "dst")
    )
    comps = connected_components(edges, method="star")
    cn = comps.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    ce = (
        edges.join(comps.withColumnRenamed("node", "src"), "src")
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    shaped = cn.join(ce, "component")
    return shaped.groupBy("n_nodes", "n_edges").agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.round(
            2.0
            * F.first("n_edges")
            / (F.first("n_nodes") * (F.first("n_nodes") - 1)),
            6,
        ).alias("density"),
        (F.first("n_edges") == F.first("n_nodes") - 1).alias("is_tree"),
    )


# A/B power analysis sized FROM the observed data: n per arm to detect
# a 5% lift of the mean per-user purchase total at alpha = 0.05 (two-
# sided), power = 0.80, using the normal approximation
# n = 2 (z_{1-a/2} + z_{1-b})^2 sigma^2 / delta^2. Moments come from
# the same exact-DECIMAL per-user reduction as welch_ttest_q; the z
# quantiles are fixed literals (1.959963985, 0.8416212336), so the
# only data-dependent float math is the final scalar formula. ceil is
# applied to a 6-dp-rounded ratio so an engine ulp can never straddle
# the integer boundary.
@register(
    "power_analysis_q",
    """
    WITH u AS (
        SELECT SUM(CAST(value AS DECIMAL(18,6))) AS tot
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(tot) AS DOUBLE) / COUNT(*) AS mu,
               (CAST(SUM(CAST(tot AS DECIMAL(19,6))
                         * CAST(tot AS DECIMAL(19,6))) AS DOUBLE)
                - CAST(SUM(tot) AS DOUBLE) * CAST(SUM(tot) AS DOUBLE)
                  / COUNT(*)) / (COUNT(*) - 1) AS var_s
        FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_observed,
           CAST(ROUND(mu, 6) AS DOUBLE) + 0.0 AS mean_total,
           CAST(ROUND(sqrt(var_s), 6) AS DOUBLE) + 0.0 AS sd_total,
           CAST(ROUND(0.05 * mu, 6) AS DOUBLE) + 0.0 AS mde_abs,
           CAST(ceil(ROUND(
               2 * pow(1.959963985 + 0.8416212336, 2) * var_s
               / pow(0.05 * mu, 2), 6)) AS BIGINT) AS n_per_arm
    FROM m
    """,
)
def power_analysis_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many users per arm would the purchase-total experiment need
    to see a 5% lift? Sizing computed from the corpus's own moments —
    the planning companion to welch_ttest_q / permutation_test_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("tot")
    )
    t16 = F.col("tot").cast("decimal(16,6)")
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("tot").cast("double") / F.count(F.lit(1))).alias("mu"),
        (
            (
                F.sum(t16 * t16).cast("double")
                - F.sum("tot").cast("double")
                * F.sum("tot").cast("double")
                / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("var_s"),
    )
    za, zb = 1.959963985, 0.8416212336
    return m.select(
        F.col("n").cast("long").alias("n_observed"),
        (F.round(F.col("mu"), 6) + F.lit(0.0)).alias("mean_total"),
        (F.round(F.sqrt(F.col("var_s")), 6) + F.lit(0.0)).alias(
            "sd_total"
        ),
        (F.round(0.05 * F.col("mu"), 6) + F.lit(0.0)).alias("mde_abs"),
        F.ceil(
            F.round(
                2
                * F.pow(F.lit(za + zb), 2)
                * F.col("var_s")
                / F.pow(0.05 * F.col("mu"), 2),
                6,
            )
        )
        .cast("long")
        .alias("n_per_arm"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): the autocorrelation function,
# inequality decomposition, spatial autocorrelation, ANOVA post-hoc
# pairs, and a 3-iteration unrolled soft-clustering EM. The clustering
# one deliberately uses RATIONAL membership weights (fuzzy c-means'
# inverse-square-distance), not Gaussian responsibilities: +,-,x,/ are
# correctly rounded IEEE ops, bit-identical on every engine, whereas a
# per-row exp() could differ by an ulp between libms.
# ---------------------------------------------------------------------------


# Sample autocorrelation function of daily purchase revenue at lags
# 1..7: r_k = sum(dev_t * dev_{t+k}) / sum(dev_t^2) with deviations
# from the DECIMAL-quantized series mean, so every product in both
# sums is exact and order-independent. One corpus aggregation; the
# 7 lag passes are windows over the calendar-bounded daily frame.
@register(
    "acf_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    mu AS (
        SELECT CAST(CAST(SUM(m) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6))
            AS ybar, COUNT(*) AS n
        FROM daily
    ),
    dev AS (
        SELECT day, CAST(m - (SELECT ybar FROM mu) AS DECIMAL(16,6))
            AS d
        FROM daily
    ),
    lags AS (
        SELECT l.lag, d1.d AS a, d2.d AS b
        FROM (SELECT unnest(range(1, 8)) AS lag) l
        JOIN dev d1 ON TRUE
        JOIN dev d2 ON d2.day = d1.day + CAST(l.lag AS INTEGER)
    ),
    den AS (
        SELECT CAST(SUM(d * d) AS DOUBLE) AS ss FROM dev
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(ROUND(CAST(SUM(a * b) AS DOUBLE)
               / (SELECT ss FROM den), 6) AS DOUBLE) + 0.0 AS acf
    FROM lags GROUP BY lag
    """,
)
def acf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full short-lag correlogram (rolling_autocorr_q tracks only a
    windowed lag-1); feeds the ljung_box_q portmanteau and the weekly
    seasonality read (expect a bump at lag 7)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    mu = daily.agg(
        (F.sum("m").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("ybar")
    )
    dev = daily.crossJoin(F.broadcast(mu)).select(
        "day",
        (F.col("m") - F.col("ybar")).cast("decimal(16,6)").alias("d"),
    )
    den = dev.agg(
        F.sum(F.col("d") * F.col("d")).cast("double").alias("ss")
    )
    lags = daily.sparkSession.range(1, 8).select(
        F.col("id").cast("int").alias("lag")
    )
    d1 = dev.select(F.col("day").alias("day1"), F.col("d").alias("a"))
    d2 = dev.select(F.col("day").alias("day2"), F.col("d").alias("b"))
    pairs = (
        d1.crossJoin(F.broadcast(lags))
        .join(
            d2,
            F.col("day2")
            == F.date_add(F.col("day1"), F.col("lag")),
        )
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("a") * F.col("b")).alias("sab"),
        )
        .crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n_pairs",
            (
                F.round(F.col("sab").cast("double") / F.col("ss"), 6)
                + F.lit(0.0)
            ).alias("acf"),
        )
    )


# Theil-T inequality index of order prices, decomposed by customer
# nation: T = T_between + T_within with
# T_between = sum_g (s_g) ln(mu_g/mu)  [s_g = group income share],
# T_within  = sum_g  s_g * T_g. Per-row work is one ln (the same
# accepted float class as ccnet/zipf); x ln x terms are
# DECIMAL(28,12)-quantized before their corpus-scale sums so addition
# order never moves the result. One shuffle keyed by nation.
@register(
    "theil_index_q",
    """
    WITH x AS (
        SELECT c.c_nationkey AS nat, o.o_totalprice AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
        SELECT nat, COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s,
               CAST(SUM(CAST(x * ln(x) AS DECIMAL(28,12))) AS DOUBLE)
                   AS sxlx
        FROM x GROUP BY nat
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE) AS s,
               CAST(SUM(CAST(sxlx AS DECIMAL(28,12))) AS DOUBLE) AS sxlx
        FROM g
    ),
    parts AS (
        SELECT (SELECT sxlx / s FROM tot) - ln((SELECT s / n FROM tot))
                   AS t_total,
               CAST(SUM(CAST((s / (SELECT s FROM tot))
                    * ln((s / n) / (SELECT s / n FROM tot))
                    AS DECIMAL(28,12))) AS DOUBLE) AS t_between
        FROM g
    )
    SELECT (SELECT n FROM tot) AS n_orders,
           CAST(ROUND(t_total, 6) AS DOUBLE) + 0.0 AS theil_total,
           CAST(ROUND(t_between, 6) AS DOUBLE) + 0.0 AS theil_between,
           CAST(ROUND(t_total - t_between, 6) AS DOUBLE) + 0.0
               AS theil_within
    FROM parts
    """,
)
def theil_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much order-value inequality lives BETWEEN nations vs within
    them? Uses the population-share identity T = E[x ln x]/mu/E[x] -
    ln(mu) so the corpus pass needs only (n, sum x, sum x ln x) per
    group — the decomposition is scalar arithmetic on the group table."""
    o = Catalog(spark, sf_dir).orders
    c = Catalog(spark, sf_dir).customer.select("c_custkey", "c_nationkey")
    x = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_nationkey").alias("nat"),
        F.col("o_totalprice").alias("x"),
    )
    g = x.groupBy("nat").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("x"), 18, 6)).cast("double").alias("s"),
        _dsum(F.col("x") * F.log(F.col("x"))).cast("double").alias("sxlx"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("tn"),
        _dsum(F.col("s")).cast("double").alias("ts"),
        _dsum(F.col("sxlx")).cast("double").alias("tsxlx"),
    )
    parts = g.crossJoin(F.broadcast(tot)).agg(
        F.max("tn").alias("n_orders"),
        (
            F.max(F.col("tsxlx") / F.col("ts"))
            - F.log(F.max(F.col("ts") / F.col("tn")))
        ).alias("t_total"),
        _dsum(
            (F.col("s") / F.col("ts"))
            * F.log(
                (F.col("s") / F.col("n")) / (F.col("ts") / F.col("tn"))
            )
        )
        .cast("double")
        .alias("t_between"),
    )
    return parts.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.round(F.col("t_total"), 6) + F.lit(0.0)).alias("theil_total"),
        (F.round(F.col("t_between"), 6) + F.lit(0.0)).alias(
            "theil_between"
        ),
        (
            F.round(F.col("t_total") - F.col("t_between"), 6)
            + F.lit(0.0)
        ).alias("theil_within"),
    )


# Moran's I spatial autocorrelation of nation-level mean account
# balance over the "shares a region" adjacency graph:
# I = (n/W) * sum_ij w_ij z_i z_j / sum_i z_i^2, w_ij = 1 iff same
# region and i != j. One corpus aggregation to nation means; the
# z-scores, the 25x25 adjacency, and the double sum are all
# nation-table metadata (self-join on region).
@register(
    "moran_i_q",
    """
    WITH nm AS (
        SELECT c_nationkey AS nat,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM customer GROUP BY c_nationkey
    ),
    nz AS (
        SELECT nm.nat, n.n_regionkey AS region,
               m - (SELECT CAST(SUM(CAST(m AS DECIMAL(28,12)))
                        AS DOUBLE) / COUNT(*) FROM nm) AS z
        FROM nm JOIN nation n ON n.n_nationkey = nm.nat
    ),
    pairs AS (
        SELECT a.z AS za, b.z AS zb
        FROM nz a JOIN nz b
            ON a.region = b.region AND a.nat <> b.nat
    )
    SELECT CAST((SELECT COUNT(*) FROM nz) AS BIGINT) AS n_nations,
           CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_links,
           CAST(ROUND(
               (CAST((SELECT COUNT(*) FROM nz) AS DOUBLE)
                / (SELECT COUNT(*) FROM pairs))
               * CAST((SELECT SUM(CAST(za * zb AS DECIMAL(28,12)))
                       FROM pairs) AS DOUBLE)
               / CAST((SELECT SUM(CAST(z * z AS DECIMAL(28,12)))
                       FROM nz) AS DOUBLE), 6) AS DOUBLE) + 0.0
               AS moran_i
    """,
)
def moran_i_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do same-region nations have correlated balance levels? I > 0 =
    regional clustering, I < 0 = checkerboard; expectation under the
    null is -1/(n-1), not 0."""
    c = Catalog(spark, sf_dir).customer
    n = Catalog(spark, sf_dir).nation.select(
        F.col("n_nationkey").alias("nat"),
        F.col("n_regionkey").alias("region"),
    )
    nm = c.groupBy(F.col("c_nationkey").alias("nat")).agg(
        (
            F.sum(_dec(F.col("c_acctbal"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    mbar = nm.agg(
        (_dsum(F.col("m")).cast("double") / F.count(F.lit(1))).alias(
            "mbar"
        )
    )
    nz = (
        nm.join(F.broadcast(n), "nat")
        .crossJoin(F.broadcast(mbar))
        .select(
            "nat", "region", (F.col("m") - F.col("mbar")).alias("z")
        )
    )
    a = nz.select(
        F.col("region").alias("ra"),
        F.col("nat").alias("na"),
        F.col("z").alias("za"),
    )
    b = nz.select(
        F.col("region").alias("rb"),
        F.col("nat").alias("nb"),
        F.col("z").alias("zb"),
    )
    pairs = a.join(
        b, (F.col("ra") == F.col("rb")) & (F.col("na") != F.col("nb"))
    )
    num = pairs.agg(
        F.count(F.lit(1)).alias("n_links"),
        _dsum(F.col("za") * F.col("zb")).cast("double").alias("cross"),
    )
    den = nz.agg(
        F.count(F.lit(1)).alias("n_nations"),
        _dsum(F.col("z") * F.col("z")).cast("double").alias("ss"),
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("n_nations").cast("long").alias("n_nations"),
        F.col("n_links").cast("long").alias("n_links"),
        (
            F.round(
                (F.col("n_nations").cast("double") / F.col("n_links"))
                * F.col("cross")
                / F.col("ss"),
                6,
            )
            + F.lit(0.0)
        ).alias("moran_i"),
    )


# Tukey HSD post-hoc pairs after anova_f_q: for each of the 10 segment
# pairs, the mean difference and the studentized-range criterion
# |diff| > (q_crit/sqrt(2)) * sqrt(MSW*(1/ni+1/nj)) with the
# asymptotic q(k=5, inf, 0.05) = 3.858 as a fixed literal (the
# Tukey-Kramer unequal-n form). Group moments reduce in one pass
# (exact DECIMAL sums); the pair table is k(k-1)/2 rows of scalar
# arithmetic.
@register(
    "tukey_hsd_q",
    """
    WITH g AS (
        SELECT c_mktsegment AS seg, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   AS s,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6))
                        * CAST(c_acctbal AS DECIMAL(19,6))) AS DOUBLE)
                   AS q
        FROM customer GROUP BY c_mktsegment
    ),
    msw AS (
        SELECT CAST(SUM(CAST(q - s * s / n AS DECIMAL(28,12)))
                    AS DOUBLE)
               / (SUM(n) - COUNT(*)) AS v
        FROM g
    )
    SELECT a.seg AS seg_a, b.seg AS seg_b,
           CAST(ROUND(a.s / a.n - b.s / b.n, 6) AS DOUBLE) + 0.0
               AS mean_diff,
           CAST(ROUND(3.858 / sqrt(2.0)
               * sqrt((SELECT v FROM msw) * (1.0 / a.n + 1.0 / b.n)),
               6) AS DOUBLE) + 0.0 AS hsd_critical,
           abs(a.s / a.n - b.s / b.n)
               > 3.858 / sqrt(2.0)
                 * sqrt((SELECT v FROM msw) * (1.0 / a.n + 1.0 / b.n))
               AS significant
    FROM g a JOIN g b ON a.seg < b.seg
    """,
)
def tukey_hsd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH segment pairs differ, after anova_f_q says SOME do —
    familywise-error-controlled pairwise comparisons."""
    c = Catalog(spark, sf_dir).customer
    s6 = _dec(F.col("c_acctbal"), 18, 6)
    s16 = _dec(F.col("c_acctbal"), 16, 6)
    g = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(s6).cast("double").alias("s"),
        F.sum(s16 * s16).cast("double").alias("q"),
    )
    msw = g.agg(
        (
            _dsum(
                F.col("q") - F.col("s") * F.col("s") / F.col("n")
            ).cast("double")
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("v")
    )
    a = g.select(
        F.col("seg").alias("seg_a"),
        F.col("n").alias("na"),
        (F.col("s") / F.col("n")).alias("ma"),
    )
    b = g.select(
        F.col("seg").alias("seg_b"),
        F.col("n").alias("nb"),
        (F.col("s") / F.col("n")).alias("mb"),
    )
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b")).crossJoin(
        F.broadcast(msw)
    )
    crit = (
        3.858
        / F.sqrt(F.lit(2.0))
        * F.sqrt(F.col("v") * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    )
    diff = F.col("ma") - F.col("mb")
    return pairs.select(
        "seg_a",
        "seg_b",
        (F.round(diff, 6) + F.lit(0.0)).alias("mean_diff"),
        (F.round(crit, 6) + F.lit(0.0)).alias("hsd_critical"),
        (F.abs(diff) > crit).alias("significant"),
    )


def _fcm_oracle(iters: int = 3) -> str:
    """Unrolled fuzzy-c-means oracle: one membership CTE + one centroid
    CTE per iteration, generated so the Spark loop and the SQL stay in
    lockstep. Memberships are inverse-square-distance ratios — pure
    +,-,x,/ on doubles (correctly-rounded IEEE ops, bit-identical
    across engines), never a libm call; weighted sums are
    DECIMAL(28,12)-quantized so partial-sum order cannot move the
    centroids."""
    parts = [
        "x AS (SELECT c_acctbal AS x FROM customer)",
        "c0 AS (SELECT CAST(0.0 AS DOUBLE) AS c1,"
        " CAST(8000.0 AS DOUBLE) AS c2)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        d1 = f"(x - (SELECT c1 FROM c{p})) * (x - (SELECT c1 FROM c{p}))"
        d2 = f"(x - (SELECT c2 FROM c{p})) * (x - (SELECT c2 FROM c{p}))"
        parts.append(
            f"m{k} AS (SELECT x, ({d2}) / (({d1}) + ({d2})) AS u1 FROM x)"
        )
        parts.append(
            f"""c{k} AS (
        SELECT CAST(SUM(CAST(u1 * u1 * x AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(u1 * u1 AS DECIMAL(28,12))) AS DOUBLE)
                   AS c1,
               CAST(SUM(CAST((1 - u1) * (1 - u1) * x AS DECIMAL(28,12)))
                    AS DOUBLE)
               / CAST(SUM(CAST((1 - u1) * (1 - u1) AS DECIMAL(28,12)))
                      AS DOUBLE) AS c2
        FROM m{k})"""
        )
    last = f"c{iters}"
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT CAST((SELECT COUNT(*) FROM x) AS BIGINT) AS n_points,
           CAST(ROUND(least(c1, c2), 4) AS DOUBLE) + 0.0 AS centroid_lo,
           CAST(ROUND(greatest(c1, c2), 4) AS DOUBLE) + 0.0
               AS centroid_hi
    FROM {last}
    """


# Fuzzy c-means (m = 2, two clusters, three unrolled iterations) on
# customer account balance. Soft k-means whose membership weights are
# RATIONAL functions of distance — u1 = d2^2/(d1^2+d2^2) — chosen over
# Gaussian-EM responsibilities precisely because they involve no
# exp()/libm call: every arithmetic step is a correctly-rounded IEEE
# op, so both engines walk bit-identical centroid trajectories. Each
# iteration is one corpus pass (map-side partial sums of quantized
# weighted moments); the centroid state between passes is a broadcast
# 1-row frame, never a collect.
@register("fuzzy_cmeans_q", _fcm_oracle(3))
def fuzzy_cmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative soft clustering expressed as a 3-stage declarative
    DAG — the 1-D pedagogical twin of operators/clustering.py's
    k-means (which owns the d-dimensional production path)."""
    c = Catalog(spark, sf_dir).customer
    x = c.select(F.col("c_acctbal").alias("x"))
    spark_ = x.sparkSession
    cent = spark_.range(1).select(
        F.lit(0.0).alias("c1"), F.lit(8000.0).alias("c2")
    )
    for _ in range(3):
        m = x.crossJoin(F.broadcast(cent))
        d1 = (F.col("x") - F.col("c1")) * (F.col("x") - F.col("c1"))
        d2 = (F.col("x") - F.col("c2")) * (F.col("x") - F.col("c2"))
        m = m.select("x", (d2 / (d1 + d2)).alias("u1"))
        w1 = F.col("u1") * F.col("u1")
        w2 = (1 - F.col("u1")) * (1 - F.col("u1"))
        cent = m.agg(
            (
                F.sum((w1 * F.col("x")).cast("decimal(28,12)"))
                .cast("double")
                / F.sum(w1.cast("decimal(28,12)")).cast("double")
            ).alias("c1"),
            (
                F.sum((w2 * F.col("x")).cast("decimal(28,12)"))
                .cast("double")
                / F.sum(w2.cast("decimal(28,12)")).cast("double")
            ).alias("c2"),
        )
    n = x.agg(F.count(F.lit(1)).alias("n_points"))
    return cent.crossJoin(F.broadcast(n)).select(
        F.col("n_points").cast("long").alias("n_points"),
        (
            F.round(F.least(F.col("c1"), F.col("c2")), 4) + F.lit(0.0)
        ).alias("centroid_lo"),
        (
            F.round(F.greatest(F.col("c1"), F.col("c2")), 4) + F.lit(0.0)
        ).alias("centroid_hi"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): collocation mining, drawdown,
# market concentration, Pareto ABC inventory classes on the distributed
# rank, and a fixed-basket price index. ABC is the scale showcase: a
# corpus-wide revenue rank + cumulative share with NO single-partition
# window (global_cumsum).
# ---------------------------------------------------------------------------


# Dunning log-likelihood-ratio collocations over document bigrams: the
# G2 statistic 2*sum(O*ln(O/E)) on each bigram's 2x2 contingency table
# — the robust big-counts companion to token_pmi_q (PMI overweights
# rare pairs; LLR doesn't). Counts are exact from two token-stream
# aggregations; the per-bigram G2 arithmetic runs on the BIGRAM
# VOCABULARY table. ln(0)-free by the 0*ln(0)=0 convention (terms with
# O=0 are dropped in both engines identically). Top 30 by (G2, bigram).
@register(
    "collocation_llr_q",
    f"""
    WITH t AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS w,
               generate_subscripts({_SQL_TOKENS}, 1) AS pos
        FROM documents
    ),
    bg AS (
        SELECT a.w AS w1, b.w AS w2, COUNT(*) AS o11
        FROM t a JOIN t b
            ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        GROUP BY a.w, b.w
    ),
    tot AS (SELECT CAST(SUM(o11) AS DOUBLE) AS n FROM bg),
    marg1 AS (SELECT w1, SUM(o11) AS c1 FROM bg GROUP BY w1),
    marg2 AS (SELECT w2, SUM(o11) AS c2 FROM bg GROUP BY w2),
    cells AS (
        SELECT bg.w1, bg.w2, bg.o11,
               m1.c1 - bg.o11 AS o12,
               m2.c2 - bg.o11 AS o21,
               (SELECT n FROM tot) - m1.c1 - m2.c2 + bg.o11 AS o22,
               m1.c1 AS c1, m2.c2 AS c2, (SELECT n FROM tot) AS n
        FROM bg JOIN marg1 m1 ON m1.w1 = bg.w1
                JOIN marg2 m2 ON m2.w2 = bg.w2
    ),
    g2 AS (
        SELECT w1, w2, o11,
               2 * ((CASE WHEN o11 > 0 THEN o11 * ln(o11 * n / (c1 * c2))
                          ELSE 0 END)
                  + (CASE WHEN o12 > 0 THEN o12 * ln(o12 * n / (c1 * (n - c2)))
                          ELSE 0 END)
                  + (CASE WHEN o21 > 0 THEN o21 * ln(o21 * n / ((n - c1) * c2))
                          ELSE 0 END)
                  + (CASE WHEN o22 > 0 THEN o22 * ln(o22 * n / ((n - c1) * (n - c2)))
                          ELSE 0 END)) AS llr
        FROM cells
    )
    SELECT w1, w2, CAST(o11 AS BIGINT) AS n_cooc,
           CAST(ROUND(llr, 4) AS DOUBLE) + 0.0 AS llr
    FROM g2
    ORDER BY llr DESC, w1, w2 LIMIT 30
    """,
)
def collocation_llr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which word pairs co-occur far beyond chance? Dunning 1993's G2
    over adjacent-token bigrams; scale shape is two vocabulary-keyed
    shuffles and scalar math on the bigram table."""
    d = Catalog(spark, sf_dir).documents
    t = d.select(
        "doc_id", F.posexplode(_tokens("text")).alias("pos", "w")
    )
    # adjacent pairs via LEAD over the per-document partition (bounded
    # by document length) — one shuffle of the token stream, not the
    # two a positional self-join would move
    wl = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        t.withColumn("w2", F.lead("w").over(wl))
        .filter(F.col("w2").isNotNull())
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).alias("o11"))
    )
    tot = bg.agg(F.sum("o11").cast("double").alias("n"))
    m1 = bg.groupBy("w1").agg(F.sum("o11").alias("c1"))
    m2 = bg.groupBy("w2").agg(F.sum("o11").alias("c2"))
    cells = (
        bg.join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "o11",
            (F.col("c1") - F.col("o11")).alias("o12"),
            (F.col("c2") - F.col("o11")).alias("o21"),
            (F.col("n") - F.col("c1") - F.col("c2") + F.col("o11")).alias(
                "o22"
            ),
            "c1",
            "c2",
            "n",
        )
    )

    def term(o, e_num, e_den):
        return F.when(
            o > 0, o * F.log(o * F.col("n") / (e_num * e_den))
        ).otherwise(F.lit(0.0))

    llr = 2 * (
        term(F.col("o11"), F.col("c1"), F.col("c2"))
        + term(F.col("o12"), F.col("c1"), F.col("n") - F.col("c2"))
        + term(F.col("o21"), F.col("n") - F.col("c1"), F.col("c2"))
        + term(
            F.col("o22"), F.col("n") - F.col("c1"), F.col("n") - F.col("c2")
        )
    )
    g2 = cells.select(
        "w1",
        "w2",
        F.col("o11").cast("long").alias("n_cooc"),
        (F.round(llr, 4) + F.lit(0.0)).alias("llr"),
    )
    return g2.orderBy(F.col("llr").desc(), "w1", "w2").limit(30)


# Maximum drawdown of cumulative daily purchase revenue: running peak
# minus current equity, reported with peak/trough days. Equity is an
# exact DECIMAL cumulative sum, so peaks, troughs, and the argmax day
# are deterministic. Calendar-bounded windows only.
@register(
    "drawdown_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    pnl AS (
        -- demean so the curve is a trendless P&L with real drawdowns
        -- (raw revenue is positive-only: its cumsum is monotone and
        -- max drawdown would be identically zero at every scale)
        SELECT day,
               rev - (SELECT CAST(CAST(SUM(rev) AS DOUBLE) / COUNT(*)
                          AS DECIMAL(18,6)) FROM daily) AS rev
        FROM daily
    ),
    eq AS (
        SELECT day, SUM(rev) OVER (ORDER BY day) AS equity
        FROM pnl
    ),
    dd AS (
        SELECT day, equity,
               MAX(equity) OVER (ORDER BY day) AS peak
        FROM eq
    ),
    w AS (
        SELECT day, equity, peak, peak - equity AS draw
        FROM dd
    )
    SELECT CAST(ROUND(CAST(MAX(draw) AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS max_drawdown,
           MIN(CASE WHEN draw = (SELECT MAX(draw) FROM w)
               THEN day END) AS trough_day,
           CAST(ROUND(CAST(MAX(equity) AS DOUBLE), 2) AS DOUBLE) + 0.0
               AS final_peak_equity
    FROM w
    """,
)
def drawdown_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst peak-to-trough slide of the revenue equity curve — the
    risk statistic every monitoring dashboard wants next to ohlc_bars_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    mu = daily.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("mu")
    )
    pnl = daily.crossJoin(F.broadcast(mu)).select(
        "day", (F.col("rev") - F.col("mu")).alias("rev")
    )
    wday = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w = pnl.select(
        "day", F.sum("rev").over(wday).alias("equity")
    ).withColumn("peak", F.max("equity").over(wday))
    w = w.withColumn("draw", F.col("peak") - F.col("equity"))
    mx = w.agg(F.max("draw").alias("mdraw"))
    return (
        w.crossJoin(F.broadcast(mx))
        .agg(
            (F.round(F.max("draw").cast("double"), 2) + F.lit(0.0)).alias(
                "max_drawdown"
            ),
            F.min(
                F.when(F.col("draw") == F.col("mdraw"), F.col("day"))
            ).alias("trough_day"),
            (
                F.round(F.max("equity").cast("double"), 2) + F.lit(0.0)
            ).alias("final_peak_equity"),
        )
    )


# Herfindahl–Hirschman concentration of supplier revenue within each
# supplier nation: HHI = sum_i share_i^2 over a nation's suppliers
# (1/n = perfect competition, 1 = monopoly; HHI > 0.25 is the antitrust
# red line). Revenue reduces exactly per supplier; shares and the HHI
# are per-nation scalar math. Effective competitor count 1/HHI comes
# along for free.
@register(
    "herfindahl_q",
    """
    WITH sr AS (
        SELECT s.s_nationkey AS nat, l.l_suppkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS rev
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey, l.l_suppkey
    ),
    nt AS (
        SELECT nat, CAST(SUM(rev) AS DOUBLE) AS tot, COUNT(*) AS n_supp
        FROM sr GROUP BY nat
    )
    SELECT sr.nat AS nationkey, CAST(MAX(nt.n_supp) AS BIGINT) AS n_suppliers,
           CAST(ROUND(CAST(SUM(CAST(
               (CAST(rev AS DOUBLE) / nt.tot)
               * (CAST(rev AS DOUBLE) / nt.tot) AS DECIMAL(28,12)))
               AS DOUBLE), 6) AS DOUBLE) + 0.0 AS hhi,
           CAST(ROUND(1.0 / CAST(SUM(CAST(
               (CAST(rev AS DOUBLE) / nt.tot)
               * (CAST(rev AS DOUBLE) / nt.tot) AS DECIMAL(28,12)))
               AS DOUBLE), 4) AS DOUBLE) + 0.0 AS effective_n
    FROM sr JOIN nt ON nt.nat = sr.nat
    GROUP BY sr.nat
    """,
)
def herfindahl_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration census per supplier nation; the inequality
    lens on revenue that gini_q applies to documents."""
    li = Catalog(spark, sf_dir).lineitem
    s = Catalog(spark, sf_dir).supplier.select("s_suppkey", "s_nationkey")
    sr = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nat"), "l_suppkey")
        .agg(F.sum(_dec(F.col("l_extendedprice"), 18, 4)).alias("rev"))
    )
    nt = sr.groupBy("nat").agg(
        F.sum("rev").cast("double").alias("tot"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    share = F.col("rev").cast("double") / F.col("tot")
    return (
        sr.join(F.broadcast(nt), "nat")
        .groupBy(F.col("nat").alias("nationkey"))
        .agg(
            F.max("n_supp").cast("long").alias("n_suppliers"),
            (
                F.round(_dsum(share * share).cast("double"), 6)
                + F.lit(0.0)
            ).alias("hhi"),
            (
                F.round(1.0 / _dsum(share * share).cast("double"), 4)
                + F.lit(0.0)
            ).alias("effective_n"),
        )
    )


# Pareto ABC inventory classification of parts by lineitem revenue:
# class A = parts covering the first 80% of cumulative revenue share,
# B = next 15%, C = the tail. The revenue rank and cumulative share
# run over the PART-scale table via global_cumsum (range partition +
# broadcast prefix offsets) — at 100 TB the part dimension is still
# millions of rows, and this plan never serializes it into one window
# task (the oracle keeps plain ANSI windows). Revenue is summed as
# exact DECIMAL cents so the cumulative shares are deterministic.
@register(
    "abc_analysis_q",
    """
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000
                    AS BIGINT) AS rev_c
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(rev_c) AS DOUBLE) AS t FROM pr),
    c AS (
        SELECT l_partkey, rev_c,
               SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey)
                   AS cum_c
        FROM pr
    ),
    cls AS (
        SELECT l_partkey, rev_c,
               CASE WHEN cum_c <= 0.80 * (SELECT t FROM tot) THEN 'A'
                    WHEN cum_c <= 0.95 * (SELECT t FROM tot) THEN 'B'
                    ELSE 'C' END AS abc
        FROM c
    )
    SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(ROUND(CAST(SUM(rev_c) AS DOUBLE)
               / (SELECT t FROM tot), 6) AS DOUBLE) AS revenue_share
    FROM cls GROUP BY abc
    """,
)
def abc_analysis_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/15/5 inventory census. Cumulative revenue share over the
    ranked part table uses the distributed prefix-sum — the classic
    'Pareto cut needs a global running total' trap, solved the same
    way as seq_rank/sprt_q."""
    from iniz_exporters_spark.operators.indexing import global_cumsum

    li = Catalog(spark, sf_dir).lineitem
    pr = li.groupBy("l_partkey").agg(
        (F.sum(_dec(F.col("l_extendedprice"), 18, 4)) * 10000)
        .cast("long")
        .alias("rev_c")
    )
    tot = pr.agg(F.sum("rev_c").cast("double").alias("t"))
    c = global_cumsum(
        pr,
        [F.col("rev_c").desc(), F.col("l_partkey").asc()],
        "rev_c",
        "cum_c",
    )
    cls = c.crossJoin(F.broadcast(tot)).withColumn(
        "abc",
        F.when(F.col("cum_c") <= 0.80 * F.col("t"), "A")
        .when(F.col("cum_c") <= 0.95 * F.col("t"), "B")
        .otherwise("C"),
    )
    return (
        cls.groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            (F.sum("rev_c").cast("double") / F.max("t")).alias("rs"),
        )
        .select(
            "abc",
            "n_parts",
            F.round(F.col("rs"), 6).alias("revenue_share"),
        )
    )


# Laspeyres and Paasche price indices between the first and last
# calendar YEAR of lineitem shipments, over the parts traded in both:
# L = sum(p1 q0)/sum(p0 q0), P = sum(p1 q1)/sum(p0 q1), with
# per-part period prices = revenue/quantity and quantities as weights.
# Fisher's ideal index = sqrt(L*P). Every period aggregate is an exact
# DECIMAL sum; the index arithmetic runs on the common-parts join.
@register(
    "price_index_q",
    """
    WITH base AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                   AS DOUBLE) AS rev,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS qty
        FROM lineitem WHERE year(l_shipdate) = 1995
        GROUP BY l_partkey
    ),
    cur AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                   AS DOUBLE) AS rev,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS qty
        FROM lineitem WHERE year(l_shipdate) = 2001
        GROUP BY l_partkey
    ),
    j AS (
        SELECT b.rev / b.qty AS p0, b.qty AS q0,
               c.rev / c.qty AS p1, c.qty AS q1
        FROM base b JOIN cur c ON c.l_partkey = b.l_partkey
    ),
    s AS (
        SELECT COUNT(*) AS n_parts,
               CAST(SUM(CAST(p1 * q0 AS DECIMAL(28,12))) AS DOUBLE)
                   AS p1q0,
               CAST(SUM(CAST(p0 * q0 AS DECIMAL(28,12))) AS DOUBLE)
                   AS p0q0,
               CAST(SUM(CAST(p1 * q1 AS DECIMAL(28,12))) AS DOUBLE)
                   AS p1q1,
               CAST(SUM(CAST(p0 * q1 AS DECIMAL(28,12))) AS DOUBLE)
                   AS p0q1
        FROM j
    )
    SELECT CAST(n_parts AS BIGINT) AS n_common_parts,
           CAST(ROUND(p1q0 / p0q0, 6) AS DOUBLE) + 0.0 AS laspeyres,
           CAST(ROUND(p1q1 / p0q1, 6) AS DOUBLE) + 0.0 AS paasche,
           CAST(ROUND(sqrt((p1q0 / p0q0) * (p1q1 / p0q1)), 6)
               AS DOUBLE) + 0.0 AS fisher
    FROM s
    """,
)
def price_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did unit prices drift between the first and last shipment year?
    Base-weighted (Laspeyres), current-weighted (Paasche), and their
    geometric mean (Fisher ideal)."""
    li = Catalog(spark, sf_dir).lineitem

    def period(year):
        return (
            li.filter(F.year("l_shipdate") == year)
            .groupBy("l_partkey")
            .agg(
                F.sum(_dec(F.col("l_extendedprice"), 18, 4))
                .cast("double")
                .alias("rev"),
                F.sum(_dec(F.col("l_quantity"), 18, 4))
                .cast("double")
                .alias("qty"),
            )
        )

    base = period(1995).select(
        "l_partkey",
        (F.col("rev") / F.col("qty")).alias("p0"),
        F.col("qty").alias("q0"),
    )
    cur = period(2001).select(
        F.col("l_partkey").alias("pk"),
        (F.col("rev") / F.col("qty")).alias("p1"),
        F.col("qty").alias("q1"),
    )
    j = base.join(cur, base["l_partkey"] == cur["pk"])
    s = j.agg(
        F.count(F.lit(1)).alias("n_parts"),
        _dsum(F.col("p1") * F.col("q0")).cast("double").alias("p1q0"),
        _dsum(F.col("p0") * F.col("q0")).cast("double").alias("p0q0"),
        _dsum(F.col("p1") * F.col("q1")).cast("double").alias("p1q1"),
        _dsum(F.col("p0") * F.col("q1")).cast("double").alias("p0q1"),
    )
    return s.select(
        F.col("n_parts").cast("long").alias("n_common_parts"),
        (
            F.round(F.col("p1q0") / F.col("p0q0"), 6) + F.lit(0.0)
        ).alias("laspeyres"),
        (
            F.round(F.col("p1q1") / F.col("p0q1"), 6) + F.lit(0.0)
        ).alias("paasche"),
        (
            F.round(
                F.sqrt(
                    (F.col("p1q0") / F.col("p0q0"))
                    * (F.col("p1q1") / F.col("p0q1"))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 4 (continued): exact 1-D distribution
# distances WITHOUT the pair explosion. Both energy distance and
# 1-Wasserstein over two cohorts are, naively, O(n^2) pairwise sums;
# the rank/prefix-sum identities below compute them EXACTLY from
# range-partitioned cumulative sums (operators/indexing.global_cumsum
# / global_index) — one sort-shuffle instead of n^2 pairs, the same
# trick exact_median_q uses. Values are quantized to integer cents so
# every cumulative quantity is an exact BIGINT. Plus tail risk (CVaR),
# the newsvendor quantile, and the cohort-LTV curve.
# ---------------------------------------------------------------------------


# Energy distance between the two user cohorts' purchase-total
# distributions: D^2 = 2 E|X-Y| - E|X-X'| - E|Y-Y'| (V-statistics).
# Each mean absolute difference comes from the sorted-merge identity
# sum_x |x - v| = v*cnt_le(v) - sum_le(v) + (tot - sum_le(v))
#                 - (cnt - cnt_le(v))*v,
# where cnt_le/sum_le are inclusive prefix sums over the MERGED value
# order — four global_cumsum passes (x-count, x-sum, y-count, y-sum),
# zero pairwise joins. The oracle keeps plain ANSI running windows.
@register(
    "energy_distance_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    m AS (
        SELECT user_id, v,
               CASE WHEN grp = 0 THEN 1 ELSE 0 END AS ix,
               CASE WHEN grp = 1 THEN 1 ELSE 0 END AS iy
        FROM u
    ),
    c AS (
        SELECT v, ix, iy,
               SUM(ix) OVER w AS cxc, SUM(ix * v) OVER w AS cxs,
               SUM(iy) OVER w AS cyc, SUM(iy * v) OVER w AS cys,
               SUM(ix) OVER () AS nx, SUM(ix * v) OVER () AS sx,
               SUM(iy) OVER () AS ny, SUM(iy * v) OVER () AS sy
        FROM m
        WINDOW w AS (ORDER BY v, user_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    terms AS (
        SELECT
            SUM(CASE WHEN iy = 1 THEN
                v * cxc - cxs + (sx - cxs) - (nx - cxc) * v
                ELSE 0 END) AS dxy,
            SUM(CASE WHEN ix = 1 THEN
                v * cxc - cxs + (sx - cxs) - (nx - cxc) * v
                ELSE 0 END) AS dxx,
            SUM(CASE WHEN iy = 1 THEN
                v * cyc - cys + (sy - cys) - (ny - cyc) * v
                ELSE 0 END) AS dyy,
            MAX(nx) AS nx, MAX(ny) AS ny
        FROM c
    )
    SELECT CAST(nx AS BIGINT) AS n_x, CAST(ny AS BIGINT) AS n_y,
           CAST(ROUND(CAST(dxy AS DOUBLE) / (nx * ny) / 100, 6)
               AS DOUBLE) + 0.0 AS e_xy,
           CAST(ROUND(CAST(dxx AS DOUBLE) / (nx * nx) / 100, 6)
               AS DOUBLE) + 0.0 AS e_xx,
           CAST(ROUND(CAST(dyy AS DOUBLE) / (ny * ny) / 100, 6)
               AS DOUBLE) + 0.0 AS e_yy,
           CAST(ROUND(sqrt(greatest(0.0,
               2.0 * CAST(dxy AS DOUBLE) / (nx * ny) / 100
               - CAST(dxx AS DOUBLE) / (nx * nx) / 100
               - CAST(dyy AS DOUBLE) / (ny * ny) / 100)), 6)
               AS DOUBLE) + 0.0 AS energy_dist
    FROM terms
    """,
)
def energy_distance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are the two cohorts' spend distributions different IN SHAPE,
    not just in mean? Exact E-statistic from prefix sums — the
    pairwise |x-y| sums never materialize. The identity evaluated at
    every sample point already counts all ORDERED pairs, so each
    V-statistic is its raw sum over n^2 (no extra factor)."""
    from iniz_exporters_spark.operators.indexing import global_prefix

    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        (F.sum(_dec(F.col("value"), 18, 2)) * 100)
        .cast("long")
        .alias("v")
    )
    m = u.select(
        "user_id",
        "v",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("ix"),
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("iy"),
    ).withColumn("ixv", F.col("ix") * F.col("v")).withColumn(
        "iyv", F.col("iy") * F.col("v")
    )
    order = [F.col("v").asc(), F.col("user_id").asc()]
    # all four running quantities share one fused range-partition pass
    c = global_prefix(
        m,
        order,
        {"cxc": "ix", "cxs": "ixv", "cyc": "iy", "cys": "iyv"},
    )
    tot = m.agg(
        F.sum("ix").alias("nx"),
        F.sum("ixv").alias("sx"),
        F.sum("iy").alias("ny"),
        F.sum("iyv").alias("sy"),
    )
    c = c.crossJoin(F.broadcast(tot))

    def absdiff_sum(cnt_le, sum_le, n, s):
        v = F.col("v")
        return (
            v * F.col(cnt_le)
            - F.col(sum_le)
            + (F.col(s) - F.col(sum_le))
            - (F.col(n) - F.col(cnt_le)) * v
        )

    terms = c.agg(
        F.sum(
            F.when(
                F.col("iy") == 1, absdiff_sum("cxc", "cxs", "nx", "sx")
            ).otherwise(0)
        ).alias("dxy"),
        F.sum(
            F.when(
                F.col("ix") == 1, absdiff_sum("cxc", "cxs", "nx", "sx")
            ).otherwise(0)
        ).alias("dxx"),
        F.sum(
            F.when(
                F.col("iy") == 1, absdiff_sum("cyc", "cys", "ny", "sy")
            ).otherwise(0)
        ).alias("dyy"),
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
    )
    exy = F.col("dxy").cast("double") / (F.col("nx") * F.col("ny")) / 100
    exx = F.col("dxx").cast("double") / (F.col("nx") * F.col("nx")) / 100
    eyy = F.col("dyy").cast("double") / (F.col("ny") * F.col("ny")) / 100
    return terms.select(
        F.col("nx").cast("long").alias("n_x"),
        F.col("ny").cast("long").alias("n_y"),
        (F.round(exy, 6) + F.lit(0.0)).alias("e_xy"),
        (F.round(exx, 6) + F.lit(0.0)).alias("e_xx"),
        (F.round(eyy, 6) + F.lit(0.0)).alias("e_yy"),
        (
            F.round(
                F.sqrt(F.greatest(F.lit(0.0), 2.0 * exy - exx - eyy)), 6
            )
            + F.lit(0.0)
        ).alias("energy_dist"),
    )


# 1-Wasserstein (earth mover) distance between the same two cohorts'
# purchase-total distributions: W1 = integral |F_X - F_Y| dt, computed
# exactly over the merged sorted values as
# sum_k |cxc_k/nx - cyc_k/ny| * (v_{k+1} - v_k). The merged rank and
# the two cumulative counts come from global_index/global_cumsum; the
# "next value" gap is a self-join on rank+1 (a shuffle join on the
# rank key — never a corpus-scale LEAD window). Integer-cent values
# make every CDF numerator exact.
@register(
    "wasserstein_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    m AS (
        SELECT user_id, v,
               CASE WHEN grp = 0 THEN 1 ELSE 0 END AS ix,
               CASE WHEN grp = 1 THEN 1 ELSE 0 END AS iy
        FROM u
    ),
    c AS (
        SELECT v,
               ROW_NUMBER() OVER o AS t,
               SUM(ix) OVER (o ROWS UNBOUNDED PRECEDING) AS cxc,
               SUM(iy) OVER (o ROWS UNBOUNDED PRECEDING) AS cyc,
               SUM(ix) OVER () AS nx, SUM(iy) OVER () AS ny
        FROM m
        WINDOW o AS (ORDER BY v, user_id)
    ),
    gaps AS (
        SELECT a.cxc, a.cyc, a.nx, a.ny, b.v - a.v AS gap
        FROM c a JOIN c b ON b.t = a.t + 1
    )
    SELECT CAST(MAX(nx) AS BIGINT) AS n_x,
           CAST(MAX(ny) AS BIGINT) AS n_y,
           CAST(ROUND(SUM(abs(CAST(cxc AS DOUBLE) / nx
               - CAST(cyc AS DOUBLE) / ny) * gap) / 100, 6)
               AS DOUBLE) + 0.0 AS wasserstein_1
    FROM gaps
    """,
)
def wasserstein_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much 'work' separates the two spend distributions, in the
    money unit itself? The optimal-transport companion to
    energy_distance_q and ks_test_q over the same cohorts."""
    from iniz_exporters_spark.operators.indexing import global_prefix

    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        (F.sum(_dec(F.col("value"), 18, 2)) * 100)
        .cast("long")
        .alias("v")
    )
    m = u.select(
        "user_id",
        "v",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("ix"),
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("iy"),
    )
    order = [F.col("v").asc(), F.col("user_id").asc()]
    # rank + both CDF numerators in one fused range-partition pass
    c = global_prefix(
        m, order, {"cxc": "ix", "cyc": "iy"}, idx_col="t"
    )
    tot = m.agg(F.sum("ix").alias("nx"), F.sum("iy").alias("ny"))
    a = c.select("t", "v", "cxc", "cyc")
    b = c.select((F.col("t") - 1).alias("t"), F.col("v").alias("v_next"))
    gaps = a.join(b, "t").crossJoin(F.broadcast(tot))
    w1 = (
        F.sum(
            F.abs(
                F.col("cxc").cast("double") / F.col("nx")
                - F.col("cyc").cast("double") / F.col("ny")
            )
            * (F.col("v_next") - F.col("v"))
        )
        / 100
    )
    return gaps.agg(
        F.max("nx").cast("long").alias("n_x"),
        F.max("ny").cast("long").alias("n_y"),
        (F.round(w1, 6) + F.lit(0.0)).alias("wasserstein_1"),
    )


# Value-at-Risk and expected shortfall (CVaR) of the demeaned daily
# revenue P&L (the drawdown_q series): losses are -pnl; VaR_95 is the
# ceil(0.95 n)-th smallest... equivalently the k-th largest loss with
# k = ceil(0.05 n) under the empirical upper-tail convention, and
# CVaR_95 averages the losses at or beyond VaR. All ranking happens on
# the calendar-bounded daily frame with exact DECIMAL P&L.
@register(
    "cvar_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    pnl AS (
        SELECT day,
               (SELECT CAST(CAST(SUM(rev) AS DOUBLE) / COUNT(*)
                    AS DECIMAL(18,6)) FROM daily) - rev AS loss
        FROM daily
    ),
    r AS (
        SELECT loss,
               ROW_NUMBER() OVER (ORDER BY loss DESC, day) AS k,
               COUNT(*) OVER () AS n
        FROM pnl
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(ROUND(CAST(MAX(CASE WHEN k = CAST(ceil(0.05 * n)
               AS BIGINT) THEN loss END) AS DOUBLE), 2) AS DOUBLE)
               + 0.0 AS var_95,
           CAST(ROUND(CAST(SUM(CASE WHEN k <= CAST(ceil(0.05 * n)
               AS BIGINT) THEN loss END) AS DOUBLE)
               / MAX(CASE WHEN n > 0
                     THEN CAST(ceil(0.05 * n) AS BIGINT) END), 2)
               AS DOUBLE) + 0.0 AS cvar_95
    FROM r
    """,
)
def cvar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail risk of the daily P&L: the 95% loss threshold and the mean
    loss beyond it — the coherent-risk companion to drawdown_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    mu = daily.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("mu")
    )
    pnl = daily.crossJoin(F.broadcast(mu)).select(
        "day", (F.col("mu") - F.col("rev")).alias("loss")
    )
    wk = Window.orderBy(F.col("loss").desc(), F.col("day"))
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = pnl.select(
        "loss",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    kcut = F.ceil(0.05 * F.col("n")).cast("long")
    return r.agg(
        F.max("n").cast("long").alias("n_days"),
        (
            F.round(
                F.max(F.when(F.col("k") == kcut, F.col("loss"))).cast(
                    "double"
                ),
                2,
            )
            + F.lit(0.0)
        ).alias("var_95"),
        (
            F.round(
                F.sum(
                    F.when(F.col("k") <= kcut, F.col("loss"))
                ).cast("double")
                / F.max(F.when(F.col("n") > 0, kcut)),
                2,
            )
            + F.lit(0.0)
        ).alias("cvar_95"),
    )


# Newsvendor stocking quantile for daily purchase-event demand:
# critical ratio CR = cu/(cu+co) = 0.8 (understock costs 4x overstock
# with cu=4, co=1); q* = the smallest demand level whose empirical CDF
# reaches CR, and the expected daily overage/underage at q* replay the
# cost. The demand distribution is the calendar-bounded daily frame;
# ranks and tail sums are exact integers.
@register(
    "newsvendor_q",
    """
    WITH demand AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS d
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    r AS (
        SELECT d,
               ROW_NUMBER() OVER (ORDER BY d, day) AS k,
               COUNT(*) OVER () AS n
        FROM demand
    ),
    qstar AS (
        SELECT MIN(d) AS q FROM r
        WHERE k >= CAST(ceil(0.8 * n) AS BIGINT)
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST((SELECT q FROM qstar) AS BIGINT) AS q_star,
           CAST(ROUND(CAST(SUM(greatest((SELECT q FROM qstar) - d, 0))
               AS DOUBLE) / MAX(n), 4) AS DOUBLE) AS expected_overage,
           CAST(ROUND(CAST(SUM(greatest(d - (SELECT q FROM qstar), 0))
               AS DOUBLE) / MAX(n), 4) AS DOUBLE) AS expected_underage
    FROM r
    """,
)
def newsvendor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much to stock per day when shortage costs 4x leftover —
    the empirical-quantile answer plus the resulting cost split."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    demand = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("d")
    )
    wk = Window.orderBy("d", "day")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = demand.select(
        "d",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    qstar = r.filter(
        F.col("k") >= F.ceil(0.8 * F.col("n")).cast("long")
    ).agg(F.min("d").alias("q"))
    return (
        r.crossJoin(F.broadcast(qstar))
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.max("q").cast("long").alias("q_star"),
            F.round(
                F.sum(
                    F.greatest(F.col("q") - F.col("d"), F.lit(0))
                ).cast("double")
                / F.max("n"),
                4,
            ).alias("expected_overage"),
            F.round(
                F.sum(
                    F.greatest(F.col("d") - F.col("q"), F.lit(0))
                ).cast("double")
                / F.max("n"),
                4,
            ).alias("expected_underage"),
        )
    )


# Cohort LTV curve: users grouped by first-activity week, cumulative
# purchase revenue per user tracked by weeks-since-first-activity.
# First-touch reduces per user (one corpus aggregation); the curve
# table is cohorts x ages (calendar-bounded); the running sum windows
# partition by cohort over <= 5 rows each.
@register(
    "ltv_cohort_q",
    """
    WITH first_seen AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '2024-01-01',
                    CAST(MIN(ts) AS DATE)) // 7 AS BIGINT) AS cohort
        FROM events GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort, COUNT(*) AS n_users
        FROM first_seen GROUP BY cohort
    ),
    rev AS (
        SELECT f.cohort,
               CAST(date_diff('day', DATE '2024-01-01',
                    CAST(e.ts AS DATE)) // 7 AS BIGINT) - f.cohort
                   AS age_weeks,
               SUM(CAST(e.value AS DECIMAL(18,6))) AS r
        FROM events e JOIN first_seen f ON f.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY f.cohort,
                 CAST(date_diff('day', DATE '2024-01-01',
                      CAST(e.ts AS DATE)) // 7 AS BIGINT) - f.cohort
    )
    SELECT rev.cohort, age_weeks,
           CAST(s.n_users AS BIGINT) AS cohort_size,
           CAST(ROUND(CAST(SUM(r) OVER (PARTITION BY rev.cohort
                    ORDER BY age_weeks) AS DOUBLE) / s.n_users, 4)
               AS DOUBLE) AS cum_ltv_per_user
    FROM rev JOIN sizes s ON s.cohort = rev.cohort
    """,
)
def ltv_cohort_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth-analytics staple: does a later cohort monetize
    faster? Rows are (cohort week, age weeks) — calendar metadata."""
    e = Catalog(spark, sf_dir).events
    first_seen = e.groupBy("user_id").agg(
        F.floor(
            F.datediff(F.to_date(F.min("ts")), F.lit("2024-01-01")) / 7
        )
        .cast("long")
        .alias("cohort")
    )
    sizes = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        # first_seen is a PER-USER table — never broadcast it; the
        # shuffle join on user_id is the plan that survives 100 TB
        .join(first_seen, "user_id")
        .groupBy(
            "cohort",
            (
                F.floor(
                    F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7
                ).cast("long")
                - F.col("cohort")
            ).alias("age_weeks"),
        )
        .agg(F.sum(_dec(F.col("value"), 18, 6)).alias("r"))
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age_weeks",
            F.col("n_users").cast("long").alias("cohort_size"),
            F.round(
                F.sum("r").over(wcum).cast("double") / F.col("n_users"),
                4,
            ).alias("cum_ltv_per_user"),
        )
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5: modern dependence measures (Chatterjee's
# xi, partial correlation), U-shaped multi-touch attribution, the
# Hodges-Lehmann robust location estimate, and the log-rank survival
# comparison. xi is the scale showcase: both of its rankings come from
# global_index, and the adjacent-rank differences come from a rank+1
# self-join — no corpus-scale window anywhere.
# ---------------------------------------------------------------------------


# Chatterjee's xi rank correlation (2020) measuring how well per-user
# purchase spend is a FUNCTION of click spend (asymmetric, detects any
# functional dependence, not just monotone): sort by x, take y-ranks
# r_i along that order, xi = 1 - 3 sum|r_{i+1} - r_i| / (n^2 - 1).
# Both the y-rank and the x-position are range-partitioned global
# ranks; consecutive x-positions meet via a shuffle join on position
# +1. Continuous DECIMAL totals make ties measure-zero; the (value,
# user_id) tiebreak keeps both engines identical if one ever occurs.
@register(
    "xi_correlation_q",
    """
    WITH u AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS x,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS y
        FROM events GROUP BY user_id
        HAVING x IS NOT NULL AND y IS NOT NULL
    ),
    ranked AS (
        SELECT user_id, x,
               ROW_NUMBER() OVER (ORDER BY y, user_id) AS r
        FROM u
    ),
    ordered AS (
        SELECT r, ROW_NUMBER() OVER (ORDER BY x, user_id) AS s
        FROM ranked
    ),
    steps AS (
        SELECT abs(b.r - a.r) AS dr
        FROM ordered a JOIN ordered b ON b.s = a.s + 1
    )
    SELECT CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_users,
           CAST(ROUND(1 - 3.0 * SUM(dr)
               / (CAST((SELECT COUNT(*) FROM u) AS DOUBLE)
                  * (SELECT COUNT(*) FROM u) - 1), 6) AS DOUBLE) + 0.0
               AS xi
    FROM steps
    """,
)
def xi_correlation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does click spend DETERMINE purchase spend? xi ~ 0 =
    independent, 1 = y is a measurable function of x — catches
    relationships spearman_corr_q (monotone-only) misses."""
    from iniz_exporters_spark.operators.indexing import global_index

    e = Catalog(spark, sf_dir).events
    u = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "click",
                    _dec(F.col("value"), 18, 6),
                )
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    _dec(F.col("value"), 18, 6),
                )
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    ranked = global_index(
        u, [F.col("y").asc(), F.col("user_id").asc()], "r"
    )
    ordered = global_index(
        ranked, [F.col("x").asc(), F.col("user_id").asc()], "s"
    )
    a = ordered.select("s", "r")
    b = ordered.select((F.col("s") - 1).alias("s"), F.col("r").alias("r2"))
    steps = a.join(b, "s").select(
        F.abs(F.col("r2") - F.col("r")).alias("dr")
    )
    n = u.agg(F.count(F.lit(1)).alias("n"))
    return steps.crossJoin(F.broadcast(n)).agg(
        F.max("n").cast("long").alias("n_users"),
        (
            F.round(
                1
                - 3.0
                * F.sum("dr")
                / (F.max("n").cast("double") * F.max("n") - 1),
                6,
            )
            + F.lit(0.0)
        ).alias("xi"),
    )


# Partial correlation of per-user click vs purchase spend CONTROLLING
# for view spend: r_xy.z = (r_xy - r_xz r_yz) /
# sqrt((1-r_xz^2)(1-r_yz^2)). Zero-filled user totals; all nine
# moments come from one grouped pass with exact DECIMAL sums
# (products at decimal(16,6) — the exact-width convention).
@register(
    "partial_corr_q",
    """
    WITH u AS (
        SELECT user_id,
               COALESCE(SUM(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS x,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS y,
               COALESCE(SUM(CASE WHEN event_type = 'view'
                   THEN CAST(value AS DECIMAL(18,6)) END),
                   CAST(0 AS DECIMAL(18,6))) AS z
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(z) AS DOUBLE) AS sz,
               CAST(SUM(CAST(x AS DECIMAL(19,6))
                        * CAST(x AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(19,6))
                        * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(z AS DECIMAL(19,6))
                        * CAST(z AS DECIMAL(19,6))) AS DOUBLE) AS szz,
               CAST(SUM(CAST(x AS DECIMAL(19,6))
                        * CAST(y AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(19,6))
                        * CAST(z AS DECIMAL(19,6))) AS DOUBLE) AS sxz,
               CAST(SUM(CAST(y AS DECIMAL(19,6))
                        * CAST(z AS DECIMAL(19,6))) AS DOUBLE) AS syz
        FROM u
    ),
    r AS (
        SELECT n,
               (sxy - sx * sy / n)
                   / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
                   AS rxy,
               (sxz - sx * sz / n)
                   / sqrt((sxx - sx * sx / n) * (szz - sz * sz / n))
                   AS rxz,
               (syz - sy * sz / n)
                   / sqrt((syy - sy * sy / n) * (szz - sz * sz / n))
                   AS ryz
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(ROUND(rxy, 6) AS DOUBLE) + 0.0 AS r_xy,
           CAST(ROUND(rxz, 6) AS DOUBLE) + 0.0 AS r_xz,
           CAST(ROUND(ryz, 6) AS DOUBLE) + 0.0 AS r_yz,
           CAST(ROUND((rxy - rxz * ryz)
               / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
               AS DOUBLE) + 0.0 AS partial_r
    FROM r
    """,
)
def partial_corr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the click-purchase association real or just shared exposure
    (views)? First-order partial correlation from one moment pass."""
    e = Catalog(spark, sf_dir).events

    def tsum(et):
        return F.coalesce(
            F.sum(
                F.when(F.col("event_type") == et, _dec(F.col("value"), 18, 6))
            ),
            F.lit(0).cast("decimal(18,6)"),
        )

    u = e.groupBy("user_id").agg(
        tsum("click").alias("x"),
        tsum("purchase").alias("y"),
        tsum("view").alias("z"),
    )

    def p16(a, b):
        return F.sum(
            F.col(a).cast("decimal(16,6)") * F.col(b).cast("decimal(16,6)")
        ).cast("double")

    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("z").cast("double").alias("sz"),
        p16("x", "x").alias("sxx"),
        p16("y", "y").alias("syy"),
        p16("z", "z").alias("szz"),
        p16("x", "y").alias("sxy"),
        p16("x", "z").alias("sxz"),
        p16("y", "z").alias("syz"),
    )
    n = F.col("n")

    def corr(sab, sa, sb, saa, sbb):
        return (F.col(sab) - F.col(sa) * F.col(sb) / n) / F.sqrt(
            (F.col(saa) - F.col(sa) * F.col(sa) / n)
            * (F.col(sbb) - F.col(sb) * F.col(sb) / n)
        )

    r = m.select(
        "n",
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        corr("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    part = (F.col("rxy") - F.col("rxz") * F.col("ryz")) / F.sqrt(
        (1 - F.col("rxz") * F.col("rxz"))
        * (1 - F.col("ryz") * F.col("ryz"))
    )
    return r.select(
        n.cast("long").alias("n_users"),
        (F.round(F.col("rxy"), 6) + F.lit(0.0)).alias("r_xy"),
        (F.round(F.col("rxz"), 6) + F.lit(0.0)).alias("r_xz"),
        (F.round(F.col("ryz"), 6) + F.lit(0.0)).alias("r_yz"),
        (F.round(part, 6) + F.lit(0.0)).alias("partial_r"),
    )


# U-shaped (position-based) multi-touch attribution: each purchase
# splits 1.0 of credit over the user's non-purchase touches in the 3
# days before it — 40% first touch, 40% last touch, 20% spread over
# the middle (k=1 -> 100%, k=2 -> 50/50). The purchase-touch pair
# table is bounded by the 3-day window predicate (pushed into the
# join); ranks partition by (user, purchase). Credits are exact
# decimals built from integer rank arithmetic; one final group by
# channel.
@register(
    "multi_touch_attribution_q",
    """
    WITH p AS (
        SELECT user_id, event_id AS pid, ts AS pts FROM events
        WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT p.pid, e.event_type AS channel, e.ts, e.event_id
        FROM events e JOIN p ON p.user_id = e.user_id
        WHERE e.event_type <> 'purchase'
          AND e.ts < p.pts
          AND e.ts >= p.pts - INTERVAL 3 DAY
    ),
    ranked AS (
        SELECT pid, channel,
               ROW_NUMBER() OVER (PARTITION BY pid
                   ORDER BY ts, event_id) AS k,
               COUNT(*) OVER (PARTITION BY pid) AS m
        FROM touch
    ),
    credit AS (
        SELECT channel,
               CASE WHEN m = 1 THEN CAST(1.0 AS DECIMAL(18,12))
                    WHEN m = 2 THEN CAST(0.5 AS DECIMAL(18,12))
                    WHEN k = 1 OR k = m THEN CAST(0.4 AS DECIMAL(18,12))
                    ELSE CAST(CAST(0.2 AS DECIMAL(18,12)) / (m - 2)
                         AS DECIMAL(18,12))
               END AS c
        FROM ranked
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(ROUND(CAST(SUM(c) AS DOUBLE), 4) AS DOUBLE)
               AS total_credit
    FROM credit GROUP BY channel
    """,
)
def multi_touch_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which channels EARN conversions once credit is split across the
    journey (vs attribution_q's winner-takes-all last touch)? Credits
    are decimal so channel totals are order-independent; the 3-day
    lookback bounds the pair fan-out at any corpus size."""
    e = Catalog(spark, sf_dir).events
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    t = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_type").alias("channel"),
        "ts",
        "event_id",
    )
    touch = t.join(p, "user_id").filter(
        (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 3 DAY"))
    )
    wk = Window.partitionBy("pid").orderBy("ts", "event_id")
    wm = Window.partitionBy("pid")
    ranked = touch.select(
        "pid",
        "channel",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wm).alias("m"),
    )
    c = (
        F.when(F.col("m") == 1, F.lit(1.0).cast("decimal(18,12)"))
        .when(F.col("m") == 2, F.lit(0.5).cast("decimal(18,12)"))
        .when(
            (F.col("k") == 1) | (F.col("k") == F.col("m")),
            F.lit(0.4).cast("decimal(18,12)"),
        )
        .otherwise(
            (F.lit(0.2).cast("decimal(18,12)") / (F.col("m") - 2)).cast(
                "decimal(18,12)"
            )
        )
    )
    return (
        ranked.select("channel", c.alias("c"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.round(F.sum("c").cast("double"), 4).alias("total_credit"),
        )
    )


# Hodges-Lehmann location estimate of the demeaned daily P&L: the
# median of all Walsh averages (x_i + x_j)/2, i <= j — the robust,
# rank-based "typical level" with 29% breakdown. The pair table is
# n(n+1)/2 rows of the CALENDAR-bounded daily frame; averages are
# exact DECIMAL(19,7)s so the median element is deterministic.
@register(
    "hodges_lehmann_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    pnl AS (
        SELECT day,
               rev - (SELECT CAST(CAST(SUM(rev) AS DOUBLE) / COUNT(*)
                          AS DECIMAL(18,6)) FROM daily) AS v
        FROM daily
    ),
    walsh AS (
        SELECT CAST((a.v + b.v) AS DECIMAL(19,7)) / 2 AS w
        FROM pnl a JOIN pnl b ON a.day <= b.day
    ),
    r AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS k,
               COUNT(*) OVER () AS n
        FROM walsh
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_walsh,
           CAST(ROUND(CAST(AVG(CASE WHEN k = (n + 1) // 2
                    OR k = n // 2 + 1 THEN w END) AS DOUBLE), 4)
               AS DOUBLE) + 0.0 AS hodges_lehmann
    FROM r
    """,
)
def hodges_lehmann_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pseudo-median of daily P&L — robust companion to cvar_q's
    tail view. Walsh-average ties resolve identically in both engines
    because the averages are exact decimals."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    mu = daily.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("mu")
    )
    pnl = daily.crossJoin(F.broadcast(mu)).select(
        "day", (F.col("rev") - F.col("mu")).alias("v")
    )
    a = pnl.select(F.col("day").alias("da"), F.col("v").alias("va"))
    b = pnl.select(F.col("day").alias("db"), F.col("v").alias("vb"))
    walsh = a.join(b, F.col("da") <= F.col("db")).select(
        (
            (F.col("va") + F.col("vb")).cast("decimal(19,7)") / 2
        ).alias("w")
    )
    wk = Window.orderBy("w")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = walsh.select(
        "w",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    mid = F.when(
        (F.col("k") == F.expr("(n + 1) div 2"))
        | (F.col("k") == F.expr("n div 2 + 1")),
        F.col("w"),
    )
    return r.agg(
        F.max("n").cast("long").alias("n_walsh"),
        (F.round(F.avg(mid).cast("double"), 4) + F.lit(0.0)).alias(
            "hodges_lehmann"
        ),
    )


# Log-rank test comparing signup->purchase conversion survival between
# the two user cohorts (user_id parity): at each distinct event time,
# observed cohort-0 events vs the hypergeometric expectation
# d * n0/n, variance d (n0/n)(1-n0/n)(n-d)/(n-1); z = (O-E)/sqrt(V).
# Builds on km_survival_q's duration frame; the per-time table is
# calendar-bounded, at-risk counts are running-sum integers, and the
# only float stage is the final z.
@register(
    "log_rank_test_q",
    """
    WITH su AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    la AS (SELECT user_id, MAX(ts) AS tl FROM events GROUP BY user_id),
    pu AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= su.t0
        GROUP BY e.user_id
    ),
    b AS (
        SELECT su.user_id, su.user_id % 2 AS grp,
               CASE WHEN tp IS NOT NULL
                    THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                    ELSE date_diff('day', CAST(t0 AS DATE), CAST(tl AS DATE))
               END AS t,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM su JOIN la USING (user_id)
        LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    g AS (
        SELECT t,
               SUM(obs) AS d,
               SUM(CASE WHEN grp = 0 THEN obs ELSE 0 END) AS d0,
               COUNT(*) AS m,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS m0
        FROM b GROUP BY t
    ),
    tot AS (
        SELECT COUNT(*) AS nn,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS nn0
        FROM b
    ),
    k AS (
        SELECT t, d, d0,
               nn - (SUM(m) OVER (ORDER BY t) - m) AS n_risk,
               nn0 - (SUM(m0) OVER (ORDER BY t) - m0) AS n0_risk
        FROM g CROSS JOIN tot
    ),
    terms AS (
        SELECT CAST(SUM(d0) AS BIGINT) AS o0,
               CAST(SUM(CAST(d * (CAST(n0_risk AS DOUBLE) / n_risk)
                    AS DECIMAL(28,12))) AS DOUBLE) AS e0,
               CAST(SUM(CASE WHEN n_risk > 1 THEN CAST(
                    d * (CAST(n0_risk AS DOUBLE) / n_risk)
                      * (1 - CAST(n0_risk AS DOUBLE) / n_risk)
                      * (n_risk - d) / (n_risk - 1)
                    AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12))
                    END) AS DOUBLE) AS v
        FROM k WHERE d > 0
    )
    SELECT o0 AS observed_g0,
           CAST(ROUND(e0, 4) AS DOUBLE) + 0.0 AS expected_g0,
           CAST(ROUND((o0 - e0) / sqrt(v), 6) AS DOUBLE) + 0.0
               AS logrank_z,
           CAST(ROUND((o0 - e0) * (o0 - e0) / v, 6) AS DOUBLE) + 0.0
               AS logrank_chi2
    FROM terms
    """,
)
def log_rank_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the two cohorts convert at different speeds, accounting for
    censoring? The hypothesis test behind km_survival_q's curves."""
    ev = Catalog(spark, sf_dir).events
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    la = ev.groupBy("user_id").agg(F.max("ts").alias("tl"))
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    b = (
        su.join(la, "user_id")
        .join(pu, "user_id", "left")
        .select(
            (F.col("user_id") % 2).alias("grp"),
            F.when(
                F.col("tp").isNotNull(),
                F.datediff(F.to_date("tp"), F.to_date("t0")),
            )
            .otherwise(F.datediff(F.to_date("tl"), F.to_date("t0")))
            .alias("t"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("obs"),
        )
    )
    g = b.groupBy("t").agg(
        F.sum("obs").alias("d"),
        F.sum(F.when(F.col("grp") == 0, F.col("obs")).otherwise(0)).alias(
            "d0"
        ),
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("m0"),
    )
    tot = b.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("nn0"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "d0",
        (
            F.col("nn") - (F.sum("m").over(wcum) - F.col("m"))
        ).alias("n_risk"),
        (
            F.col("nn0") - (F.sum("m0").over(wcum) - F.col("m0"))
        ).alias("n0_risk"),
    )
    frac = F.col("n0_risk").cast("double") / F.col("n_risk")
    terms = k.filter(F.col("d") > 0).agg(
        F.sum("d0").cast("long").alias("o0"),
        _dsum(F.col("d") * frac).cast("double").alias("e0"),
        F.sum(
            F.when(
                F.col("n_risk") > 1,
                (
                    F.col("d")
                    * frac
                    * (1 - frac)
                    * (F.col("n_risk") - F.col("d"))
                    / (F.col("n_risk") - 1)
                ).cast("decimal(28,12)"),
            ).otherwise(F.lit(0).cast("decimal(28,12)"))
        )
        .cast("double")
        .alias("v"),
    )
    return terms.select(
        F.col("o0").alias("observed_g0"),
        (F.round(F.col("e0"), 4) + F.lit(0.0)).alias("expected_g0"),
        (
            F.round(
                (F.col("o0") - F.col("e0")) / F.sqrt(F.col("v")), 6
            )
            + F.lit(0.0)
        ).alias("logrank_z"),
        (
            F.round(
                (F.col("o0") - F.col("e0"))
                * (F.col("o0") - F.col("e0"))
                / F.col("v"),
                6,
            )
            + F.lit(0.0)
        ).alias("logrank_chi2"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5 (continued): Greenwood confidence bands for
# the KM curve, seasonal-ESD anomaly days, leave-one-out kNN label
# accuracy, split-conformal prediction intervals, and a breadth query
# exercising Spark's higher-order array functions against DuckDB's
# list_* twins.
# ---------------------------------------------------------------------------


# Kaplan-Meier curve with Greenwood 95% confidence band:
# Var[ln S(t)] ~= sum_{s<=t} d/(n(n-d)), CI = S(t)^exp(+-1.96 se /
# ln S(t))... the simpler plain Greenwood band S +- 1.96 S sqrt(V) is
# used here (clamped to [0,1]) — the textbook form. Greenwood terms
# are DECIMAL-quantized before their running sum; the frame is the
# same duration-distinct table as km_survival_q.
@register(
    "km_greenwood_q",
    """
    WITH su AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    la AS (SELECT user_id, MAX(ts) AS tl FROM events GROUP BY user_id),
    pu AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= su.t0
        GROUP BY e.user_id
    ),
    b AS (
        SELECT su.user_id,
               CASE WHEN tp IS NOT NULL
                    THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                    ELSE date_diff('day', CAST(t0 AS DATE), CAST(tl AS DATE))
               END AS t,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM su JOIN la USING (user_id)
        LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    g AS (SELECT t, SUM(obs) AS d, COUNT(*) AS m FROM b GROUP BY t),
    tot AS (SELECT COUNT(*) AS nn FROM b),
    k AS (
        SELECT t, d, nn - (SUM(m) OVER (ORDER BY t) - m) AS n_risk
        FROM g CROSS JOIN tot
    ),
    c AS (
        SELECT t, d, n_risk,
               SUM(CASE WHEN n_risk > d
                        THEN LN(CAST(n_risk - d AS DOUBLE)
                                / CAST(n_risk AS DOUBLE))
                   END) OVER (ORDER BY t) AS sl,
               SUM(CASE WHEN n_risk > d THEN CAST(
                        CAST(d AS DOUBLE) / (n_risk
                            * CAST(n_risk - d AS BIGINT))
                        AS DECIMAL(28,12)) END)
                   OVER (ORDER BY t) AS gv
        FROM k
    )
    SELECT CAST(t AS BIGINT) AS duration_days,
           CAST(ROUND(EXP(sl), 6) AS DOUBLE) AS survival,
           greatest(0.0, CAST(ROUND(EXP(sl) - 1.96 * EXP(sl)
               * sqrt(CAST(gv AS DOUBLE)), 6) AS DOUBLE)) AS ci_lo,
           least(1.0, CAST(ROUND(EXP(sl) + 1.96 * EXP(sl)
               * sqrt(CAST(gv AS DOUBLE)), 6) AS DOUBLE)) AS ci_hi
    FROM c WHERE d > 0 AND n_risk > d
    """,
)
def km_greenwood_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """km_survival_q's curve with its sampling uncertainty — the band
    a dashboard needs before calling two cohort curves 'different'
    (log_rank_test_q answers that formally)."""
    ev = Catalog(spark, sf_dir).events
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    la = ev.groupBy("user_id").agg(F.max("ts").alias("tl"))
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    b = (
        su.join(la, "user_id")
        .join(pu, "user_id", "left")
        .select(
            F.when(
                F.col("tp").isNotNull(),
                F.datediff(F.to_date("tp"), F.to_date("t0")),
            )
            .otherwise(F.datediff(F.to_date("tl"), F.to_date("t0")))
            .alias("t"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("obs"),
        )
    )
    g = b.groupBy("t").agg(
        F.sum("obs").alias("d"), F.count(F.lit(1)).alias("m")
    )
    tot = b.agg(F.count(F.lit(1)).alias("nn"))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (F.col("nn") - (F.sum("m").over(wcum) - F.col("m"))).alias(
            "n_risk"
        ),
    )
    surv_term = F.when(
        F.col("n_risk") > F.col("d"),
        F.log(
            (F.col("n_risk") - F.col("d")).cast("double")
            / F.col("n_risk").cast("double")
        ),
    )
    green_term = F.when(
        F.col("n_risk") > F.col("d"),
        (
            F.col("d").cast("double")
            / (
                F.col("n_risk")
                * (F.col("n_risk") - F.col("d")).cast("long")
            )
        ).cast("decimal(28,12)"),
    )
    c = k.select(
        "t",
        "d",
        "n_risk",
        F.sum(surv_term).over(wcum).alias("sl"),
        F.sum(green_term).over(wcum).alias("gv"),
    )
    s = F.exp(F.col("sl"))
    half = 1.96 * s * F.sqrt(F.col("gv").cast("double"))
    return c.filter(
        (F.col("d") > 0) & (F.col("n_risk") > F.col("d"))
    ).select(
        F.col("t").cast("long").alias("duration_days"),
        F.round(s, 6).alias("survival"),
        F.greatest(F.lit(0.0), F.round(s - half, 6)).alias("ci_lo"),
        F.least(F.lit(1.0), F.round(s + half, 6)).alias("ci_hi"),
    )


# Seasonal-ESD-lite anomaly days: remove the stl_decompose_q trend and
# weekly seasonal from the daily view-value series, then flag days
# whose |residual| exceeds 3 x MAD (scaled by 1.4826). The residual
# frame is calendar-bounded; MAD uses an exact rank over it. Reports
# only flagged days (metadata-scale output).
@register(
    "seasonal_esd_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                   AS dow,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'view'
        GROUP BY CAST(ts AS DATE),
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
    ),
    trended AS (
        SELECT day, dow, m,
               CAST(CAST(SUM(m) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DOUBLE)
                    / COUNT(*) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DECIMAL(18,6)) AS trend
        FROM daily
    ),
    seasoned AS (
        SELECT day, m, trend,
               CAST(CAST(SUM(m - trend) OVER (PARTITION BY dow)
                    AS DOUBLE) / COUNT(*) OVER (PARTITION BY dow)
                    AS DECIMAL(18,6)) AS seasonal
        FROM trended
    ),
    resid AS (
        SELECT day, CAST(m - trend - seasonal AS DECIMAL(18,6)) AS r
        FROM seasoned
    ),
    med AS (
        SELECT r AS med_r FROM (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, day) AS k,
                   COUNT(*) OVER () AS n
            FROM resid
        ) WHERE k = (n + 1) // 2
    ),
    adev AS (
        SELECT day, r,
               abs(r - (SELECT med_r FROM med)) AS ad
        FROM resid
    ),
    mad AS (
        SELECT ad AS mad_r FROM (
            SELECT ad, ROW_NUMBER() OVER (ORDER BY ad, day) AS k,
                   COUNT(*) OVER () AS n
            FROM adev
        ) WHERE k = (n + 1) // 2
    )
    SELECT day,
           CAST(ROUND(CAST(r AS DOUBLE), 4) AS DOUBLE) + 0.0
               AS residual,
           CAST(ROUND(1.4826 * CAST((SELECT mad_r FROM mad) AS DOUBLE),
               4) AS DOUBLE) + 0.0 AS sigma_robust,
           CAST(ROUND(CAST(r AS DOUBLE)
               / (1.4826 * CAST((SELECT mad_r FROM mad) AS DOUBLE)), 4)
               AS DOUBLE) + 0.0 AS esd_score
    FROM adev
    WHERE abs(CAST(r AS DOUBLE))
        > 3 * 1.4826 * CAST((SELECT mad_r FROM mad) AS DOUBLE)
    """,
)
def seasonal_esd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which days are anomalous AFTER the weekly rhythm is removed?
    Twitter-style seasonal-ESD with a single robust-sigma pass; raw
    z-scores would flag every weekend (mad_outliers_q's failure mode
    on seasonal series)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "view"
    )
    daily = e.groupBy(
        F.to_date("ts").alias("day"),
        (F.datediff(F.to_date("ts"), F.lit("2024-01-01")) % 7).alias(
            "dow"
        ),
    ).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "trend",
        (
            F.sum("m").over(w7).cast("double")
            / F.count(F.lit(1)).over(w7)
        ).cast("decimal(18,6)"),
    )
    wdow = Window.partitionBy("dow")
    resid = trended.withColumn(
        "seasonal",
        (
            F.sum(F.col("m") - F.col("trend")).over(wdow).cast("double")
            / F.count(F.lit(1)).over(wdow)
        ).cast("decimal(18,6)"),
    ).select(
        "day",
        (F.col("m") - F.col("trend") - F.col("seasonal"))
        .cast("decimal(18,6)")
        .alias("r"),
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    def lower_median(df, col, out):
        wk = Window.orderBy(col, "day")
        return (
            df.select(
                F.col(col),
                F.row_number().over(wk).alias("k"),
                F.count(F.lit(1)).over(wt).alias("n"),
            )
            .filter(F.col("k") == F.expr("(n + 1) div 2"))
            .select(F.col(col).alias(out))
        )

    med = lower_median(resid, "r", "med_r")
    adev = resid.crossJoin(F.broadcast(med)).select(
        "day", "r", F.abs(F.col("r") - F.col("med_r")).alias("ad")
    )
    mad = lower_median(adev, "ad", "mad_r")
    sig = 1.4826 * F.col("mad_r").cast("double")
    return (
        adev.crossJoin(F.broadcast(mad))
        .filter(F.abs(F.col("r").cast("double")) > 3 * sig)
        .select(
            "day",
            (F.round(F.col("r").cast("double"), 4) + F.lit(0.0)).alias(
                "residual"
            ),
            (F.round(sig, 4) + F.lit(0.0)).alias("sigma_robust"),
            (
                F.round(F.col("r").cast("double") / sig, 4) + F.lit(0.0)
            ).alias("esd_score"),
        )
    )


# Leave-one-out 5-NN label accuracy over the embedding corpus: predict
# each vector's label by majority vote of its five nearest neighbors
# (ties broken toward the SMALLEST label id — spelled identically in
# both engines), report per-label and overall accuracy. Same bounded
# pair stage as hubness_q (explicit pre-explosion repartition); at
# corpus scale the identical vote plan runs over the bucketed ANN's
# candidate pairs instead of the full cross join.
@register(
    "knn_loo_accuracy_q",
    """
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS qid, q.label AS true_label,
               c.label AS cand_label,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND(list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - q.v[i]) * (c.v[i] - q.v[i])),
                       (x, y) -> x + y), 6), c.vec_id) AS rn
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
    ),
    votes AS (
        SELECT qid, true_label, cand_label, COUNT(*) AS nv
        FROM scored WHERE rn <= 5
        GROUP BY qid, true_label, cand_label
    ),
    pred AS (
        SELECT qid, true_label, cand_label AS pred_label,
               ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY nv DESC, cand_label) AS pr
        FROM votes
    )
    SELECT true_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN pred_label = true_label
                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(ROUND(CAST(SUM(CASE WHEN pred_label = true_label
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS DOUBLE) AS accuracy
    FROM pred WHERE pr = 1
    GROUP BY true_label
    """,
)
def knn_loo_accuracy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the embedding space label-coherent? LOO 5-NN accuracy per
    class — the intrinsic-quality read that pairs with hubness_q
    (hubs are exactly the points that poison these votes)."""
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )
    e = e.repartition(
        spark.sparkContext.defaultParallelism, F.col("vec_id")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "true_label",
            F.col("label").alias("cand_label"),
            F.col("vec_id").alias("cid"),
            d2.alias("d2"),
        )
    )
    wnn = Window.partitionBy("qid").orderBy("d2", "cid")
    votes = (
        scored.withColumn("rn", F.row_number().over(wnn))
        .filter(F.col("rn") <= 5)
        .groupBy("qid", "true_label", "cand_label")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("nv").desc(), F.col("cand_label")
    )
    pred = votes.withColumn("pr", F.row_number().over(wv)).filter(
        F.col("pr") == 1
    )
    hit = F.when(F.col("cand_label") == F.col("true_label"), 1).otherwise(
        0
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(hit).cast("long").alias("n_correct"),
        F.round(
            F.sum(hit).cast("double") / F.count(F.lit(1)), 6
        ).alias("accuracy"),
    )


# Split-conformal prediction interval for per-user purchase totals:
# proper training/calibration/test split by content-keyed hash of
# user_id (40/30/30); the point model is the TRAIN mean, the
# nonconformity score is |y - mean|, q_hat is the ceil((n_cal+1)
# (1-alpha))-th smallest calibration score (alpha = 0.1), and the
# guarantee is checked as empirical coverage on TEST. Distribution-
# free — the marginal coverage bound holds whatever the spend
# distribution is. All ranks run on the CALIBRATION subset.
@register(
    "conformal_interval_q",
    f"""
    WITH u AS (
        SELECT user_id,
               {_SQL_POLY.format(s="'conf:' || user_id::VARCHAR")} % 10
                   AS fold,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    train AS (
        SELECT CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE)
               / COUNT(*) AS mu
        FROM u WHERE fold < 4
    ),
    cal AS (
        SELECT abs(y - (SELECT mu FROM train)) AS score,
               ROW_NUMBER() OVER (ORDER BY
                   abs(y - (SELECT mu FROM train)), user_id) AS k,
               COUNT(*) OVER () AS n
        FROM u WHERE fold >= 4 AND fold < 7
    ),
    qhat AS (
        -- finite-sample clamp: when ceil((n+1)(1-alpha)) > n the exact
        -- conformal interval is infinite; use the max score instead so
        -- tiny calibration sets stay well-defined (and deterministic)
        SELECT score AS q FROM cal
        WHERE k = CAST(least(n, ceil(0.9 * (n + 1))) AS BIGINT)
    )
    SELECT CAST((SELECT COUNT(*) FROM u WHERE fold < 4) AS BIGINT)
               AS n_train,
           CAST(MAX(CASE WHEN TRUE THEN (SELECT MAX(n) FROM cal) END)
               AS BIGINT) AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(ROUND((SELECT mu FROM train), 4) AS DOUBLE) + 0.0
               AS point_pred,
           CAST(ROUND((SELECT q FROM qhat), 4) AS DOUBLE) + 0.0
               AS q_hat,
           CAST(ROUND(CAST(SUM(CASE WHEN
                abs(y - (SELECT mu FROM train)) <= (SELECT q FROM qhat)
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS DOUBLE) AS test_coverage
    FROM u WHERE fold >= 7
    """,
)
def conformal_interval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free +-q_hat interval around the train-mean
    predictor, with its promised >= 90% coverage verified on held-out
    users. The hash-fold split replays exactly on any engine."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    u = e.groupBy("user_id").agg(
        F.sum(_dec(F.col("value"), 18, 6)).cast("double").alias("y")
    ).withColumn(
        "fold",
        poly_hash(
            F.concat(F.lit("conf:"), F.col("user_id").cast("string"))
        )
        % 10,
    )
    train = u.filter(F.col("fold") < 4).agg(
        (
            _dsum(F.col("y")).cast("double") / F.count(F.lit(1))
        ).alias("mu"),
        F.count(F.lit(1)).alias("n_train"),
    )
    cal = u.filter((F.col("fold") >= 4) & (F.col("fold") < 7)).crossJoin(
        F.broadcast(train)
    )
    score = F.abs(F.col("y") - F.col("mu"))
    wk = Window.orderBy(score.asc(), F.col("user_id"))
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = cal.select(
        score.alias("score"),
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(wt).alias("n"),
        "mu",
        "n_train",
    )
    qhat = ranked.filter(
        F.col("k")
        == F.least(
            F.col("n"), F.ceil(0.9 * (F.col("n") + 1))
        ).cast("long")
    ).select(
        F.col("score").alias("q"),
        F.col("n").alias("n_cal"),
        "mu",
        "n_train",
    )
    test = u.filter(F.col("fold") >= 7).crossJoin(F.broadcast(qhat))
    covered = F.when(
        F.abs(F.col("y") - F.col("mu")) <= F.col("q"), 1
    ).otherwise(0)
    return test.agg(
        F.max("n_train").cast("long").alias("n_train"),
        F.max("n_cal").cast("long").alias("n_cal"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        (F.round(F.max("mu"), 4) + F.lit(0.0)).alias("point_pred"),
        (F.round(F.max("q"), 4) + F.lit(0.0)).alias("q_hat"),
        F.round(
            F.sum(covered).cast("double") / F.count(F.lit(1)), 6
        ).alias("test_coverage"),
    )


# Higher-order array-function breadth: per order, build the sorted
# array of its line-item quantities, then exercise transform / filter
# / exists / forall / reduce (aggregate) / slice / array_distinct /
# zip_with against DuckDB's list_* twins. Output one row per order
# bucket with every derived scalar, so a wrong corner in ANY of the
# eight functions diverges the hash. Array construction is one
# grouped collect_list (bounded by the 7-line order cap); everything
# after is per-row expression work.
@register(
    "array_hof_breadth",
    """
    WITH arr AS (
        SELECT l_orderkey,
               list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
        FROM lineitem GROUP BY l_orderkey
    ),
    hof AS (
        SELECT l_orderkey % 97 AS bucket,
               len(qs) AS n_items,
               list_sum(list_transform(qs, x -> x * x)) AS sum_sq,
               len(list_filter(qs, x -> x > 25)) AS n_large,
               CASE WHEN len(list_filter(qs, x -> x % 2 = 0)) > 0
                    THEN 1 ELSE 0 END AS has_even,
               CASE WHEN len(list_filter(qs, x -> x > 0)) = len(qs)
                    THEN 1 ELSE 0 END AS all_positive,
               list_reduce(qs, (a, b) -> (a * 31 + b) % 1000003)
                   AS fold_hash,
               list_sum(qs[1:2]) AS head2_sum,
               len(list_distinct(qs)) AS n_distinct,
               list_sum(list_transform(range(1, len(qs) + 1),
                   i -> qs[i] * i)) AS weighted_sum
        FROM arr
    )
    SELECT bucket,
           CAST(SUM(n_items) AS BIGINT) AS items,
           CAST(SUM(sum_sq) AS BIGINT) AS sum_sq,
           CAST(SUM(n_large) AS BIGINT) AS n_large,
           CAST(SUM(has_even) AS BIGINT) AS n_has_even,
           CAST(SUM(all_positive) AS BIGINT) AS n_all_positive,
           CAST(SUM(fold_hash) AS BIGINT) AS fold_hash_sum,
           CAST(SUM(head2_sum) AS BIGINT) AS head2_sum,
           CAST(SUM(n_distinct) AS BIGINT) AS n_distinct,
           CAST(SUM(weighted_sum) AS BIGINT) AS weighted_sum
    FROM hof GROUP BY bucket
    """,
)
def array_hof_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's lambda-expression surface (transform/filter/exists/
    forall/aggregate/slice/array_distinct + an indexed zip via
    transform-with-index) pinned value-for-value against DuckDB's
    list_* functions. Complements array_set_ops (set algebra) and
    map_funcs (map surface)."""
    li = Catalog(spark, sf_dir).lineitem
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.col("l_quantity").cast("long"))
        ).alias("qs")
    )
    qs = F.col("qs")
    hof = arr.select(
        (F.col("l_orderkey") % 97).alias("bucket"),
        F.size(qs).alias("n_items"),
        F.aggregate(
            F.transform(qs, lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_sq"),
        F.size(F.filter(qs, lambda x: x > 25)).alias("n_large"),
        F.when(F.exists(qs, lambda x: x % 2 == 0), 1)
        .otherwise(0)
        .alias("has_even"),
        F.when(F.forall(qs, lambda x: x > 0), 1)
        .otherwise(0)
        .alias("all_positive"),
        F.aggregate(
            F.slice(qs, 2, 1000000),
            F.element_at(qs, 1),
            lambda a, x: (a * 31 + x) % 1000003,
        ).alias("fold_hash"),
        F.aggregate(
            F.slice(qs, 1, 2),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("head2_sum"),
        F.size(F.array_distinct(qs)).alias("n_distinct"),
        F.aggregate(
            F.zip_with(
                qs,
                F.sequence(F.lit(1), F.size(qs)),
                lambda x, i: x * i.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("weighted_sum"),
    )
    return hof.groupBy("bucket").agg(
        F.sum("n_items").cast("long").alias("items"),
        F.sum("sum_sq").cast("long").alias("sum_sq"),
        F.sum("n_large").cast("long").alias("n_large"),
        F.sum("has_even").cast("long").alias("n_has_even"),
        F.sum("all_positive").cast("long").alias("n_all_positive"),
        F.sum("fold_hash").cast("long").alias("fold_hash_sum"),
        F.sum("head2_sum").cast("long").alias("head2_sum"),
        F.sum("n_distinct").cast("long").alias("n_distinct"),
        F.sum("weighted_sum").cast("long").alias("weighted_sum"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5 (continued): grid-DBSCAN re-expressed as
# relational algebra, difference-in-differences, per-step funnel
# significance, an optimizer-style join-cardinality audit, and
# cross-source quantile normalization on the distributed rank.
# ---------------------------------------------------------------------------


# Grid-DBSCAN over the first two embedding dimensions: a cell is CORE
# when its 3x3 neighborhood holds >= 8 points (grid_density_q's
# criterion); clusters are connected components of the adjacency graph
# over core cells (8-neighborhood), reported as (cluster, n_cells,
# n_points). The expensive phase is cell counting (one corpus
# aggregation); the graph lives on OCCUPIED CELLS (bounded by the
# grid, not the corpus) via plans/graph star contraction. The oracle
# walks the same closure with a recursive CTE over the cell graph.
@register(
    "grid_dbscan_q",
    """
    WITH RECURSIVE pts AS (
        SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.1) AS BIGINT)
                   AS cx,
               CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.1) AS BIGINT)
                   AS cy
        FROM embeddings
    ),
    cells AS (SELECT cx, cy, COUNT(*) AS c FROM pts GROUP BY cx, cy),
    nbr AS (
        SELECT cells.cx + dx.d AS cx, cells.cy + dy.d AS cy,
               SUM(c) AS nbr_count
        FROM cells
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
        GROUP BY 1, 2
    ),
    core AS (
        SELECT cells.cx, cells.cy, cells.c,
               (cells.cx + 1000) * 100000 + (cells.cy + 1000) AS cid
        FROM cells JOIN nbr USING (cx, cy)
        WHERE nbr.nbr_count >= 8
    ),
    edges AS (
        SELECT a.cid AS src, b.cid AS dst
        FROM core a JOIN core b
            ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
           AND a.cid <> b.cid
    ),
    reach(a, b) AS (
        SELECT cid, cid FROM core
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    ),
    comp AS (SELECT a AS cid, MIN(b) AS cluster FROM reach GROUP BY a)
    SELECT comp.cluster,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(core.c) AS BIGINT) AS n_points
    FROM core JOIN comp USING (cid)
    GROUP BY comp.cluster
    """,
)
def grid_dbscan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN's density clustering without any pairwise distances:
    count, threshold, connect adjacent cells, take components — every
    phase a bounded relational op (the cell graph can't outgrow the
    grid). Isolated core cells become their own singleton clusters."""
    from iniz_exporters_spark.plans.graph import connected_components

    e = Catalog(spark, sf_dir).embeddings
    pts = e.select(
        F.floor(F.element_at("embedding", 1).cast("double") / 0.1)
        .cast("long")
        .alias("cx"),
        F.floor(F.element_at("embedding", 2).cast("double") / 0.1)
        .cast("long")
        .alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("c"))
    sh = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx int, dy int",
    )
    nbr = (
        cells.crossJoin(F.broadcast(sh))
        .groupBy(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
        .agg(F.sum("c").alias("nbr_count"))
    )
    core = (
        cells.join(nbr, ["cx", "cy"])
        .filter(F.col("nbr_count") >= 8)
        .select(
            "cx",
            "cy",
            "c",
            ((F.col("cx") + 1000) * 100000 + F.col("cy") + 1000).alias(
                "cid"
            ),
        )
    )
    a = core.select(
        F.col("cx").alias("ax"), F.col("cy").alias("ay"),
        F.col("cid").alias("src"),
    )
    b = core.select(
        F.col("cx").alias("bx"), F.col("cy").alias("by"),
        F.col("cid").alias("dst"),
    )
    edges = a.join(
        b,
        (F.abs(F.col("ax") - F.col("bx")) <= 1)
        & (F.abs(F.col("ay") - F.col("by")) <= 1)
        & (F.col("src") != F.col("dst")),
    ).select("src", "dst")
    comps = connected_components(edges, method="star").withColumnRenamed(
        "node", "cid"
    )
    # isolated core cells never appear in the edge list — they are
    # their own singleton clusters
    labeled = core.join(comps, "cid", "left").select(
        "cid",
        "c",
        F.coalesce(F.col("component"), F.col("cid")).alias("cluster"),
    )
    return labeled.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("c").cast("long").alias("n_points"),
    )


# Difference-in-differences for the mid-month change in mean purchase
# value: treated = odd users, control = even users, post = on/after
# 2024-01-16. DiD = (T_post - T_pre) - (C_post - C_pre) from four
# exact-DECIMAL cell means — the 2x2 causal workhorse. One corpus
# aggregation; the estimate is scalar arithmetic on eight numbers.
@register(
    "did_q",
    """
    WITH cells AS (
        SELECT user_id % 2 AS treated,
               CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
                   AS post,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    w AS (
        SELECT MAX(CASE WHEN treated = 1 AND post = 0 THEN s / n END)
                   AS t_pre,
               MAX(CASE WHEN treated = 1 AND post = 1 THEN s / n END)
                   AS t_post,
               MAX(CASE WHEN treated = 0 AND post = 0 THEN s / n END)
                   AS c_pre,
               MAX(CASE WHEN treated = 0 AND post = 1 THEN s / n END)
                   AS c_post,
               CAST(SUM(n) AS BIGINT) AS n_events
        FROM cells
    )
    SELECT n_events,
           CAST(ROUND(t_post - t_pre, 6) AS DOUBLE) + 0.0
               AS treated_delta,
           CAST(ROUND(c_post - c_pre, 6) AS DOUBLE) + 0.0
               AS control_delta,
           CAST(ROUND((t_post - t_pre) - (c_post - c_pre), 6)
               AS DOUBLE) + 0.0 AS did_estimate
    FROM w
    """,
)
def did_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the 'treatment' cohort's purchase value move differently
    after the cutoff than the control's parallel trend predicts?"""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    cells = e.groupBy(
        (F.col("user_id") % 2).alias("treated"),
        F.when(F.col("ts") >= F.lit("2024-01-16"), 1)
        .otherwise(0)
        .alias("post"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("value"), 18, 6)).cast("double").alias("s"),
    )

    def cell(t, p):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p),
                F.col("s") / F.col("n"),
            )
        )

    w = cells.agg(
        cell(1, 0).alias("t_pre"),
        cell(1, 1).alias("t_post"),
        cell(0, 0).alias("c_pre"),
        cell(0, 1).alias("c_post"),
        F.sum("n").cast("long").alias("n_events"),
    )
    td = F.col("t_post") - F.col("t_pre")
    cd = F.col("c_post") - F.col("c_pre")
    return w.select(
        "n_events",
        (F.round(td, 6) + F.lit(0.0)).alias("treated_delta"),
        (F.round(cd, 6) + F.lit(0.0)).alias("control_delta"),
        (F.round(td - cd, 6) + F.lit(0.0)).alias("did_estimate"),
    )


# Per-step funnel drop-off significance: at each signup->view->click->
# purchase step, the two cohorts' step-conversion proportions get a
# two-proportion pooled z. User-level step flags reduce in one pass;
# the step table is 3 rows of scalar arithmetic.
@register(
    "funnel_significance_q",
    """
    WITH u AS (
        SELECT user_id, user_id % 2 AS grp,
               MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS s1,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS s2,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS s3,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS s4
        FROM events GROUP BY user_id
    ),
    steps AS (
        SELECT step, grp,
               SUM(reached_prev) AS n_prev, SUM(reached) AS n_cur
        FROM (
            SELECT grp, 'view_of_signup' AS step, s1 AS reached_prev,
                   CASE WHEN s1 = 1 AND s2 = 1 THEN 1 ELSE 0 END
                       AS reached FROM u
            UNION ALL
            SELECT grp, 'click_of_view', s2,
                   CASE WHEN s2 = 1 AND s3 = 1 THEN 1 ELSE 0 END FROM u
            UNION ALL
            SELECT grp, 'purchase_of_click', s3,
                   CASE WHEN s3 = 1 AND s4 = 1 THEN 1 ELSE 0 END FROM u
        ) GROUP BY step, grp
    ),
    wide AS (
        SELECT step,
               MAX(CASE WHEN grp = 0 THEN n_prev END) AS n0,
               MAX(CASE WHEN grp = 0 THEN n_cur END) AS c0,
               MAX(CASE WHEN grp = 1 THEN n_prev END) AS n1,
               MAX(CASE WHEN grp = 1 THEN n_cur END) AS c1
        FROM steps GROUP BY step
    )
    SELECT step,
           CAST(ROUND(CAST(c0 AS DOUBLE) / NULLIF(n0, 0), 6) AS DOUBLE)
               AS rate_g0,
           CAST(ROUND(CAST(c1 AS DOUBLE) / NULLIF(n1, 0), 6) AS DOUBLE)
               AS rate_g1,
           CAST(ROUND((CAST(c0 AS DOUBLE) / NULLIF(n0, 0)
                       - CAST(c1 AS DOUBLE) / NULLIF(n1, 0))
               / NULLIF(sqrt((CAST(c0 + c1 AS DOUBLE)
                          / NULLIF(n0 + n1, 0))
                      * (1 - CAST(c0 + c1 AS DOUBLE)
                             / NULLIF(n0 + n1, 0))
                      * (1.0 / NULLIF(n0, 0) + 1.0 / NULLIF(n1, 0))),
                 0), 6) AS DOUBLE) + 0.0 AS z_stat
    FROM wide
    """,
)
def funnel_significance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE in the funnel do the cohorts actually diverge? Pooled
    two-proportion z per step, conditioned on reaching the prior
    step (so later steps aren't confounded by earlier drop-off)."""
    e = Catalog(spark, sf_dir).events
    flags = [
        F.max(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).alias(f"s{i}")
        for i, t in enumerate(
            ["signup", "view", "click", "purchase"], start=1
        )
    ]
    u = e.groupBy("user_id").agg(*flags).withColumn(
        "grp", F.col("user_id") % 2
    )
    steps = None
    for name, prev, cur in [
        ("view_of_signup", "s1", "s2"),
        ("click_of_view", "s2", "s3"),
        ("purchase_of_click", "s3", "s4"),
    ]:
        part = u.select(
            "grp",
            F.lit(name).alias("step"),
            F.col(prev).alias("reached_prev"),
            F.when(
                (F.col(prev) == 1) & (F.col(cur) == 1), 1
            )
            .otherwise(0)
            .alias("reached"),
        )
        steps = part if steps is None else steps.unionByName(part)
    agg = steps.groupBy("step", "grp").agg(
        F.sum("reached_prev").alias("n_prev"),
        F.sum("reached").alias("n_cur"),
    )

    def side(col, g):
        return F.max(F.when(F.col("grp") == g, F.col(col)))

    wide = agg.groupBy("step").agg(
        side("n_prev", 0).alias("n0"),
        side("n_cur", 0).alias("c0"),
        side("n_prev", 1).alias("n1"),
        side("n_cur", 1).alias("c1"),
    )
    n0 = F.nullif(F.col("n0"), F.lit(0))
    n1 = F.nullif(F.col("n1"), F.lit(0))
    r0 = F.col("c0").cast("double") / n0
    r1 = F.col("c1").cast("double") / n1
    pool = (F.col("c0") + F.col("c1")).cast("double") / F.nullif(
        F.col("n0") + F.col("n1"), F.lit(0)
    )
    z = (r0 - r1) / F.nullif(
        F.sqrt(pool * (1 - pool) * (1.0 / n0 + 1.0 / n1)), F.lit(0.0)
    )
    return wide.select(
        "step",
        F.round(r0, 6).alias("rate_g0"),
        F.round(r1, 6).alias("rate_g1"),
        (F.round(z, 6) + F.lit(0.0)).alias("z_stat"),
    )


# Optimizer-style join-cardinality audit: for the orders |><| lineitem
# equi-join bucketed by order-key residue, compare the textbook
# estimate |R| * |S| / max(ndv_R, ndv_S) against the TRUE join output
# count, reporting the q-error max(est/act, act/est) that optimizer
# papers grade estimators by. Everything reduces with map-side
# partials; the audit table is one row per residue bucket.
@register(
    "join_cardinality_audit_q",
    """
    WITH r AS (
        SELECT o_orderkey % 16 AS b, COUNT(*) AS n_r,
               COUNT(DISTINCT o_orderkey) AS ndv_r
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT l_orderkey % 16 AS b, COUNT(*) AS n_s,
               COUNT(DISTINCT l_orderkey) AS ndv_s
        FROM lineitem GROUP BY 1
    ),
    act AS (
        SELECT o.o_orderkey % 16 AS b, COUNT(*) AS actual
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    )
    SELECT r.b AS bucket,
           CAST(r.n_r AS BIGINT) AS n_orders,
           CAST(s.n_s AS BIGINT) AS n_lineitems,
           CAST(ROUND(CAST(r.n_r AS DOUBLE) * s.n_s
               / greatest(r.ndv_r, s.ndv_s), 2) AS DOUBLE)
               AS estimated,
           CAST(act.actual AS BIGINT) AS actual,
           CAST(ROUND(greatest(
               (CAST(r.n_r AS DOUBLE) * s.n_s
                / greatest(r.ndv_r, s.ndv_s)) / act.actual,
               act.actual / (CAST(r.n_r AS DOUBLE) * s.n_s
                / greatest(r.ndv_r, s.ndv_s))), 4) AS DOUBLE)
               AS q_error
    FROM r JOIN s ON s.b = r.b JOIN act ON act.b = r.b
    """,
)
def join_cardinality_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How wrong would the uniform-frequency independence estimate be
    on this join? q-error per bucket — the sanity check a lakehouse
    stats pipeline runs after ANALYZE (analyze_table_stats feeds the
    same inputs)."""
    o = Catalog(spark, sf_dir).orders
    li = Catalog(spark, sf_dir).lineitem
    r = o.groupBy((F.col("o_orderkey") % 16).alias("b")).agg(
        F.count(F.lit(1)).alias("n_r"),
        F.countDistinct("o_orderkey").alias("ndv_r"),
    )
    s = li.groupBy((F.col("l_orderkey") % 16).alias("b")).agg(
        F.count(F.lit(1)).alias("n_s"),
        F.countDistinct("l_orderkey").alias("ndv_s"),
    )
    act = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy((F.col("o_orderkey") % 16).alias("b"))
        .agg(F.count(F.lit(1)).alias("actual"))
    )
    est = (
        F.col("n_r").cast("double")
        * F.col("n_s")
        / F.greatest(F.col("ndv_r"), F.col("ndv_s"))
    )
    return (
        r.join(s, "b")
        .join(act, "b")
        .select(
            F.col("b").alias("bucket"),
            F.col("n_r").cast("long").alias("n_orders"),
            F.col("n_s").cast("long").alias("n_lineitems"),
            F.round(est, 2).alias("estimated"),
            F.col("actual").cast("long").alias("actual"),
            F.round(
                F.greatest(
                    est / F.col("actual"), F.col("actual") / est
                ),
                4,
            ).alias("q_error"),
        )
    )


# Cross-source quantile normalization of document lengths (the
# bioinformatics batch-correction standard): rank documents WITHIN
# each source, average the values at each rank ACROSS sources, and
# replace every document's length with the cross-source mean at its
# rank. Per-source ranks come from grouped_index (range partition +
# broadcast offsets — no per-source corpus-scale window); the
# rank-profile join is rank-keyed. Output: per (source, rank-decile)
# mean of normalized values — identical across sources afterward by
# construction, which the oracle verifies value-for-value.
@register(
    "quantile_normalize_q",
    """
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS r,
               COUNT(*) OVER (PARTITION BY source) AS n_src
        FROM documents
    ),
    profile AS (
        SELECT r, CAST(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)
                   AS DECIMAL(18,6)) AS qmean,
               COUNT(*) AS n_sources_at_rank
        FROM ranked GROUP BY r
    ),
    norm AS (
        SELECT ranked.source, ranked.r, ranked.n_src, profile.qmean
        FROM ranked JOIN profile USING (r)
    )
    SELECT source,
           CAST((r - 1) * 10 // n_src AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(ROUND(CAST(SUM(qmean) AS DOUBLE) / COUNT(*), 4)
               AS DOUBLE) AS mean_normalized
    FROM norm
    GROUP BY source, (r - 1) * 10 // n_src
    """,
)
def quantile_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove per-source length-distribution shifts before mixing
    corpora: after normalization every source shares the SAME value
    distribution (its rank profile), summarized here per decile."""
    from iniz_exporters_spark.operators.indexing import grouped_index

    d = Catalog(spark, sf_dir).documents.select(
        "source", "n_chars", "doc_id"
    )
    ranked = grouped_index(
        d,
        ["source"],
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        idx_col="r",
        size_col="n_src",
    )
    profile = ranked.groupBy("r").agg(
        (F.sum("n_chars").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("qmean")
    )
    norm = ranked.join(profile, "r")
    decile = F.expr("(r - 1) * 10 div n_src")
    return norm.groupBy(
        "source", decile.cast("long").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum("qmean").cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_normalized"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5 (continued): breakpoint regression, the
# ABC x XYZ inventory census, Haar wavelet band energies, the
# gaps-and-islands longest streak, and the Welford/Chan parallel
# variance merge that underlies every distributed STDDEV.
# ---------------------------------------------------------------------------


# Single-breakpoint trend segmentation of daily purchase revenue: for
# every candidate split day, fit OLS lines to both sides and pick the
# split minimizing total SSE (>= 3 points per side). The candidate x
# day table is calendar x calendar (bounded); each side's SSE comes
# from closed-form moments of DECIMAL-quantized values. Ties on the
# 6-dp-rounded SSE break toward the earliest split in both engines.
@register(
    "trend_break_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS t,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    cand AS (SELECT t AS split FROM daily),
    sides AS (
        SELECT c.split, d.t <= c.split AS left_side,
               COUNT(*) AS n,
               CAST(SUM(d.t) AS DOUBLE) AS sx,
               CAST(SUM(d.y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(d.t AS BIGINT) * d.t) AS DOUBLE) AS sxx,
               CAST(SUM(d.t * d.y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(d.y AS DECIMAL(16,6))
                        * CAST(d.y AS DECIMAL(16,6))) AS DOUBLE) AS syy
        FROM cand c JOIN daily d ON TRUE
        GROUP BY c.split, d.t <= c.split
    ),
    sse AS (
        SELECT split, left_side, n,
               syy - sy * sy / n
                 - CASE WHEN sxx - sx * sx / n > 0
                        THEN (sxy - sx * sy / n) * (sxy - sx * sy / n)
                             / (sxx - sx * sx / n)
                        ELSE 0 END AS e
        FROM sides
    ),
    scored AS (
        SELECT split,
               ROUND(SUM(e), 6) AS total_sse,
               MIN(n) AS min_side
        FROM sse GROUP BY split
        HAVING COUNT(*) = 2 AND MIN(n) >= 3
    ),
    best AS (
        SELECT split, total_sse,
               ROW_NUMBER() OVER (ORDER BY total_sse, split) AS rk
        FROM scored
    )
    SELECT d.day AS break_day,
           CAST(b.split AS BIGINT) AS break_t,
           CAST(b.total_sse AS DOUBLE) + 0.0 AS total_sse
    FROM best b JOIN daily d ON d.t = b.split
    WHERE b.rk = 1
    """,
)
def trend_break_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where does the revenue trend change slope? Exhaustive single-
    breakpoint piecewise OLS — the regression view of what
    cusum_changepoint_q detects sequentially."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(_dec(F.col("value"), 18, 6)).cast("double")
                / F.count(F.lit(1))
            )
            .cast("decimal(18,6)")
            .alias("y")
        )
        .withColumn("t", F.row_number().over(wday))
    )
    cand = daily.select(F.col("t").alias("split"))
    sides = (
        cand.join(daily)
        .groupBy("split", (F.col("t") <= F.col("split")).alias("left_side"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("t").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("t").cast("long") * F.col("t"))
            .cast("double")
            .alias("sxx"),
            F.sum(F.col("t") * F.col("y")).cast("double").alias("sxy"),
            F.sum(
                F.col("y").cast("decimal(16,6)")
                * F.col("y").cast("decimal(16,6)")
            )
            .cast("double")
            .alias("syy"),
        )
    )
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    sse = sides.select(
        "split",
        "n",
        (
            cyy - F.when(cxx > 0, cxy * cxy / cxx).otherwise(F.lit(0.0))
        ).alias("e"),
    )
    scored = (
        sse.groupBy("split")
        .agg(
            F.round(F.sum("e"), 6).alias("total_sse"),
            F.min("n").alias("min_side"),
            F.count(F.lit(1)).alias("n_sides"),
        )
        .filter((F.col("n_sides") == 2) & (F.col("min_side") >= 3))
    )
    wbest = Window.orderBy("total_sse", "split")
    best = scored.withColumn("rk", F.row_number().over(wbest)).filter(
        F.col("rk") == 1
    )
    return best.join(daily, best["split"] == daily["t"]).select(
        F.col("day").alias("break_day"),
        F.col("split").cast("long").alias("break_t"),
        (F.col("total_sse") + F.lit(0.0)).alias("total_sse"),
    )


# ABC x XYZ inventory census: ABC classes from abc_analysis_q's
# cumulative revenue cut, XYZ classes from each part's weekly demand
# variability (CV = sd/mean of weekly quantities over the part's
# active weeks: X < 0.5, Y < 1.0, Z otherwise). The 3 x 3 census is
# the stocking-policy planning table. Revenue ranks reuse
# global_cumsum; CVs come from exact per-(part, week) DECIMAL sums.
@register(
    "abc_xyz_q",
    """
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000
                    AS BIGINT) AS rev_c
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(rev_c) AS DOUBLE) AS t FROM pr),
    c AS (
        SELECT l_partkey, rev_c,
               SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey) AS cum_c
        FROM pr
    ),
    abc AS (
        SELECT l_partkey,
               CASE WHEN cum_c <= 0.80 * (SELECT t FROM tot) THEN 'A'
                    WHEN cum_c <= 0.95 * (SELECT t FROM tot) THEN 'B'
                    ELSE 'C' END AS abc
        FROM c
    ),
    wk AS (
        SELECT l_partkey,
               date_diff('day', DATE '1995-01-01',
                   CAST(l_shipdate AS DATE)) // 7 AS w,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    cv AS (
        SELECT l_partkey,
               COUNT(*) AS n,
               CAST(SUM(q) AS DOUBLE) AS s,
               CAST(SUM(CAST(q AS DECIMAL(16,4))
                        * CAST(q AS DECIMAL(16,4))) AS DOUBLE) AS ss
        FROM wk GROUP BY l_partkey
    ),
    xyz AS (
        SELECT l_partkey,
               CASE WHEN n < 2 THEN 'Z'
                    WHEN sqrt(greatest(ss / n - (s / n) * (s / n), 0.0))
                         / (s / n) < 0.5 THEN 'X'
                    WHEN sqrt(greatest(ss / n - (s / n) * (s / n), 0.0))
                         / (s / n) < 1.0 THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM cv
    )
    SELECT abc.abc, xyz.xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM abc JOIN xyz USING (l_partkey)
    GROUP BY abc.abc, xyz.xyz
    """,
)
def abc_xyz_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which parts are high-value AND unpredictable (the A-Z corner
    that breaks stocking policies)? Crosses abc_analysis_q's revenue
    cut with weekly-demand CV classes."""
    from iniz_exporters_spark.operators.indexing import global_cumsum

    li = Catalog(spark, sf_dir).lineitem
    pr = li.groupBy("l_partkey").agg(
        (F.sum(_dec(F.col("l_extendedprice"), 18, 4)) * 10000)
        .cast("long")
        .alias("rev_c")
    )
    tot = pr.agg(F.sum("rev_c").cast("double").alias("t"))
    c = global_cumsum(
        pr,
        [F.col("rev_c").desc(), F.col("l_partkey").asc()],
        "rev_c",
        "cum_c",
    )
    abc = c.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        F.when(F.col("cum_c") <= 0.80 * F.col("t"), "A")
        .when(F.col("cum_c") <= 0.95 * F.col("t"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    wk = li.groupBy(
        "l_partkey",
        (
            F.datediff(F.to_date("l_shipdate"), F.lit("1995-01-01")) / 7
        )
        .cast("long")
        .alias("w"),
    ).agg(F.sum(_dec(F.col("l_quantity"), 18, 4)).alias("q"))
    cv = wk.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").cast("double").alias("s"),
        F.sum(
            F.col("q").cast("decimal(16,4)")
            * F.col("q").cast("decimal(16,4)")
        )
        .cast("double")
        .alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    sd = F.sqrt(
        F.greatest(
            F.col("ss") / F.col("n") - mean * mean, F.lit(0.0)
        )
    )
    xyz = cv.select(
        "l_partkey",
        F.when(F.col("n") < 2, "Z")
        .when(sd / mean < 0.5, "X")
        .when(sd / mean < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return abc.join(xyz, "l_partkey").groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )


# Haar wavelet band energies of the daily purchase-revenue series:
# missing dyadic slots simply contribute zero (absent from the block
# sums — no explicit padding needed); energy at
# level k = sum over blocks of (left-half sum - right-half sum)^2
# / 2^k — the unnormalized Haar detail energy, RATIONAL in the block
# sums so no sqrt(2) ever enters. Block sums are exact DECIMALs built
# by bit-shifted grouping; the level table is 5 rows.
@register(
    "haar_energy_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS i,
               SUM(CAST(value AS DECIMAL(18,6))) AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    lv AS (SELECT unnest(range(1, 6)) AS k),
    blocks AS (
        SELECT lv.k, d.i // (1 << lv.k) AS blk,
               SUM(CASE WHEN (d.i // (1 << (lv.k - 1))) % 2 = 0
                        THEN d.v ELSE -d.v END) AS diff
        FROM daily d CROSS JOIN lv
        GROUP BY lv.k, d.i // (1 << lv.k)
    )
    SELECT CAST(k AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(ROUND(CAST(SUM(CAST(CAST(diff AS DOUBLE)
                    * CAST(diff AS DOUBLE) AS DECIMAL(38,6)))
                    AS DOUBLE) / (1 << k), 4) AS DOUBLE) + 0.0
               AS band_energy
    FROM blocks GROUP BY k
    """,
)
def haar_energy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which time scale carries the revenue variance — day-to-day
    (level 1), weekly-ish (level 3), or fortnight+ (level 5)? The
    multiresolution companion to acf_q/seasonal_strength_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(_dec(F.col("value"), 18, 6)).alias("v"))
        .select((F.row_number().over(wday) - 1).alias("i"), "v")
    )
    lv = daily.sparkSession.range(1, 6).select(
        F.col("id").cast("int").alias("k")
    )
    sign = F.when(
        (
            F.col("i").cast("long")
            / F.pow(F.lit(2), F.col("k") - 1).cast("long")
        ).cast("long")
        % 2
        == 0,
        F.col("v"),
    ).otherwise(-F.col("v"))
    blocks = (
        daily.crossJoin(F.broadcast(lv))
        .groupBy(
            "k",
            (
                F.col("i").cast("long")
                / F.pow(F.lit(2), F.col("k")).cast("long")
            )
            .cast("long")
            .alias("blk"),
        )
        .agg(F.sum(sign).alias("diff"))
    )
    d = F.col("diff").cast("double")
    return blocks.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    ).join(
        blocks.groupBy("k").agg(
            F.sum((d * d).cast("decimal(38,6)"))
            .cast("double")
            .alias("se")
        ),
        "k",
    ).select(
        F.col("k").cast("long").alias("level"),
        "n_blocks",
        (
            F.round(
                F.col("se") / F.pow(F.lit(2), F.col("k")), 4
            )
            + F.lit(0.0)
        ).alias("band_energy"),
    )


# Longest strictly-increasing streak of daily purchase revenue — the
# canonical gaps-and-islands pattern: mark streak starts with LAG,
# cumulative-sum the starts into island ids, then take the longest
# island (ties -> earliest start). Every window runs on the
# calendar-bounded daily frame; revenue comparisons are exact
# DECIMALs.
@register(
    "longest_streak_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    marks AS (
        SELECT day, rev,
               CASE WHEN rev > LAG(rev) OVER (ORDER BY day)
                    THEN 0 ELSE 1 END AS is_start
        FROM daily
    ),
    islands AS (
        SELECT day, rev,
               SUM(is_start) OVER (ORDER BY day) AS island
        FROM marks
    ),
    sized AS (
        SELECT island, COUNT(*) AS len,
               MIN(day) AS start_day, MAX(day) AS end_day
        FROM islands GROUP BY island
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY len DESC, start_day) AS rk
        FROM sized
    )
    SELECT CAST(len AS BIGINT) AS streak_len,
           start_day, end_day
    FROM best WHERE rk = 1
    """,
)
def longest_streak_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The longest run of day-over-day revenue growth — SQL's
    gaps-and-islands idiom (LAG marks + running-sum island ids)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    wday = Window.orderBy("day")
    wcum = wday.rowsBetween(Window.unboundedPreceding, 0)
    marks = daily.select(
        "day",
        "rev",
        F.when(F.col("rev") > F.lag("rev").over(wday), 0)
        .otherwise(1)
        .alias("is_start"),
    )
    islands = marks.select(
        "day", F.sum("is_start").over(wcum).alias("island")
    )
    sized = islands.groupBy("island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
    )
    wbest = Window.orderBy(F.col("len").desc(), F.col("start_day"))
    return (
        sized.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            F.col("len").cast("long").alias("streak_len"),
            "start_day",
            "end_day",
        )
    )


# Welford/Chan parallel variance merge, audited: compute per-nation
# partial (n, mean, M2) statistics, merge them pairwise-fold style
# with the Chan update M2 = M2a + M2b + delta^2 * na*nb/(na+nb), and
# pin the merged result against the direct two-pass variance. This is
# the algebra that lets distributed STDDEV avoid a second scan; the
# audit reports both paths and their 9-dp agreement. Merge order is
# fixed (nation ascending) so the float fold is identical in both
# engines.
@register(
    "welford_merge_q",
    """
    WITH parts AS (
        SELECT c_nationkey AS nat, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mean,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6))
                        * CAST(c_acctbal AS DECIMAL(19,6))) AS DOUBLE)
               - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                        AS DOUBLE) / COUNT(*) AS m2
        FROM customer GROUP BY c_nationkey
    ),
    merged AS (
        SELECT n, mean, m2, rk FROM (
            SELECT parts.*,
                   ROW_NUMBER() OVER (ORDER BY nat) AS rk
            FROM parts
        )
    ),
    fold AS (
        WITH RECURSIVE f(rk, n, mean, m2) AS (
            SELECT rk, CAST(n AS BIGINT), mean, m2
            FROM merged WHERE rk = 1
            UNION ALL
            SELECT m.rk, f.n + m.n,
                   (f.mean * f.n + m.mean * m.n) / (f.n + m.n),
                   f.m2 + m.m2
                     + (m.mean - f.mean) * (m.mean - f.mean)
                       * f.n * m.n / (f.n + m.n)
            FROM f JOIN merged m ON m.rk = f.rk + 1
        )
        SELECT n, m2 FROM f
        WHERE rk = (SELECT MAX(rk) FROM merged)
    ),
    direct AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6))
                        * CAST(c_acctbal AS DECIMAL(19,6))) AS DOUBLE)
               - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                        AS DOUBLE) / COUNT(*) AS m2
        FROM customer
    )
    SELECT CAST(direct.n AS BIGINT) AS n_rows,
           CAST(ROUND(direct.m2 / (direct.n - 1), 4) AS DOUBLE) + 0.0
               AS var_direct,
           CAST(ROUND(fold.m2 / (fold.n - 1), 4) AS DOUBLE) + 0.0
               AS var_merged,
           abs(direct.m2 - fold.m2) / direct.m2 < 1e-9
               AS merge_agrees
    FROM direct, fold
    """,
)
def welford_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proof-by-query that partial-moment merging reproduces the
    global variance: the identity every map-side-combine STDDEV rests
    on, folded in a FIXED nation order so both engines walk the same
    float path. The 25-row partial table is collected to the driver
    (metadata scale — the same class as k x d centroids) and folded
    there, mirroring the oracle's recursive CTE step for step."""
    c = Catalog(spark, sf_dir).customer
    s6 = _dec(F.col("c_acctbal"), 18, 6)
    s16 = _dec(F.col("c_acctbal"), 16, 6)
    parts = (
        c.groupBy(F.col("c_nationkey").alias("nat"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(s6).cast("double") / F.count(F.lit(1))).alias("mean"),
            (
                F.sum(s16 * s16).cast("double")
                - F.sum(s6).cast("double")
                * F.sum(s6).cast("double")
                / F.count(F.lit(1))
            ).alias("m2"),
        )
        .orderBy("nat")
    )
    # metadata-scale sequential fold (25 rows) — same order as the
    # oracle's recursive CTE
    rows = parts.collect()
    n, mean, m2 = rows[0]["n"], rows[0]["mean"], rows[0]["m2"]
    for r in rows[1:]:
        nb, mb, m2b = r["n"], r["mean"], r["m2"]
        delta = mb - mean
        m2 = m2 + m2b + delta * delta * n * nb / (n + nb)
        mean = (mean * n + mb * nb) / (n + nb)
        n = n + nb
    direct = c.agg(
        F.count(F.lit(1)).alias("nd"),
        (
            F.sum(s16 * s16).cast("double")
            - F.sum(s6).cast("double")
            * F.sum(s6).cast("double")
            / F.count(F.lit(1))
        ).alias("m2d"),
    )
    return direct.select(
        F.col("nd").cast("long").alias("n_rows"),
        (
            F.round(F.col("m2d") / (F.col("nd") - 1), 4) + F.lit(0.0)
        ).alias("var_direct"),
        (
            F.round(F.lit(m2) / (F.lit(n) - 1), 4) + F.lit(0.0)
        ).alias("var_merged"),
        (
            F.abs(F.col("m2d") - F.lit(m2)) / F.col("m2d") < 1e-9
        ).alias("merge_agrees"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 5 (continued): restricted mean survival,
# Dunn's post-hoc with BH control, deterministic exhaustive RANSAC,
# Bradley-Terry strengths via rational MM iterations, and a Weiszfeld
# geometric median (sqrt is IEEE-correctly-rounded, so the iterate
# trajectory is bit-identical across engines).
# ---------------------------------------------------------------------------


# Restricted mean survival time (RMST) to the 14-day horizon: the area
# under the Kaplan-Meier curve, sum of S(t_k) x (t_{k+1} - t_k) over
# the step function clipped at tau = 14 — the one-number survival
# summary that stays valid under censoring. Reuses km_survival_q's
# duration frame; the step integration is a window pass over it.
@register(
    "rmst_q",
    """
    WITH su AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    la AS (SELECT user_id, MAX(ts) AS tl FROM events GROUP BY user_id),
    pu AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN su USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= su.t0
        GROUP BY e.user_id
    ),
    b AS (
        SELECT su.user_id,
               CASE WHEN tp IS NOT NULL
                    THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
                    ELSE date_diff('day', CAST(t0 AS DATE), CAST(tl AS DATE))
               END AS t,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM su JOIN la USING (user_id)
        LEFT JOIN pu ON pu.user_id = su.user_id
    ),
    g AS (SELECT t, SUM(obs) AS d, COUNT(*) AS m FROM b GROUP BY t),
    tot AS (SELECT COUNT(*) AS nn FROM b),
    k AS (
        SELECT t, d, nn - (SUM(m) OVER (ORDER BY t) - m) AS n_risk
        FROM g CROSS JOIN tot
    ),
    c AS (
        SELECT t,
               EXP(SUM(CASE WHEN n_risk > d
                       THEN LN(CAST(n_risk - d AS DOUBLE)
                               / CAST(n_risk AS DOUBLE)) END)
                   OVER (ORDER BY t)) AS s
        FROM k WHERE d > 0 AND t < 14
    ),
    steps AS (
        SELECT t, s,
               COALESCE(LEAD(t) OVER (ORDER BY t), 14) AS t_next,
               LAG(t) OVER (ORDER BY t) IS NULL AS is_first
        FROM c WHERE t < 14
    )
    SELECT CAST(ROUND(
               MAX(CASE WHEN is_first THEN t ELSE 0 END)
               + CAST(SUM(CAST(s * (least(t_next, 14) - t)
                     AS DECIMAL(28,12))) AS DOUBLE), 4) AS DOUBLE)
               + 0.0 AS rmst_14d,
           CAST(COUNT(*) AS BIGINT) AS n_steps
    FROM steps
    """,
)
def rmst_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected conversion-free days within the first two weeks —
    the integral summary of km_survival_q (S = 1 before the first
    event time, so that span contributes its full width)."""
    ev = Catalog(spark, sf_dir).events
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    la = ev.groupBy("user_id").agg(F.max("ts").alias("tl"))
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    b = (
        su.join(la, "user_id")
        .join(pu, "user_id", "left")
        .select(
            F.when(
                F.col("tp").isNotNull(),
                F.datediff(F.to_date("tp"), F.to_date("t0")),
            )
            .otherwise(F.datediff(F.to_date("tl"), F.to_date("t0")))
            .alias("t"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("obs"),
        )
    )
    g = b.groupBy("t").agg(
        F.sum("obs").alias("d"), F.count(F.lit(1)).alias("m")
    )
    tot = b.agg(F.count(F.lit(1)).alias("nn"))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (F.col("nn") - (F.sum("m").over(wcum) - F.col("m"))).alias(
            "n_risk"
        ),
    )
    c = (
        k.filter((F.col("d") > 0) & (F.col("t") < 14))
        .select(
            "t",
            "d",
            "n_risk",
        )
        .withColumn(
            "s",
            F.exp(
                F.sum(
                    F.when(
                        F.col("n_risk") > F.col("d"),
                        F.log(
                            (F.col("n_risk") - F.col("d")).cast("double")
                            / F.col("n_risk").cast("double")
                        ),
                    )
                ).over(wcum)
            ),
        )
    )
    wlead = Window.orderBy("t")
    steps = c.select(
        "t",
        "s",
        F.coalesce(F.lead("t").over(wlead), F.lit(14)).alias("t_next"),
        F.lag("t").over(wlead).isNull().alias("is_first"),
    )
    return steps.agg(
        (
            F.round(
                F.max(
                    F.when(F.col("is_first"), F.col("t")).otherwise(0)
                )
                + _dsum(
                    F.col("s")
                    * (
                        F.least(F.col("t_next"), F.lit(14)) - F.col("t")
                    )
                ).cast("double"),
                4,
            )
            + F.lit(0.0)
        ).alias("rmst_14d"),
        F.count(F.lit(1)).cast("long").alias("n_steps"),
    )


# Dunn's post-hoc test after kruskal_wallis_q, BH-corrected: pairwise
# mean-rank z statistics between market segments on the SHARED
# midrank table (z_ij = (Rbar_i - Rbar_j) / sqrt(N(N+1)/12 (1/ni +
# 1/nj)), rank2 = doubled midranks keep rank sums integral), then the
# Benjamini-Hochberg step-up over the 10 pairwise A&S-erfc p-values
# (the bh_fdr_q machinery). Rank sums come from avg_rank2_table
# (range-partitioned); the pair table is k(k-1)/2 rows.
@register(
    "dunn_test_q",
    """
    WITH v AS (
        SELECT c_mktsegment AS seg, c_acctbal AS x FROM customer
    ),
    cnt AS (SELECT x, COUNT(*) AS cnt FROM v GROUP BY x),
    rk AS (
        SELECT x, 2 * SUM(cnt) OVER (ORDER BY x) - cnt + 1 AS rank2
        FROM cnt
    ),
    seg AS (
        SELECT v.seg, COUNT(*) AS n,
               CAST(SUM(rk.rank2) AS DOUBLE) / (2 * COUNT(*))
                   AS mean_rank
        FROM v JOIN rk ON rk.x = v.x
        GROUP BY v.seg
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM seg),
    pairs AS (
        SELECT a.seg AS seg_a, b.seg AS seg_b,
               abs(a.mean_rank - b.mean_rank)
               / sqrt((SELECT nn * (nn + 1) / 12.0 FROM tot)
                      * (1.0 / a.n + 1.0 / b.n)) AS az
        FROM seg a JOIN seg b ON a.seg < b.seg
    ),
    p AS (
        SELECT seg_a, seg_b, az,
               (0.254829592 * (1 / (1 + 0.3275911 * az / sqrt(2.0)))
                - 0.284496736 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 2)
                + 1.421413741 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 3)
                - 1.453152027 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 4)
                + 1.061405429 * pow(1 / (1 + 0.3275911 * az / sqrt(2.0)), 5))
               * exp(-az * az / 2.0) AS pv
        FROM pairs
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY pv, seg_a, seg_b) AS i,
               COUNT(*) OVER () AS m
        FROM p
    ),
    kstar AS (
        SELECT ranked.*,
               MAX(CASE WHEN pv <= 0.05 * i / m THEN i END) OVER () AS k
        FROM ranked
    )
    SELECT seg_a, seg_b,
           CAST(ROUND(az, 4) AS DOUBLE) + 0.0 AS abs_z,
           CAST(ROUND(pv, 6) AS DOUBLE) + 0.0 AS p_value,
           COALESCE(i <= k, FALSE) AS significant
    FROM kstar
    """,
)
def dunn_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH segments differ in rank location after kruskal_wallis_q
    rejects — the nonparametric sibling of tukey_hsd_q, with FDR
    control instead of the studentized range."""
    from iniz_exporters_spark.operators.indexing import avg_rank2_table

    c = Catalog(spark, sf_dir).customer
    v = c.select(F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("x"))
    cnt = v.groupBy("x").agg(F.count(F.lit(1)).alias("cnt"))
    rk = avg_rank2_table(cnt, "x")
    seg = (
        v.join(rk, "x")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum("rank2").cast("double") / (2 * F.count(F.lit(1)))
            ).alias("mean_rank"),
        )
    )
    tot = seg.agg(F.sum("n").cast("long").alias("nn"))
    a = seg.select(
        F.col("seg").alias("seg_a"),
        F.col("n").alias("na"),
        F.col("mean_rank").alias("ra"),
    )
    b = seg.select(
        F.col("seg").alias("seg_b"),
        F.col("n").alias("nb"),
        F.col("mean_rank").alias("rb"),
    )
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b")).crossJoin(
        F.broadcast(tot)
    )
    az = F.abs(F.col("ra") - F.col("rb")) / F.sqrt(
        (F.col("nn") * (F.col("nn") + 1) / 12.0)
        * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    p = pairs.select("seg_a", "seg_b", az.alias("az"))
    t = 1 / (1 + 0.3275911 * F.col("az") / F.sqrt(F.lit(2.0)))
    pv = (
        0.254829592 * t
        - 0.284496736 * F.pow(t, 2)
        + 1.421413741 * F.pow(t, 3)
        - 1.453152027 * F.pow(t, 4)
        + 1.061405429 * F.pow(t, 5)
    ) * F.exp(-F.col("az") * F.col("az") / 2.0)
    p = p.withColumn("pv", pv)
    wr = Window.orderBy("pv", "seg_a", "seg_b")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = p.select(
        "seg_a",
        "seg_b",
        "az",
        "pv",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wt).alias("m"),
    )
    kstar = ranked.withColumn(
        "k",
        F.max(
            F.when(
                F.col("pv") <= 0.05 * F.col("i") / F.col("m"), F.col("i")
            )
        ).over(wt),
    )
    return kstar.select(
        "seg_a",
        "seg_b",
        (F.round(F.col("az"), 4) + F.lit(0.0)).alias("abs_z"),
        (F.round(F.col("pv"), 6) + F.lit(0.0)).alias("p_value"),
        F.coalesce(F.col("i") <= F.col("k"), F.lit(False)).alias(
            "significant"
        ),
    )


# Exhaustive deterministic RANSAC line fit on the daily revenue
# series: every day PAIR proposes the line through its two points;
# the consensus score counts days within eps = 2 x MAD of residuals
# from theil_sen-style center... here a fixed eps = 50.0 value units.
# Winner = most inliers, ties -> smallest (i, j). O(days^2 x days)
# work on the calendar-bounded frame — the exhaustive version of
# sampling RANSAC, fully replayable. Slopes are exact-decimal ratios
# evaluated in double identically on both engines.
@register(
    "ransac_trend_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS t,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    cand AS (
        SELECT a.t AS i, b.t AS j,
               CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) AS slope,
               CAST(a.y AS DOUBLE)
                   - CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) * a.t
                   AS intercept
        FROM daily a JOIN daily b ON b.t > a.t
    ),
    scored AS (
        SELECT c.i, c.j, c.slope, c.intercept,
               SUM(CASE WHEN abs(CAST(d.y AS DOUBLE)
                        - (c.slope * d.t + c.intercept)) <= 50.0
                   THEN 1 ELSE 0 END) AS inliers
        FROM cand c JOIN daily d ON TRUE
        GROUP BY c.i, c.j, c.slope, c.intercept
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY inliers DESC, i, j) AS rk
        FROM scored
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(ROUND(slope, 6) AS DOUBLE) + 0.0 AS slope,
           CAST(ROUND(intercept, 4) AS DOUBLE) + 0.0 AS intercept,
           CAST(inliers AS BIGINT) AS n_inliers
    FROM best WHERE rk = 1
    """,
)
def ransac_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consensus line through daily revenue, immune to anomaly
    days that bend OLS — exhaustive over all day pairs, so no RNG and
    no iteration count to tune (theil_sen_q is the median-slope
    cousin; this one reports its supporting set size)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(_dec(F.col("value"), 18, 6)).cast("double")
                / F.count(F.lit(1))
            )
            .cast("decimal(18,6)")
            .alias("y")
        )
        .select(F.row_number().over(wday).alias("t"), "y")
    )
    a = daily.select(F.col("t").alias("i"), F.col("y").alias("ya"))
    b = daily.select(F.col("t").alias("j"), F.col("y").alias("yb"))
    slope = (F.col("yb") - F.col("ya")).cast("double") / (
        F.col("j") - F.col("i")
    )
    cand = a.join(b, F.col("j") > F.col("i")).select(
        "i",
        "j",
        slope.alias("slope"),
        (F.col("ya").cast("double") - slope * F.col("i")).alias(
            "intercept"
        ),
    )
    scored = (
        cand.join(daily)
        .groupBy("i", "j", "slope", "intercept")
        .agg(
            F.sum(
                F.when(
                    F.abs(
                        F.col("y").cast("double")
                        - (F.col("slope") * F.col("t") + F.col("intercept"))
                    )
                    <= 50.0,
                    1,
                ).otherwise(0)
            ).alias("inliers")
        )
    )
    wbest = Window.orderBy(F.col("inliers").desc(), "i", "j")
    return (
        scored.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            (F.round(F.col("slope"), 6) + F.lit(0.0)).alias("slope"),
            (F.round(F.col("intercept"), 4) + F.lit(0.0)).alias(
                "intercept"
            ),
            F.col("inliers").cast("long").alias("n_inliers"),
        )
    )


# Bradley-Terry strengths for the five event types from daily-mean
# "matches" (type i beats type j on a day its mean value is higher):
# three unrolled MM iterations pi' = W_i / sum_j n_ij/(pi_i + pi_j)
# from a uniform start — every step a RATIONAL function of integer
# win counts (the fuzzy_cmeans_q determinism trick), normalized to
# sum 1 at the end. The win matrix is 5x5 metadata; iterations are
# scalar passes over it.
@register(
    "bradley_terry_q",
    """
    WITH dt AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    games AS (
        SELECT a.event_type AS ti, b.event_type AS tj,
               SUM(CASE WHEN a.m > b.m THEN 1 ELSE 0 END) AS w
        FROM dt a JOIN dt b
            ON b.day = a.day AND a.event_type <> b.event_type
        GROUP BY a.event_type, b.event_type
    ),
    p0 AS (
        SELECT DISTINCT ti AS t, 1.0 AS pi FROM games
    ),
    it1 AS (
        SELECT g.ti AS t,
               SUM(g.w) / SUM((g.w + g2.w)
                   / (pa.pi + pb.pi)) AS pi
        FROM games g
        JOIN games g2 ON g2.ti = g.tj AND g2.tj = g.ti
        JOIN p0 pa ON pa.t = g.ti JOIN p0 pb ON pb.t = g.tj
        GROUP BY g.ti
    ),
    it2 AS (
        SELECT g.ti AS t,
               SUM(g.w) / SUM((g.w + g2.w)
                   / (pa.pi + pb.pi)) AS pi
        FROM games g
        JOIN games g2 ON g2.ti = g.tj AND g2.tj = g.ti
        JOIN it1 pa ON pa.t = g.ti JOIN it1 pb ON pb.t = g.tj
        GROUP BY g.ti
    ),
    it3 AS (
        SELECT g.ti AS t,
               SUM(g.w) / SUM((g.w + g2.w)
                   / (pa.pi + pb.pi)) AS pi
        FROM games g
        JOIN games g2 ON g2.ti = g.tj AND g2.tj = g.ti
        JOIN it2 pa ON pa.t = g.ti JOIN it2 pb ON pb.t = g.tj
        GROUP BY g.ti
    )
    SELECT t AS event_type,
           CAST(ROUND(pi / (SELECT SUM(pi) FROM it3), 6) AS DOUBLE)
               + 0.0 AS strength
    FROM it3
    """,
)
def bradley_terry_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event type 'wins' the daily value contest once every
    pairing is accounted for? Paired-comparison strengths, MM-
    iterated; rational arithmetic end to end so the trajectory is
    engine-exact."""
    e = Catalog(spark, sf_dir).events
    dt = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    a = dt.select(
        F.col("day").alias("da"),
        F.col("event_type").alias("ti"),
        F.col("m").alias("ma"),
    )
    bb = dt.select(
        F.col("day").alias("db"),
        F.col("event_type").alias("tj"),
        F.col("m").alias("mb"),
    )
    games = (
        a.join(
            bb,
            (F.col("da") == F.col("db"))
            & (F.col("ti") != F.col("tj")),
        )
        .groupBy("ti", "tj")
        .agg(
            F.sum(
                F.when(F.col("ma") > F.col("mb"), 1).otherwise(0)
            ).alias("w")
        )
    )
    g2 = games.select(
        F.col("ti").alias("tj2"),
        F.col("tj").alias("ti2"),
        F.col("w").alias("w2"),
    )
    full = games.join(
        g2,
        (F.col("ti") == F.col("ti2")) & (F.col("tj") == F.col("tj2")),
    ).select("ti", "tj", "w", "w2")
    pi = full.select(F.col("ti").alias("t")).distinct().withColumn(
        "pi", F.lit(1.0)
    )
    for _ in range(3):
        pa = pi.select(F.col("t").alias("ti"), F.col("pi").alias("pa"))
        pb = pi.select(F.col("t").alias("tj"), F.col("pi").alias("pb"))
        pi = (
            full.join(F.broadcast(pa), "ti")
            .join(F.broadcast(pb), "tj")
            .groupBy(F.col("ti").alias("t"))
            .agg(
                (
                    F.sum("w")
                    / F.sum(
                        (F.col("w") + F.col("w2"))
                        / (F.col("pa") + F.col("pb"))
                    )
                ).alias("pi")
            )
        )
    tot = pi.agg(F.sum("pi").alias("s"))
    return pi.crossJoin(F.broadcast(tot)).select(
        F.col("t").alias("event_type"),
        (
            F.round(F.col("pi") / F.col("s"), 6) + F.lit(0.0)
        ).alias("strength"),
    )


# Geometric median of the 2-D embedding cloud (dims 1-2) by three
# unrolled Weiszfeld iterations from the coordinate mean:
# x' = sum(p_i / d_i) / sum(1 / d_i), d_i = euclidean distance to the
# current iterate. sqrt is IEEE-correctly-rounded, so — like
# fuzzy_cmeans_q's rational memberships — the whole trajectory is
# bit-identical across engines. Each iteration is one corpus pass with
# DECIMAL(28,12)-quantized weighted sums; the iterate is a broadcast
# 1-row frame.
@register(
    "geometric_median_q",
    """
    WITH p AS (
        SELECT CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings
    ),
    c0 AS (
        SELECT CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS cx,
               CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS cy
        FROM p
    ),
    c1 AS (
        SELECT CAST(SUM(CAST(x / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cx,
               CAST(SUM(CAST(y / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cy
        FROM (SELECT x, y,
                     sqrt((x - (SELECT cx FROM c0))
                          * (x - (SELECT cx FROM c0))
                          + (y - (SELECT cy FROM c0))
                            * (y - (SELECT cy FROM c0))) AS d
              FROM p) WHERE d > 0
    ),
    c2 AS (
        SELECT CAST(SUM(CAST(x / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cx,
               CAST(SUM(CAST(y / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cy
        FROM (SELECT x, y,
                     sqrt((x - (SELECT cx FROM c1))
                          * (x - (SELECT cx FROM c1))
                          + (y - (SELECT cy FROM c1))
                            * (y - (SELECT cy FROM c1))) AS d
              FROM p) WHERE d > 0
    ),
    c3 AS (
        SELECT CAST(SUM(CAST(x / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cx,
               CAST(SUM(CAST(y / d AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(SUM(CAST(1 / d AS DECIMAL(28,12))) AS DOUBLE)
                   AS cy
        FROM (SELECT x, y,
                     sqrt((x - (SELECT cx FROM c2))
                          * (x - (SELECT cx FROM c2))
                          + (y - (SELECT cy FROM c2))
                            * (y - (SELECT cy FROM c2))) AS d
              FROM p) WHERE d > 0
    )
    SELECT CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_points,
           CAST(ROUND(cx, 6) AS DOUBLE) + 0.0 AS median_x,
           CAST(ROUND(cy, 6) AS DOUBLE) + 0.0 AS median_y
    FROM c3
    """,
)
def geometric_median_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The L1-optimal center of the embedding cloud — the robust
    anchor centroid_drift_q should diff against when outliers poison
    the mean. Points exactly AT the iterate are dropped from that
    step's weights (the standard Weiszfeld guard), identically in
    both engines."""
    emb = Catalog(spark, sf_dir).embeddings
    p = emb.select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    cent = p.agg(
        (
            F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cx"),
        (
            F.sum(F.col("y").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cy"),
    )
    for _ in range(3):
        j = p.crossJoin(F.broadcast(cent))
        d = F.sqrt(
            (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
            + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
        )
        wj = j.withColumn("d", d).filter(F.col("d") > 0)
        cent = wj.agg(
            (
                F.sum((F.col("x") / F.col("d")).cast("decimal(28,12)"))
                .cast("double")
                / F.sum(
                    (F.lit(1) / F.col("d")).cast("decimal(28,12)")
                ).cast("double")
            ).alias("cx"),
            (
                F.sum((F.col("y") / F.col("d")).cast("decimal(28,12)"))
                .cast("double")
                / F.sum(
                    (F.lit(1) / F.col("d")).cast("decimal(28,12)")
                ).cast("double")
            ).alias("cy"),
        )
    n = p.agg(F.count(F.lit(1)).alias("n_points"))
    return cent.crossJoin(F.broadcast(n)).select(
        F.col("n_points").cast("long").alias("n_points"),
        (F.round(F.col("cx"), 6) + F.lit(0.0)).alias("median_x"),
        (F.round(F.col("cy"), 6) + F.lit(0.0)).alias("median_y"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 6: OLS influence diagnostics, Box-Cox
# transform selection, the Youden-J operating point, expected
# calibration error on integer-keyed bins, and the Lorenz curve.
# ---------------------------------------------------------------------------


# Influence diagnostics for the daily-revenue-vs-time OLS: leverage
# h_i = 1/n + (t - tbar)^2 / Sxx, internally studentized residual
# r_i = e_i / (s sqrt(1 - h_i)), Cook's D = r_i^2 h_i / (2 (1 - h_i)).
# Fit moments come from DECIMAL-quantized sums; the per-day
# diagnostics are window-free arithmetic against the broadcast fit.
# Flags days with D > 4/n — the standard screening cut.
@register(
    "regression_diagnostics_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS t,
               CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(t) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(t AS BIGINT) * t) AS DOUBLE) AS sxx,
               CAST(SUM(t * y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(y AS DECIMAL(16,6))
                        * CAST(y AS DECIMAL(16,6))) AS DOUBLE) AS syy
        FROM daily
    ),
    fit AS (
        SELECT n,
               (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
               sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                   * sx / n AS a,
               sxx - sx * sx / n AS cxx, sx / n AS xbar,
               ((syy - sy * sy / n)
                - (sxy - sx * sy / n) * (sxy - sx * sy / n)
                  / (sxx - sx * sx / n)) / (n - 2) AS s2
        FROM m
    ),
    diag AS (
        SELECT d.day, d.t,
               CAST(d.y AS DOUBLE) - (fit.a + fit.b * d.t) AS e,
               1.0 / fit.n + (d.t - fit.xbar) * (d.t - fit.xbar)
                   / fit.cxx AS h,
               fit.s2, fit.n
        FROM daily d, fit
    )
    SELECT day,
           CAST(ROUND(e, 4) AS DOUBLE) + 0.0 AS residual,
           CAST(ROUND(h, 6) AS DOUBLE) + 0.0 AS leverage,
           CAST(ROUND(e / sqrt(s2 * (1 - h)), 4) AS DOUBLE) + 0.0
               AS studentized,
           CAST(ROUND((e / sqrt(s2 * (1 - h)))
                * (e / sqrt(s2 * (1 - h))) * h / (2 * (1 - h)), 6)
               AS DOUBLE) + 0.0 AS cooks_d,
           (e / sqrt(s2 * (1 - h))) * (e / sqrt(s2 * (1 - h)))
               * h / (2 * (1 - h)) > 4.0 / n AS influential
    FROM diag
    """,
)
def regression_diagnostics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH days drive the fitted trend — the leverage/Cook's D sheet
    that should accompany any slope claim from theil_sen_q or
    trend_break_q."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(_dec(F.col("value"), 18, 6)).cast("double")
                / F.count(F.lit(1))
            )
            .cast("decimal(18,6)")
            .alias("y")
        )
        .withColumn("t", F.row_number().over(wday))
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("t").cast("long") * F.col("t"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("t") * F.col("y")).cast("double").alias("sxy"),
        F.sum(
            F.col("y").cast("decimal(16,6)")
            * F.col("y").cast("decimal(16,6)")
        )
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    fit = m.select(
        "n",
        (cxy / cxx).alias("b"),
        (F.col("sy") / n - cxy / cxx * F.col("sx") / n).alias("a"),
        cxx.alias("cxx"),
        (F.col("sx") / n).alias("xbar"),
        ((cyy - cxy * cxy / cxx) / (n - 2)).alias("s2"),
    )
    diag = daily.crossJoin(F.broadcast(fit)).select(
        "day",
        (
            F.col("y").cast("double")
            - (F.col("a") + F.col("b") * F.col("t"))
        ).alias("e"),
        (
            1.0 / F.col("n")
            + (F.col("t") - F.col("xbar"))
            * (F.col("t") - F.col("xbar"))
            / F.col("cxx")
        ).alias("h"),
        "s2",
        "n",
    )
    stud = F.col("e") / F.sqrt(F.col("s2") * (1 - F.col("h")))
    cd = stud * stud * F.col("h") / (2 * (1 - F.col("h")))
    return diag.select(
        "day",
        (F.round(F.col("e"), 4) + F.lit(0.0)).alias("residual"),
        (F.round(F.col("h"), 6) + F.lit(0.0)).alias("leverage"),
        (F.round(stud, 4) + F.lit(0.0)).alias("studentized"),
        (F.round(cd, 6) + F.lit(0.0)).alias("cooks_d"),
        (cd > 4.0 / F.col("n")).alias("influential"),
    )


# Box-Cox lambda selection for order prices by profile log-likelihood
# over the standard grid {-1, -0.5, 0, 0.5, 1}: LL(lambda) =
# -n/2 ln(var(y_lambda)) + (lambda - 1) sum(ln x). Per-lambda moments
# come from one corpus pass fanned out over the 5-row grid; the
# transform and variance are the accepted per-row float class
# (pow/ln), with DECIMAL-quantized sums.
@register(
    "boxcox_q",
    """
    WITH x AS (SELECT o_totalprice AS v FROM orders),
    lam AS (SELECT CAST(unnest([-1.0, -0.5, 0.0, 0.5, 1.0]) AS DOUBLE) AS l),
    t AS (
        SELECT lam.l, x.v,
               CASE WHEN lam.l = 0 THEN ln(x.v)
                    ELSE (pow(x.v, lam.l) - 1) / lam.l END AS y
        FROM x CROSS JOIN lam
    ),
    m AS (
        SELECT l, COUNT(*) AS n,
               CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE)
                   AS syy,
               CAST(SUM(CAST(ln(v) AS DECIMAL(28,12))) AS DOUBLE)
                   AS slnx
        FROM t GROUP BY l
    ),
    ll AS (
        SELECT l, n,
               -n / 2.0 * ln((syy - sy * sy / n) / n)
                   + (l - 1) * slnx AS loglik
        FROM m
    )
    SELECT l AS lambda,
           CAST(ROUND(loglik, 2) AS DOUBLE) + 0.0 AS profile_ll,
           loglik = (SELECT MAX(loglik) FROM ll) AS is_best
    FROM ll
    """,
)
def boxcox_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which power transform makes order prices most Gaussian? The
    winsorize/log decision (winsorize_prices, lang of skew_profile)
    made principled: profile likelihood over the canonical grid."""
    o = Catalog(spark, sf_dir).orders.select(
        F.col("o_totalprice").alias("v")
    )
    lam = o.sparkSession.createDataFrame(
        [(-1.0,), (-0.5,), (0.0,), (0.5,), (1.0,)], "l double"
    )
    t = o.crossJoin(F.broadcast(lam)).select(
        "l",
        "v",
        F.when(F.col("l") == 0, F.log("v"))
        .otherwise((F.pow(F.col("v"), F.col("l")) - 1) / F.col("l"))
        .alias("y"),
    )
    m = t.groupBy("l").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(28,12)"))
        .cast("double")
        .alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
        F.sum(F.log("v").cast("decimal(28,12)"))
        .cast("double")
        .alias("slnx"),
    )
    n = F.col("n")
    ll = m.select(
        "l",
        (
            -n / 2.0
            * F.log((F.col("syy") - F.col("sy") * F.col("sy") / n) / n)
            + (F.col("l") - 1) * F.col("slnx")
        ).alias("loglik"),
    )
    mx = ll.agg(F.max("loglik").alias("best"))
    return ll.crossJoin(F.broadcast(mx)).select(
        F.col("l").alias("lambda"),
        (F.round(F.col("loglik"), 2) + F.lit(0.0)).alias("profile_ll"),
        (F.col("loglik") == F.col("best")).alias("is_best"),
    )


# Youden-J optimal operating point for the roc_auc_q scorer: over the
# per-distinct-score ROC table, J(s) = TPR(s) - FPR(s) for the rule
# "predict positive when score >= s"; the report row is the
# J-maximizing threshold (ties -> smallest threshold). Same grouped-
# counts scale shape as roc_auc_q — windows run over the SCORE table.
@register(
    "youden_j_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(CAST(list_sum(list_transform(t, x -> length(x)))
                          AS DOUBLE) / len(t), 4) AS s
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    per_score AS (
        SELECT s, SUM(y) AS np, SUM(1 - y) AS nn
        FROM scored GROUP BY s
    ),
    c AS (
        SELECT s,
               SUM(np) OVER (ORDER BY s DESC) AS tp,
               SUM(nn) OVER (ORDER BY s DESC) AS fp,
               SUM(np) OVER () AS p_tot, SUM(nn) OVER () AS n_tot
        FROM per_score
    ),
    j AS (
        SELECT s,
               CAST(tp AS DOUBLE) / p_tot AS tpr,
               CAST(fp AS DOUBLE) / n_tot AS fpr,
               CAST(tp AS DOUBLE) / p_tot - CAST(fp AS DOUBLE) / n_tot
                   AS youden,
               ROW_NUMBER() OVER (ORDER BY
                   CAST(tp AS DOUBLE) / p_tot
                   - CAST(fp AS DOUBLE) / n_tot DESC, s) AS rk
        FROM c
    )
    SELECT s AS threshold,
           CAST(ROUND(tpr, 6) AS DOUBLE) + 0.0 AS tpr,
           CAST(ROUND(fpr, 6) AS DOUBLE) + 0.0 AS fpr,
           CAST(ROUND(youden, 6) AS DOUBLE) + 0.0 AS youden_j
    FROM j WHERE rk = 1
    """,
)
def youden_j_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE to cut the score once roc_auc_q says it ranks well —
    the sensitivity+specificity-maximizing threshold."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(
            F.aggregate(
                t, F.lit(0), lambda a, x: a + F.length(x)
            ).cast("double")
            / F.size(t),
            4,
        ).alias("s"),
    ).filter(F.size(t) > 0)
    per_score = scored.groupBy("s").agg(
        F.sum("y").alias("np"), F.sum(1 - F.col("y")).alias("nn")
    )
    wc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = per_score.select(
        "s",
        F.sum("np").over(wc).alias("tp"),
        F.sum("nn").over(wc).alias("fp"),
        F.sum("np").over(wt).alias("p_tot"),
        F.sum("nn").over(wt).alias("n_tot"),
    )
    tpr = F.col("tp").cast("double") / F.col("p_tot")
    fpr = F.col("fp").cast("double") / F.col("n_tot")
    wj = Window.orderBy((tpr - fpr).desc(), F.col("s"))
    j = c.select(
        "s",
        tpr.alias("tpr"),
        fpr.alias("fpr"),
        (tpr - fpr).alias("youden"),
        F.row_number().over(wj).alias("rk"),
    )
    return j.filter(F.col("rk") == 1).select(
        F.col("s").alias("threshold"),
        (F.round(F.col("tpr"), 6) + F.lit(0.0)).alias("tpr"),
        (F.round(F.col("fpr"), 6) + F.lit(0.0)).alias("fpr"),
        (F.round(F.col("youden"), 6) + F.lit(0.0)).alias("youden_j"),
    )


# Expected calibration error (10 equal-width bins over [0, 1]) for
# the score/10 forecast: ECE = sum_k n_k/n |acc_k - conf_k|, with bin
# keys from PURE INTEGER arithmetic (isotonic_calibration_q's lesson:
# never key bins on a rounded double). conf_k averages the exact
# integer 1000p values; the only floats are the final ratios.
@register(
    "ece_q",
    f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               100 * list_sum(list_transform(t, x -> length(x)))
                   // len(t) AS p_mil
        FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) > 0
    ),
    b AS (
        SELECT least(p_mil // 100, 9) AS bin,
               COUNT(*) AS n_k, SUM(y) AS pos_k,
               SUM(p_mil) AS conf_sum
        FROM scored GROUP BY 1
    ),
    tot AS (SELECT SUM(n_k) AS n FROM b)
    SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(ROUND(SUM(CAST(n_k AS DOUBLE) / (SELECT n FROM tot)
               * abs(CAST(pos_k AS DOUBLE) / n_k
                     - CAST(conf_sum AS DOUBLE) / n_k / 1000)), 6)
               AS DOUBLE) + 0.0 AS ece
    FROM b
    """,
)
def ece_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-number calibration score modern model cards quote —
    complements brier_decomposition_q (which decomposes the same gap)
    and isotonic_calibration_q (which repairs it)."""
    d = Catalog(spark, sf_dir).documents
    t = _tokens("text")
    p_mil = (
        (
            100
            * F.aggregate(
                t, F.lit(0), lambda a, x: a + F.length(x)
            ).cast("long")
        )
        / F.size(t)
    ).cast("long")
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        p_mil.alias("p_mil"),
    ).filter(F.size(t) > 0)
    b = scored.groupBy(
        F.least(F.expr("p_mil div 100"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("y").alias("pos_k"),
        F.sum("p_mil").alias("conf_sum"),
    )
    tot = b.agg(F.sum("n_k").alias("n"))
    term = (
        F.col("n_k").cast("double")
        / F.col("n")
        * F.abs(
            F.col("pos_k").cast("double") / F.col("n_k")
            - F.col("conf_sum").cast("double") / F.col("n_k") / 1000
        )
    )
    return b.crossJoin(F.broadcast(tot)).agg(
        F.max("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        (F.round(F.sum(term), 6) + F.lit(0.0)).alias("ece"),
    )


# Lorenz curve of customer account balance (shifted to nonnegative by
# the global minimum so shares are well-defined): per population
# decile from global_ntile, the cumulative share of total shifted
# balance — gini_q's curve, point by point. Decile cuts and cumulative
# shares are exact integer/decimal arithmetic.
@register(
    "lorenz_curve_q",
    """
    WITH mn AS (
        SELECT CAST(MIN(c_acctbal) AS DECIMAL(18,6)) AS lo
        FROM customer
    ),
    v AS (
        SELECT c_custkey,
               CAST(c_acctbal AS DECIMAL(18,6)) - (SELECT lo FROM mn)
                   AS w
        FROM customer
    ),
    tiled AS (
        SELECT w, NTILE(10) OVER (ORDER BY w, c_custkey) AS decile
        FROM v
    ),
    d AS (
        SELECT decile, COUNT(*) AS n, SUM(w) AS s
        FROM tiled GROUP BY decile
    )
    SELECT decile,
           CAST(n AS BIGINT) AS n_customers,
           CAST(ROUND(CAST(SUM(s) OVER (ORDER BY decile) AS DOUBLE)
               / (SELECT CAST(SUM(w) AS DOUBLE) FROM v), 6) AS DOUBLE)
               AS cum_share
    FROM d
    """,
)
def lorenz_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inequality curve behind gini_q/theil_index_q's scalars:
    cumulative share of (shifted) balance held by the bottom k
    deciles. Deciles come from the range-partitioned global_ntile."""
    from iniz_exporters_spark.operators.indexing import global_ntile

    c = Catalog(spark, sf_dir).customer
    mn = c.agg(
        F.min("c_acctbal").cast("decimal(18,6)").alias("lo")
    )
    v = c.crossJoin(F.broadcast(mn)).select(
        "c_custkey",
        (_dec(F.col("c_acctbal"), 18, 6) - F.col("lo")).alias("w"),
    )
    tiled = global_ntile(
        v, [F.col("w").asc(), F.col("c_custkey").asc()], 10, "decile"
    )
    d = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
    )
    tot = v.agg(F.sum("w").cast("double").alias("tw"))
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "decile",
        F.col("n").cast("long").alias("n_customers"),
        F.round(
            F.sum("s").over(wcum).cast("double") / F.col("tw"), 6
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 6 (continued): offline policy evaluation by
# replay, entropic optimal transport (Sinkhorn), per-edge triangle
# support (the k-truss building block), the mutual-kNN graph quality
# read, and PACF via the Durbin-Levinson recursion on acf_q's moments.
# ---------------------------------------------------------------------------


# Offline bandit replay: the greedy policy "play the event type with
# the best running mean so far" is evaluated against the uniform
# logging policy, day by day. For each day, the policy's arm is the
# argmax of PRIOR days' cumulative mean (ties -> alphabetical arm;
# day 1 has no history and is skipped); its reward is that day's
# realized mean for the chosen arm. Reports the replay estimate and
# the uniform baseline. Running means are exact-decimal ratios over
# the calendar-bounded (day x arm) frame.
@register(
    "bandit_replay_q",
    """
    WITH dt AS (
        SELECT CAST(ts AS DATE) AS day, event_type AS arm,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS r
        FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    hist AS (
        SELECT day, arm, r,
               SUM(r) OVER (PARTITION BY arm ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_sum,
               COUNT(r) OVER (PARTITION BY arm ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_n
        FROM dt
    ),
    choice AS (
        SELECT day, arm, r,
               ROW_NUMBER() OVER (PARTITION BY day
                   ORDER BY prior_sum / prior_n DESC, arm) AS rk
        FROM hist WHERE prior_n > 0
    )
    SELECT CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_days_played,
           CAST(ROUND(CAST(SUM(CASE WHEN rk = 1 THEN CAST(r
                AS DECIMAL(18,6)) END) AS DOUBLE)
               / SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END), 6)
               AS DOUBLE) + 0.0 AS greedy_value,
           CAST(ROUND(CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS DOUBLE) + 0.0 AS uniform_value
    FROM choice
    """,
)
def bandit_replay_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would greedy arm selection have beaten uniform logging? The
    replay estimator over the daily arm-reward table; uniform_value
    averages ALL arms' rewards on the played days (what the logger
    collected), greedy_value only the chosen arm's."""
    e = Catalog(spark, sf_dir).events
    dt = e.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type").alias("arm")
    ).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        ).alias("r")
    )
    wprior = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = dt.select(
        "day",
        "arm",
        "r",
        F.sum("r").over(wprior).alias("prior_sum"),
        F.count("r").over(wprior).alias("prior_n"),
    ).filter(F.col("prior_n") > 0)
    wday = Window.partitionBy("day").orderBy(
        (F.col("prior_sum") / F.col("prior_n")).desc(), F.col("arm")
    )
    choice = hist.withColumn("rk", F.row_number().over(wday))
    is_pick = F.when(F.col("rk") == 1, 1).otherwise(0)
    return choice.agg(
        F.sum(is_pick).cast("long").alias("n_days_played"),
        (
            F.round(
                F.sum(
                    F.when(
                        F.col("rk") == 1,
                        F.col("r").cast("decimal(18,6)"),
                    )
                ).cast("double")
                / F.sum(is_pick),
                6,
            )
            + F.lit(0.0)
        ).alias("greedy_value"),
        (
            F.round(
                F.sum(F.col("r").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            )
            + F.lit(0.0)
        ).alias("uniform_value"),
    )


# Entropic optimal transport between the label distributions of the
# two embedding cohorts (vec_id parity), three unrolled Sinkhorn
# scalings: cost = squared distance between per-(cohort, label)
# centroids, kernel K = exp(-cost / 0.5), u/v updated alternately
# from the marginals. Everything after ONE corpus pass (centroids +
# masses) is arithmetic on the 10 x 10 label matrix; exp is the
# accepted per-cell float class (100 cells, not per-row).
@register(
    "sinkhorn_plan_q",
    """
    WITH e AS (
        SELECT vec_id % 2 AS grp, label,
               CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings
    ),
    cent AS (
        SELECT grp, label, COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS cx,
               CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS cy
        FROM e GROUP BY grp, label
    ),
    mass AS (
        SELECT grp, label,
               CAST(n AS DOUBLE)
                   / SUM(n) OVER (PARTITION BY grp) AS m
        FROM cent
    ),
    kmat AS (
        SELECT a.label AS la, b.label AS lb,
               exp(-((a.cx - b.cx) * (a.cx - b.cx)
                     + (a.cy - b.cy) * (a.cy - b.cy)) / 0.5) AS kv,
               ma.m AS mu, mb.m AS nu
        FROM cent a JOIN cent b ON a.grp = 0 AND b.grp = 1
        JOIN mass ma ON ma.grp = 0 AND ma.label = a.label
        JOIN mass mb ON mb.grp = 1 AND mb.label = b.label
    ),
    u1 AS (
        SELECT la, MAX(mu) / SUM(kv * 1.0) AS u FROM kmat GROUP BY la
    ),
    v1 AS (
        SELECT lb, MAX(nu) / SUM(kv * u1.u) AS v
        FROM kmat JOIN u1 USING (la) GROUP BY lb
    ),
    u2 AS (
        SELECT la, MAX(mu) / SUM(kv * v1.v) AS u
        FROM kmat JOIN v1 USING (lb) GROUP BY la
    ),
    v2 AS (
        SELECT lb, MAX(nu) / SUM(kv * u2.u) AS v
        FROM kmat JOIN u2 USING (la) GROUP BY lb
    ),
    u3 AS (
        SELECT la, MAX(mu) / SUM(kv * v2.v) AS u
        FROM kmat JOIN v2 USING (lb) GROUP BY la
    ),
    v3 AS (
        SELECT lb, MAX(nu) / SUM(kv * u3.u) AS v
        FROM kmat JOIN u3 USING (la) GROUP BY lb
    ),
    plan AS (
        SELECT k.la, k.lb, u3.u * k.kv * v3.v AS p
        FROM kmat k JOIN u3 USING (la) JOIN v3 USING (lb)
    )
    SELECT CAST(la AS BIGINT) AS label_from,
           CAST(lb AS BIGINT) AS label_to,
           CAST(ROUND(p, 6) AS DOUBLE) + 0.0 AS mass
    FROM plan WHERE ROUND(p, 6) > 0
    """,
)
def sinkhorn_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How must cohort-0's label mass flow to look like cohort-1's,
    moving cheaply in embedding space? Three Sinkhorn scalings on the
    10x10 centroid-cost kernel; only entries above 1e-6 ship."""
    emb = Catalog(spark, sf_dir).embeddings
    e = emb.select(
        (F.col("vec_id") % 2).alias("grp"),
        "label",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    cent = e.groupBy("grp", "label").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cx"),
        (
            F.sum(F.col("y").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cy"),
    )
    wg = Window.partitionBy("grp")
    mass = cent.select(
        "grp",
        "label",
        (F.col("n").cast("double") / F.sum("n").over(wg)).alias("m"),
    )
    a = (
        cent.filter(F.col("grp") == 0)
        .join(
            mass.filter(F.col("grp") == 0).select(
                F.col("label").alias("label"), F.col("m").alias("mu")
            ),
            "label",
        )
        .select(
            F.col("label").alias("la"),
            F.col("cx").alias("ax"),
            F.col("cy").alias("ay"),
            "mu",
        )
    )
    b = (
        cent.filter(F.col("grp") == 1)
        .join(
            mass.filter(F.col("grp") == 1).select(
                F.col("label").alias("label"), F.col("m").alias("nu")
            ),
            "label",
        )
        .select(
            F.col("label").alias("lb"),
            F.col("cx").alias("bx"),
            F.col("cy").alias("by"),
            "nu",
        )
    )
    kmat = a.crossJoin(b).select(
        "la",
        "lb",
        "mu",
        "nu",
        F.exp(
            -(
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by"))
                * (F.col("ay") - F.col("by"))
            )
            / 0.5
        ).alias("kv"),
    )
    u = kmat.groupBy("la").agg(
        (F.max("mu") / F.sum(F.col("kv") * 1.0)).alias("u")
    )

    def v_step(u_df):
        return (
            kmat.join(F.broadcast(u_df), "la")
            .groupBy("lb")
            .agg(
                (F.max("nu") / F.sum(F.col("kv") * F.col("u"))).alias(
                    "v"
                )
            )
        )

    def u_step(v_df):
        return (
            kmat.join(F.broadcast(v_df), "lb")
            .groupBy("la")
            .agg(
                (F.max("mu") / F.sum(F.col("kv") * F.col("v"))).alias(
                    "u"
                )
            )
        )

    # exactly the oracle's schedule: u1 -> v1 -> u2 -> v2 -> u3 -> v3,
    # plan = u3 (x) K (x) v3 — one extra half-step would only agree by
    # convergence luck
    for _ in range(2):
        u = u_step(v_step(u))
    v = v_step(u)
    plan = (
        kmat.join(F.broadcast(u), "la")
        .join(F.broadcast(v), "lb")
        .select(
            "la",
            "lb",
            (F.col("u") * F.col("kv") * F.col("v")).alias("p"),
        )
    )
    return plan.filter(F.round(F.col("p"), 6) > 0).select(
        F.col("la").cast("long").alias("label_from"),
        F.col("lb").cast("long").alias("label_to"),
        (F.round(F.col("p"), 6) + F.lit(0.0)).alias("mass"),
    )


# Per-edge triangle support on the part co-purchase graph (parts
# sharing >= 2 orders, to keep the graph sparse): support(u,v) =
# |N(u) n N(v)|, the quantity k-truss peeling iterates on; edges with
# support >= 1 are the 3-truss. Candidate edges and common-neighbor
# counts both come from order-key joins (never all-pairs); the
# wedge-join fans out per shared neighbor, bounded by degree.
@register(
    "edge_support_q",
    """
    WITH op AS (
        SELECT DISTINCT l.l_orderkey AS o, l.l_partkey AS p
        FROM lineitem l
    ),
    edges AS (
        SELECT a.p AS u, b.p AS v
        FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ),
    und AS (
        SELECT u, v FROM edges
        UNION ALL SELECT v, u FROM edges
    ),
    support AS (
        SELECT e.u, e.v, COUNT(w2.v) AS sup
        FROM edges e
        LEFT JOIN und w1 ON w1.u = e.u
        LEFT JOIN und w2 ON w2.u = e.v AND w2.v = w1.v
        GROUP BY e.u, e.v
    )
    SELECT CAST(sup AS BIGINT) AS support,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           sup >= 1 AS in_3truss
    FROM support GROUP BY sup
    """,
)
def edge_support_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How embedded is each co-purchase tie? The support histogram is
    the first k-truss peeling round — support 0 edges are bridges no
    community algorithm should keep (clustering_coeff_q gives the
    node-level view of the same wedges)."""
    li = Catalog(spark, sf_dir).lineitem
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b = op.select(F.col("o").alias("o2"), F.col("p").alias("v"))
    edges = (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("u", "v")
    )
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w1 = und.select(F.col("u").alias("eu"), F.col("v").alias("n1"))
    w2 = und.select(F.col("u").alias("ev"), F.col("v").alias("n2"))
    support = (
        edges.join(w1, edges["u"] == w1["eu"], "left")
        .join(
            w2,
            (edges["v"] == w2["ev"]) & (F.col("n2") == F.col("n1")),
            "left",
        )
        .groupBy("u", "v")
        .agg(F.count("n2").alias("sup"))
    )
    return support.groupBy(
        F.col("sup").cast("long").alias("support")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.first(F.col("sup") >= 1).alias("in_3truss"),
    )


# Mutual-kNN graph statistics over the embeddings: an edge (a, b) is
# MUTUAL when each is in the other's 5-NN; the mutual rate and degree
# histogram are the standard symmetrization-quality read before
# building a kNN graph for clustering. Reuses the parallelized
# hubness pair stage at test scale; the mutual check is a self-join
# of the directed top-5 list on the reversed pair.
@register(
    "mutual_knn_q",
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ROUND(list_reduce(
                       list_transform(range(1, len(c.v)+1),
                           i -> (c.v[i] - q.v[i]) * (c.v[i] - q.v[i])),
                       (x, y) -> x + y), 6), c.vec_id) AS rn
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
    ),
    knn AS (SELECT qid, cid FROM scored WHERE rn <= 5),
    mutual AS (
        SELECT a.qid AS u, a.cid AS v
        FROM knn a JOIN knn b ON b.qid = a.cid AND b.cid = a.qid
        WHERE a.qid < a.cid
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM mutual
            UNION ALL SELECT v FROM mutual
        ) GROUP BY node
    )
    SELECT CAST((SELECT COUNT(*) FROM mutual) AS BIGINT)
               AS n_mutual_edges,
           CAST(ROUND(2.0 * (SELECT COUNT(*) FROM mutual)
               / (SELECT COUNT(*) FROM knn), 6) AS DOUBLE)
               AS mutual_rate,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT)
               AS n_connected_points,
           CAST((SELECT MAX(d) FROM deg) AS BIGINT) AS max_degree
    """,
)
def mutual_knn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How symmetric is the 5-NN relation? Low mutual_rate = hub
    pollution (hubness_q quantifies the culprit); the mutual graph is
    what robust kNN clustering should run on."""
    e = Catalog(spark, sf_dir).embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )
    e = e.repartition(
        spark.sparkContext.defaultParallelism, F.col("vec_id")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", F.col("vec_id").alias("cid"), d2.alias("d2")
        )
    )
    w = Window.partitionBy("qid").orderBy("d2", "cid")
    knn = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "cid")
    )
    rev = knn.select(
        F.col("qid").alias("cid2"), F.col("cid").alias("qid2")
    )
    mutual = knn.join(
        rev,
        (knn["qid"] == F.col("qid2")) & (knn["cid"] == F.col("cid2")),
    ).filter(F.col("qid") < F.col("cid"))
    deg = (
        mutual.select(F.col("qid").alias("node"))
        .unionByName(mutual.select(F.col("cid").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    nm = mutual.agg(F.count(F.lit(1)).alias("nm"))
    nk = knn.agg(F.count(F.lit(1)).alias("nk"))
    dd = deg.agg(
        F.count(F.lit(1)).alias("np"), F.max("d").alias("md")
    )
    return (
        nm.crossJoin(F.broadcast(nk))
        .crossJoin(F.broadcast(dd))
        .select(
            F.col("nm").cast("long").alias("n_mutual_edges"),
            F.round(2.0 * F.col("nm") / F.col("nk"), 6).alias(
                "mutual_rate"
            ),
            F.col("np").cast("long").alias("n_connected_points"),
            F.col("md").cast("long").alias("max_degree"),
        )
    )


# Partial autocorrelation at lags 1-3 via the Durbin-Levinson
# recursion on acf_q's sample autocorrelations: phi11 = r1,
# phi22 = (r2 - r1^2)/(1 - r1^2), phi33 from the order-2 forward
# coefficients — pure scalar arithmetic on three decimal-exact ACF
# values, spelled identically in both engines.
@register(
    "pacf_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    mu AS (
        SELECT CAST(CAST(SUM(m) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6))
            AS ybar
        FROM daily
    ),
    dev AS (
        SELECT day, CAST(m - (SELECT ybar FROM mu) AS DECIMAL(16,6))
            AS d
        FROM daily
    ),
    r AS (
        SELECT l.lag,
               CAST(SUM(d1.d * d2.d) AS DOUBLE)
               / (SELECT CAST(SUM(d * d) AS DOUBLE) FROM dev) AS acf
        FROM (SELECT unnest(range(1, 4)) AS lag) l
        JOIN dev d1 ON TRUE
        JOIN dev d2 ON d2.day = d1.day + CAST(l.lag AS INTEGER)
        GROUP BY l.lag
    ),
    w AS (
        SELECT MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
               MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
               MAX(CASE WHEN lag = 3 THEN acf END) AS r3
        FROM r
    ),
    dl AS (
        SELECT r1 AS phi11,
               (r2 - r1 * r1) / (1 - r1 * r1) AS phi22,
               r1 * (1 - (r2 - r1 * r1) / (1 - r1 * r1)) AS phi21,
               r1, r2, r3
        FROM w
    )
    SELECT CAST(ROUND(phi11, 6) AS DOUBLE) + 0.0 AS pacf_1,
           CAST(ROUND(phi22, 6) AS DOUBLE) + 0.0 AS pacf_2,
           CAST(ROUND((r3 - phi21 * r2 - phi22 * r1)
               / (1 - phi21 * r1 - phi22 * r2), 6) AS DOUBLE) + 0.0
               AS pacf_3
    FROM dl
    """,
)
def pacf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR-order identification: the partial correlogram companion to
    acf_q (an AR(p) series cuts off after lag p here while the plain
    ACF tails on)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    mu = daily.agg(
        (F.sum("m").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("ybar")
    )
    dev = daily.crossJoin(F.broadcast(mu)).select(
        "day",
        (F.col("m") - F.col("ybar")).cast("decimal(16,6)").alias("d"),
    )
    den = dev.agg(
        F.sum(F.col("d") * F.col("d")).cast("double").alias("ss")
    )
    lags = daily.sparkSession.range(1, 4).select(
        F.col("id").cast("int").alias("lag")
    )
    d1 = dev.select(F.col("day").alias("day1"), F.col("d").alias("a"))
    d2 = dev.select(F.col("day").alias("day2"), F.col("d").alias("b"))
    r = (
        d1.crossJoin(F.broadcast(lags))
        .join(
            d2,
            F.col("day2") == F.date_add(F.col("day1"), F.col("lag")),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("a") * F.col("b")).alias("sab"))
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            (F.col("sab").cast("double") / F.col("ss")).alias("acf"),
        )
    )

    def at(lag):
        return F.max(F.when(F.col("lag") == lag, F.col("acf")))

    w = r.agg(at(1).alias("r1"), at(2).alias("r2"), at(3).alias("r3"))
    phi22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1 - F.col("r1") * F.col("r1")
    )
    phi21 = F.col("r1") * (1 - phi22)
    return w.select(
        (F.round(F.col("r1"), 6) + F.lit(0.0)).alias("pacf_1"),
        (F.round(phi22, 6) + F.lit(0.0)).alias("pacf_2"),
        (
            F.round(
                (F.col("r3") - phi21 * F.col("r2") - phi22 * F.col("r1"))
                / (1 - phi21 * F.col("r1") - phi22 * F.col("r2")),
                6,
            )
            + F.lit(0.0)
        ).alias("pacf_3"),
    )


# ---------------------------------------------------------------------------
# Batch — round-8 session 6 (continued): renewal & sequential
# statistics — Allan variance across dyadic block sizes, two classic
# distribution-free randomness tests (turning points, records), a
# peaks-over-threshold GPD moment fit, and the index-of-dispersion
# Poissonness check. All on calendar-bounded daily frames with exact
# DECIMAL values.
# ---------------------------------------------------------------------------


# Allan variance of daily purchase revenue at block sizes 1/2/4/8:
# AVAR(tau) = mean of (block_mean_{k+1} - block_mean_k)^2 / 2 over
# adjacent non-overlapping blocks — the drift-vs-noise separator
# clock people use, equally at home on metric streams. Block SUMS
# stay exact decimals (dividing by tau early would quantize a double
# at a guaranteed .5 boundary); adjacent pairs meet via block-id+1
# join and tau^2 divides once at the end.
@register(
    "allan_variance_q",
    """
    WITH daily AS (
        SELECT ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) - 1 AS i,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    taus AS (SELECT unnest([1, 2, 4, 8]) AS tau),
    blocks AS (
        -- keep the EXACT block sum; dividing by tau here would quantize
        -- a double at a guaranteed .5 boundary (6-dp sums / 2). The tau
        -- division happens once, at the end: AVAR = sum((Sb-Sa)^2)
        -- / (2 n tau^2).
        SELECT taus.tau, d.i // taus.tau AS blk,
               SUM(d.m) AS bs, COUNT(*) AS n_in
        FROM daily d CROSS JOIN taus
        GROUP BY taus.tau, d.i // taus.tau
        HAVING COUNT(*) = taus.tau
    ),
    pairs AS (
        SELECT a.tau, CAST(b.bs - a.bs AS DOUBLE) AS d
        FROM blocks a JOIN blocks b
            ON b.tau = a.tau AND b.blk = a.blk + 1
    )
    SELECT CAST(tau AS BIGINT) AS tau_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(ROUND(CAST(SUM(CAST(d * d AS DECIMAL(28,12)))
                AS DOUBLE) / (2.0 * COUNT(*) * tau * tau), 6)
               AS DOUBLE) + 0.0 AS allan_var
    FROM pairs GROUP BY tau
    """,
)
def allan_variance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """White noise slopes down with tau, drift flattens or rises —
    the multi-scale stability read next to hurst_exponent_q. Partial
    trailing blocks are dropped (HAVING n = tau) in both engines."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    wday = Window.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(_dec(F.col("value"), 18, 6)).cast("double")
                / F.count(F.lit(1))
            )
            .cast("decimal(18,6)")
            .alias("m")
        )
        .select((F.row_number().over(wday) - 1).alias("i"), "m")
    )
    taus = daily.sparkSession.createDataFrame(
        [(1,), (2,), (4,), (8,)], "tau int"
    )
    blocks = (
        daily.crossJoin(F.broadcast(taus))
        .groupBy("tau", F.expr("i div tau").alias("blk"))
        .agg(
            F.sum("m").alias("bs"),
            F.count(F.lit(1)).alias("n_in"),
        )
        .filter(F.col("n_in") == F.col("tau"))
    )
    a = blocks.select(
        F.col("tau").alias("ta"), F.col("blk").alias("ba"),
        F.col("bs").alias("sa"),
    )
    b = blocks.select(
        F.col("tau").alias("tb"), F.col("blk").alias("bb"),
        F.col("bs").alias("sb"),
    )
    pairs = a.join(
        b,
        (F.col("tb") == F.col("ta")) & (F.col("bb") == F.col("ba") + 1),
    ).select(
        F.col("ta").alias("tau"),
        (F.col("sb") - F.col("sa")).cast("double").alias("d"),
    )
    return pairs.groupBy("tau").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (
            F.round(
                _dsum(F.col("d") * F.col("d")).cast("double")
                / (
                    2.0
                    * F.count(F.lit(1))
                    * F.col("tau")
                    * F.col("tau")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("allan_var"),
    ).select(
        F.col("tau").cast("long").alias("tau_days"),
        "n_pairs",
        "allan_var",
    )


# Turning-points randomness test on daily revenue: count local
# extrema (strictly higher or lower than both neighbors); under iid,
# E = 2(n-2)/3 and Var = (16n - 29)/90; z = (T - E)/sqrt(Var).
# Neighbor comparisons are exact DECIMALs via LAG/LEAD on the daily
# frame.
@register(
    "turning_points_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    tp AS (
        SELECT day, m,
               LAG(m) OVER (ORDER BY day) AS pm,
               LEAD(m) OVER (ORDER BY day) AS nm,
               COUNT(*) OVER () AS n
        FROM daily
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN (m > pm AND m > nm)
                      OR (m < pm AND m < nm) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_turning,
           CAST(ROUND((SUM(CASE WHEN (m > pm AND m > nm)
                      OR (m < pm AND m < nm) THEN 1 ELSE 0 END)
                   - 2.0 * (MAX(n) - 2) / 3)
               / sqrt((16.0 * MAX(n) - 29) / 90), 6) AS DOUBLE) + 0.0
               AS z_stat
    FROM tp WHERE pm IS NOT NULL AND nm IS NOT NULL
    """,
)
def turning_points_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Too few turning points = trending/smooth, too many =
    oscillating — the second classic randomness read next to
    runs_test_q (which scores sign runs, not extrema)."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wday = Window.orderBy("day")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tp = daily.select(
        "m",
        F.lag("m").over(wday).alias("pm"),
        F.lead("m").over(wday).alias("nm"),
        F.count(F.lit(1)).over(wt).alias("n"),
    ).filter(F.col("pm").isNotNull() & F.col("nm").isNotNull())
    is_turn = F.when(
        ((F.col("m") > F.col("pm")) & (F.col("m") > F.col("nm")))
        | ((F.col("m") < F.col("pm")) & (F.col("m") < F.col("nm"))),
        1,
    ).otherwise(0)
    return tp.agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum(is_turn).cast("long").alias("n_turning"),
        (
            F.round(
                (F.sum(is_turn) - 2.0 * (F.max("n") - 2) / 3)
                / F.sqrt((16.0 * F.max("n") - 29) / 90),
                6,
            )
            + F.lit(0.0)
        ).alias("z_stat"),
    )


# Records test: the count of running maxima in the daily revenue
# series; under iid the expectation is the harmonic number H_n and
# the variance H_n - H_n^(2). The harmonic sums come from a range
# table (n rows, calendar-bounded), the record indicator from an
# exact running max.
@register(
    "records_test_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*) AS DECIMAL(18,6)) AS m
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    rec AS (
        SELECT day, m,
               CASE WHEN m > MAX(m) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING)
                    OR LAG(m) OVER (ORDER BY day) IS NULL
                    THEN 1 ELSE 0 END AS is_rec,
               COUNT(*) OVER () AS n
        FROM daily
    ),
    h AS (
        SELECT SUM(1.0 / k) AS h1, SUM(1.0 / (k * k)) AS h2
        FROM (SELECT unnest(range(1, (SELECT MAX(n) FROM rec) + 1))
                  AS k)
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(SUM(is_rec) AS BIGINT) AS n_records,
           CAST(ROUND((SELECT h1 FROM h), 6) AS DOUBLE) + 0.0
               AS expected,
           CAST(ROUND((SUM(is_rec) - (SELECT h1 FROM h))
               / sqrt((SELECT h1 - h2 FROM h)), 6) AS DOUBLE) + 0.0
               AS z_stat
    FROM rec
    """,
)
def records_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are new revenue highs arriving faster than chance? Record
    counts grow like ln n under iid; a surplus means trend."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (
            F.sum(_dec(F.col("value"), 18, 6)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("decimal(18,6)")
        .alias("m")
    )
    wday = Window.orderBy("day")
    wprev = wday.rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rec = daily.select(
        "m",
        F.when(
            (F.col("m") > F.max("m").over(wprev))
            | F.lag("m").over(wday).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_rec"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    nmax = daily.agg(F.count(F.lit(1)).alias("nn"))
    h = (
        daily.sparkSession.range(1, 10000)
        .crossJoin(F.broadcast(nmax))
        .filter(F.col("id") <= F.col("nn"))
        .agg(
            F.sum(1.0 / F.col("id")).alias("h1"),
            F.sum(1.0 / (F.col("id") * F.col("id"))).alias("h2"),
        )
    )
    return rec.crossJoin(F.broadcast(h)).agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum("is_rec").cast("long").alias("n_records"),
        (F.round(F.max("h1"), 6) + F.lit(0.0)).alias("expected"),
        (
            F.round(
                (F.sum("is_rec") - F.max("h1"))
                / F.sqrt(F.max("h1") - F.max("h2")),
                6,
            )
            + F.lit(0.0)
        ).alias("z_stat"),
    )


# Peaks-over-threshold GPD moment fit on daily LOSSES (the cvar_q
# P&L): threshold u = the 5th-largest loss (a fixed order statistic
# so the excess set is deterministic); method-of-moments shape
# xi = (1 - mean^2/var)/2 and scale beta = mean (mean^2/var + 1)/2
# from the excess mean/variance. The EVT tail read beyond cvar_q's
# empirical quantile. All ranking on the calendar frame.
@register(
    "pot_evt_q",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    ),
    pnl AS (
        SELECT day,
               (SELECT CAST(CAST(SUM(rev) AS DOUBLE) / COUNT(*)
                    AS DECIMAL(18,6)) FROM daily) - rev AS loss
        FROM daily
    ),
    r AS (
        SELECT loss, ROW_NUMBER() OVER (ORDER BY loss DESC, day) AS k
        FROM pnl
    ),
    u AS (SELECT loss AS thr FROM r WHERE k = 5),
    exc AS (
        SELECT CAST(loss - (SELECT thr FROM u) AS DOUBLE) AS e
        FROM r WHERE k < 5
    ),
    m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(e AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS mu,
               CAST(SUM(CAST(e * e AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS m2
        FROM exc
    )
    SELECT CAST(n AS BIGINT) AS n_excesses,
           CAST(ROUND((SELECT CAST(thr AS DOUBLE) FROM u), 2)
               AS DOUBLE) + 0.0 AS threshold,
           CAST(ROUND((1 - mu * mu / (m2 - mu * mu)) / 2, 6)
               AS DOUBLE) + 0.0 AS gpd_shape,
           CAST(ROUND(mu * (mu * mu / (m2 - mu * mu) + 1) / 2, 4)
               AS DOUBLE) + 0.0 AS gpd_scale
    FROM m
    """,
)
def pot_evt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How heavy is the loss tail BEYOND the observed quantile?
    Positive shape = Pareto-heavy (cvar_q underestimates), negative =
    bounded tail. Moment fit over the top-4 excesses at this scale."""
    e = Catalog(spark, sf_dir).events.filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(_dec(F.col("value"), 18, 6)).alias("rev")
    )
    mu0 = daily.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1)))
        .cast("decimal(18,6)")
        .alias("mu")
    )
    pnl = daily.crossJoin(F.broadcast(mu0)).select(
        "day", (F.col("mu") - F.col("rev")).alias("loss")
    )
    wk = Window.orderBy(F.col("loss").desc(), F.col("day"))
    r = pnl.select("loss", F.row_number().over(wk).alias("k"))
    u = r.filter(F.col("k") == 5).select(F.col("loss").alias("thr"))
    exc = (
        r.filter(F.col("k") < 5)
        .crossJoin(F.broadcast(u))
        .select((F.col("loss") - F.col("thr")).cast("double").alias("e"))
    )
    m = exc.crossJoin(F.broadcast(u)).agg(
        F.count(F.lit(1)).alias("n"),
        (_dsum(F.col("e")).cast("double") / F.count(F.lit(1))).alias(
            "mu"
        ),
        (
            _dsum(F.col("e") * F.col("e")).cast("double")
            / F.count(F.lit(1))
        ).alias("m2"),
        F.max("thr").alias("thr"),
    )
    var = F.col("m2") - F.col("mu") * F.col("mu")
    return m.select(
        F.col("n").cast("long").alias("n_excesses"),
        (
            F.round(F.col("thr").cast("double"), 2) + F.lit(0.0)
        ).alias("threshold"),
        (
            F.round((1 - F.col("mu") * F.col("mu") / var) / 2, 6)
            + F.lit(0.0)
        ).alias("gpd_shape"),
        (
            F.round(
                F.col("mu")
                * (F.col("mu") * F.col("mu") / var + 1)
                / 2,
                4,
            )
            + F.lit(0.0)
        ).alias("gpd_scale"),
    )


# Index-of-dispersion Poissonness check per event type: IoD =
# var/mean of DAILY COUNTS (sample variance), chi2 = (n-1) IoD. IoD
# >> 1 flags overdispersion (bursty arrivals), << 1 regular spacing.
# Counts are exact integers; one (type, day) aggregation feeds a
# 5-row moment table.
@register(
    "poissonness_q",
    """
    WITH dc AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    m AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(c) AS DOUBLE) AS s,
               CAST(SUM(c * c) AS DOUBLE) AS ss
        FROM dc GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(ROUND(s / n, 4) AS DOUBLE) + 0.0 AS mean_daily,
           CAST(ROUND(((ss - s * s / n) / (n - 1)) / (s / n), 6)
               AS DOUBLE) + 0.0 AS dispersion_index,
           ((ss - s * s / n) / (n - 1)) / (s / n) > 1.5
               AS overdispersed
    FROM m
    """,
)
def poissonness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are arrivals Poisson-like per type? The dispersion screen that
    decides whether dp_counts_q-style rate models or burstiness_q's
    heavy-tail machinery applies."""
    e = Catalog(spark, sf_dir).events
    dc = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m = dc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("double").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("ss"),
    )
    iod = (
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    ) / (F.col("s") / F.col("n"))
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        (
            F.round(F.col("s") / F.col("n"), 4) + F.lit(0.0)
        ).alias("mean_daily"),
        (F.round(iod, 6) + F.lit(0.0)).alias("dispersion_index"),
        (iod > 1.5).alias("overdispersed"),
    )
